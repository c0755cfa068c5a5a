"""Fused conv(3×3, s1, p1) → ReLU → maxpool(3×3, s1) Pallas stage kernel.

The visual trunk's stages 2–3 (reference ``utils.py:156-163``) are a
stride-1 conv followed by a VPU max-pool; run as separate XLA ops the conv
output makes a full HBM round trip (written by the conv, re-read by the
pool — ~430 MB at B=2048 for stage 3).  This kernel keeps the whole stage in
VMEM:

* **shifted-matmul conv** — no im2col relayout (measured 4–6× slowdowns from
  reshaping activations away from conv-native tiling, docs/BENCHMARKS.md):
  the padded input block is sliced 9 ways (static (dy, dx) offsets) and each
  slice hits the MXU as a (F·H·W, C) @ (C, C_out) GEMM accumulated in f32;
* bias is a SPATIAL map (H, W, C_out) so the batchnorm-folding correction
  term (``models/visual.py``: the batch-1 conv over the t-map, exact at
  zero-padded borders) rides in for free — pass ``b + corr`` directly;
* ReLU and the 3×3 stride-1 max-pool run on the VPU over the VMEM
  accumulator; only the pooled (H-2, W-2, C_out) tile is written back.

Parity: bit-tolerance vs the XLA conv→relu→pool chain in interpret mode and
on TPU.  **Measured outcome (v5e, B=2048, docs/BENCHMARKS.md): SLOWER than
XLA's own fusion** — stage 3 at F=8 ran 6.32 ms vs 5.13 ms for the XLA chain
under identical probes, and larger frame blocks failed Mosaic compilation
(the (F, 13, 13, C) tiles pad both tiny spatial dims to the (8, 128) tile
grid, wasting ~2.4× of VMEM/VPU).  Kept as the validated hand-scheduled
alternative and as recorded evidence that XLA's conv fusion is at the floor
for the reference's tiny-spatial shapes; the production path stays on XLA
(models/visual.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, o_ref, *, h: int, wdt: int, cin: int,
            cout: int, frames: int):
    # x_ref: (F, H+2, W+2, C) — pre-padded input block
    # w_ref: (3, 3, C, Co); b_ref: (H, W, Co) spatial bias (incl. fold corr)
    x = x_ref[...]
    acc = jnp.zeros((frames * h * wdt, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            window = x[:, dy:dy + h, dx:dx + wdt, :].reshape(frames * h * wdt, cin)
            acc += jax.lax.dot(
                window, w_ref[dy, dx], preferred_element_type=jnp.float32
            )
    y = acc.reshape(frames, h, wdt, cout) + b_ref[...].astype(jnp.float32)
    y = jnp.maximum(y, 0.0)
    # 3×3 stride-1 max pool over the VMEM tile
    ph, pw = h - 2, wdt - 2
    pooled = jnp.full((frames, ph, pw, cout), -jnp.inf, jnp.float32)
    for dy in range(3):
        for dx in range(3):
            pooled = jnp.maximum(pooled, y[:, dy:dy + ph, dx:dx + pw, :])
    o_ref[...] = pooled.astype(o_ref.dtype)


@partial(jax.jit, static_argnums=(3, 4))
def fused_conv_pool_stage(
    x: jax.Array,          # (N, H, W, C)
    w: jax.Array,          # (3, 3, C, C_out)
    b_spatial: jax.Array,  # (H, W, C_out) — conv bias (+ BN-fold correction)
    block_frames: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """conv(3×3, s1, p1) → relu → maxpool(3×3, s1): (N, H-2, W-2, C_out)."""
    n, h, wdt, cin = x.shape
    cout = w.shape[-1]
    f = block_frames
    n_pad = -(-n // f) * f
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0), (0, 0), (0, 0)))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    out = pl.pallas_call(
        partial(_kernel, h=h, wdt=wdt, cin=cin, cout=cout, frames=f),
        grid=(n_pad // f,),
        in_specs=[
            pl.BlockSpec((f, h + 2, wdt + 2, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, wdt, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((f, h - 2, wdt - 2, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, h - 2, wdt - 2, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(xp, w, b_spatial)
    return out[:n]


def reference_stage(x, w, b_spatial):
    """XLA chain (conv → relu → pool) for parity tests."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b_spatial.astype(x.dtype)[None]
    y = jax.nn.relu(y)
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
    )
