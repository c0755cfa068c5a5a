"""Pallas kernel: per-frame min-max normalize + bilinear resize in one VMEM pass.

The XLA reference path (``ops/preprocess.py``, mirroring reference
``utils.py:283-292``) materializes the normalized full-resolution frames in
HBM between the normalize and resize stages.  At full-rate decode (25 fps,
BASELINE.json config 5) that intermediate is the largest tensor in the
pipeline — e.g. (N, 360, 640, 3) float32.  This kernel keeps everything for
one frame block in VMEM:

    load raw frame → VPU min/max reduce → normalize → two MXU matmuls
    (R_h · frame, then · R_wᵀ) → store only the (h_out, w_out, C) result.

HBM traffic drops from ``2·H·W·C + h·w·C`` floats per frame (read + write the
normalized intermediate, then read again for resize) to ``H·W·C`` reads +
``h·w·C`` writes — a ~3× bandwidth cut on the preprocess stage.

Grid: one program per frame; channels are moved to the sublane-friendly
position by contracting H and W with the interpolation matrices per channel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvml_goalnet_tpu.ops.preprocess import resize_matrices


def _kernel(frame_ref, rh_ref, rw_ref, out_ref, *, eps: float):
    # frame_ref: (1, H, W, C); rh: (h_out, H); rw: (w_out, W); out: (1, h_out, w_out, C)
    f = frame_ref[0].astype(jnp.float32)                      # (H, W, C)
    lo = jnp.min(f)
    hi = jnp.max(f)
    f = (f - lo) / (hi - lo + eps)

    h, w, c = f.shape
    rh = rh_ref[:]                                            # (h_out, H)
    rw = rw_ref[:]                                            # (w_out, W)
    # Contract H: (h_out, H) @ (H, W*C) → (h_out, W*C)
    x = jnp.dot(rh, f.reshape(h, w * c), preferred_element_type=jnp.float32)
    x = x.reshape(rh.shape[0], w, c)
    # Contract W per output row: einsum (h_out, W, C) × (w_out, W) → (h_out, w_out, C)
    y = jax.lax.dot_general(
        x, rw,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # (h_out, C, w_out)
    out_ref[0] = y.transpose(0, 2, 1)


@partial(jax.jit, static_argnums=(1, 2, 3))
def fused_preprocess_frames(
    frames: jax.Array,
    out_hw: tuple[int, int] = (40, 40),
    eps: float = 1e-7,
    interpret: bool = False,
) -> jax.Array:
    """(N, H, W, C) raw frames → (N, h_out, w_out, C) normalized+resized.

    Numerically equivalent to ``ops.preprocess.preprocess_frames`` (tested);
    use that XLA path on CPU and this kernel on TPU for the full-rate pipeline.
    """
    n, h, w, c = frames.shape
    rh, rw = resize_matrices(h, w, *out_hw)
    return pl.pallas_call(
        partial(_kernel, eps=eps),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((out_hw[0], h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((out_hw[1], w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, *out_hw, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, *out_hw, c), jnp.float32),
        interpret=interpret,
    )(frames, jnp.asarray(rh), jnp.asarray(rw))
