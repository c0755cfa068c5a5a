"""Pallas kernel: per-frame min-max normalize + bilinear resize in one VMEM pass.

The XLA reference path (``ops/preprocess.py``, mirroring reference
``utils.py:283-292``) materializes the normalized full-resolution frames in
HBM between the normalize and resize stages.  At full-rate decode (25 fps,
BASELINE.json config 5) that intermediate is the largest tensor in the
pipeline — e.g. (N, 360, 640, 3) float32.  This kernel keeps everything for
one frame in VMEM:

    load raw frame → VPU min/max reduce → normalize → two MXU matmuls → store
    only the (h_out, w_out·C) result.

HBM traffic drops from ``2·H·W·C + h·w·C`` floats per frame (read + write the
normalized intermediate, then read again for resize) to ``H·W·C`` reads +
``h·w·C`` writes — a ~3× bandwidth cut on the preprocess stage.

Mosaic constraints shape the layout (vector reshapes of minor dims are not
lowerable on TPU):

* frames enter the kernel pre-flattened to (N, H, W·C) — a free relayout in
  XLA since (W, C) are contiguous;
* the H contraction is a plain matmul with R_h (h_out, H);
* the W contraction uses R_wc = kron(R_wᵀ, I_C) of shape (W·C, w_out·C), so
  channels stay interleaved and no in-kernel reshape is needed.  The extra
  C× zeros in R_wc are irrelevant — the stage is bandwidth-bound.

Measured (v5e, 512×180×320×3 uint8 → 40×40): bit-exact vs the XLA path but
~2.5× slower (4.45 ms blocked×8 / 5.0 ms per-frame vs 1.74 ms XLA).  The gap
is NOT program overhead (blocking 8 frames/program barely moved it) — it is
GEMM shape: this kernel issues per-frame (40, H)×(H, W·C) matmuls whose
M=40 underutilizes the 128×128 MXU, while XLA's einsum batches ALL frames
into two giant GEMMs ((h_out, H) × (H, N·W·C), then (N·h_out, W·C) ×
(W·C, w_out·C)) at full tile occupancy.  Matching that inside Pallas would
reproduce XLA's exact schedule for no gain, so the XLA path stays the
default; this kernel is kept as the validated hand-scheduled alternative and
a documented negative result.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvml_goalnet_tpu.ops.preprocess import resize_matrices


@lru_cache(maxsize=32)
def _kron_resize_matrices(src_h: int, src_w: int, dst_h: int, dst_w: int, channels: int):
    rh, rw = resize_matrices(src_h, src_w, dst_h, dst_w)
    rwc = np.kron(rw.T, np.eye(channels, dtype=np.float32))  # (W·C, w_out·C)
    return rh, rwc


def _kernel(frame_ref, rh_ref, rwc_ref, out_ref, *, eps: float, block: int):
    # frame_ref: (block, H, W·C); rh: (h_out, H); rwc: (W·C, w_out·C)
    # Static unroll over the frame block: 1/block as many grid programs, so
    # per-program overhead amortizes while each matmul stays 2-D (no
    # in-kernel minor-dim reshapes — Mosaic lowering constraint).
    for k in range(block):
        f = frame_ref[k]                                       # (H, W·C) f32
        lo = jnp.min(f)
        hi = jnp.max(f)
        f = (f - lo) / (hi - lo + eps)
        x = jnp.dot(rh_ref[:], f, preferred_element_type=jnp.float32)   # (h_out, W·C)
        out_ref[k] = jnp.dot(x, rwc_ref[:], preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def fused_preprocess_frames(
    frames: jax.Array,
    out_hw: tuple[int, int] = (40, 40),
    eps: float = 1e-7,
    interpret: bool = False,
    block: int = 8,
) -> jax.Array:
    """(N, H, W, C) raw frames → (N, h_out, w_out, C) normalized+resized.

    Numerically equivalent to ``ops.preprocess.preprocess_frames`` (tested).
    ``block`` frames are processed per grid program to amortize per-program
    overhead; it auto-shrinks to divide N and respect a ~8 MB VMEM budget.
    """
    n, h, w, c = frames.shape
    if frames.dtype != jnp.float32:
        # Mosaic has no uint8→f32 cast in-kernel; convert at the boundary
        # (XLA fuses the cast into the feeding copy).
        frames = frames.astype(jnp.float32)
    while block > 1 and (n % block != 0 or block * h * w * c * 4 > 8 * 2**20):
        block //= 2
    rh, rwc = _kron_resize_matrices(h, w, *out_hw, c)
    flat = frames.reshape(n, h, w * c)
    out = pl.pallas_call(
        partial(_kernel, eps=eps, block=block),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((block, h, w * c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((out_hw[0], h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w * c, out_hw[1] * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block, out_hw[0], out_hw[1] * c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, out_hw[0], out_hw[1] * c), jnp.float32),
        interpret=interpret,
    )(flat, jnp.asarray(rh), jnp.asarray(rwc))
    return out.reshape(n, out_hw[0], out_hw[1], c)
