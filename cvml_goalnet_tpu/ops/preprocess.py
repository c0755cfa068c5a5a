"""Frame preprocessing: per-frame min-max normalization + bilinear resize.

Capability parity with reference ``extract_condensed_frame_tensor``'s per-frame
math (``utils.py:283-292``): each kept frame is min-max normalized over ALL
pixels and channels jointly, THEN resized to 40×40 (order matters and is
preserved).  The reference does this on the host with cv2 per frame inside the
decode loop; here the math is batched XLA on device:

* normalization is two reductions + one fused elementwise op over (N, H, W, C);
* bilinear resize is expressed as two small matmuls —
  ``out = R_h @ frame @ R_w^T`` per channel — with precomputed interpolation
  matrices, which XLA maps straight onto the MXU (far better than a gather
  formulation on TPU).

Interpolation matrices use cv2/INTER_LINEAR's half-pixel convention
(``x_src = (x_dst + 0.5) * scale - 0.5``, edge-clamped), so outputs match the
reference's cv2.resize on float inputs to float tolerance.

Layout note: this module is NHWC (TPU-native).  The reference emits NCHW
(``utils.py:292``); parity tests transpose at the boundary.

A fused Pallas version (normalize+resize in one VMEM pass) lives in
``ops/pallas/fused_preprocess.py``; this XLA path is the reference
implementation it is tested against.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def resize_matrices(src_h: int, src_w: int, dst_h: int, dst_w: int) -> tuple[np.ndarray, np.ndarray]:
    """Precompute bilinear interpolation matrices (dst_h, src_h) and (dst_w, src_w)."""

    def axis_matrix(src: int, dst: int) -> np.ndarray:
        scale = src / dst
        x = (np.arange(dst) + 0.5) * scale - 0.5
        x = np.clip(x, 0.0, src - 1.0)
        lo = np.floor(x).astype(np.int64)
        hi = np.minimum(lo + 1, src - 1)
        frac = x - lo
        m = np.zeros((dst, src), dtype=np.float32)
        rows = np.arange(dst)
        np.add.at(m, (rows, lo), 1.0 - frac)
        np.add.at(m, (rows, hi), frac)
        return m

    return axis_matrix(src_h, dst_h), axis_matrix(src_w, dst_w)


@jax.jit
def normalize_frames(frames: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Per-frame joint min-max normalization over (H, W, C) — ``utils.py:284``."""
    f = frames.astype(jnp.float32)
    lo = jnp.min(f, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(f, axis=(1, 2, 3), keepdims=True)
    return (f - lo) / (hi - lo + eps)


@partial(jax.jit, static_argnums=(1, 2))
def resize_bilinear(frames: jax.Array, out_hw: tuple[int, int], compute_dtype=jnp.float32) -> jax.Array:
    """Bilinear-resize (N, H, W, C) → (N, out_h, out_w, C) via two matmuls.

    ``compute_dtype=jnp.bfloat16`` runs the contractions on the MXU in bf16
    with f32 accumulation (the production fast path; [0,1]-normalized inputs
    keep the error ≤ ~1e-3).
    """
    n, h, w, c = frames.shape
    rh, rw = resize_matrices(h, w, *out_hw)
    rh = jnp.asarray(rh, compute_dtype)
    rw = jnp.asarray(rw, compute_dtype)
    # (N,H,W,C): contract H with R_h then W with R_w — two MXU matmuls.
    x = jnp.einsum(
        "ah,nhwc->nawc", rh, frames.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ).astype(compute_dtype)
    return jnp.einsum("bw,nawc->nabc", rw, x, preferred_element_type=jnp.float32)


def preprocess_frames_host(frames: np.ndarray, out_hw: tuple[int, int] = (40, 40), eps: float = 1e-7) -> np.ndarray:
    """NumPy mirror of :func:`preprocess_frames` (same matrices, same order).

    Used by the streaming pipeline's host-preprocess mode: on links where
    host→device bandwidth is the bottleneck, resizing on the host shrinks the
    transfer by H·W/(h·w) (e.g. 36× at 180×320→40×40) at trivial CPU cost.
    """
    frames = np.asarray(frames)
    n, h, w, c = frames.shape
    # Per-frame min/max on the raw dtype (cheap on uint8), then resize FIRST
    # and normalize on the small output — bilinear resize is affine-linear
    # with unit row sums, so resize((f-lo)/s) == (resize(f)-lo)/s exactly.
    lo = frames.min(axis=(1, 2, 3)).astype(np.float32)
    hi = frames.max(axis=(1, 2, 3)).astype(np.float32)
    small = np.empty((n, *out_hw, c), np.float32)
    try:
        import cv2

        def one(i):
            r = cv2.resize(
                frames[i].astype(np.float32), (out_hw[1], out_hw[0]),
                interpolation=cv2.INTER_LINEAR,
            )
            # cv2 drops the channel dim for c=1; the matmul fallback keeps
            # it — behave identically on any host (round-3 review)
            small[i] = r[..., None] if r.ndim == 2 else r

        if n >= 64:
            # cv2.resize releases the GIL; chunked frames parallelize cleanly
            import os
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1)) as pool:
                list(pool.map(one, range(n)))
        else:
            for i in range(n):
                one(i)
    except ImportError:
        rh, rw = resize_matrices(h, w, *out_hw)
        f = frames.astype(np.float32)
        x = np.matmul(rh, f.reshape(n, h, w * c))
        x = x.reshape(n, out_hw[0], w, c).transpose(0, 1, 3, 2)
        small = np.ascontiguousarray(np.matmul(x, rw.T).transpose(0, 1, 3, 2))
    scale = (hi - lo + eps)[:, None, None, None]
    return (small - lo[:, None, None, None]) / scale


@partial(jax.jit, static_argnums=(1, 2, 3))
def preprocess_frames(
    frames: jax.Array,
    out_hw: tuple[int, int] = (40, 40),
    eps: float = 1e-7,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """The reference's normalize-then-resize contract (``utils.py:284-285``),
    computed as resize-then-affine-normalize: bilinear interpolation rows sum
    to 1, so ``resize((f−lo)/s) == (resize(f)−lo)/s`` exactly (same identity
    the host mirror uses).  The reorder keeps the per-frame min/max on the
    raw (uint8) input and normalizes only the SMALL resized output — never
    materializing the full-resolution f32 normalized intermediate, which was
    pure HBM traffic (measured +26% end-to-end on v5e, score drift ≤2.5e-4).
    """
    lo = jnp.min(frames, axis=(1, 2, 3), keepdims=True).astype(jnp.float32)
    hi = jnp.max(frames, axis=(1, 2, 3), keepdims=True).astype(jnp.float32)
    small = resize_bilinear(frames, out_hw, compute_dtype).astype(jnp.float32)
    return (small - lo) / (hi - lo + eps)


@partial(jax.jit, static_argnums=(1, 2, 3))
def preprocess_frames_normalize_first(
    frames: jax.Array,
    out_hw: tuple[int, int] = (40, 40),
    eps: float = 1e-7,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Literal normalize-then-resize order — the parity oracle for
    :func:`preprocess_frames` (equal up to float associativity) and for the
    Pallas fused kernel."""
    return resize_bilinear(normalize_frames(frames, eps), out_hw, compute_dtype)
