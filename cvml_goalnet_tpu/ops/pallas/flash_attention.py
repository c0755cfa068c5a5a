"""Flash attention (Pallas TPU): tiled online-softmax forward AND backward.

The reference has no attention at all (its model is strictly per-frame —
SURVEY.md §2.3); the temporal transformer scorer (``models/temporal_attention``)
adds it for long-timeline event spotting, and these kernels are its TPU compute
core.  Naive attention materializes the (T, T) score matrix — 72 GB in f32
for a 90-min match at 25 fps (T=135k) — while these kernels stream K/V tiles
through VMEM with running statistics, so memory is O(T·d) in BOTH directions:
full-rate transformer training fits on one chip.

Forward (grid = (heads, T_q/block_q, T_k/block_k), KV innermost):

* VMEM scratch ``m/l/acc`` persists across KV tiles of one Q tile; online
  softmax correction ``alpha = exp(m_prev − m_next)`` keeps the result
  numerically equal to full softmax (f32 statistics);
* the accumulator stays UNnormalized until the final KV tile, then one divide
  by ``l`` produces the output, and the row log-sum-exp ``L = m + log l`` is
  written out (broadcast along a 128-lane trailing dim, the same layout
  ``jax.experimental.pallas.ops.tpu.flash_attention`` uses for its ``l/m``
  residuals) as the only extra residual the backward needs;
* padded key columns are masked by static ``t_valid``.

Backward — the standard two-kernel split (residuals: q, k, v, o, lse; plus
``di = rowsum(do·o)`` precomputed in XLA):

* **dKV kernel** (grid = (heads, T_k/block_k, T_q/block_q), Q innermost):
  each K/V tile streams all Q tiles, recomputing the probabilities
  ``p = exp(s − lse)`` tile-by-tile (never materializing T×T) and
  accumulating ``dv += pᵀ·do`` and ``dk += (p·(dp − di))ᵀ·q`` in VMEM.
* **dQ kernel** (grid = (heads, T_q/block_q, T_k/block_k), KV innermost):
  each Q tile streams all K/V tiles, accumulating ``dq += ds·k``.

Gradient parity vs :func:`attention_reference` is tested in interpret mode
(``tests/test_flash_attention.py``) and the O(T·d) memory claim is asserted
via compiled-memory analysis at T=32k where the XLA backward's residuals are
gigabytes.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(np.finfo(np.float32).max)  # avoids exp(-inf - -inf) NaN
LANES = 128  # trailing broadcast dim for per-row stats (TPU tiling)


def _fwd_kernel(tv_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *,
                block_k: int, scale: float, n_kv: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                   # (block_q, d)
    k = k_ref[0]                                   # (block_k, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                      # (block_q, block_k)

    # mask padded key columns; the true length is a DYNAMIC scalar so ring
    # attention can reuse this kernel with a per-hop valid length
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col < tv_ref[0], s, NEG_INF)

    m_prev = m_scr[:, :1]                          # (block_q, 1)
    l_prev = l_scr[:, :1]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)                        # (block_q, block_k)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(ki == n_kv - 1)
    def _store():
        # A row that never saw a valid key keeps m == NEG_INF (each masked
        # tile contributes p = exp(NEG_INF - NEG_INF) = 1, so l is NOT 0):
        # detect dead rows via m and emit out = 0, lse = 0 — the backward's
        # exp(NEG_INF - 0) then underflows to 0, not NaN.
        dead = m_scr[...] == NEG_INF
        l = jnp.where(dead[:, :1], 1.0, l_scr[:, :1])
        o_ref[0] = jnp.where(
            dead[:, :1], 0.0, acc_scr[...] / l).astype(o_ref.dtype)
        lse_ref[0] = jnp.where(dead, 0.0, m_scr[...] + jnp.log(l_scr[...]))


def _block_ladder(n: int) -> int:
    """Default tile size by sequence length — one ladder for the full AND
    banded kernels.  Measured on v5e (chained fwd, d=128): full attention at
    T=135k block 1024 → 73.7 ms vs 512 → 159.2 (2.16×), T=16k 3.99 vs 5.01;
    banded W=1024 at T=135k: 1024 → 5.17 ms, 512 → 6.52, 256 → 8.92,
    128 → 14.34.  2048 fails Mosaic compilation (VMEM).  Bigger MXU tiles
    win; shrink for short sequences to bound padding waste."""
    return 1024 if n >= 1024 else (512 if n >= 512 else 128)


def _block_defaults(t, t_kv, block_q, block_k):
    if block_q is None:
        block_q = _block_ladder(t)
    if block_k is None:
        block_k = _block_ladder(t_kv)
    return block_q, block_k


def _pad_seq(x, t_pad):
    t = x.shape[1]
    return x if t_pad == t else jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _flash_fwd(q, k, v, scale, block_q, block_k, interpret, t_valid=None):
    """→ (out (H, Tq, d), lse (H, Tq_pad, LANES) f32).

    ``t_valid`` (dynamic scalar, default = k's length) masks key columns at
    and beyond the true length — ring attention passes a per-hop value.
    """
    h, t, d = q.shape
    t_kv = k.shape[1]
    t_pad = -(-t // block_q) * block_q
    tkv_pad = -(-t_kv // block_k) * block_k
    q = _pad_seq(q, t_pad)
    k = _pad_seq(k, tkv_pad)
    v = _pad_seq(v, tkv_pad)
    n_kv = tkv_pad // block_k
    tv = jnp.full((1,), t_kv if t_valid is None else t_valid, jnp.int32)

    out, lse = pl.pallas_call(
        partial(_fwd_kernel, block_k=block_k, scale=scale, n_kv=n_kv),
        grid=(h, t_pad // block_q, n_kv),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), lambda hh, qi, ki: (hh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda hh, qi, ki: (hh, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda hh, qi, ki: (hh, ki, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda hh, qi, ki: (hh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, LANES), lambda hh, qi, ki: (hh, qi, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, t_pad, d), q.dtype),
            jax.ShapeDtypeStruct((h, t_pad, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),   # running max
            pltpu.VMEM((block_q, LANES), jnp.float32),   # running sum
            pltpu.VMEM((block_q, d), jnp.float32),       # unnormalized output
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(tv, q, k, v)
    return out[:, :t], lse


def flash_attention(
    q: jax.Array,                 # (H, T, d)
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Full (non-causal) attention: q (H, Tq, d) × k/v (H, Tk, d) → (H, Tq, d).

    Default block sizes: 1024 for long sequences (measured ~2× XLA's
    attention at T=16k and 2.16× the 512-block kernel at T=135k on v5e —
    docs/BENCHMARKS.md), shrinking for short ones to bound padding waste.
    """
    h, t, d = q.shape
    block_q, block_k = _block_defaults(t, k.shape[1], block_q, block_k)
    scale = (1.0 / np.sqrt(d)) if scale is None else scale
    out, _ = _flash_fwd(q, k, v, scale, block_q, block_k, interpret)
    return out


def _dkv_kernel(tv_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref,
                dk_scr, dv_scr, *, block_k: int, scale: float, n_q: int):
    qi = pl.program_id(2)
    ki = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]                                   # (block_q, d)
    k = k_ref[0]                                   # (block_k, d)
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)             # (block_q, d)
    lse = lse_ref[0][:, :1]                        # (block_q, 1)
    di = di_ref[0][:, :1]                          # (block_q, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                      # (block_q, block_k)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col < tv_ref[0], s, NEG_INF)
    p = jnp.exp(s - lse)                           # normalized probabilities

    # dv += pᵀ · do
    dv_scr[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dp = do · vᵀ ; ds = p (dp − di)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - di)
    # dk += dsᵀ · q   (scale applied once at the end)
    dk_scr[...] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == n_q - 1)
    def _store():
        dk_ref[0] = (dk_scr[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _dq_kernel(tv_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref, dq_scr, *,
               block_k: int, scale: float, n_kv: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]
    di = di_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col < tv_ref[0], s, NEG_INF)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - di)
    dq_scr[...] += jax.lax.dot(
        ds, k.astype(jnp.float32), preferred_element_type=jnp.float32
    )

    @pl.when(ki == n_kv - 1)
    def _store():
        dq_ref[0] = (dq_scr[...] * scale).astype(dq_ref.dtype)


@partial(jax.jit, static_argnums=(6, 7, 8, 9))
def _flash_bwd(q, k, v, o, lse, g, scale, block_q, block_k, interpret,
               t_valid=None, g_lse=None):
    """Tiled backward → (dq, dk, dv), all O(T·d) memory.

    ``g_lse`` (H, Tq, 1) is the cotangent of the log-sum-exp output (the
    flash-ring merge consumes lse): since ∂lse/∂s = p, it folds into the
    standard recipe as ``ds = p · (dp − (di − g_lse))`` — no kernel change,
    only the XLA ``di`` precompute.  ``t_valid`` is the dynamic key-validity
    length (ring hops pass per-hop values).
    """
    h, t, d = q.shape
    t_kv = k.shape[1]
    t_pad = -(-t // block_q) * block_q
    tkv_pad = -(-t_kv // block_k) * block_k
    q, g, o = _pad_seq(q, t_pad), _pad_seq(g, t_pad), _pad_seq(o, t_pad)
    k, v = _pad_seq(k, tkv_pad), _pad_seq(v, tkv_pad)
    n_q, n_kv = t_pad // block_q, tkv_pad // block_k
    tv = jnp.full((1,), t_kv if t_valid is None else t_valid, jnp.int32)

    # di = rowsum(do · o) − g_lse: cheap XLA precompute, stored in the same
    # broadcast-along-lanes layout as lse.
    di_col = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), -1, keepdims=True)
    if g_lse is not None:
        di_col = di_col - _pad_seq(g_lse.astype(jnp.float32), t_pad)
    di = jnp.broadcast_to(di_col, (h, t_pad, LANES))

    q_spec = pl.BlockSpec((1, block_q, d), lambda hh, a, b: (hh, a, 0), memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, block_q, LANES), lambda hh, a, b: (hh, a, 0), memory_space=pltpu.VMEM)
    # dKV: grid (h, kv tiles, q tiles) — q streams innermost
    kv_spec_d = pl.BlockSpec((1, block_k, d), lambda hh, ki, qi: (hh, ki, 0), memory_space=pltpu.VMEM)
    q_spec_d = pl.BlockSpec((1, block_q, d), lambda hh, ki, qi: (hh, qi, 0), memory_space=pltpu.VMEM)
    stat_spec_d = pl.BlockSpec((1, block_q, LANES), lambda hh, ki, qi: (hh, qi, 0), memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        partial(_dkv_kernel, block_k=block_k, scale=scale, n_q=n_q),
        grid=(h, n_kv, n_q),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  q_spec_d, kv_spec_d, kv_spec_d, q_spec_d, stat_spec_d, stat_spec_d],
        out_specs=[kv_spec_d, kv_spec_d],
        out_shape=[
            jax.ShapeDtypeStruct((h, tkv_pad, d), k.dtype),
            jax.ShapeDtypeStruct((h, tkv_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(tv, q, k, v, g, lse, di)

    # dQ: grid (h, q tiles, kv tiles) — kv streams innermost
    kv_spec_q = pl.BlockSpec((1, block_k, d), lambda hh, qi, ki: (hh, ki, 0), memory_space=pltpu.VMEM)
    q_spec_q = pl.BlockSpec((1, block_q, d), lambda hh, qi, ki: (hh, qi, 0), memory_space=pltpu.VMEM)
    stat_spec_q = pl.BlockSpec((1, block_q, LANES), lambda hh, qi, ki: (hh, qi, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        partial(_dq_kernel, block_k=block_k, scale=scale, n_kv=n_kv),
        grid=(h, n_q, n_kv),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  q_spec_q, kv_spec_q, kv_spec_q, q_spec_q, stat_spec_q, stat_spec_q],
        out_specs=q_spec_q,
        out_shape=jax.ShapeDtypeStruct((h, t_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(tv, q, k, v, g, lse, di)

    return dq[:, :t], dk[:, :t_kv], dv[:, :t_kv]


def attention_reference(q, k, v, scale: float | None = None) -> jax.Array:
    """XLA reference (materializes the score matrix) for parity tests."""
    h, t, d = q.shape
    scale = (1.0 / np.sqrt(d)) if scale is None else scale
    s = jnp.einsum("htd,hsd->hts", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("hts,hsd->htd", p.astype(v.dtype), v)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_trainable(q, k, v, scale: float | None = None,
                              interpret: bool = False):
    """Flash attention with O(T·d) gradients: Pallas forward AND backward.

    The backward recomputes probabilities tile-by-tile from the saved row
    log-sum-exp (never materializing the (T, T) score matrix), so full-rate
    T=135k transformer spotting TRAINS on one chip — the XLA backward at that
    length would need a 72 GB score-matrix residual.  Grad parity vs
    :func:`attention_reference` ≤1e-3 f32 (tests/test_flash_attention.py).
    """
    out, _ = _fat_fwd(q, k, v, scale, interpret)
    return out


def _fat_fwd(q, k, v, scale, interpret):
    h, t, d = q.shape
    block_q, block_k = _block_defaults(t, k.shape[1], None, None)
    s = (1.0 / np.sqrt(d)) if scale is None else scale
    out, lse = _flash_fwd(q, k, v, s, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _fat_bwd(scale, interpret, res, g):
    q, k, v, o, lse = res
    h, t, d = q.shape
    block_q, block_k = _block_defaults(t, k.shape[1], None, None)
    s = (1.0 / np.sqrt(d)) if scale is None else scale
    return _flash_bwd(q, k, v, o, lse, g, s, block_q, block_k, interpret)


flash_attention_trainable.defvjp(_fat_fwd, _fat_bwd)


# --------------------------------------------------------------------------
# Sliding-window (banded) flash attention: attend only |i − j| ≤ window.
#
# Event spotting is local by nature (a goal's evidence lives in the
# surrounding seconds, not 80 minutes away), so the full T² score band is
# mostly wasted FLOPs at match scale.  These kernels visit only the
# 2·w_tiles+1 KV tiles that intersect each query tile's band — compute AND
# memory are O(T·W·d) in both directions.  The grid's KV axis indexes the
# band offset; the BlockSpec index map clamps out-of-range tiles into the
# array (their contributions are masked to −∞ in-kernel, so clamping only
# affects which bytes are prefetched, never the math).
# --------------------------------------------------------------------------


def _band_mask(s_shape, desired_tile, anchor_tile, block, window, n_tiles,
               tv_lo, tv_hi, desired_axis: int, q_offset: int = 0):
    """Validity mask for one (block, block) tile of the banded score matrix.

    ``desired_tile`` indexes the streamed side (may be out of range — masked
    here), ``anchor_tile`` the grid-parallel side.  ``desired_axis`` says
    which axis of ``s`` the streamed side lies on (1 = cols for fwd/dQ,
    0 = rows for dKV).  Keys are valid in the dynamic half-open range
    ``[tv_lo, tv_hi)`` — context-parallel halo shards pass nonzero ``tv_lo``
    to mask nonexistent halos at the global sequence edges.  The band is
    ``|(q_pos + q_offset) − k_pos| ≤ window``: a nonzero static ``q_offset``
    lets Tq ≠ Tk shards (query rows sitting mid-way into an extended key
    sequence, the halo-CP layout) skip computing discarded halo query rows.
    """
    d_iota = jax.lax.broadcasted_iota(jnp.int32, s_shape, desired_axis)
    a_iota = jax.lax.broadcasted_iota(jnp.int32, s_shape, 1 - desired_axis)
    d_pos = d_iota + desired_tile * block
    a_pos = a_iota + anchor_tile * block
    if desired_axis == 1:   # anchor side is Q
        q_pos, k_pos = a_pos + q_offset, d_pos
    else:                   # desired (streamed) side is Q
        q_pos, k_pos = d_pos + q_offset, a_pos
    return (
        (jnp.abs(q_pos - k_pos) <= window)
        & (k_pos >= tv_lo)
        & (k_pos < tv_hi)
        & (desired_tile >= 0)
        & (desired_tile < n_tiles)
    )


def _local_fwd_kernel(tv_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                      m_scr, l_scr, acc_scr, *,
                      block: int, scale: float, n_loc: int, tile_base: int,
                      window: int, n_kv: int, q_offset: int):
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    kv_tile = qi + tile_base + kj
    valid = _band_mask(s.shape, kv_tile, qi, block, window, n_kv,
                       tv_ref[0], tv_ref[1], 1, q_offset)
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(kj == n_loc - 1)
    def _store():
        # dead rows (no valid key in the band) keep m == NEG_INF; emit 0s —
        # see _fwd_kernel._store
        dead = m_scr[...] == NEG_INF
        l = jnp.where(dead[:, :1], 1.0, l_scr[:, :1])
        o_ref[0] = jnp.where(
            dead[:, :1], 0.0, acc_scr[...] / l).astype(o_ref.dtype)
        lse_ref[0] = jnp.where(dead, 0.0, m_scr[...] + jnp.log(l_scr[...]))


def _local_dkv_kernel(tv_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                      dk_ref, dv_ref, dk_scr, dv_scr, *,
                      block: int, scale: float, n_loc: int, tile_base: int,
                      window: int, n_q: int, q_offset: int):
    ki = pl.program_id(1)
    qj = pl.program_id(2)

    @pl.when(qj == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]
    di = di_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    q_tile = ki + tile_base + qj
    valid = _band_mask(s.shape, q_tile, ki, block, window, n_q,
                       tv_ref[0], tv_ref[1], 0, q_offset)
    s = jnp.where(valid, s, NEG_INF)
    p = jnp.exp(s - lse)

    dv_scr[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - di)
    dk_scr[...] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qj == n_loc - 1)
    def _store():
        dk_ref[0] = (dk_scr[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _local_dq_kernel(tv_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                     dq_ref, dq_scr, *,
                     block: int, scale: float, n_loc: int, tile_base: int,
                     window: int, n_kv: int, q_offset: int):
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]
    di = di_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    kv_tile = qi + tile_base + kj
    valid = _band_mask(s.shape, kv_tile, qi, block, window, n_kv,
                       tv_ref[0], tv_ref[1], 1, q_offset)
    s = jnp.where(valid, s, NEG_INF)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - di)
    dq_scr[...] += jax.lax.dot(
        ds, k.astype(jnp.float32), preferred_element_type=jnp.float32
    )

    @pl.when(kj == n_loc - 1)
    def _store():
        dq_ref[0] = (dq_scr[...] * scale).astype(dq_ref.dtype)


def _local_block_default(t: int, window: int) -> int:
    # shared ladder, then shrink for tiny windows (where a huge tile would
    # over-cover the band by > 2×)
    block = _block_ladder(t)
    while block > 128 and block > 2 * max(window, 1):
        block //= 2
    return block


def _band_cover(window: int, block: int, q_offset: int):
    """Static tile geometry for the banded cover.

    ``n_loc = 2·ceil(W/block)+1`` streamed tiles per anchor tile, starting at
    ``anchor + tile_base_fwd`` (kv tiles for a q tile) or
    ``anchor + tile_base_bwd`` (q tiles for a kv tile).  Asserted sufficient
    for the given static offset (holds for the offsets used: 0 and W).
    """
    w_tiles = -(-window // block)
    n_loc = 2 * w_tiles + 1
    base_fwd = (q_offset - window) // block          # floor
    base_bwd = (-q_offset - window) // block
    hi_fwd = (block - 1 + q_offset + window) // block
    hi_bwd = (block - 1 + window - q_offset) // block
    # Coverage invariants must survive `python -O` (a violation would
    # silently truncate the band), so raise rather than assert.
    if hi_fwd - base_fwd > n_loc - 1 or hi_bwd - base_bwd > n_loc - 1:
        raise ValueError(
            f"banded tile cover insufficient for window={window}, "
            f"block={block}, q_offset={q_offset}: need "
            f"{max(hi_fwd - base_fwd, hi_bwd - base_bwd) + 1} tiles per "
            f"anchor but n_loc={n_loc}"
        )
    return n_loc, base_fwd, base_bwd


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 9))
def _flash_local_fwd(q, k, v, scale, window, block, interpret,
                     tv_lo=None, tv_hi=None, q_offset=0):
    h, t, d = q.shape
    t_kv = k.shape[1]
    t_pad = -(-t // block) * block
    tkv_pad = -(-t_kv // block) * block
    q = _pad_seq(q, t_pad)
    k, v = _pad_seq(k, tkv_pad), _pad_seq(v, tkv_pad)
    n_q, n_kv = t_pad // block, tkv_pad // block
    n_loc, base_fwd, _ = _band_cover(window, block, q_offset)
    tv = jnp.stack([
        jnp.int32(0) if tv_lo is None else tv_lo.astype(jnp.int32),
        jnp.int32(t_kv) if tv_hi is None else tv_hi.astype(jnp.int32),
    ])

    def clamp(i):
        return jnp.clip(i, 0, n_kv - 1)

    q_spec = pl.BlockSpec((1, block, d), lambda hh, qi, kj: (hh, qi, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec(
        (1, block, d), lambda hh, qi, kj: (hh, clamp(qi + base_fwd + kj), 0),
        memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        partial(_local_fwd_kernel, block=block, scale=scale, n_loc=n_loc,
                tile_base=base_fwd, window=window, n_kv=n_kv,
                q_offset=q_offset),
        grid=(h, n_q, n_loc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), q_spec, kv_spec, kv_spec],
        out_specs=[
            q_spec,
            pl.BlockSpec((1, block, LANES), lambda hh, qi, kj: (hh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, t_pad, d), q.dtype),
            jax.ShapeDtypeStruct((h, t_pad, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, LANES), jnp.float32),
            pltpu.VMEM((block, LANES), jnp.float32),
            pltpu.VMEM((block, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(tv, q, k, v)
    return out[:, :t], lse


@partial(jax.jit, static_argnums=(6, 7, 8, 9, 12))
def _flash_local_bwd(q, k, v, o, lse, g, scale, window, block, interpret=False,
                     tv_lo=None, tv_hi=None, q_offset=0):
    h, t, d = q.shape
    t_kv = k.shape[1]
    t_pad = -(-t // block) * block
    tkv_pad = -(-t_kv // block) * block
    q = _pad_seq(q, t_pad)
    k, v = _pad_seq(k, tkv_pad), _pad_seq(v, tkv_pad)
    g, o = _pad_seq(g, t_pad), _pad_seq(o, t_pad)
    n_q, n_kv = t_pad // block, tkv_pad // block
    n_loc, base_fwd, base_bwd = _band_cover(window, block, q_offset)
    tv = jnp.stack([
        jnp.int32(0) if tv_lo is None else tv_lo.astype(jnp.int32),
        jnp.int32(t_kv) if tv_hi is None else tv_hi.astype(jnp.int32),
    ])

    di_col = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), -1, keepdims=True)
    di = jnp.broadcast_to(di_col, (h, t_pad, LANES))

    def clamp_q(i):
        return jnp.clip(i, 0, n_q - 1)

    def clamp_kv(i):
        return jnp.clip(i, 0, n_kv - 1)

    # dKV: grid (h, kv tiles, band offset) — the banded Q tiles stream
    kv_anchor = pl.BlockSpec((1, block, d), lambda hh, ki, qj: (hh, ki, 0),
                             memory_space=pltpu.VMEM)
    banded_q = pl.BlockSpec(
        (1, block, d), lambda hh, ki, qj: (hh, clamp_q(ki + base_bwd + qj), 0),
        memory_space=pltpu.VMEM)
    banded_stat = pl.BlockSpec(
        (1, block, LANES), lambda hh, ki, qj: (hh, clamp_q(ki + base_bwd + qj), 0),
        memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        partial(_local_dkv_kernel, block=block, scale=scale, n_loc=n_loc,
                tile_base=base_bwd, window=window, n_q=n_q, q_offset=q_offset),
        grid=(h, n_kv, n_loc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  banded_q, kv_anchor, kv_anchor, banded_q, banded_stat, banded_stat],
        out_specs=[kv_anchor, kv_anchor],
        out_shape=[
            jax.ShapeDtypeStruct((h, tkv_pad, d), k.dtype),
            jax.ShapeDtypeStruct((h, tkv_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, d), jnp.float32),
            pltpu.VMEM((block, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(tv, q, k, v, g, lse, di)

    # dQ: grid (h, q tiles, band offset) — the banded KV tiles stream
    q_anchor = pl.BlockSpec((1, block, d), lambda hh, qi, kj: (hh, qi, 0),
                            memory_space=pltpu.VMEM)
    banded_kv = pl.BlockSpec(
        (1, block, d), lambda hh, qi, kj: (hh, clamp_kv(qi + base_fwd + kj), 0),
        memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((1, block, LANES), lambda hh, qi, kj: (hh, qi, 0),
                        memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        partial(_local_dq_kernel, block=block, scale=scale, n_loc=n_loc,
                tile_base=base_fwd, window=window, n_kv=n_kv, q_offset=q_offset),
        grid=(h, n_q, n_loc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  q_anchor, banded_kv, banded_kv, q_anchor, stat, stat],
        out_specs=q_anchor,
        out_shape=jax.ShapeDtypeStruct((h, t_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(tv, q, k, v, g, lse, di)

    return dq[:, :t], dk[:, :t_kv], dv[:, :t_kv]


def attention_local_reference(q, k, v, window: int, scale: float | None = None):
    """XLA banded attention (materializes the masked score matrix) — the
    numerical contract for the local kernels, used for parity tests and as
    the CPU fallback in the temporal transformer.  The special case of
    :func:`attention_local_bounded_reference` with the full [0, T) bounds
    (every row then has a valid diagonal key)."""
    t = q.shape[1]
    return attention_local_bounded_reference(q, k, v, 0, t, window, scale)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_local(q, k, v, window: int, scale: float | None = None,
                          interpret: bool = False):
    """Sliding-window flash self-attention: attend only where |i−j| ≤ window.

    O(T·W·d) compute and O(T·d) memory in BOTH directions (tiled Pallas
    forward and backward) — at match scale (T=135k, W≈1k) that is ~60× fewer
    attention FLOPs than the full kernel while keeping the local context that
    event spotting actually uses.  Numerically equal to
    :func:`attention_local_reference` (tests).  ``window`` is a static radius
    in frames; q/k/v are (H, T, d) with equal T (self-attention band).
    """
    out, _ = _fal_fwd(q, k, v, window, scale, interpret)
    return out


def _fal_fwd(q, k, v, window, scale, interpret):
    h, t, d = q.shape
    if k.shape[1] != t:
        raise ValueError(
            f"flash_attention_local is a self-attention band: Tq={t} != Tk={k.shape[1]}")
    block = _local_block_default(t, window)
    s = (1.0 / np.sqrt(d)) if scale is None else scale
    out, lse = _flash_local_fwd(q, k, v, s, window, block, interpret)
    return out, (q, k, v, out, lse)


def _fal_bwd(window, scale, interpret, res, g):
    q, k, v, o, lse = res
    h, t, d = q.shape
    block = _local_block_default(t, window)
    s = (1.0 / np.sqrt(d)) if scale is None else scale
    return _flash_local_bwd(q, k, v, o, lse, g, s, window, block, interpret)


flash_attention_local.defvjp(_fal_fwd, _fal_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_attention_local_bounded(q, k, v, lo_f, hi_f, window: int,
                                  interpret: bool = False, q_offset: int = 0):
    """Banded flash attention with DYNAMIC key-validity bounds [lo, hi).

    The band is ``|(i + q_offset) − j| ≤ window`` between q rows i and key
    columns j — the context-parallel halo formulation keeps only the local
    query rows (Tq) against the extended key sequence (Tk = Tq + 2·window,
    ``q_offset = window``), so no FLOPs are spent on discarded halo queries.
    Shards at the global sequence edges have nonexistent halos, masked by
    the dynamic bounds.  ``lo_f``/``hi_f`` are float32 scalars (cast inside)
    so the custom VJP can return zero cotangents for them.
    """
    out, _ = _falb_fwd(q, k, v, lo_f, hi_f, window, interpret, q_offset)
    return out


def _falb_fwd(q, k, v, lo_f, hi_f, window, interpret, q_offset=0):
    h, t, d = q.shape
    block = _local_block_default(t, window)
    scale = 1.0 / np.sqrt(d)
    out, lse = _flash_local_fwd(q, k, v, scale, window, block, interpret,
                                lo_f.astype(jnp.int32), hi_f.astype(jnp.int32),
                                q_offset)
    return out, (q, k, v, out, lse, lo_f, hi_f)


def _falb_bwd(window, interpret, q_offset, res, g):
    q, k, v, o, lse, lo_f, hi_f = res
    h, t, d = q.shape
    block = _local_block_default(t, window)
    scale = 1.0 / np.sqrt(d)
    dq, dk, dv = _flash_local_bwd(
        q, k, v, o, lse, g, scale, window, block, interpret,
        lo_f.astype(jnp.int32), hi_f.astype(jnp.int32), q_offset)
    return dq, dk, dv, jnp.zeros_like(lo_f), jnp.zeros_like(hi_f)


flash_attention_local_bounded.defvjp(_falb_fwd, _falb_bwd)


def attention_local_bounded_reference(q, k, v, lo, hi, window: int,
                                      scale: float | None = None,
                                      q_offset: int = 0):
    """XLA banded attention with [lo, hi) key-validity bounds (parity oracle
    and CPU fallback for the halo context-parallel path).  Band:
    ``|(i + q_offset) − j| ≤ window`` (Tq and Tk may differ).  Rows with no
    valid keys return 0 (matching the kernel's dead-row convention)."""
    h, t, d = q.shape
    t_kv = k.shape[1]
    scale = (1.0 / np.sqrt(d)) if scale is None else scale
    s = jnp.einsum("htd,hsd->hts", q, k).astype(jnp.float32) * scale
    qi = jnp.arange(t) + q_offset
    kj = jnp.arange(t_kv)
    valid = (jnp.abs(qi[:, None] - kj[None, :]) <= window) \
        & (kj[None, :] >= lo) & (kj[None, :] < hi)
    s = jnp.where(valid[None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    row_has = jnp.any(valid, axis=1)[None, :, None]
    return jnp.where(row_has, jnp.einsum("hts,hsd->htd", p.astype(v.dtype), v), 0.0)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention_with_lse(q, k, v, t_valid_f, interpret: bool = False):
    """Flash attention that ALSO returns the per-row log-sum-exp — both
    differentiable — with a DYNAMIC key-validity length.

    This is the ring-attention building block: hops merge (out, lse) pairs,
    so training through the ring needs gradients w.r.t. lse too.  Since
    ∂lse/∂s = softmax(s), the lse cotangent folds into the tiled backward's
    existing ``ds = p·(dp − di)`` as ``di − g_lse`` — same kernels, O(T·d)
    memory.  ``t_valid_f`` is a float32 scalar (cast to int inside) so the
    custom VJP can hand back a zero cotangent for it.

    → (out (H, Tq, d), lse (H, Tq, 1) f32)
    """
    (out, lse), _ = _fwl_fwd(q, k, v, t_valid_f, interpret)
    return out, lse


def _fwl_fwd(q, k, v, t_valid_f, interpret):
    h, t, d = q.shape
    block_q, block_k = _block_defaults(t, k.shape[1], None, None)
    scale = 1.0 / np.sqrt(d)
    tv = t_valid_f.astype(jnp.int32)
    out, lse3 = _flash_fwd(q, k, v, scale, block_q, block_k, interpret, tv)
    lse = lse3[:, :t, :1]
    return (out, lse), (q, k, v, out, lse3, t_valid_f)


def _fwl_bwd(interpret, res, g):
    q, k, v, o, lse3, t_valid_f = res
    g_out, g_lse = g
    h, t, d = q.shape
    block_q, block_k = _block_defaults(t, k.shape[1], None, None)
    scale = 1.0 / np.sqrt(d)
    dq, dk, dv = _flash_bwd(
        q, k, v, o, lse3, g_out.astype(q.dtype), scale, block_q, block_k,
        interpret, t_valid_f.astype(jnp.int32), g_lse,
    )
    return dq, dk, dv, jnp.zeros_like(t_valid_f)


flash_attention_with_lse.defvjp(_fwl_fwd, _fwl_bwd)
