"""Flash attention (Pallas TPU): tiled online-softmax attention forward.

The reference has no attention at all (its model is strictly per-frame —
SURVEY.md §2.3); the temporal transformer scorer (``models/temporal_attention``)
adds it for long-timeline event spotting, and this kernel is its TPU compute
core.  Naive attention materializes the (T, T) score matrix — 72 GB in f32
for a 90-min match at 25 fps (T=135k) — while this kernel streams K/V tiles
through VMEM with running (m, l, acc) statistics, so memory is O(T·d)
regardless of T.

Structure (after ``jax.experimental.pallas.ops.tpu`` flash attention):

* grid = (heads, T_q/block_q, T_k/block_k) with the KV axis innermost and
  ``dimension_semantics=("parallel", "parallel", "arbitrary")``;
* VMEM scratch ``m/l/acc`` persists across KV tiles of one Q tile; online
  softmax correction ``alpha = exp(m_prev − m_next)`` keeps the result
  numerically equal to full softmax (f32 statistics);
* the accumulator stays UNnormalized until the final KV tile, then one
  divide by ``l`` produces the output;
* sequence padding is masked by column validity (static ``t_valid``), so any
  timeline length works after padding to a block multiple.

Tested in interpret mode against an XLA reference; benchmarked on v5e.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(np.finfo(np.float32).max)  # avoids exp(-inf - -inf) NaN


def _kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
            block_k: int, t_valid: int, scale: float, n_kv: int):
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

    # mask padded key columns (static true length)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col < t_valid, s, NEG_INF)

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
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[...] / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
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

    Default block sizes: 512 for long sequences (measured 1.42× faster than
    XLA's attention at T=16k on v5e — docs/BENCHMARKS.md), shrinking to 128
    for short ones to bound padding waste.
    """
    h, t, d = q.shape
    t_kv = k.shape[1]
    if block_q is None:
        block_q = 512 if t >= 512 else 128
    if block_k is None:
        block_k = 512 if t_kv >= 512 else 128
    scale = (1.0 / np.sqrt(d)) if scale is None else scale
    t_pad = -(-t // block_q) * block_q
    tkv_pad = -(-t_kv // block_k) * block_k
    if t_pad != t:
        q = jnp.pad(q, ((0, 0), (0, t_pad - t), (0, 0)))
    if tkv_pad != t_kv:
        kv_pad = ((0, 0), (0, tkv_pad - t_kv), (0, 0))
        k = jnp.pad(k, kv_pad)
        v = jnp.pad(v, kv_pad)
    n_kv = tkv_pad // block_k

    out = pl.pallas_call(
        partial(_kernel, block_k=block_k, t_valid=t_kv, scale=scale, n_kv=n_kv),
        grid=(h, t_pad // block_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda hh, qi, ki: (hh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda hh, qi, ki: (hh, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda hh, qi, ki: (hh, ki, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda hh, qi, ki: (hh, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, t_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # running max
            pltpu.VMEM((block_q, 128), jnp.float32),   # running sum
            pltpu.VMEM((block_q, d), jnp.float32),     # unnormalized output
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :t]


def attention_reference(q, k, v, scale: float | None = None) -> jax.Array:
    """XLA reference (materializes the score matrix) for parity tests."""
    h, t, d = q.shape
    scale = (1.0 / np.sqrt(d)) if scale is None else scale
    s = jnp.einsum("htd,hsd->hts", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("hts,hsd->htd", p.astype(v.dtype), v)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_trainable(q, k, v, scale: float | None = None):
    """Flash forward with gradients: Pallas kernel forward, XLA backward.

    The backward pass recomputes attention probabilities with the XLA
    formulation (O(T²) memory in the bwd only) — exact gradients with the
    fast forward.  Right trade for spotting training at 1 fps condensed
    timelines (T≈5.4k per match → 117 MB bwd scores); full-rate T=135k
    training would need a tiled backward kernel (future round).
    """
    return flash_attention(q, k, v, scale)


def _fat_fwd(q, k, v, scale):
    return flash_attention(q, k, v, scale), (q, k, v)


def _fat_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: attention_reference(q_, k_, v_, scale), q, k, v)
    return vjp(g)


flash_attention_trainable.defvjp(_fat_fwd, _fat_bwd)
