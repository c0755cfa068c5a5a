"""Ring attention: context parallelism for timelines sharded across the mesh.

SURVEY.md §2.3 noted ring attention was inapplicable upstream because "no
attention exists to ring" — the temporal transformer
(``models/temporal_attention``) changes that.  For timelines too long for one
chip's HBM, the sequence axis shards across the mesh and attention runs as a
ring (guide: boom_attention_tricks §15–16):

* each device keeps its local Q shard resident;
* K/V shards rotate around the ring via ``ppermute`` — after ``n`` steps
  every Q shard has attended to every K/V shard;
* partial results merge with the SAME online-softmax statistics flash
  attention uses (running max ``m``, normalizer ``l``, unnormalized ``acc``),
  so the result is numerically equal to monolithic attention.

Inside each ring step the local block runs through XLA attention pieces; on
real multi-chip hardware the ``ppermute`` rides ICI and overlaps with the
block compute (XLA schedules the collective async).  Tested for exactness on
the 8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -0.7 * float(np.finfo(np.float32).max)


def _local_block(q, k, v, scale):
    """One Q-shard × K/V-shard block → (partial acc, m, l)."""
    s = jnp.einsum("htd,hsd->hts", q, k).astype(jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)                     # (H, Tl, 1)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("hts,hsd->htd", p.astype(v.dtype), v).astype(jnp.float32)
    return acc, m, l


def ring_attention(
    q: jax.Array,                  # (H, T, d), T sharded over `axis`
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "data",
    scale: float | None = None,
) -> jax.Array:
    """Sequence-sharded attention over the mesh → (H, T, d), exact."""
    h, t, d = q.shape
    scale = (1.0 / np.sqrt(d)) if scale is None else scale

    def body(q_l, k_l, v_l):
        n = jax.lax.axis_size(axis)

        def step(i, carry):
            k_cur, v_cur, m, l, acc = carry
            acc_i, m_i, l_i = _local_block(q_l, k_cur, v_cur, scale)
            # online-softmax merge of the new block into the running stats
            m_new = jnp.maximum(m, m_i)
            alpha = jnp.exp(m - m_new)
            beta = jnp.exp(m_i - m_new)
            l = alpha * l + beta * l_i
            acc = acc * alpha + acc_i * beta
            # rotate K/V shards one hop around the ring
            perm = [(j, (j + 1) % n) for j in range(n)]
            k_next = jax.lax.ppermute(k_cur, axis_name=axis, perm=perm)
            v_next = jax.lax.ppermute(v_cur, axis_name=axis, perm=perm)
            return k_next, v_next, m_new, l, acc

        tl = q_l.shape[1]
        init = (
            k_l, v_l,
            jnp.full((h, tl, 1), NEG_INF, jnp.float32),
            jnp.zeros((h, tl, 1), jnp.float32),
            jnp.zeros((h, tl, d), jnp.float32),
        )
        _, _, _, l, acc = jax.lax.fori_loop(0, n, step, init)
        return (acc / jnp.where(l == 0.0, 1.0, l)).astype(q_l.dtype)

    seq = P(None, axis, None)
    fn = shard_map(body, mesh=mesh, in_specs=(seq, seq, seq), out_specs=seq, check_rep=False)
    return jax.jit(fn)(q, k, v)
