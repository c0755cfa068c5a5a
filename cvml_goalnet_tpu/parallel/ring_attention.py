"""Ring attention: context parallelism for timelines sharded across the mesh.

SURVEY.md §2.3 noted ring attention was inapplicable upstream because "no
attention exists to ring" — the temporal transformer
(``models/temporal_attention``) changes that.  For timelines too long for one
chip's HBM, the sequence axis shards across the mesh and attention runs as a
ring:

* each device keeps its local Q shard resident;
* K/V shards rotate around the ring via ``ppermute`` — after ``n`` steps
  every Q shard has attended to every K/V shard;
* partial results merge with the SAME online-softmax statistics flash
  attention uses (running max ``m``, normalizer ``l``, unnormalized ``acc``),
  so the result is numerically equal to monolithic attention.

Two entry points:

* :func:`ring_attention_local` — the per-shard body, for composing INSIDE an
  enclosing ``shard_map`` (how ``models/temporal_attention.
  temporal_transformer_sharded_apply`` runs whole transformer blocks
  context-parallel).  The rotation loop is a ``lax.scan`` and ``ppermute``
  has a transpose rule, so ``jax.grad`` flows through it — context-parallel
  TRAINING works (tested on the 8-device CPU mesh).
* :func:`ring_attention` — standalone wrapper: sequence-sharded q/k/v in,
  attention out.

On real multi-chip hardware the ``ppermute`` rides ICI and overlaps with the
block compute (XLA schedules the collective async).  Padding: when the global
timeline is padded to a multiple of the ring size, pass ``t_valid`` — padded
key columns (which live only on the LAST shard) are masked before the softmax
statistics, so sharded == monolithic exactly.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -0.7 * float(np.finfo(np.float32).max)


def ring_attention_local(
    q_l: jax.Array,               # (H, T_local, d) — this device's Q shard
    k_l: jax.Array,
    v_l: jax.Array,
    axis: str = "data",
    scale: float | None = None,
    t_valid: int | None = None,   # global true length (masks pad columns)
    use_flash: bool = False,
    flash_interpret: bool = False,
) -> jax.Array:
    """Per-shard ring attention body; call inside an enclosing ``shard_map``.

    ``use_flash=True`` runs each ring hop through the tiled Pallas flash
    kernels (``ops/pallas/flash_attention``) instead of an XLA block, so the
    per-device memory is O(T_local·d) rather than the XLA block's O(T_local²)
    score matrix — at production shard sizes (T_local = 135k/8 ≈ 17k, a
    1.1 GB f32 matrix per hop) this is what makes multi-chip full-rate
    timelines viable.  Hops merge via the numerically-stable log-sum-exp rule
    (exact), and the hop kernel is DIFFERENTIABLE (custom VJP carrying the
    lse cotangent, ``flash_attention_with_lse``), so context-parallel
    TRAINING streams too.
    """
    h, tl, d = q_l.shape
    scale = (1.0 / np.sqrt(d)) if scale is None else scale
    n = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    perm = [(j, (j + 1) % n) for j in range(n)]

    if use_flash:
        from cvml_goalnet_tpu.ops.pallas.flash_attention import flash_attention_with_lse

        assert abs(scale - 1.0 / np.sqrt(d)) < 1e-12, (
            "flash ring hops use the default 1/sqrt(d) scale; pass "
            "use_flash=False for custom scales"
        )

        def fstep(carry, i):
            k_cur, v_cur, out, lse = carry
            src = (me - i) % n
            # valid columns in THIS hop's shard: all, except the global tail
            # shard which carries the pad
            if t_valid is not None:
                valid = jnp.minimum(jnp.maximum(t_valid - src * tl, 0), tl)
            else:
                valid = jnp.int32(tl)
            out_i, lse_i = flash_attention_with_lse(
                q_l, k_cur, v_cur, valid.astype(jnp.float32), flash_interpret
            )
            # a fully-masked hop reports lse=0 (its l is 0); exclude it
            lse_i = jnp.where(valid > 0, lse_i, NEG_INF)
            # stable merge of two normalized partials via their log-sum-exps
            m = jnp.maximum(lse, lse_i)
            w, w_i = jnp.exp(lse - m), jnp.exp(lse_i - m)
            tot = w + w_i
            out = (out * w + out_i.astype(jnp.float32) * w_i) / tot
            lse = m + jnp.log(tot)
            k_next = jax.lax.ppermute(k_cur, axis_name=axis, perm=perm)
            v_next = jax.lax.ppermute(v_cur, axis_name=axis, perm=perm)
            return (k_next, v_next, out, lse), None

        init = (
            k_l, v_l,
            jnp.zeros((h, tl, d), jnp.float32),
            jnp.full((h, tl, 1), NEG_INF, jnp.float32),
        )
        (_, _, out, _), _ = jax.lax.scan(fstep, init, jnp.arange(n))
        return out.astype(q_l.dtype)

    def step(carry, i):
        k_cur, v_cur, m, l, acc = carry
        s = jnp.einsum("htd,hsd->hts", q_l, k_cur).astype(jnp.float32) * scale
        if t_valid is not None:
            # at ring step i this device holds the K/V shard of device
            # (me - i) mod n; mask its columns past the global true length
            src = (me - i) % n
            col = src * tl + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(col < t_valid, s, NEG_INF)
        m_i = jnp.max(s, axis=-1, keepdims=True)              # (H, Tl, 1)
        p = jnp.exp(s - m_i)
        l_i = jnp.sum(p, axis=-1, keepdims=True)
        acc_i = jnp.einsum("hts,hsd->htd", p.astype(v_cur.dtype), v_cur).astype(jnp.float32)
        # online-softmax merge of the new block into the running stats
        m_new = jnp.maximum(m, m_i)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_i - m_new)
        l = alpha * l + beta * l_i
        acc = acc * alpha + acc_i * beta
        # rotate K/V shards one hop around the ring
        k_next = jax.lax.ppermute(k_cur, axis_name=axis, perm=perm)
        v_next = jax.lax.ppermute(v_cur, axis_name=axis, perm=perm)
        return (k_next, v_next, m_new, l, acc), None

    init = (
        k_l, v_l,
        jnp.full((h, tl, 1), NEG_INF, jnp.float32),
        jnp.zeros((h, tl, 1), jnp.float32),
        jnp.zeros((h, tl, d), jnp.float32),
    )
    (_, _, _, l, acc), _ = jax.lax.scan(step, init, jnp.arange(n))
    return (acc / jnp.where(l == 0.0, 1.0, l)).astype(q_l.dtype)


@lru_cache(maxsize=16)
def _ring_attention_fn(mesh: Mesh, axis: str, scale, t_valid, use_flash: bool,
                       flash_interpret: bool):
    # cache the built program: a fresh lambda + shard_map + jit per CALL
    # would retrace and recompile every invocation (minutes per compile on
    # remote-compile tunnels) — round-3 review
    seq = P(None, axis, None)
    fn = shard_map(
        lambda ql, kl, vl: ring_attention_local(
            ql, kl, vl, axis, scale, t_valid, use_flash, flash_interpret),
        mesh=mesh, in_specs=(seq, seq, seq), out_specs=seq, check_rep=False,
    )
    return jax.jit(fn)


def ring_attention(
    q: jax.Array,                  # (H, T, d), T sharded over `axis`
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "data",
    scale: float | None = None,
    t_valid: int | None = None,
    use_flash: bool = False,
    flash_interpret: bool = False,
) -> jax.Array:
    """Sequence-sharded attention over the mesh → (H, T, d), exact."""
    return _ring_attention_fn(
        mesh, axis, scale, t_valid, use_flash, flash_interpret)(q, k, v)
