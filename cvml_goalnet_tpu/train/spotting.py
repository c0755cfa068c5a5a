"""Training the temporal spotting head (BASELINE.json config 3/5).

SoccerNet-style supervision: per-frame binary event labels over a timeline.
The step jits loss + grad + Adam for the GRU scorer over precomputed frame
features; class imbalance (rare events on a 90-min timeline) is handled with
a positive-class weight.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.train.optim import adam_init, adam_update


def weighted_bce(logits: jax.Array, labels: jax.Array,
                 pos_weight: float) -> jax.Array:
    """Weighted binary cross-entropy on logits, the ONE loss every spotting
    train step shares (single-timeline, CP, DP×CP, 3-D, and PP — a drifted
    copy of this body is how the PP step once trained on pad rows).

    Labels < 0 mark padding (the variable-length batching contract) and get
    zero weight; real labels get ``pos_weight`` on the positive class.  For
    unpadded labels the mask is identically 1, so the two cases share one
    formula.
    """
    w = jnp.where(labels > 0.5, pos_weight, 1.0) * (labels >= 0)
    lab = jnp.maximum(labels, 0.0)  # keep padded rows finite; w is 0 there
    per = (jnp.maximum(logits, 0) - logits * lab
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return jnp.sum(w * per) / jnp.sum(w)


def timeline_lengths(labels: jax.Array) -> jax.Array:
    """True length of each timeline in a (B, T[, C]) label batch padded with
    −1 at the tail: attention must not treat pad rows as keys, so batched CP
    steps pass this to the apply's ``lengths``."""
    valid = labels >= 0
    if valid.ndim == 3:
        valid = jnp.any(valid, axis=-1)
    return jnp.sum(valid.astype(jnp.int32), axis=1)


@lru_cache(maxsize=8)
def make_spotting_train_step(
    hidden: int,
    lr: float = 1e-3,
    pos_weight: float = 10.0,
    remat: bool = False,
    scorer: str = "gru",
    num_heads: int = 1,
    use_flash: bool = False,
    flash_interpret: bool = False,
    window: int = 0,
    lr_schedule: "tuple | None" = None,
    grad_clip_norm: float = 0.0,
):
    """→ jitted ``step(params, opt_state, features (T,D), labels (T,)) →
    (params, opt_state, loss)`` with weighted BCE on event frames.

    ``scorer``: "gru" (bidirectional scan), "transformer"
    (``models/temporal_attention``), or "hybrid" (GRU-augmented banded
    transformer, ``models/temporal_hybrid`` — ``hidden`` is the GRU width
    there).  ``use_flash=True`` trains through the
    tiled Pallas flash kernels (O(T·d) memory forward AND backward — the
    full-rate T=135k path); ``window > 0`` restricts attention to the
    |i−j| ≤ window band (sliding-window kernel, O(T·W·d) compute);
    ``flash_interpret`` runs kernels in interpret mode (CPU tests).
    ``remat=True`` rematerializes the scorer in the backward pass
    (``jax.checkpoint``): activations are recomputed instead of stored,
    the standard TPU FLOPs-for-HBM trade.
    """
    import jax as _jax

    if scorer == "transformer":
        from cvml_goalnet_tpu.models.temporal_attention import temporal_transformer_apply

        def scorer_fn(params, features, _hidden):
            return temporal_transformer_apply(
                params, features, num_heads, use_flash, flash_interpret, window
            )
    elif scorer == "hybrid":
        from cvml_goalnet_tpu.models.temporal_hybrid import temporal_hybrid_apply

        def scorer_fn(params, features, hidden):
            return temporal_hybrid_apply(
                params, features, hidden, num_heads, use_flash,
                flash_interpret, window
            )
    else:
        from cvml_goalnet_tpu.models.temporal import temporal_scorer_apply as scorer_fn

    if remat:
        scorer_fn = _jax.checkpoint(scorer_fn, static_argnums=(2,))

    def loss_fn(params, features, labels):
        # heads emit (T,) for one output channel and (T, C) otherwise; align
        # to the labels' layout so a (T, 1)-labelled single-class run can
        # never silently broadcast to a (T, T) loss
        logits = scorer_fn(params, features, hidden).reshape(labels.shape)
        return weighted_bce(logits, labels, pos_weight)

    def step(params, opt_state, features, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, features, labels)
        from cvml_goalnet_tpu.train.optim import clip_by_global_norm

        params, opt_state = adam_update(
            clip_by_global_norm(grads, grad_clip_norm), opt_state, params,
            _lr_at(opt_state, lr, lr_schedule))
        return params, opt_state, loss

    return jax.jit(step)



def _lr_at(opt_state, lr, lr_schedule):
    """Effective LR for this step: fixed ``lr``, or ``schedule_lr(step, lr,
    *lr_schedule)`` when a (schedule, warmup, decay, min_ratio) tuple is set
    (hashable so the lru_cached factories stay cacheable)."""
    if lr_schedule is None:
        return lr
    from cvml_goalnet_tpu.train.optim import schedule_lr

    return schedule_lr(opt_state.step, lr, *lr_schedule)


def init_spotting_opt(params):
    return adam_init(params)


@lru_cache(maxsize=8)
def make_sharded_spotting_train_step(
    mesh,
    num_heads: int = 1,
    lr: float = 1e-3,
    pos_weight: float = 10.0,
    axis: str = "data",
    use_flash: bool = False,
    flash_interpret: bool = False,
    window: int = 0,
    lr_schedule: "tuple | None" = None,
    grad_clip_norm: float = 0.0,
):
    """Context-parallel transformer spotting train step.

    The timeline shards over the mesh ``axis`` and gradients flow through the
    ``ppermute`` ring (its transpose is the reverse ring), so each device only
    ever holds T/n of the sequence — the multi-chip path for timelines beyond
    one chip's HBM.  ``use_flash=True`` streams each ring hop through the
    tiled Pallas kernels in BOTH directions (the hop's custom VJP carries the
    lse cotangent), keeping per-device memory O(T_local·d) during training
    too.  Gradients equal the single-device step's ≤1e-4
    (tests/test_flash_attention.py::TestContextParallelTraining).
    """
    from cvml_goalnet_tpu.models.temporal_attention import (
        temporal_transformer_sharded_apply,
    )

    def loss_fn(params, features, labels):
        logits = temporal_transformer_sharded_apply(
            params, features, mesh, num_heads, axis,
            use_flash=use_flash, flash_interpret=flash_interpret, window=window,
        ).reshape(labels.shape)
        return weighted_bce(logits, labels, pos_weight)

    def step(params, opt_state, features, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, features, labels)
        from cvml_goalnet_tpu.train.optim import clip_by_global_norm

        params, opt_state = adam_update(
            clip_by_global_norm(grads, grad_clip_norm), opt_state, params,
            _lr_at(opt_state, lr, lr_schedule))
        return params, opt_state, loss

    return jax.jit(step)


@lru_cache(maxsize=8)
def make_dp_cp_spotting_train_step(
    mesh,
    num_heads: int = 1,
    lr: float = 1e-3,
    pos_weight: float = 10.0,
    data_axis: str = "data",
    ctx_axis: str = "ctx",
    use_flash: bool = False,
    flash_interpret: bool = False,
    window: int = 0,
    lr_schedule: "tuple | None" = None,
    grad_clip_norm: float = 0.0,
):
    """Composed data × context parallel spotting train step.

    Features are (B, T, D) — a batch of timelines with B sharded over
    ``data_axis`` and T over ``ctx_axis`` of one 2-D mesh (the production
    layout: many matches at once, each longer than one chip's HBM).  The
    forward runs one ``shard_map`` over both axes
    (``temporal_transformer_dp_cp_apply``); the backward ppermute ring
    transposes to the reverse ring over ``ctx_axis`` and the replicated
    params transpose to a psum over BOTH axes, so each device ends the step
    with the full global gradient — no explicit collective code here.
    Numerically equal to the monolithic batched step
    (tests/test_composed_parallel.py).

    Variable-length timelines batch by padding labels with ``-1``: negative
    labels get zero loss weight (and zero gradient), AND each timeline's pad
    rows are excluded from attention (``lengths`` derived from the labels —
    without that, pad rows of shorter group members act as valid attention
    keys and contaminate the real frames' logits), so a group of matches
    padded to the longest timeline trains exactly like the per-timeline
    steps up to the shared weighted-mean normalizer.
    """
    from cvml_goalnet_tpu.models.temporal_attention import (
        temporal_transformer_dp_cp_apply,
    )

    def loss_fn(params, features, labels):
        logits = temporal_transformer_dp_cp_apply(
            params, features, mesh, num_heads, data_axis, ctx_axis,
            use_flash=use_flash, flash_interpret=flash_interpret, window=window,
            lengths=timeline_lengths(labels),
        ).reshape(labels.shape)
        return weighted_bce(logits, labels, pos_weight)

    def step(params, opt_state, features, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, features, labels)
        from cvml_goalnet_tpu.train.optim import clip_by_global_norm

        params, opt_state = adam_update(
            clip_by_global_norm(grads, grad_clip_norm), opt_state, params,
            _lr_at(opt_state, lr, lr_schedule))
        return params, opt_state, loss

    return jax.jit(step)


@lru_cache(maxsize=8)
def make_3d_spotting_train_step(
    mesh,
    num_heads: int = 1,
    lr: float = 1e-3,
    pos_weight: float = 10.0,
    data_axis: str = "data",
    model_axis: str = "model",
    ctx_axis: str = "ctx",
    use_flash: bool = False,
    flash_interpret: bool = False,
    window: int = 0,
    lr_schedule: "tuple | None" = None,
    grad_clip_norm: float = 0.0,
):
    """Full 3-D (DP × TP × CP) spotting train step: batch over ``data_axis``,
    time over ``ctx_axis``, heads over ``model_axis`` — one shard_map, with
    ring/halo hops on the ctx ring, Megatron's two all-reduces per layer on
    the model axis, and gradient psums over all three axes derived by the
    shard_map transpose.  Same −1-label padding contract as the DP×CP step.
    Numerically equal to the monolithic batched step
    (tests/test_composed_parallel.py::Test3DParallel).
    """
    from cvml_goalnet_tpu.models.temporal_attention import (
        temporal_transformer_3d_apply,
    )

    def loss_fn(params, features, labels):
        logits = temporal_transformer_3d_apply(
            params, features, mesh, num_heads, data_axis, model_axis, ctx_axis,
            use_flash=use_flash, flash_interpret=flash_interpret, window=window,
            lengths=timeline_lengths(labels),
        ).reshape(labels.shape)
        return weighted_bce(logits, labels, pos_weight)

    def step(params, opt_state, features, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, features, labels)
        from cvml_goalnet_tpu.train.optim import clip_by_global_norm

        params, opt_state = adam_update(
            clip_by_global_norm(grads, grad_clip_norm), opt_state, params,
            _lr_at(opt_state, lr, lr_schedule))
        return params, opt_state, loss

    return jax.jit(step)


def save_spotting_checkpoint(path: str, params, classes=None) -> None:
    """Atomic npz checkpoint of the temporal scorer params.

    ``classes`` (event-class names, in channel order) is embedded as
    metadata: a multi-class head's channels are positional, so loading a
    ``goal,card`` head as ``card,goal`` would silently swap every score —
    same shapes, same structure, wrong events.  Loaders verify the names.
    """
    import os

    import numpy as np

    from cvml_goalnet_tpu.train.checkpoint import _flatten_with_paths

    arrays, _ = _flatten_with_paths(params)
    if classes:
        arrays["__classes__"] = np.asarray(list(classes), dtype=np.str_)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def load_spotting_checkpoint(path: str, template, classes=None):
    """Restore temporal scorer params into ``template``'s structure.

    The file's key set must MATCH the template's: a head trained with
    learned positions has a ``pos`` table a rotary template lacks (and vice
    versa) — silently dropping or missing leaves would score with the wrong
    positional math, so any structural mismatch raises with the likely
    cause (``temporal_pos_encoding`` disagreement between spot-train and
    spot).

    ``classes`` — the caller's event-class names, in channel order.  When
    the checkpoint embeds its training-time names (``save_spotting_checkpoint
    (classes=)``), a name/ORDER mismatch raises: channels are positional,
    and ``card,goal`` against a ``goal,card`` head would silently swap every
    score.  Checkpoints without the metadata (pre-round-3, or single-class)
    load as before.
    """
    import numpy as np

    import jax

    data = np.load(path)
    stored_classes = (
        [str(c) for c in data["__classes__"]] if "__classes__" in data.files else None
    )
    if stored_classes is not None:
        want = list(classes) if classes else None
        if want != stored_classes:
            raise ValueError(
                f"spotting checkpoint {path!r} was trained with classes "
                f"{stored_classes} but is being loaded with "
                f"{want if want is not None else 'no --classes'} — channel "
                "order is positional, so the names must match exactly"
            )
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    keys = ["/".join(str(x) for x in p) for p, _ in flat]
    missing = [k for k in keys if k not in data]
    extra = [k for k in data.files if k not in keys and k != "__classes__"]
    if missing or extra:
        raise ValueError(
            f"spotting checkpoint {path!r} does not match the configured "
            f"scorer structure (missing: {missing or '—'}; not in template: "
            f"{extra or '—'}) — was the head trained with a different "
            "temporal_pos_encoding / temporal_model / --classes setting?"
        )
    leaves = []
    for (p, leaf), key in zip(flat, keys):
        stored = data[key]
        if stored.shape != np.shape(leaf):
            raise ValueError(
                f"spotting checkpoint {path!r}: shape mismatch for {key} "
                f"({stored.shape} vs {np.shape(leaf)})"
            )
        leaves.append(stored)
    return jax.tree_util.tree_unflatten(treedef, leaves)
