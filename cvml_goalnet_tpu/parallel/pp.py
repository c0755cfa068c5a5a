"""Pipeline parallelism (GPipe schedule) for the temporal transformer scorer.

SURVEY.md §2.3 marks pipeline parallelism ABSENT in the reference (single
device, 1,195 LoC PyTorch — nothing to pipeline) and the round-1/2 design
docs deferred it because the AVM is tiny.  The temporal spotting transformer
is the model family where PP genuinely applies: its blocks are identical
``(T, D) → (T, D)`` functions, exactly the shape real pipelined LLMs have, so
the framework provides it as a first-class, tested strategy rather than a
doc footnote.

TPU-first design (not a torch-style stage-process port):

* **Stages are consecutive transformer layers** sharded one-stage-per-device
  over a mesh axis; per-stage layer params are STACKED pytrees (leading axis
  = stage) so one ``shard_map`` in_spec ``P(axis)`` places them.
* **The schedule is a single ``lax.scan`` over ticks** with one
  ``lax.ppermute`` shift per tick — activations hop stage→stage over ICI.
  ``M`` microbatches drain through ``S`` stages in ``M + S − 1`` ticks
  (bubble fraction ``(S−1)/(M+S−1)``, the textbook GPipe bubble).
* **The backward schedule is derived, not written:** ``jax.grad`` of the
  scanned forward transposes ``ppermute`` into the reverse hop and replays
  ticks in reverse — the reverse pipeline comes from the AD transpose of the
  forward program, which is the whole point of building on functional
  transforms.
* Embedding (``proj_in`` + positions) and the scoring head run replicated
  outside the pipeline body: at ``D_in→D`` / ``D→C`` they are a negligible
  fraction of block FLOPs here.  A production LLM would fold them into the
  first/last stages; documented divergence.

Exactness: outputs and gradients equal the monolithic
``temporal_transformer_apply`` (tests/test_pipeline_parallel.py) — GPipe is
math-identical to sequential execution, only the schedule changes.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.models import layers as L


def stack_pipeline_stages(layer_list, n_stages: int):
    """Group ``n_layers`` block-param dicts into ``n_stages`` stacked stages.

    Returns a pytree whose leaves carry a leading ``(n_stages, layers_per
    _stage)`` axis pair — ``P(axis)`` on the first axis places one stage per
    device; ``lax.scan`` over the second runs that stage's blocks in order.
    Stacking is a traced op, so gradients transpose back to the per-layer
    structure automatically.
    """
    n_layers = len(layer_list)
    if n_layers % n_stages:
        raise ValueError(
            f"{n_layers} transformer layers not divisible into {n_stages} "
            "pipeline stages — num_layers must be a multiple of the pipe axis"
        )
    per = n_layers // n_stages
    stages = [
        jax.tree.map(lambda *xs: jnp.stack(xs), *layer_list[s * per : (s + 1) * per])
        for s in range(n_stages)
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stages)


def _block_apply(lp, x, num_heads, use_flash, flash_interpret, window, rope_pos):
    """One pre-LN transformer block on a (T, D) timeline (monolithic math —
    models/temporal_attention.temporal_transformer_apply's loop body)."""
    from cvml_goalnet_tpu.models.temporal_attention import _attend

    h = L.layernorm_apply(lp["ln1"], x)
    x = x + _attend(lp, h, num_heads, use_flash, flash_interpret, window, rope_pos)
    h = L.layernorm_apply(lp["ln2"], x)
    return x + L.linear_apply(lp["mlp_out"], jax.nn.gelu(L.linear_apply(lp["mlp_in"], h)))


@lru_cache(maxsize=16)
def _pp_fn(mesh, axis: str, n_micro: int, num_heads: int, use_flash: bool,
           flash_interpret: bool, window: int, rotary: bool, n_out: int,
           data_axis: str | None = None):
    """Build + cache the jitted GPipe program for one (mesh, schedule) shape.

    ``data_axis`` composes DP with the pipeline (DP×PP): each microbatch's
    within-batch dim shards over ``data_axis`` of the same mesh, so every
    data-parallel replica runs its own pipeline over the ``axis`` ring with
    1/n_data of the batch.  Nothing crosses ``data_axis`` in the forward
    (stage hops and the result psum ride ``axis`` only); stage params are
    replicated across it, so their gradient psum over ``data_axis`` comes
    from the shard_map transpose.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n_stages = mesh.shape[axis]
    fwd_ring = [(i, i + 1) for i in range(n_stages - 1)]

    def body(stages, xs, positions):
        # stages: leaves (1, per_stage, ...) — this device's stage
        layers = jax.tree.map(lambda a: a[0], stages)
        me = jax.lax.axis_index(axis)
        rope_pos = positions if rotary else None

        def stage_fn(x):  # (mb, T, D) → (mb, T, D): this stage's blocks
            def one_block(h, lp):
                h = jax.vmap(lambda hi: _block_apply(
                    lp, hi, num_heads, use_flash, flash_interpret, window,
                    rope_pos))(h)
                return h, None

            return jax.lax.scan(one_block, x, layers)[0]

        def tick(act, t):
            # shift every stage's last output one hop down the pipe; stage 0
            # (which receives ppermute's zero fill) reads the next microbatch
            recv = jax.lax.ppermute(act, axis, fwd_ring) if n_stages > 1 else act
            fresh = jax.lax.dynamic_index_in_dim(
                xs, jnp.minimum(t, n_micro - 1), 0, keepdims=False)
            y = stage_fn(jnp.where(me == 0, fresh, recv))
            return y, y

        _, ys = jax.lax.scan(tick, jnp.zeros_like(xs[0]),
                             jnp.arange(n_micro + n_stages - 1))
        # microbatch m leaves the last stage at tick m + S − 1; every other
        # stage's slot there is mid-pipeline garbage → mask + psum to
        # replicate the result (its AD transpose routes cotangents only into
        # the last stage's valid outputs, so gradients stay exact)
        valid = jnp.where(me == n_stages - 1, ys[n_stages - 1 :], 0)
        return jax.lax.psum(valid, axis)

    # xs: (n_micro, mb, T, D) — with DP×PP the within-microbatch dim shards
    # over data_axis; outputs carry the same batch sharding
    xs_spec = P(None, data_axis) if data_axis else P()
    in_specs = (P(axis), xs_spec, P())
    fn = shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=xs_spec,
                   check_rep=False)

    def full(params, feats):  # feats: (B, T, D_in)
        b, t, _ = feats.shape
        mb = b // n_micro
        x = jax.vmap(lambda f: L.linear_apply(params["proj_in"], f))(feats)
        positions = jnp.arange(t)
        if not rotary:  # learned absolute table, tiled mod max_len
            x = x + params["pos"][positions % params["pos"].shape[0]]
        stacked = stack_pipeline_stages(params["layers"], n_stages)
        xs = x.reshape(n_micro, mb, t, x.shape[-1])
        ys = fn(stacked, xs, positions)
        y = ys.reshape(b, t, ys.shape[-1])
        out = jax.vmap(lambda h: L.linear_apply(params["head"], h))(y)
        return out[..., 0] if n_out == 1 else out

    return jax.jit(full)


def pipeline_transformer_apply(
    params,
    features: jax.Array,          # (B, T, D_in) batch of timelines
    mesh,
    axis: str = "model",
    num_heads: int = 1,
    n_micro: int = 0,             # microbatches; 0 → one per stage
    use_flash: bool = False,
    flash_interpret: bool = False,
    window: int = 0,
    data_axis: str | None = None,
) -> jax.Array:
    """GPipe-scheduled scoring of a BATCH of timelines → (B, T) (or (B, T, C)).

    Layers shard one-stage-per-device over ``axis``; the batch splits into
    ``n_micro`` microbatches that drain through the stage ring (see module
    docstring).  ``data_axis`` composes DP×PP: each microbatch additionally
    shards its within-batch dim over that mesh axis, so n_data pipeline
    replicas each drain 1/n_data of every microbatch.  Numerically equal to
    ``vmap(temporal_transformer_apply)`` with the same params, and
    differentiable — ``jax.grad`` derives the reverse pipeline schedule from
    the forward's AD transpose.
    """
    b = features.shape[0]
    n_stages = mesh.shape[axis]
    m = n_micro or min(b, n_stages)
    if b % m:
        raise ValueError(f"batch {b} not divisible into {m} microbatches")
    if data_axis is not None and (b // m) % mesh.shape[data_axis]:
        raise ValueError(
            f"microbatch size {b // m} must divide over data axis "
            f"{data_axis!r} ({mesh.shape[data_axis]} devices)"
        )
    rotary = "pos" not in params
    n_out = int(params["head"]["w"].shape[-1])
    fn = _pp_fn(mesh, axis, m, num_heads, use_flash, flash_interpret,
                window, rotary, n_out, data_axis)
    return fn(params, features)


@lru_cache(maxsize=8)
def make_pp_spotting_train_step(
    mesh,
    axis: str = "model",
    num_heads: int = 1,
    lr: float = 1e-3,
    pos_weight: float = 10.0,
    n_micro: int = 0,
    use_flash: bool = False,
    flash_interpret: bool = False,
    window: int = 0,
    data_axis: str | None = None,
    lr_schedule: "tuple | None" = None,
    grad_clip_norm: float = 0.0,
):
    """Pipeline-parallel spotting train step over (B, T, D) feature batches.

    → jitted ``step(params, opt_state, features (B,T,D), labels (B,T[,C]))
    → (params, opt_state, loss)`` — same weighted-BCE objective as
    ``train/spotting.make_spotting_train_step``, with the scorer forward AND
    backward running on the GPipe schedule.  ``data_axis`` composes DP×PP
    (n_data pipeline replicas, grads psum'd across them by the shard_map
    transpose).  Loss/gradients equal the monolithic step's (tests), the
    schedule is the only difference.

    Labels < 0 carry zero loss weight (the −1 padding contract shared by
    every spotting step via ``weighted_bce``).  Note: unlike the DP×CP/3-D
    steps, PP batches do NOT mask pad rows out of attention — feed it
    equal-length timelines (the CLI only routes padded variable-length
    groups to the CP-family steps).
    """
    from cvml_goalnet_tpu.train.optim import adam_update
    from cvml_goalnet_tpu.train.spotting import _lr_at, weighted_bce

    def loss_fn(params, features, labels):
        logits = pipeline_transformer_apply(
            params, features, mesh, axis, num_heads, n_micro,
            use_flash, flash_interpret, window, data_axis,
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
