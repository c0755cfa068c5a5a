"""Data-parallel (optionally tensor-parallel) training step over the mesh.

BASELINE.json config 5: clip/frame batches data-parallel across a v5e-8 mesh.
Semantics: one optimizer step per GLOBAL batch — each device computes the loss
on its batch shard, gradients are mean-reduced across ``"data"`` (GSPMD
inserts the all-reduce from the sharding annotations; the explicit shard_map
formulation in ``collectives.py`` is the manually-verifiable mirror), and the
replicated params take one Adam update.

This is the scaling path; the single-chip ``lax.scan`` sub-batch loop in
``train/loop.py`` keeps the reference's sequential-update semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from cvml_goalnet_tpu.config import PipelineConfig
from cvml_goalnet_tpu.models.avm import avm_apply
from cvml_goalnet_tpu.parallel.sharding import batch_sharding, fusion_param_shardings, replicated
from cvml_goalnet_tpu.train.optim import adam_update


def make_dp_train_step(cfg: PipelineConfig, mesh: Mesh, tensor_parallel: bool = False):
    """Build a jitted global-batch train step with mesh shardings.

    Returns ``step(params, model_state, opt_state, visual, audio, labels, rng)
    → (params, model_state, opt_state, loss)`` where batch tensors are sharded
    over ``"data"`` and params are replicated (or fusion-TP over ``"model"``).
    """
    tc, mc = cfg.train, cfg.model
    from cvml_goalnet_tpu.train.optim import clip_by_global_norm, schedule_from_config

    lr_fn = schedule_from_config(tc)

    def loss_fn(params, model_state, visual, audio, text, labels, rng):
        preds, new_ms = avm_apply(
            params, model_state, visual, audio, text, cfg=mc, train=True, rng=rng
        )
        d = preds[:, 0] - labels
        return jnp.mean(d * d), new_ms

    def step(params, model_state, opt_state, visual, audio, text, labels, rng):
        (loss, new_ms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, model_state, visual, audio, text, labels, rng
        )
        new_params, new_opt = adam_update(
            clip_by_global_norm(grads, tc.grad_clip_norm),
            opt_state, params, lr_fn(opt_state.step), tc.b1, tc.b2, tc.eps,
            tc.weight_decay,
        )
        return new_params, new_ms, new_opt, loss

    rep = replicated(mesh)
    pspec = fusion_param_shardings if tensor_parallel else (lambda p, m: jax.tree.map(lambda _: rep, p))
    cache: dict = {}

    def jitted(params, model_state, opt_state, visual, audio, labels, rng, text=None):
        if mc.text_included and text is None:
            # avm_apply would otherwise crash deep inside tracing on text=None
            raise ValueError(
                "cfg.model.text_included=True but the DP step got no text "
                "tokens — pool VideoItem.text into the global batch (what "
                "train_data_parallel does)"
            )
        key = (audio is not None, text is not None)
        if key not in cache:  # one compile per modality-arity
            param_sh = pspec(params, mesh)
            state_sh = jax.tree.map(lambda _: rep, (model_state, opt_state))
            in_sh = (
                param_sh,
                state_sh[0],
                state_sh[1],
                batch_sharding(mesh, 4),
                batch_sharding(mesh, 3) if audio is not None else None,
                batch_sharding(mesh, 2) if text is not None else None,
                batch_sharding(mesh, 1),
                rep,
            )
            out_sh = (param_sh, state_sh[0], state_sh[1], rep)
            cache[key] = jax.jit(step, in_shardings=in_sh, out_shardings=out_sh)
        return cache[key](params, model_state, opt_state, visual, audio, text, labels, rng)

    return jitted


def make_dp_train_step_shardmap(cfg: PipelineConfig, mesh: Mesh):
    """Explicit-collectives DP step: ``shard_map`` body + manual ``pmean``.

    The GSPMD path above lets the compiler insert the gradient all-reduce;
    this variant writes the comms out by hand (``collectives.pmean``) so the
    communication pattern is explicit and independently testable — the
    "testable comms layer" SURVEY.md §2.3 calls for.

    Semantics note: batchnorm batch statistics are per-device here (the
    standard non-sync-BN data-parallel convention), whereas the GSPMD path
    normalizes over the global batch — losses differ by the BN-stats
    locality; the gradient all-reduce is the same in both.  Dropout keys
    fold in the device index so each shard draws INDEPENDENT masks (a
    replicated key would drop the same unit pattern at the same local row
    on every device, correlating noise across the global batch).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from cvml_goalnet_tpu.parallel.collectives import pmean

    tc, mc = cfg.train, cfg.model
    from cvml_goalnet_tpu.train.optim import clip_by_global_norm, schedule_from_config

    lr_fn = schedule_from_config(tc)

    def body(params, model_state, opt_state, visual, audio, text, labels, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        def loss_fn(p):
            preds, new_ms = avm_apply(
                p, model_state, visual, audio, text, cfg=mc, train=True, rng=rng
            )
            d = preds[:, 0] - labels
            return jnp.mean(d * d), new_ms

        (loss, new_ms), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = jax.tree.map(lambda g: pmean(g, "data"), grads)
        loss = pmean(loss, "data")
        new_ms = jax.tree.map(lambda s: pmean(s, "data"), new_ms)
        new_params, new_opt = adam_update(
            clip_by_global_norm(grads, tc.grad_clip_norm),
            opt_state, params, lr_fn(opt_state.step), tc.b1, tc.b2, tc.eps,
            tc.weight_decay,
        )
        return new_params, new_ms, new_opt, loss

    rep = P()
    batch = P("data")
    cache: dict = {}  # (audio-arity, tree structures) → compiled program

    def step(params, model_state, opt_state, visual, audio, labels, rng, text=None):
        if mc.text_included and text is None:
            raise ValueError(
                "cfg.model.text_included=True but the DP step got no text "
                "tokens — pool VideoItem.text into the global batch (what "
                "train_data_parallel does)"
            )
        # build shard_map + jit ONCE per (modality-arity, pytree structure):
        # a fresh closure per call would make jit re-trace and re-compile
        # EVERY training step (the cache keys on function identity) —
        # minutes per step through a remote-compile tunnel (round-3 review)
        key = (
            audio is not None,
            text is not None,
            jax.tree_util.tree_structure((params, model_state, opt_state)),
        )
        if key not in cache:
            in_specs = (
                jax.tree.map(lambda _: rep, params),
                jax.tree.map(lambda _: rep, model_state),
                jax.tree.map(lambda _: rep, opt_state),
                batch,
                None if audio is None else batch,
                None if text is None else batch,
                batch,
                rep,
            )
            out_specs = (
                jax.tree.map(lambda _: rep, params),
                jax.tree.map(lambda _: rep, model_state),
                jax.tree.map(lambda _: rep, opt_state),
                rep,
            )
            fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_rep=False)
            cache[key] = jax.jit(fn)
        return cache[key](params, model_state, opt_state, visual, audio, text, labels, rng)

    return step
