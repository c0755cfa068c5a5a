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

    def loss_fn(params, model_state, visual, audio, labels, rng):
        preds, new_ms = avm_apply(
            params, model_state, visual, audio, None, cfg=mc, train=True, rng=rng
        )
        d = preds[:, 0] - labels
        return jnp.mean(d * d), new_ms

    def step(params, model_state, opt_state, visual, audio, labels, rng):
        (loss, new_ms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, model_state, visual, audio, labels, rng
        )
        new_params, new_opt = adam_update(
            grads, opt_state, params, tc.learning_rate, tc.b1, tc.b2, tc.eps
        )
        return new_params, new_ms, new_opt, loss

    rep = replicated(mesh)
    pspec = fusion_param_shardings if tensor_parallel else (lambda p, m: jax.tree.map(lambda _: rep, p))
    cache: dict[bool, object] = {}

    def jitted(params, model_state, opt_state, visual, audio, labels, rng):
        has_audio = audio is not None
        if has_audio not in cache:
            param_sh = pspec(params, mesh)
            state_sh = jax.tree.map(lambda _: rep, (model_state, opt_state))
            in_sh = (
                param_sh,
                state_sh[0],
                state_sh[1],
                batch_sharding(mesh, 4),
                batch_sharding(mesh, 3) if has_audio else None,
                batch_sharding(mesh, 1),
                rep,
            )
            out_sh = (param_sh, state_sh[0], state_sh[1], rep)
            cache[has_audio] = jax.jit(step, in_shardings=in_sh, out_shardings=out_sh)
        return cache[has_audio](params, model_state, opt_state, visual, audio, labels, rng)

    return jitted
