"""First-class optimizers as pure pytree transforms (optax-style API).

The reference used ``torch.optim.Adam`` (``main.py:70``); here the framework
owns its optimizers — ``init``/``update`` pure functions over parameter
pytrees, jit/scan/shard_map-composable, with PyTorch-matching Adam semantics
(bias-corrected first/second moments, eps outside the sqrt of v̂).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    step: jax.Array
    mu: dict
    nu: dict


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(step=jnp.zeros((), jnp.int32), mu=zeros, nu=jax.tree.map(jnp.zeros_like, params))


def adam_update(
    grads,
    state: AdamState,
    params,
    lr: float = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
):
    """One Adam step → (new_params, new_state).

    ``weight_decay > 0`` applies DECOUPLED decay (AdamW, Loshchilov &
    Hutter): ``p -= lr·wd·p`` alongside the Adam step, NOT added to the
    gradient — so the decay is not rescaled by 1/√v̂.  0 (default) is plain
    Adam, the reference's optimizer (``main.py:70``)."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
    bc1 = 1 - b1**t
    bc2 = 1 - b2**t

    def leaf(p, m, v):
        m_hat = m / bc1
        v_hat = v / bc2
        new_p = p - lr * m_hat / (jnp.sqrt(v_hat) + eps)
        if weight_decay:
            new_p = new_p - lr * weight_decay * p
        return new_p

    new_params = jax.tree.map(leaf, params, mu, nu)
    return new_params, AdamState(step=step, mu=mu, nu=nu)


def global_norm(tree) -> jax.Array:
    """ℓ2 norm over EVERY leaf of a gradient pytree (f32 accumulation)."""
    sq = [jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(tree)]
    return jnp.sqrt(jnp.sum(jnp.stack(sq)))


def clip_by_global_norm(grads, max_norm: float):
    """Scale ``grads`` so their global ℓ2 norm is ≤ ``max_norm``.

    The standard spike guard production training uses (absent upstream —
    the reference steps on raw grads).  ``max_norm <= 0`` disables.  The
    scale is ``min(1, max_norm/(norm+tiny))`` — traced-safe, no data-
    dependent control flow, exactly-1 when already within bounds is not
    required (the 1e-6 regularizer keeps 0-grad trees finite)."""
    if max_norm <= 0:
        return grads
    norm = global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: g * scale.astype(g.dtype), grads)


def schedule_lr(
    step,
    base_lr: float,
    schedule: str = "constant",
    warmup_steps: int = 0,
    decay_steps: int = 0,
    min_ratio: float = 0.0,
):
    """Learning rate at optimizer ``step`` (0-indexed; traced-safe).

    Production LR schedules the reference lacked (it runs fixed Adam lr=1e-3
    for all 150 epochs, ``main.py:49,70``).  ``schedule``:

    * ``"constant"`` — ``base_lr`` (after warmup).
    * ``"cosine"`` — cosine decay from ``base_lr`` to ``min_ratio·base_lr``
      over ``decay_steps`` optimizer steps (after warmup).
    * ``"linear"`` — linear decay over the same span.

    ``warmup_steps > 0`` ramps linearly from ``base_lr/warmup_steps`` (never
    an exact-zero first step) to ``base_lr``.  ``decay_steps == 0`` means no
    decay.  The schedule name/knobs are Python-static; only ``step`` math is
    traced, so the function composes with jit/scan/shard_map.
    """
    if schedule not in ("constant", "cosine", "linear"):
        raise ValueError(
            f"unknown lr schedule {schedule!r} (constant | cosine | linear)")
    step = jnp.asarray(step, jnp.float32)
    lr = jnp.asarray(base_lr, jnp.float32)
    if schedule != "constant" and decay_steps > 0:
        floor = min_ratio * base_lr
        t = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
        if schedule == "cosine":
            frac = 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        else:
            frac = 1.0 - t
        lr = floor + (base_lr - floor) * frac
    if warmup_steps > 0:
        ramp = jnp.minimum((step + 1.0) / warmup_steps, 1.0)
        lr = lr * ramp
    return lr


def schedule_from_config(tc):
    """``TrainConfig`` → callable ``step -> lr`` (validates the name now)."""
    schedule_lr(0, tc.learning_rate, tc.lr_schedule, tc.lr_warmup_steps,
                tc.lr_decay_steps, tc.lr_min_ratio)  # fail at build time
    def fn(step):
        return schedule_lr(step, tc.learning_rate, tc.lr_schedule,
                           tc.lr_warmup_steps, tc.lr_decay_steps,
                           tc.lr_min_ratio)
    return fn


class SgdState(NamedTuple):
    momentum: dict


def sgd_init(params) -> SgdState:
    return SgdState(momentum=jax.tree.map(jnp.zeros_like, params))


def sgd_update(grads, state: SgdState, params, lr: float = 1e-2, momentum: float = 0.9):
    mom = jax.tree.map(lambda m, g: momentum * m + g, state.momentum, grads)
    new_params = jax.tree.map(lambda p, m: p - lr * m, params, mom)
    return new_params, SgdState(momentum=mom)
