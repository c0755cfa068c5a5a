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
):
    """One Adam step → (new_params, new_state)."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
    bc1 = 1 - b1**t
    bc2 = 1 - b2**t

    def leaf(p, m, v):
        m_hat = m / bc1
        v_hat = v / bc2
        return p - lr * m_hat / (jnp.sqrt(v_hat) + eps)

    new_params = jax.tree.map(leaf, params, mu, nu)
    return new_params, AdamState(step=step, mu=mu, nu=nu)


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
