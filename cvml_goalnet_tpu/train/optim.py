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


class SgdState(NamedTuple):
    momentum: dict


def sgd_init(params) -> SgdState:
    return SgdState(momentum=jax.tree.map(jnp.zeros_like, params))


def sgd_update(grads, state: SgdState, params, lr: float = 1e-2, momentum: float = 0.9):
    mom = jax.tree.map(lambda m, g: momentum * m + g, state.momentum, grads)
    new_params = jax.tree.map(lambda p, m: p - lr * m, params, mom)
    return new_params, SgdState(momentum=mom)
