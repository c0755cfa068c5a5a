"""Mixture-of-experts fusion layer (gated linear experts, top-k routing).

SURVEY.md §2.3 marks expert parallelism ABSENT in the reference (no MoE in
its 1,195 lines); this module is the framework's first-class MoE so EP is a
real, tested strategy.  The fusion MLP's first hidden layer
(reference ``utils.py:242-258``: the 640→512 linear) is the natural
attachment point — ``ModelConfig.fusion_moe_experts > 0`` swaps it for a
mixture of ``E`` linear experts with a learned softmax gate.

TPU-first design decisions:

* **Dense dispatch** — every expert computes every token via one
  ``einsum("nd,edh->enh")`` batched GEMM, and the top-k gate zeroes the
  non-routed combine weights.  No sort/scatter, no ragged shapes, no
  capacity dropping: at this expert count the batched GEMM keeps the MXU
  busier than any gather-based dispatch and the program stays fully static
  for XLA.  (Capacity-factor token dropping is a large-E throughput
  optimization, not a semantics requirement — documented divergence from
  Switch-style routers.)
* **Top-k renormalized softmax** gate (k=1 ⇒ Switch routing, k=E ⇒ soft
  mixture).  With identical experts the layer is EXACTLY the dense linear it
  replaces (gates sum to 1) — the parity anchor the tests pin.
* **Load-balance auxiliary loss** (Switch Transformers eq. 4 shape:
  E · Σ_e fraction_e · mean-prob_e) exposed for the training loop.

Expert parallelism (experts sharded over a mesh axis, token activations
``psum``-combined) lives in ``parallel/ep.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.models import layers as L


def moe_init(key, in_dim: int, out_dim: int, n_experts: int):
    """Gate (in_dim→E) + E linear experts (in_dim→out_dim), stacked."""
    kg, ke = jax.random.split(key)
    ekeys = jax.random.split(ke, n_experts)
    experts = [L.linear_init(k, in_dim, out_dim) for k in ekeys]
    return {
        "gate": L.linear_init(kg, in_dim, n_experts),
        "experts": jax.tree.map(lambda *xs: jnp.stack(xs), *experts),
    }


def moe_gate_probs(params, x: jax.Array, top_k: int) -> jax.Array:
    """(N, in) → (N, E) combine weights: softmax renormalized over the top-k
    gate logits per token (zero elsewhere).  Differentiable w.r.t. the kept
    logits; straight-through tricks are unnecessary for softmax-combine MoE.
    """
    logits = L.linear_apply(params["gate"], x)                    # (N, E)
    n_experts = logits.shape[-1]
    if top_k < n_experts:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]           # (N, 1)
        logits = jnp.where(logits >= kth, logits, -jnp.inf)
    return jax.nn.softmax(logits, axis=-1)


def moe_apply(params, x: jax.Array, top_k: int = 2,
              probs: jax.Array | None = None) -> jax.Array:
    """(N, in_dim) → (N, out_dim): gated sum of expert outputs.

    Pass precomputed ``probs`` (from :func:`moe_gate_probs`) to reuse them —
    the training loop computes them once for both the combine and the
    load-balance auxiliary loss.
    """
    if probs is None:
        probs = moe_gate_probs(params, x, top_k)                  # (N, E)
    ew, eb = params["experts"]["w"], params["experts"]["b"]       # (E,in,out),(E,out)
    y = jnp.einsum("nd,edo->eno", x, ew) + eb[:, None, :]         # (E, N, out)
    return jnp.einsum("eno,ne->no", y, probs)


def moe_load_balance_loss(probs: jax.Array) -> jax.Array:
    """Switch-style balance penalty: E · Σ_e (token fraction_e · mean p_e).

    ``frac_e`` is the fraction of tokens whose top-1 expert is ``e`` (hard
    dispatch count — carries no gradient; the mean-probability factor
    carries it, the standard Switch formulation).  Minimized (→1) when
    routing is balanced; fully collapsed routing scores E.  Add
    ``aux_weight * loss`` to the task objective to keep experts utilized.
    ``probs`` are the (N, E) combine weights from :func:`moe_gate_probs`.
    """
    n_experts = probs.shape[-1]
    top1 = jax.nn.one_hot(jnp.argmax(probs, axis=-1), n_experts, dtype=probs.dtype)
    frac = jnp.mean(top1, axis=0)                                 # dispatch share
    mean_p = jnp.mean(probs, axis=0)
    return n_experts * jnp.sum(frac * mean_p)
