"""Expert parallelism: MoE experts sharded over a mesh axis.

SURVEY.md §2.3 row "Expert parallelism" — ABSENT in the reference; real here
because ``models/moe.py`` gives the framework an MoE layer to shard.

TPU-first formulation: MoE output is a SUM over experts of
``probs[:, e] · expert_e(x)``, so partitioning the expert axis across devices
needs exactly one collective — each device computes its local experts'
contributions for all tokens (one batched GEMM over ``E/n`` experts) and a
single ``psum`` over the axis combines them.  Gate runs replicated (its
(in_dim → E) GEMM is negligible); activations ride ICI once per layer.
This is the dense-dispatch EP mirror of ``moe_apply`` — exact, not an
approximation (tests pin bitwise-level agreement), and differentiable:
``psum``'s transpose routes cotangents back to each device's local experts.

At large E/token counts, production routers add all-to-all token exchange +
capacity dropping; documented as the scale-up path, not needed for exact
semantics.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.models.moe import moe_gate_probs


@lru_cache(maxsize=16)
def _ep_fn(mesh, axis: str, top_k: int):
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def body(gate, experts_local, x):
        # experts_local leaves: (E/n, ...) — this device's expert slice
        e_local = experts_local["w"].shape[0]
        probs = moe_gate_probs({"gate": gate}, x, top_k)          # (N, E) replicated
        me = jax.lax.axis_index(axis)
        p_local = jax.lax.dynamic_slice_in_dim(probs, me * e_local, e_local, 1)
        ew, eb = experts_local["w"], experts_local["b"]
        y = jnp.einsum("nd,edo->eno", x, ew) + eb[:, None, :]     # (E/n, N, out)
        partial = jnp.einsum("eno,ne->no", y, p_local)
        return jax.lax.psum(partial, axis)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=P(),
        check_rep=False,
    )
    return jax.jit(fn)


def moe_apply_expert_parallel(
    params, x: jax.Array, mesh, axis: str = "model", top_k: int = 2
) -> jax.Array:
    """Expert-parallel ``moe_apply``: experts shard over ``axis``; one
    ``psum`` combines per-device partial outputs.  Exactly equal to the
    single-device layer (same einsum contractions, reassociated only across
    the expert axis)."""
    n_experts = params["experts"]["w"].shape[0]
    n_shards = mesh.shape[axis]
    if n_experts % n_shards:
        raise ValueError(
            f"{n_experts} experts not divisible over {n_shards}-way mesh "
            f"axis {axis!r}")
    return _ep_fn(mesh, axis, top_k)(params["gate"], params["experts"], x)
