"""Explicit XLA collectives as a thin, testable comms module.

The TPU-native replacement for the NCCL/MPI layer the reference never had
(SURVEY.md §2.3 "Communication backend — ABSENT"): named-axis collective
wrappers usable inside ``shard_map``/``pmap`` bodies, mapped by XLA onto ICI
all-reduce/all-gather hardware paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psum(x, axis: str = "data"):
    return jax.lax.psum(x, axis_name=axis)


def pmean(x, axis: str = "data"):
    return jax.lax.pmean(x, axis_name=axis)


def all_gather(x, axis: str = "data", tiled: bool = False):
    return jax.lax.all_gather(x, axis_name=axis, tiled=tiled)


def reduce_scatter(x, axis: str = "data"):
    """Sum-reduce then scatter equal chunks along the leading dim."""
    return jax.lax.psum_scatter(x, axis_name=axis, tiled=True)


def ppermute_ring(x, axis: str = "data", shift: int = 1):
    """Rotate shards around the mesh ring (building block for manual pipelines)."""
    n = jax.lax.axis_size(axis)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name=axis, perm=perm)


def axis_index(axis: str = "data"):
    return jax.lax.axis_index(axis)


def barrier(axis: str = "data"):
    """Cheap full-mesh rendezvous: psum of a scalar one."""
    return jax.lax.psum(jnp.ones(()), axis_name=axis)
