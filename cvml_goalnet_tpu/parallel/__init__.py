"""SPMD parallelism: device mesh, sharding rules, explicit collectives.

The reference is single-process / single-device — SURVEY.md §2.3 marks DP /
TP / PP / SP / EP and any comms backend ABSENT.  This package is the
framework's first-class TPU answer: a ``jax.sharding.Mesh`` with
``("data", "model")`` axes, ``NamedSharding`` rules for batches and params
(GSPMD inserts the collectives), plus an explicit, independently-testable
collectives module (``psum``/``all_gather``/``ppermute`` under ``shard_map``)
riding ICI within a slice.
"""

from cvml_goalnet_tpu.parallel.mesh import build_mesh, cpu_mesh, mesh_axis_sizes
from cvml_goalnet_tpu.parallel.sharding import (
    batch_sharding,
    fusion_param_shardings,
    replicated,
    shard_batch,
)
from cvml_goalnet_tpu.parallel.collectives import (
    all_gather,
    pmean,
    ppermute_ring,
    psum,
    reduce_scatter,
)
from cvml_goalnet_tpu.parallel.dp import make_dp_train_step
from cvml_goalnet_tpu.parallel.ep import moe_apply_expert_parallel
from cvml_goalnet_tpu.parallel.pp import (
    make_pp_spotting_train_step,
    pipeline_transformer_apply,
)

__all__ = [
    "build_mesh",
    "cpu_mesh",
    "mesh_axis_sizes",
    "batch_sharding",
    "fusion_param_shardings",
    "replicated",
    "shard_batch",
    "all_gather",
    "pmean",
    "ppermute_ring",
    "psum",
    "reduce_scatter",
    "make_dp_train_step",
    "moe_apply_expert_parallel",
    "make_pp_spotting_train_step",
    "pipeline_transformer_apply",
]
