"""Multi-host (multi-process) runtime: pod-scale initialization + data feeding.

One JAX process drives the chips attached to one host; a v5e pod slice spans
many hosts.  This module is the process-level runtime around the SPMD code:

* :func:`initialize_from_env` — bring up the JAX distributed system
  (coordination service + cross-host collectives) from ``GOALNET_*`` env or
  TPU-pod auto-detection;
* :func:`global_data_mesh` — one mesh over ALL processes' devices;
* :func:`shard_host_batch` — each host loads only ITS slice of the global
  batch; the host-local arrays are assembled into one global ``jax.Array``
  without any cross-host data movement (each shard stays on the devices of
  the process that loaded it);
* :func:`replicated_to_host` — read a replicated result (e.g. the loss) on
  every host.

The SPMD programs themselves (``parallel/dp.py``, ring/halo attention, …)
are process-count-agnostic: a jit over a global mesh emits the same XLA
collectives whether the mesh spans one process or sixty-four — cross-host
hops ride DCN, intra-host ICI (see ``parallel/multislice.py`` for hybrid
axis layout).  Verified end to end by a REAL 2-process CPU cluster test
(``tests/test_multihost.py``): the same ``make_dp_train_step`` produces the
single-process loss exactly.

The reference is strictly single-process/single-GPU (SURVEY.md §2.3: no
``torch.distributed`` anywhere); this subsystem exists for the TPU-pod
deployment target.
"""

from __future__ import annotations

import os

import numpy as np
import jax


def initialize_from_env(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """``jax.distributed.initialize`` with explicit args, ``GOALNET_*`` env
    (COORDINATOR / NUM_PROCESSES / PROCESS_ID), or TPU-pod auto-detection.

    Call once per process, before any jax computation.  No-op when the
    distributed system is already up.
    """
    coordinator = coordinator or os.environ.get("GOALNET_COORDINATOR")
    num_processes = num_processes if num_processes is not None else (
        int(os.environ["GOALNET_NUM_PROCESSES"])
        if "GOALNET_NUM_PROCESSES" in os.environ else None)
    process_id = process_id if process_id is not None else (
        int(os.environ["GOALNET_PROCESS_ID"])
        if "GOALNET_PROCESS_ID" in os.environ else None)
    try:
        if coordinator is None and num_processes is None and process_id is None:
            # TPU pod: the runtime discovers peers from the platform metadata
            try:
                jax.distributed.initialize()
            except ValueError:
                # nothing configured AND the platform offers no peer
                # auto-detection (single CPU/GPU host): single-process mode
                # is the intent — running examples/multihost_train.py bare
                # must work exactly like its docstring says.  But on a
                # genuine pod a transient metadata failure must not let
                # every host silently train alone: fail loudly when the
                # environment carries cluster hints.
                # single-hostname TPU_WORKER_HOSTNAMES (e.g. "localhost",
                # injected by single-chip images) is NOT a pod hint — only
                # genuinely multi-worker signals count
                hints = [k for k in (
                    "MEGASCALE_COORDINATOR_ADDRESS", "MEGASCALE_NUM_SLICES",
                ) if os.environ.get(k)]
                if "," in os.environ.get("TPU_WORKER_HOSTNAMES", ""):
                    hints.append("TPU_WORKER_HOSTNAMES")
                if hints:
                    raise RuntimeError(
                        "jax.distributed.initialize() auto-detection failed "
                        f"but cluster env hints are present ({hints}) — "
                        "refusing to silently fall back to single-process "
                        "mode on what looks like a pod; set "
                        "GOALNET_COORDINATOR/GOALNET_NUM_PROCESSES/"
                        "GOALNET_PROCESS_ID explicitly")
                import warnings

                warnings.warn(
                    "no distributed config detected (no GOALNET_* env, no "
                    "platform peer auto-detection) — running single-process",
                    stacklevel=2)
                return
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id,
            )
    except RuntimeError as e:
        # already initialized → no-op (JAX's message is "distributed.initialize
        # should only be called once."; older versions said "already")
        msg = str(e).lower()
        if "once" not in msg and "already" not in msg:
            raise


def global_data_mesh(axis: str = "data") -> "jax.sharding.Mesh":
    """One 1-D mesh over every device of every process (order = jax.devices())."""
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def shard_host_batch(x_local: np.ndarray, mesh, axis: str = "data"):
    """Host-local batch slice → global ``jax.Array`` sharded over ``axis``.

    Every process passes ITS ``global_batch/num_processes`` rows (equal shape
    on all processes); the result is a global array of the full batch whose
    shards live where they were loaded — the standard multi-host input
    pipeline (no host ever materializes the whole batch).
    """
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    spec = P(axis, *([None] * (np.ndim(x_local) - 1)))
    return multihost_utils.host_local_array_to_global_array(
        np.asarray(x_local), mesh, spec)


def replicated_to_host(x) -> np.ndarray:
    """Value of a replicated global array (loss, metrics) on this host."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return np.asarray(x.addressable_data(0))
    return np.asarray(x)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()
