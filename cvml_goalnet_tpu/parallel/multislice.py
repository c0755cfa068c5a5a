"""Multi-slice mesh construction: ICI within a slice, DCN across slices.

Single-slice meshes (``mesh.py``) order devices along the physical torus so
collectives ride ICI.  When a job spans multiple TPU slices (e.g. 2× v5e-8),
cross-slice traffic goes over DCN — orders of magnitude lower bandwidth — so
the mesh must place the OUTER (infrequent, small) axis across slices and keep
the inner (gradient all-reduce / TP) axes inside a slice.  This module builds
that hybrid mesh with ``jax.experimental.mesh_utils``.

This dev environment has a single chip, so the function is exercised only via
its logical layout (tests construct degenerate single-slice cases); the axis
convention is: ``("slice", "data", "model")`` with "slice" mapped over DCN.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def build_multislice_mesh(
    data: int = -1,
    model: int = 1,
    devices=None,
    n_slices: int | None = None,
) -> Mesh:
    """Mesh with axes ("slice", "data", "model").

    Uses ``create_hybrid_device_mesh`` when the runtime reports multiple
    slices; otherwise a single-slice mesh with a size-1 "slice" axis so
    training code can shard over ("slice", "data") uniformly either way.

    ``n_slices`` overrides slice detection with a SYNTHETIC contiguous
    partition of the device list — how single-host tests (8 virtual CPU
    devices) exercise the non-degenerate hybrid layout without real DCN.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if n_slices is None:
        slice_ids = {getattr(d, "slice_index", 0) for d in devices}
        n_slices = max(len(slice_ids), 1)
        synthetic = False
    else:
        if n_slices < 1 or len(devices) % n_slices != 0:
            raise ValueError(f"n_slices {n_slices} must divide {len(devices)} devices")
        synthetic = True
    per_slice = len(devices) // n_slices
    if model <= 0 or per_slice % model != 0:
        raise ValueError(f"model axis {model} must divide per-slice size {per_slice}")
    data = per_slice // model if data <= 0 else data
    if data * model != per_slice:
        raise ValueError(f"slice mesh {data}x{model} != {per_slice} devices/slice")

    if n_slices > 1 and not synthetic:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (data, model),
            (n_slices, 1),
            devices=devices,
        )
        # hybrid mesh returns (n_slices*data, model); regroup the slice axis
        arr = arr.reshape(n_slices, data, model)
    else:
        # synthetic slices: contiguous groups, slice-major (the layout the
        # hybrid mesh produces on real hardware)
        arr = np.asarray(devices).reshape(n_slices, data, model)
    return Mesh(arr, ("slice", "data", "model"))


def grad_reduce_axes(mesh: Mesh) -> tuple[str, ...]:
    """Axes a DP gradient all-reduce must span (ICI first, then DCN)."""
    return tuple(a for a in ("data", "slice") if mesh.shape.get(a, 1) > 1) or ("data",)
