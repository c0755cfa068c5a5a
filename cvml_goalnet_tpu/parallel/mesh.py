"""Device-mesh construction for (data, model) SPMD axes."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

from cvml_goalnet_tpu.config import MeshConfig


def mesh_axis_sizes(cfg: MeshConfig, n_devices: int) -> tuple[int, int]:
    model = max(1, cfg.model)
    if n_devices % model != 0:
        raise ValueError(f"{n_devices} devices not divisible by model axis {model}")
    data = cfg.data if cfg.data > 0 else n_devices // model
    if data * model != n_devices:
        raise ValueError(f"mesh {data}x{model} != {n_devices} devices")
    return data, model


def build_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    """Mesh over all (or given) devices with axes ``cfg.axis_names``.

    On multi-chip TPU slices the default device order follows the physical
    torus, so adjacent mesh coordinates are ICI neighbors and the data-axis
    collectives ride ICI (not DCN).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    data, model = mesh_axis_sizes(cfg, len(devices))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, cfg.axis_names)


def cpu_mesh(n: int, model: int = 1) -> Mesh:
    """CPU-device mesh for tests (requires ``--xla_force_host_platform_device_count``)."""
    devices = jax.devices("cpu")[:n]
    if len(devices) < n:
        raise RuntimeError(f"need {n} CPU devices, have {len(devices)}")
    return build_mesh(MeshConfig(data=n // model, model=model), devices)
