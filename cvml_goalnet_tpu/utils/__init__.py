"""Cross-cutting utilities: logging, timing/profiling, platform selection."""

import os

from cvml_goalnet_tpu.utils.logging import Color, log_epoch_header, log_metrics, log_val_delta
from cvml_goalnet_tpu.utils.profiling import StageTimer, trace_annotation


def apply_platform_override() -> None:
    """Honor ``GOALNET_PLATFORM`` (e.g. ``cpu``) before any backend initializes.

    Some TPU images pin ``jax_platforms`` from sitecustomize, so the standard
    ``JAX_PLATFORMS`` env var alone can be ineffective; this re-pins the
    config explicitly.  Call early in entry points (CLI, bench).
    """
    platform = os.environ.get("GOALNET_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


__all__ = [
    "Color",
    "apply_platform_override",
    "log_epoch_header",
    "log_metrics",
    "log_val_delta",
    "StageTimer",
    "trace_annotation",
]
