"""Cross-cutting utilities: logging, timing/profiling, platform selection."""

import os

from cvml_goalnet_tpu.utils.logging import Color, log_epoch_header, log_metrics, log_val_delta
from cvml_goalnet_tpu.utils.profiling import StageTimer, trace_annotation


def tree_cast(tree, dtype):
    """Cast every FLOAT leaf of a pytree to ``dtype``; non-floats pass through.

    The one mixed-precision cast shared by the jitted fuse/stream/train
    programs (params and activations go bf16 on the hot path while integer
    leaves — token ids, masks, int8 quantized weights — keep their dtypes).
    """
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def apply_platform_override() -> None:
    """Honor ``GOALNET_PLATFORM`` (e.g. ``cpu``) before any backend initializes.

    Some TPU images pin ``jax_platforms`` from sitecustomize, so the standard
    ``JAX_PLATFORMS`` env var alone can be ineffective; this re-pins the
    config explicitly.  Call early in entry points (CLI, bench).

    Also enables the persistent compilation cache (first TPU compile through
    a remote-compile tunnel can take minutes; cached reloads take seconds).
    Opt out with ``GOALNET_NO_COMPILE_CACHE=1`` or relocate with
    ``GOALNET_COMPILE_CACHE_DIR``.
    """
    import jax

    platform = os.environ.get("GOALNET_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    # Cache only accelerator programs: XLA:CPU AOT executables are pinned to
    # the exact compile-host CPU features — reloading one on a host with a
    # different feature set can SIGILL/abort the process (observed with
    # fleet-heterogeneous hosts), so a CPU session must never touch the
    # persistent cache.  Enable it ONLY when an accelerator platform is
    # explicitly named (env override or pinned jax_platforms); when the
    # platform is unresolved, stay conservative — correctness over compile
    # speed (accelerator entry points on TPU images always have the pin).
    effective = platform or (jax.config.jax_platforms or "")
    accelerator_named = bool(effective) and not effective.startswith("cpu")
    if accelerator_named and not os.environ.get("GOALNET_NO_COMPILE_CACHE"):
        cache_dir = os.environ.get(
            "GOALNET_COMPILE_CACHE_DIR",
            os.path.expanduser("~/.cache/goalnet_jax"),
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


__all__ = [
    "Color",
    "apply_platform_override",
    "log_epoch_header",
    "log_metrics",
    "log_val_delta",
    "StageTimer",
    "trace_annotation",
    "tree_cast",
]
