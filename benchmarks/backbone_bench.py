"""Benchmark: the three visual model families through the full device path.

Same program shape as the official ``bench.py`` (on-device preprocess →
visual encoder → audio branch → fusion MLP) with ``vis_backbone`` swapped:
``reference`` (the reference-topology conv stack, ``utils.py:145-195``),
``resnet`` (models/resnet.py), ``vit`` (models/vit.py — all-GEMM patch
transformer).  bf16 everywhere, plus an int8 row per family (since round 4
every backbone has an int8 MXU path: dominant convs for ``reference``,
bn-folded block convs for ``resnet``, all block GEMMs for ``vit``).

Prints one JSON line per variant.  Timing uses the verified in-program scan
chain (benchmarks/_timing.py) so the numbers hold through the axon tunnel.

Env: ``GOALNET_BENCH_BATCH`` (default 8192 on accelerators, 128 on CPU),
``GOALNET_PLATFORM=cpu`` for smoke runs.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cvml_goalnet_tpu.utils import apply_platform_override

apply_platform_override()

import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.config import PipelineConfig
from cvml_goalnet_tpu.models.avm import avm_apply
from cvml_goalnet_tpu.ops.preprocess import preprocess_frames
from cvml_goalnet_tpu.train.state import create_train_state

from _timing import timed_scan_verified

TARGET_FPS = 50 * 25


def bench_variant(name: str, cfg: PipelineConfig, batch: int, rng) -> dict:
    state = create_train_state(jax.random.PRNGKey(0), cfg)

    def cast(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    params, model_state = cast(state.params), cast(state.model_state)
    raw = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (batch, 180, 320, 3), dtype=np.uint8)))
    audio = jax.device_put(jnp.asarray(
        rng.standard_normal((batch, cfg.audio.bin_length, cfg.audio.n_mfcc))
        .astype(np.float32)))

    def step(raw, audio):
        visual = preprocess_frames(
            raw, cfg.preprocess.frame_size, cfg.preprocess.eps
        ).astype(jnp.bfloat16)
        scores, _ = avm_apply(
            params, model_state, visual, audio.astype(jnp.bfloat16), None,
            cfg=cfg.model, train=False)
        return scores[:, 0].astype(jnp.float32)

    dt = timed_scan_verified(step, raw, audio, iters=12, base_iters=4)
    fps = batch / dt
    return {
        "metric": f"backbone_{name}_fps",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / TARGET_FPS, 3),
        "ms_per_batch": round(dt * 1e3, 3),
        "batch": batch,
    }


def main() -> None:
    base = PipelineConfig()
    default_batch = 8192 if jax.default_backend() != "cpu" else 128
    batch = int(os.environ.get("GOALNET_BENCH_BATCH", default_batch))
    rng = np.random.default_rng(0)

    variants = {}
    for family in ("reference", "resnet", "vit"):
        fam_cfg = dataclasses.replace(
            base, model=dataclasses.replace(base.model, vis_backbone=family))
        variants[family] = fam_cfg
        variants[f"{family}_int8"] = dataclasses.replace(
            fam_cfg,
            model=dataclasses.replace(fam_cfg.model, quantized_inference=True))
    if jax.default_backend() == "cpu":
        # XLA:CPU int8 conv is pathological; keep the GEMM-only vit int8 row
        variants.pop("reference_int8")
        variants.pop("resnet_int8")
    for name, cfg in variants.items():
        print(json.dumps(bench_variant(name, cfg, batch, rng)), flush=True)


if __name__ == "__main__":
    main()
