"""Preprocess resize implementations on the chip: matmul vs static-slice.

The round-3 program split (``program_split_bench.py``) put the preprocess
stage at ~11 ms of the ~47 ms headline program (B=16384) — ~3.2× its 2.8 GB
uint8 read floor — because the dot-general resize forces XLA to materialize
a full-resolution cast intermediate (uint8 → f32/bf16 write + read ≈ 11.3 GB
of extra HBM traffic at B=16384).

``ops/preprocess.py::resize_bilinear_sliced`` removes the contraction
entirely: for rational ratios (production 180×320→40×40 ⇒ H period 2 /
stride 9, W period 1 / stride 8) the bilinear taps are static strided
slices, and XLA fuses slice+convert+scale+add into one loop over the SMALL
output.  Expected traffic: the per-frame min/max reduce reads the 2.8 GB
input once; the resize pass touches only the sampled rows/cols; the output
is 0.3 GB — so the stage should land near its read floor (~4-5 ms), not 11.

This script measures, with the verified scan chain (``_timing.py``):

* the preprocess stage alone, matmul vs sliced, B=16384;
* the FULL bench.py program (int8 convs, conv head, bf16), matmul vs sliced;
* max |Δscore| between the two full programs (same taps ⇒ expect ~0).

Measured (v5e via the remote tunnel, B=16384, 2026-08-19): stage
18.08 → 15.95 ms (1.13×), full program 54.02 → 52.42 ms (303.3k → 312.6k
f/s, 1.03×), max score drift 2.4e-4.  The stage gain is smaller than the
traffic model predicts because the verified-timing perturbation chain adds
a shared ~10 ms floor of input traffic to BOTH sides; the full-program
delta (+3.1%) is the honest end-to-end effect.

Prints one JSON line; raw numbers go to stdout as they land.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvml_goalnet_tpu.utils import apply_platform_override

apply_platform_override()

import dataclasses

import jax
import jax.numpy as jnp

from _timing import timed_scan_verified
from cvml_goalnet_tpu.config import PipelineConfig
from cvml_goalnet_tpu.models.avm import avm_apply
from cvml_goalnet_tpu.ops.preprocess import preprocess_frames
from cvml_goalnet_tpu.train.state import create_train_state


def main() -> None:
    batch = int(os.environ.get("GOALNET_BENCH_BATCH", 16384))
    decode_hw = (180, 320)
    cfg = PipelineConfig()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, quantized_inference=True))
    dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    raw = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (batch, *decode_hw, 3), dtype=np.uint8)))
    audio = jax.device_put(jnp.asarray(rng.standard_normal(
        (batch, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32)))

    state = create_train_state(jax.random.PRNGKey(0), cfg)
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
    params, model_state = cast(state.params), cast(state.model_state)

    def pre_only(impl):
        def fn(raw):
            return preprocess_frames(
                raw, cfg.preprocess.frame_size, cfg.preprocess.eps,
                jnp.float32, impl)
        return fn

    def full(impl):
        @jax.jit
        def step(raw, audio):
            visual = preprocess_frames(
                raw, cfg.preprocess.frame_size, cfg.preprocess.eps,
                jnp.float32, impl).astype(dtype)
            scores, _ = avm_apply(
                params, model_state, visual, audio.astype(dtype), None,
                cfg=cfg.model, train=False)
            return scores[:, 0].astype(jnp.float32)
        return step

    out = {"batch": batch}
    for impl in ("matmul", "sliced"):
        dt = timed_scan_verified(pre_only(impl), raw, iters=15, base_iters=5)
        out[f"pre_{impl}_ms"] = round(dt * 1e3, 2)
        print(f"preprocess[{impl}]: {dt*1e3:.2f} ms", flush=True)

    scores = {}
    for impl in ("matmul", "sliced"):
        step = full(impl)
        scores[impl] = np.asarray(step(raw, audio))
        dt = timed_scan_verified(step, raw, audio, iters=15, base_iters=5)
        out[f"full_{impl}_ms"] = round(dt * 1e3, 2)
        out[f"full_{impl}_fps"] = round(batch / dt, 1)
        print(f"full[{impl}]: {dt*1e3:.2f} ms = {batch/dt:.0f} f/s", flush=True)

    out["max_score_drift"] = float(np.abs(scores["matmul"] - scores["sliced"]).max())
    out["pre_speedup"] = round(out["pre_matmul_ms"] / out["pre_sliced_ms"], 3)
    out["full_speedup"] = round(out["full_matmul_ms"] / out["full_sliced_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
