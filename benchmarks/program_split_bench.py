"""Where the headline program's time goes, at the headline batch.

`bench.py` measures ONE jitted program (uint8 (B, 180, 320, 3) frames →
preprocess → visual ‖ audio → fusion → scores) at B=16384.  This script
times PREFIX programs of that exact pipeline — preprocess; +visual;
+audio; +fusion (= the full bench program) — so each subsystem's marginal
cost at the production batch is measured, not inferred from B=2048 stage
tables.  Same config policy as bench.py (bf16 + int8 dominant convs on
accelerators).

Timing methodology: the SAME async dispatch loop as ``bench.py`` (20
dispatches of one jitted program, single block at the end), so the
``full_program`` row is directly comparable to the headline number.
Negative result recorded: the scan-chained carry idiom used by
roofline_bench (data-dependent int32 carry perturbing the next input)
still collapsed on TPU for the memory-bound preprocess prefix — the
first TPU run read 0.004 ms for a 2.8 GB input read, a 4-billion-f/s
impossibility — while the very same program measured sanely on CPU.
Separate dispatches cannot be cross-iteration-folded, and per-dispatch
overhead is amortized by async pipelining exactly as in bench.py.

Run on TPU: ``python benchmarks/program_split_bench.py``
(GOALNET_BENCH_BATCH overrides 16384).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from cvml_goalnet_tpu.utils import apply_platform_override

apply_platform_override()

import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.config import PipelineConfig
from cvml_goalnet_tpu.models.audio import audio_encoder_apply
from cvml_goalnet_tpu.models.avm import avm_apply
from cvml_goalnet_tpu.models.visual import visual_encoder_apply
from cvml_goalnet_tpu.ops.preprocess import preprocess_frames
from cvml_goalnet_tpu.train.state import create_train_state


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(fn, *args, iters: int = 20) -> float:
    """Verified in-program scan chain (see ``benchmarks/_timing.py``).

    bench.py's plain async loop measured a physically impossible 0.035 ms for
    the preprocess-only prefix here (461M f/s — a 2.8 GB input read at
    ~80 TB/s) while reading sanely for the heavier prefixes; the scan chain
    forces serial execution the tunnel can't elide and VERIFIES the
    iteration count from the carry value.  Note each iteration pays one
    extra read+write of the raw input for the opaque perturbation
    (~7 ms at B=16384) — prefixes are comparable with each other; the
    full-program row cross-checks bench.py's headline minus that overhead
    (measured: 53.8 ms verified vs 51.6 ms async at B=16384).
    """
    from _timing import timed_scan_verified

    return timed_scan_verified(fn, *args, iters=iters)


def main() -> None:
    cfg = PipelineConfig()
    if jax.default_backend() != "cpu":
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, quantized_inference=True))
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    default_batch = 16384 if jax.default_backend() != "cpu" else 128
    batch = int(os.environ.get("GOALNET_BENCH_BATCH", default_batch))
    dtype = jnp.bfloat16

    def cast(tree):
        return jax.tree.map(
            lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree)

    params, model_state = cast(state.params), cast(state.model_state)
    raw = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (batch, 180, 320, 3), dtype=np.uint8)))
    audio = jax.device_put(jnp.asarray(rng.standard_normal(
        (batch, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32)))

    def pre(raw):
        return preprocess_frames(raw, cfg.preprocess.frame_size,
                                 cfg.preprocess.eps).astype(dtype)

    def pre_visual(raw):
        out, _ = visual_encoder_apply(
            params["visual"], model_state["visual"], pre(raw), train=False,
            rng=jax.random.PRNGKey(0), dropout_rate=0.0,
            quant=cfg.model.quantized_inference)
        return out

    def pre_visual_audio(raw, audio):
        v = pre_visual(raw)
        a = audio_encoder_apply(params["audio"], audio.astype(dtype))
        return jnp.concatenate([a, v], axis=-1)

    def full(raw, audio):
        scores, _ = avm_apply(
            params, model_state, pre(raw), audio.astype(dtype), None,
            cfg=cfg.model, train=False)
        return scores[:, 0].astype(jnp.float32)

    stages = [("preprocess", pre, (raw,)),
              ("pre+visual", pre_visual, (raw,)),
              ("pre+visual+audio", pre_visual_audio, (raw, audio)),
              ("full_program", full, (raw, audio))]
    prev = 0.0
    prev_name = "—"
    for name, fn, args in stages:
        t = timed(fn, *args) * 1e3
        emit(metric="program_split", prefix=name, batch=batch,
             ms=round(t, 3), marginal_ms=round(t - prev, 3),
             marginal_vs=prev_name,
             frames_per_sec=round(batch / t * 1e3, 1))
        prev, prev_name = t, name


if __name__ == "__main__":
    main()
