"""Training-throughput benchmark: reference's headline setup, one chip.

The reference's headline number is wall-clock training time: 949.3 s for the
AVM (753.3 s for VM) — 150 epochs over one ~110-condensed-frame video on an
RTX 4060M (BASELINE.md, report Table 2).  This benchmark times our scan-based
per-video training program on the same workload shape (110 frames, sub-batch
10 → 11 sequential Adam updates per epoch) and reports projected time for the
150-epoch run plus the speedup over the reference.

Run on TPU: ``python benchmarks/train_bench.py``
Run on CPU: ``GOALNET_PLATFORM=cpu python benchmarks/train_bench.py``
"""

from __future__ import annotations

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
from cvml_goalnet_tpu.train.loop import make_train_video_fn
from cvml_goalnet_tpu.train.state import create_train_state

REFERENCE_SECONDS = 949.3   # AVM train time, report Table 2
REFERENCE_EPOCHS = 150
N_FRAMES = 110              # ≈ condensed frames of the train video at skip 30


def main() -> None:
    import dataclasses
    import os

    cfg = PipelineConfig()
    if os.environ.get("GOALNET_BENCH_DTYPE") == "bfloat16":
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, compute_dtype="bfloat16")
        )
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    fn = make_train_video_fn(cfg)

    rng = np.random.default_rng(0)
    visual = jnp.asarray(rng.random((N_FRAMES, 40, 40, 3)).astype(np.float32))
    audio = jnp.asarray(
        rng.random((N_FRAMES, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32)
    )
    labels = jnp.asarray(rng.integers(1, 6, N_FRAMES).astype(np.float32))
    valid = jnp.ones((N_FRAMES,), jnp.float32)
    key = jax.random.PRNGKey(1)

    params, ms, opt = state.params, state.model_state, state.opt_state
    # Warmup/compile.
    out = fn(params, ms, opt, visual, audio, labels, valid, key)
    jax.block_until_ready(out)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        params, ms, opt, preds, loss = fn(params, ms, opt, visual, audio, labels, valid, key)
    jax.block_until_ready(params)
    per_epoch = (time.perf_counter() - t0) / iters

    projected = per_epoch * REFERENCE_EPOCHS
    print(json.dumps({
        "metric": "train_seconds_150_epochs",
        "value": round(projected, 2),
        "unit": "s (projected, 150 epochs x 110 frames)",
        "per_epoch_ms": round(per_epoch * 1e3, 2),
        "reference_seconds": REFERENCE_SECONDS,
        "speedup_vs_reference": round(REFERENCE_SECONDS / projected, 1),
    }))


if __name__ == "__main__":
    main()
