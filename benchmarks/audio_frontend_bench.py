"""Audio-frontend throughput: MFCC features for a 90-minute match.

The headline bench (bench.py) consumes PREcomputed MFCCs, so the XLA audio
frontend (gather-framing → rfft → mel/DCT matmuls, ops/audio.py — reference
``extract_audio_features``, utils.py:313-349) has no standalone number.
This measures it at match scale, two regimes:

* condensed (1 fps slots, skip 30 — the reference's training regime)
* full-rate (25 fps slots — the BASELINE.json config-5 regime)

Reported per regime: end-to-end wall (slot grouping + H2D + device chain +
D2H — what a pipeline actually pays) and the device-only chain on resident
input (the compute ceiling), both as ×-real-time against the 90-min audio
duration.  The ≥50×-real-time budget applies to the WHOLE pipeline; audio
must be far from the critical path for the visual stack to keep its margin.

Run on TPU: ``python benchmarks/audio_frontend_bench.py``
(GOALNET_BENCH_MINUTES overrides 90).
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

from cvml_goalnet_tpu.config import AudioConfig
from cvml_goalnet_tpu.ops.audio import (
    _batched_slot_fn,
    extract_audio_features,
    slot_boundaries,
)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main() -> None:
    on_cpu = jax.default_backend() == "cpu"
    minutes = float(os.environ.get("GOALNET_BENCH_MINUTES", 1 if on_cpu else 90))
    cfg = AudioConfig()
    duration_s = minutes * 60.0
    n_samples = int(duration_s * cfg.sample_rate)
    rng = np.random.default_rng(0)
    wave = rng.standard_normal(n_samples).astype(np.float32) * 0.1

    for regime, fps in (("condensed_1fps", 1.0), ("full_rate_25fps", 25.0)):
        n_frames = int(duration_s * fps)

        # end-to-end wall: grouping + H2D + device chain + D2H
        extract_audio_features(wave, n_frames, cfg)  # warmup/compile
        t0 = time.perf_counter()
        out = extract_audio_features(wave, n_frames, cfg)
        wall = time.perf_counter() - t0
        assert out.shape[0] == n_frames

        # device-only ceiling: the dominant slot-length group, resident input
        bounds = slot_boundaries(n_samples, n_frames)
        groups: dict[int, list[int]] = {}
        for i, (a, b) in enumerate(bounds):
            groups.setdefault(b - a, []).append(i)
        length, idxs = max(groups.items(), key=lambda kv: len(kv[1]))
        stack = jax.device_put(jnp.asarray(np.stack(
            [wave[bounds[i][0]: bounds[i][1]] for i in idxs])))
        # verified scan chain (benchmarks/_timing.py): repeated identical
        # dispatches of cheap programs are elided through the axon tunnel,
        # reading physically impossible times; the in-program chain forces
        # serial execution and verifies the iteration count
        from _timing import timed_scan_verified

        fn = _batched_slot_fn(cfg)
        dev_s = timed_scan_verified(fn, stack, iters=35, base_iters=5)
        dev_total = dev_s * n_frames / len(idxs)  # scale to all slots

        emit(metric="audio_frontend", regime=regime, minutes=minutes,
             n_frames=n_frames, slot_len=length,
             e2e_wall_s=round(wall, 3),
             e2e_x_realtime=round(duration_s / wall, 1),
             device_chain_s=round(dev_total, 3),
             device_x_realtime=round(duration_s / dev_total, 1))


if __name__ == "__main__":
    main()
