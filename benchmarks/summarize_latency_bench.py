"""p50 per-match summarize latency (second half of the BASELINE.json metric).

Times the full post-model summarization stage — round → expand to raw rate →
clip stats → 0/1 knapsack → mask — on a 90-minute-match workload:
135,000 raw frames (25 fps), 1 fps condensed scores, ~200 temporal segments,
15% budget with ×5 weight scaling (capacity 101,250 columns).

Reports p50/p95 over repeated runs for each knapsack engine available.
Run: ``python benchmarks/summarize_latency_bench.py`` (host-dominated; the
platform only affects the expand/clip-stats device ops).
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

from cvml_goalnet_tpu.config import KnapsackConfig
from cvml_goalnet_tpu.data.synthetic import synthetic_change_points
from cvml_goalnet_tpu.pipeline import summarize
from cvml_goalnet_tpu.runtime import native_knapsack_available

FULL_N = 90 * 60 * 25          # 90-min match at 25 fps
SKIP = 25                      # 1 fps condensed scoring
N_CLIPS = 200


def main() -> None:
    rng = np.random.default_rng(0)
    scores = rng.uniform(1, 5, FULL_N // SKIP).astype(np.float32)
    intervals = synthetic_change_points(FULL_N, N_CLIPS, seed=1)

    engines = ["host"] + (["native", "native-full"] if native_knapsack_available() else [])
    results = {}
    for engine in engines:
        # warmup (jit compile of expand/clip ops)
        summarize(scores, intervals, SKIP, FULL_N, KnapsackConfig(), knapsack_engine=engine)
        times = []
        for _ in range(9):
            t0 = time.perf_counter()
            res = summarize(
                scores, intervals, SKIP, FULL_N, KnapsackConfig(), knapsack_engine=engine
            )
            times.append(time.perf_counter() - t0)
        times.sort()
        results[engine] = {
            "p50_ms": round(times[len(times) // 2] * 1e3, 1),
            "p95_ms": round(times[-1] * 1e3, 1),
            "selected_clips": len(res.selected_clips),
            "mask_frames": int(res.frame_mask.sum()),
        }

    best = min(results.values(), key=lambda r: r["p50_ms"])
    print(json.dumps({
        "metric": "p50_match_summarize_latency",
        "value": best["p50_ms"],
        "unit": "ms (90-min match, 200 clips, 15% budget)",
        "engines": results,
    }))


if __name__ == "__main__":
    main()
