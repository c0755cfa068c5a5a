"""Serving throughput: dynamic batching vs serial request handling.

Measures the `serve.DynamicBatcher` win on real hardware: N concurrent
small requests (50 condensed frames each — a ~25 s clip at 1 fps) are
summarized (a) serially through `Summarizer.summarize_frames` — one device
dispatch per request — and (b) through the batcher, which concatenates
co-arriving requests into bucket-padded device programs.

Prints one JSON line with requests/s for both modes and the batching stats.
Run: ``python benchmarks/serving_bench.py`` (GOALNET_PLATFORM=cpu for smoke;
GOALNET_BENCH_REQUESTS overrides the request count).
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

from cvml_goalnet_tpu.config import PipelineConfig
from cvml_goalnet_tpu.serve import DynamicBatcher, Summarizer


def main() -> None:
    n_requests = int(os.environ.get("GOALNET_BENCH_REQUESTS", 64))
    frames_per_req = 50
    cfg = dataclasses.replace(
        PipelineConfig(),
        model=dataclasses.replace(PipelineConfig().model, audio_included=False),
    )
    s = Summarizer(cfg)
    rng = np.random.default_rng(0)
    reqs = [rng.integers(0, 255, (frames_per_req, 180, 320, 3), dtype=np.uint8)
            for _ in range(n_requests)]

    # warm both paths (per-shape preprocess + per-bucket fuse compiles)
    batcher = DynamicBatcher(s, max_batch_frames=2048, max_wait_ms=25.0,
                             buckets=(64, 256, 1024, 2048))
    batcher.warmup()
    s.summarize_frames("warm", reqs[0])

    # serial: one dispatch per request (a single client, back to back)
    t0 = time.perf_counter()
    for i, fr in enumerate(reqs):
        s.summarize_frames(f"s{i}", fr)
    serial_s = time.perf_counter() - t0

    # batched: CONCURRENT clients (thread pool) — co-arriving requests ride
    # shared device dispatches
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=16) as pool:
        futs = list(pool.map(
            lambda iv: batcher.submit(f"b{iv[0]}", iv[1]), enumerate(reqs)))
    for f in futs:
        f.result(timeout=600)
    batched_s = time.perf_counter() - t0

    print(json.dumps({
        "metric": "serving_dynamic_batching",
        "requests": n_requests,
        "frames_per_request": frames_per_req,
        "serial_rps": round(n_requests / serial_s, 1),
        "batched_rps": round(n_requests / batched_s, 1),
        "speedup": round(serial_s / batched_s, 2),
        "batches": batcher.stats["batches"],
    }))


if __name__ == "__main__":
    main()
