"""Knapsack engine crossover: host NumPy vs on-device DP+traceback vs C++.

VERDICT r3 #7: the device engine (``ops/knapsack.knapsack_select_device``)
needs a measured role, not a dead ``engine=`` flag.  This bench times the
three engines e2e (inputs on host, selection list back on host — transfers
and dispatch included, which is what a caller pays) at:

* the 90-min-match shape the pipeline actually solves
  (n≈450 clips, capacity 20,250 after the ×1 rescale), and
* no-native stress shapes (large n·W) where the VPU row sweep should win,

and prints one JSON row per (shape, engine).  The crossover constant
``ops/knapsack.DEVICE_CROSSOVER_CELLS`` is calibrated from these rows; the
``auto`` policy is native > device (accelerator + integral + past crossover)
> host.

Run on the real chip: ``python benchmarks/knapsack_bench.py``
CPU smoke: ``GOALNET_PLATFORM=cpu GOALNET_KNAP_REPEATS=2 python ...``
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvml_goalnet_tpu.utils import apply_platform_override

apply_platform_override()

import jax

from cvml_goalnet_tpu.ops.knapsack import knapsack_select
from cvml_goalnet_tpu.runtime import native_knapsack_available

REPEATS = int(os.environ.get("GOALNET_KNAP_REPEATS", 7))

SHAPES = {
    # n items, capacity (already integer-scaled), max item weight.
    # Table footprints stay modest (2.4e8 cells = 1.9 GB host f64 / 1 GB
    # device int32) — the point is the slope, not an OOM contest.
    "match": (450, 20_250, 120),          # 90-min match, 15% budget
    "stress_1e8": (900, 120_000, 400),    # ~1.1e8 cells
    "stress_2e8": (1_200, 200_000, 500),  # ~2.4e8 cells
}
_ONLY = os.environ.get("GOALNET_KNAP_SHAPES")
if _ONLY:
    SHAPES = {k: v for k, v in SHAPES.items() if k in _ONLY.split(",")}


def bench_engine(engine: str, n: int, cap: int, wmax: int) -> dict | None:
    rng = np.random.default_rng(0)
    values = rng.integers(1, 127, n).astype(float)   # int8-rounded importances
    weights = rng.integers(1, wmax, n).astype(float)
    try:
        sel = knapsack_select(values, weights, cap, engine=engine)  # warm/compile
    except Exception as e:  # noqa: BLE001 — report, don't die mid-sweep
        return {"engine": engine, "error": str(e)[:120]}
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        got = knapsack_select(values, weights, cap, engine=engine)
        times.append(time.perf_counter() - t0)
    assert got == sel
    return {
        "engine": engine,
        "ms_median": round(float(np.median(times)) * 1e3, 2),
        "ms_iqr": round(float(np.subtract(*np.percentile(times, [75, 25]))) * 1e3, 2),
        "n_selected": len(sel),
    }


def main() -> None:
    engines = ["host"]
    if native_knapsack_available():
        engines.append("native")
    if jax.default_backend() != "cpu":
        engines.append("device")
    for shape, (n, cap, wmax) in SHAPES.items():
        for engine in engines:
            row = bench_engine(engine, n, cap, wmax)
            print(json.dumps({
                "metric": f"knapsack_{shape}_{engine}",
                "n": n, "capacity": cap, "cells": n * (cap + 1),
                "backend": jax.default_backend(),
                **row,
            }), flush=True)


if __name__ == "__main__":
    main()
