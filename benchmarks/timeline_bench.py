"""90-minute-timeline scoring benchmark: one device program for a full match.

BASELINE.json north star: "a full 90-minute match is scored in one device
program".  This times the three temporal scorers over a full-match timeline
(T = 90·60·25 = 135,000 frames at full rate; D = 640 trunk features):

* GRU scan (monolithic ``lax.scan``) — the default scorer;
* GRU chunked+halo (vmap over windows) — the parallel/shardable variant;
* transformer with the flash-attention Pallas kernel — O(T·d) memory
  (naive attention would need a 72 GB score matrix at this T).

Timing: verified in-program scan chains (``benchmarks/_timing.py``) — the
round-2 output-feedback chain (``f + mean(scores)·1e-12``) added a full
(T, D) read-modify-write per iteration, which overstated the banded rows
~2× (8.8 ms measured verified vs 15.2 recorded; docs/BENCHMARKS.md
"verified re-audit").
Run: ``python benchmarks/timeline_bench.py`` (GOALNET_BENCH_T overrides T).
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

from cvml_goalnet_tpu.models.temporal import temporal_scorer_init
from cvml_goalnet_tpu.models.temporal_attention import (
    temporal_transformer_apply,
    temporal_transformer_init,
)
from cvml_goalnet_tpu.spotting import score_timeline, score_timeline_chunked

T = int(os.environ.get("GOALNET_BENCH_T", 90 * 60 * 25))
D = 640
HIDDEN = 128


def bench_chained(name, fn, feats, iters=10):
    from _timing import timed_scan_verified

    return timed_scan_verified(fn, feats, iters=iters, base_iters=3)


def main() -> None:
    rng = np.random.default_rng(0)
    feats = jax.device_put(jnp.asarray(rng.standard_normal((T, D)).astype(np.float32)))

    gru = temporal_scorer_init(jax.random.PRNGKey(0), D, HIDDEN)
    tfm = temporal_transformer_init(
        jax.random.PRNGKey(1), D, model_dim=128, num_layers=2, num_heads=1, max_len=8192
    )

    results = {}
    results["gru_scan_ms"] = round(
        bench_chained("gru", lambda f: score_timeline(gru, f, HIDDEN), feats) * 1e3, 1
    )
    results["gru_chunked_ms"] = round(
        bench_chained(
            "gru_chunked",
            lambda f: score_timeline_chunked(gru, f, HIDDEN, 4096, 256),
            feats,
        ) * 1e3, 1
    )
    results["transformer_flash_ms"] = round(
        bench_chained(
            "tfm", lambda f: temporal_transformer_apply(tfm, f, 1, True), feats
        ) * 1e3, 1
    )
    # sliding-window flash attention: O(T·W·d) — the band an event actually
    # uses (W=1024 condensed frames ≈ ±41 s of context at 25 fps)
    results["transformer_flash_w1024_ms"] = round(
        bench_chained(
            "tfm_w1024",
            lambda f: temporal_transformer_apply(tfm, f, 1, True, window=1024),
            feats,
        ) * 1e3, 1
    )
    # same banded scorer with bf16 params/features (f32 softmax statistics
    # inside the kernel; scores within 0.05 of f32 — tests)
    tfm16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tfm,
    )
    results["transformer_flash_w1024_bf16_ms"] = round(
        bench_chained(
            "tfm_w1024_bf16",
            lambda f: temporal_transformer_apply(
                tfm16, f.astype(jnp.bfloat16), 1, True, window=1024
            ).astype(jnp.float32),
            feats,
        ) * 1e3, 1
    )

    best = min(results.values())
    print(json.dumps({
        "metric": "match_timeline_scoring",
        "value": best,
        "unit": f"ms for T={T} frames (one device program)",
        "scorers": results,
        "realtime_multiple_best": round((T / 25.0) / (best / 1e3), 0),
    }))


if __name__ == "__main__":
    main()
