"""Benchmark: LIVE bounded-latency spotting (`spotting.spot_stream`).

Measures the online journey the `goalnet spot --stream` verb drives: raw
chunks are host-preprocessed and pushed through the trunk + GRU scorer, and
every yielded update is FINAL (scores waited for `halo` right-context
frames; events for their full peak window).  Three numbers matter:

* throughput — condensed frames/s end-to-end (host preprocess + encode +
  score + the host peak scan), and the real-time multiple that implies at
  the config's skip_frames over 25-fps footage;
* per-update wall-clock — p50/p95 time to produce one update once its
  chunk is available (every update ends in host readbacks, so plain
  perf_counter timing is honest — nothing is left in flight);
* decision latency — the STRUCTURAL content delay before an event can be
  reported: (chunk + halo + peak_window) condensed frames of footage. This
  is a property of the emission contract, not of machine speed; the wall
  clock only adds to it when throughput < real-time.

Also asserts the streamed events equal `detect_peaks` on the streamed
scores (the spot_stream contract) so a perf run cannot silently measure a
broken pipeline.

Prints one JSON line.  Env: ``GOALNET_PLATFORM=cpu`` for smoke runs,
``GOALNET_BENCH_T`` (condensed frames, default 5400 = a 90-min match at
skip 25 over 25-fps footage), ``GOALNET_BENCH_CHUNK`` (default 256),
``GOALNET_BENCH_HALO`` (default 64), ``GOALNET_BENCH_SCORER``
(``gru`` default / ``transformer`` = the banded scorer, EXACT streaming,
halo floored at layers·window), ``GOALNET_BENCH_WINDOW`` (band radius for
the transformer scorer, default 64).
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

import dataclasses

import jax

from cvml_goalnet_tpu.config import ModelConfig, PipelineConfig
from cvml_goalnet_tpu.models.temporal import detect_peaks, temporal_scorer_init
from cvml_goalnet_tpu.ops.preprocess import preprocess_frames_host
from cvml_goalnet_tpu.spotting import spot_stream
from cvml_goalnet_tpu.train.state import create_train_state


def main() -> None:
    t_total = int(os.environ.get("GOALNET_BENCH_T", "5400"))
    chunk = int(os.environ.get("GOALNET_BENCH_CHUNK", "256"))
    halo = int(os.environ.get("GOALNET_BENCH_HALO", "64"))
    scorer = os.environ.get("GOALNET_BENCH_SCORER", "gru")
    window = int(os.environ.get("GOALNET_BENCH_WINDOW", "64"))
    peak_window = 5
    fps, skip = 25.0, 25  # 90-min match: 1 condensed frame per second

    model = ModelConfig(audio_included=False)
    if scorer == "transformer":
        model = dataclasses.replace(
            model, temporal_model="transformer", temporal_window=window)
    cfg = PipelineConfig(model=model)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    d = cfg.model.vis_feature_dim
    if scorer == "transformer":
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_init,
        )

        tparams = temporal_transformer_init(
            jax.random.PRNGKey(1), d, model_dim=cfg.model.temporal_hidden,
            num_layers=cfg.model.temporal_num_layers,
            num_heads=cfg.model.temporal_num_heads,
            max_len=cfg.model.temporal_max_len)
        # spot_stream floors the halo at the exactness bound; report it
        halo_eff = max(halo, cfg.model.temporal_num_layers * window)
    else:
        tparams = temporal_scorer_init(jax.random.PRNGKey(1), d,
                                       cfg.model.temporal_hidden)
        halo_eff = halo

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (t_total, 180, 320, 3), dtype=np.uint8)

    def chunks():
        for i in range(0, t_total, chunk):
            yield preprocess_frames_host(
                raw[i:i + chunk], cfg.preprocess.frame_size, cfg.preprocess.eps)

    # warm the compile caches off the clock with a chunk sequence that hits
    # EVERY scorer shape of the timed run: deferred first chunk, the first
    # (halo-less) emission window, the steady window, and — when t_total is
    # not a chunk multiple — the final-partial-chunk window + flush (round-3
    # ADVICE: the old warmup missed those, landing one compile inside the
    # timed region; through the remote-compile tunnel that is minutes)
    warm = min(t_total, 3 * chunk + t_total % chunk)
    for _ in spot_stream(state.params, state.model_state, tparams,
                         chunks_prefix(raw, warm, chunk, cfg), cfg,
                         halo=halo, peak_window=peak_window,
                         peak_threshold=-1e9):
        pass

    update_s, scores, events = [], [], []
    t0 = time.perf_counter()
    last = t0
    for u in spot_stream(state.params, state.model_state, tparams, chunks(),
                         cfg, halo=halo, peak_window=peak_window,
                         peak_threshold=-1e9):
        now = time.perf_counter()
        update_s.append(now - last)
        last = now
        scores.append(u.scores)
        events.append(np.asarray(u.events))
    wall = time.perf_counter() - t0

    streamed = np.concatenate(scores)
    ev = np.concatenate(events)
    assert len(streamed) == t_total
    # contract check: a perf number for a broken pipeline is worse than none
    import jax.numpy as jnp

    expect = np.nonzero(np.asarray(
        detect_peaks(jnp.asarray(streamed), peak_window, -1e9)))[0]
    np.testing.assert_array_equal(np.sort(ev), expect)

    frames_per_s = t_total / wall
    out = {
        "bench": "spot_stream",
        "backend": jax.default_backend(),
        "scorer": scorer,
        "t_condensed": t_total,
        "chunk": chunk,
        "halo": halo_eff,
        **({"window": window} if scorer == "transformer" else {}),
        "frames_per_s": round(frames_per_s, 1),
        "realtime_x": round(frames_per_s * skip / fps, 1),
        "p50_update_ms": round(float(np.percentile(update_s, 50)) * 1e3, 1),
        "p95_update_ms": round(float(np.percentile(update_s, 95)) * 1e3, 1),
        "decision_latency_content_s": round(
            (chunk + halo_eff + peak_window) * skip / fps, 1),
        "events": int(len(ev)),
    }
    print(json.dumps(out))


def chunks_prefix(raw, n, chunk, cfg):
    for i in range(0, n, chunk):
        yield preprocess_frames_host(
            raw[i:i + chunk], cfg.preprocess.frame_size, cfg.preprocess.eps)


if __name__ == "__main__":
    main()
