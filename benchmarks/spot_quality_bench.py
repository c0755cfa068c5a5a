"""Spotting quality: GRU vs transformer vs windowed transformer.

The speed story for the windowed scorer is in ``timeline_bench.py`` (15.8 ms
vs 317 ms per 90-min match); this benchmark checks the QUALITY side: on a
synthetic timeline whose events are decodable from local context (a feature
bump spread over ±2 frames), all three scorers should reach comparable
average-mAP — restricting attention to a band must not cost accuracy when
the evidence is local (which is the regime event spotting lives in).

CPU-runnable (small shapes): GOALNET_PLATFORM=cpu python benchmarks/spot_quality_bench.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from cvml_goalnet_tpu.utils import apply_platform_override

apply_platform_override()

import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.models.temporal import temporal_scorer_init
from cvml_goalnet_tpu.models.temporal_attention import temporal_transformer_init
from cvml_goalnet_tpu.ops.spotting_metrics import average_map
from cvml_goalnet_tpu.spotting import spot_events
from cvml_goalnet_tpu.train.spotting import init_spotting_opt, make_spotting_train_step

T, D = 512, 16
HIDDEN = 32
WINDOW = 16
EPOCHS = 120
ON_CPU = jax.default_backend() == "cpu"


def make_data(seed: int):
    rng = np.random.default_rng(seed)
    labels = np.zeros(T, np.float32)
    events = np.sort(rng.choice(np.arange(8, T - 8), 14, replace=False))
    # drop events closer than 8 frames so peaks are separable
    keep = [events[0]]
    for e in events[1:]:
        if e - keep[-1] >= 8:
            keep.append(e)
    events = np.array(keep)
    labels[events] = 1.0
    feats = rng.standard_normal((T, D)).astype(np.float32) * 0.3
    # local evidence: a bump spread over +-2 frames in two feature dims
    for e in events:
        lo, hi = max(0, e - 2), min(T, e + 3)
        feats[lo:hi, 0] += np.linspace(1.0, 2.0, hi - lo)
        feats[lo:hi, 1] += 1.5
    return feats, labels, events


def run(scorer: str, window: int, feats, labels):
    if scorer == "gru":
        from cvml_goalnet_tpu.models.temporal import temporal_scorer_apply

        params = temporal_scorer_init(jax.random.PRNGKey(0), D, HIDDEN)
        step = make_spotting_train_step(HIDDEN, lr=5e-3)
        apply = lambda p, f: temporal_scorer_apply(p, f, HIDDEN)
    else:
        params = temporal_transformer_init(
            jax.random.PRNGKey(0), D, model_dim=32, num_layers=1, num_heads=2,
            max_len=T)
        step = make_spotting_train_step(
            0, lr=5e-3, scorer="transformer", num_heads=2, window=window)
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_apply)
        apply = lambda p, f: temporal_transformer_apply(p, f, 2, window=window)
    opt = init_spotting_opt(params)
    f, l = jnp.asarray(feats), jnp.asarray(labels)
    first = last = None
    for i in range(EPOCHS):
        params, opt, loss = step(params, opt, f, l)
        if i == 0:
            first = float(loss)
        last = float(loss)
    scores = np.asarray(apply(params, f))
    pred = spot_events(scores, window=3, threshold=float(np.quantile(scores, 0.9)))
    gt = np.nonzero(labels)[0]
    m = average_map(pred, scores[pred] if len(pred) else np.zeros(0), gt,
                    tolerances=(2, 4, 8))
    return {"loss_first": round(first, 4), "loss_last": round(last, 4),
            "n_pred": int(len(pred)), "n_gt": int(len(gt)),
            "average_map": round(m["average_map"], 4)}


def main() -> None:
    feats, labels, _ = make_data(0)
    out = {
        "gru": run("gru", 0, feats, labels),
        "transformer_full": run("transformer", 0, feats, labels),
        f"transformer_w{WINDOW}": run("transformer", WINDOW, feats, labels),
    }
    print(json.dumps({"metric": "spot_quality_synthetic", "T": T, **out}))


if __name__ == "__main__":
    main()
