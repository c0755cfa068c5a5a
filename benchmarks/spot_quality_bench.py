"""Spotting quality: a DISCRIMINATIVE synthetic where window size matters.

Round-2 VERDICT weak #2: the old synthetic spread each event's evidence over
±2 frames, so GRU, full-attention, and W=16 windowed scorers all saturated
average-mAP 1.0 — a benchmark every contender aces justifies nothing.

This version makes the task require CONTEXT so scorers measurably separate:

* a true event is an evidence bump PRECEDED by a precursor cue
  ``CUE_DIST_LO..CUE_DIST_HI`` frames earlier (think: build-up play before a
  goal) — a scorer must see that far back to validate the bump;
* distractor bumps carry the SAME local evidence but no preceding cue (must
  be rejected — local pattern matching is not enough);
* cue-only confusers (cue without a following bump) must also be rejected;
* labels are jittered ±``JITTER`` frames off the evidence center;
* evidence has radius ±3 with overlapping tails.

The mAP-vs-window curve that falls out has a knee at W ≈ CUE_DIST_HI: below
it, windowed attention cannot distinguish true events from distractors
(average-mAP degrades toward the distractor-confusion floor); at and above
it, windowed matches full attention.  The production default
``temporal_window=1024`` condensed frames (~8.5 minutes of match at 2 fps)
sits far above any plausible build-up horizon, i.e. on the flat side of the
knee — that placement, not a saturated 1.0, is the justification.

CPU-runnable: GOALNET_PLATFORM=cpu python benchmarks/spot_quality_bench.py
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

T, D = 1024, 16
HIDDEN = 32
EPOCHS = int(os.environ.get("GOALNET_SPOTQ_EPOCHS", 250))
CUE_DIST_LO, CUE_DIST_HI = 24, 96   # precursor lead time (frames)
RADIUS = 3                           # evidence bump radius
JITTER = 2                           # label offset vs evidence center
WINDOWS = (8, 32, 64, 128, 256, 512)  # sweep; 0 = full attention


def make_data(seed: int):
    """→ (feats (T, D), labels (T,), events, distractors)."""
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((T, D)).astype(np.float32) * 0.3

    def add_bump(pos):
        lo, hi = max(0, pos - RADIUS), min(T, pos + RADIUS + 1)
        feats[lo:hi, 0] += np.linspace(1.0, 2.0, hi - lo)
        feats[lo:hi, 1] += 1.5

    def add_cue(pos):
        lo, hi = max(0, pos - 1), min(T, pos + 2)
        feats[lo:hi, 2] += 2.0
        feats[lo:hi, 3] -= 1.0

    margin = CUE_DIST_HI + 2 * RADIUS
    slots = rng.choice(np.arange(margin, T - margin), 40, replace=False)
    slots.sort()
    keep = [slots[0]]
    for s in slots[1:]:
        if s - keep[-1] >= 2 * RADIUS + 4:
            keep.append(s)
    slots = np.array(keep)
    rng.shuffle(slots)

    n = len(slots) // 3
    events, distractors, cue_only = slots[:n], slots[n : 2 * n], slots[2 * n : 3 * n]

    labels = np.zeros(T, np.float32)
    for e in events:
        add_bump(e)
        add_cue(e - int(rng.integers(CUE_DIST_LO, CUE_DIST_HI + 1)))
        labels[int(np.clip(e + rng.integers(-JITTER, JITTER + 1), 0, T - 1))] = 1.0
    for d in distractors:   # same bump, NO cue → must reject
        add_bump(d)
    for c in cue_only:      # cue, no bump → must reject
        add_cue(c)
    return feats, labels, np.sort(events), np.sort(distractors)


TRAIN_SEEDS = (0, 1, 2, 3)
EVAL_SEEDS = (10, 11, 12, 13, 14)   # HELD OUT: train==eval would let learned
                            # positions memorize event locations (the round-2
                            # benchmark's failure mode — everything aced it)


def run(scorer: str, window: int):
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
    train_data = [make_data(s) for s in TRAIN_SEEDS]
    for _ in range(EPOCHS):
        for feats, labels, _, _ in train_data:
            params, opt, _ = step(params, opt, jnp.asarray(feats), jnp.asarray(labels))

    maps, dist_hits = [], []
    for seed in EVAL_SEEDS:
        feats, labels, events, distractors = make_data(seed)
        scores = np.asarray(apply(params, jnp.asarray(feats)))
        pred = spot_events(scores, window=3, threshold=float(np.quantile(scores, 0.9)))
        gt = np.nonzero(labels)[0]
        m = average_map(pred, scores[pred] if len(pred) else np.zeros(0), gt,
                        tolerances=(2, 4, 8))
        maps.append(m["average_map"])
        # distractor confusion: fraction of distractor bumps that leak into
        # the top-|gt| scored peaks
        if len(pred):
            top = pred[np.argsort(scores[pred])[::-1][: len(gt)]]
            hits = sum(1 for d in distractors if np.min(np.abs(top - d)) <= RADIUS)
            dist_hits.append(hits / max(len(distractors), 1))
        else:
            dist_hits.append(0.0)
    return {
        "average_map": round(float(np.mean(maps)), 4),
        "map_std": round(float(np.std(maps)), 4),
        "distractor_leak": round(float(np.mean(dist_hits)), 4),
    }


def main() -> None:
    rows = {"gru": run("gru", 0), "transformer_full": run("transformer", 0)}
    curve = {}
    for w in WINDOWS:
        curve[w] = run("transformer", w)
        rows[f"transformer_w{w}"] = curve[w]
    full_map = rows["transformer_full"]["average_map"]
    knee = next(
        (w for w in WINDOWS if curve[w]["average_map"] >= 0.95 * full_map),
        None,
    )
    print(json.dumps({
        "metric": "spot_quality_synthetic",
        "T": T,
        "cue_dist": [CUE_DIST_LO, CUE_DIST_HI],
        "knee_window": knee,
        "production_default_window": 1024,
        **rows,
    }))


if __name__ == "__main__":
    main()
