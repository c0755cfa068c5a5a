"""Spotting quality at PRODUCTION scale: W=1024 measured, not extrapolated.

Round-3 VERDICT missing #2 / next #3: the previous version ran at T=1024
with windows ≤512, so the production default ``temporal_window=1024`` sat
OFF the measured curve, and the GRU beat every transformer variant.  This
version scales the synthetic to T=8192 with a cue horizon of 256–768 frames
(~2–6.5 minutes of condensed match at 2 fps) so that:

* the window sweep CONTAINS the production default (W ∈ {64, …, 1024, 2048});
* the knee sits at W ≈ CUE_HI = 768 — W=1024 is measured just above it;
* the GRU must carry the precursor cue across hundreds of frames of noise
  through a fixed-size recurrent state (the regime the banded transformer
  was built for), instead of the T=1024 toy regime where its recurrence
  span was short enough to win.

Task semantics (unchanged from round 3 — what made the bench discriminate):
a true event is an evidence bump PRECEDED by a precursor cue
``CUE_LO..CUE_HI`` frames earlier; distractor bumps (same local evidence, no
cue) and cue-only confusers must be rejected; labels are jittered; eval
timelines are HELD OUT.

New rows:

* ``oracle`` — a feature-level ceiling: score = local bump evidence gated by
  the max cue evidence in the trailing ``[CUE_LO, CUE_HI]`` horizon, read
  straight off the generative channels.  No scorer can beat it (it uses the
  true generative rule); the gap between it and 1.0 is label jitter + peak
  extraction + feature noise, which makes every other row interpretable.
* the flagship verdict — ``flagship_beats_gru`` compares the banded
  transformer at the PRODUCTION window (the W=1024 sweep row) against the
  GRU; a separate 2-layer/dim-64 capacity probe at the same window is
  reported win-or-lose.

Scale knobs (env): ``GOALNET_SPOTQ_T`` (default 8192),
``GOALNET_SPOTQ_EPOCHS`` (default 120), ``GOALNET_SPOTQ_FLASH=1`` to train
through the Pallas banded/flash kernels (default on accelerators),
``GOALNET_SPOTQ_FAMILY`` ∈ {a, b} — generator family (b = compound-cue:
multiplicative cue interaction, variable lag, overlapping events; see
:func:`make_data_b`).  The scorer-ordering claim is reported per family so
it cannot be an artifact of one generative rule (round-5 VERDICT #4).

CPU smoke: ``GOALNET_PLATFORM=cpu GOALNET_SPOTQ_T=512
GOALNET_SPOTQ_EPOCHS=20 python benchmarks/spot_quality_bench.py``
(cue horizon and windows scale with T).
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

T = int(os.environ.get("GOALNET_SPOTQ_T", 8192))
D = 16
HIDDEN = 32
EPOCHS = int(os.environ.get("GOALNET_SPOTQ_EPOCHS", 240))
# precursor lead time: a NARROW band 640–768 frames back at the production
# scale (scaled with T).  The band must be narrow relative to the event
# spacing: a cue "belongs" to a bump iff it falls in the trailing band, so
# band_width × cue_density is the task's intrinsic confusion rate — keep it
# ~0.1 or the task stops being discriminable for ANY scorer (the oracle row
# measures exactly this floor).
CUE_LO, CUE_HI = 5 * T // 64, 3 * T // 32
RADIUS = 3                           # evidence bump radius
JITTER = 2                           # label offset vs evidence center
# events+distractors+confusers: sized so that band_width × cue_density ≈ 0.1
N_SLOTS = 3 * max(4, round(0.12 * T / (CUE_HI - CUE_LO + 1)))
# sweep brackets the production default W=1024 (measured, not extrapolated):
# knee must land between T//16=512 (sees nothing of the 640.. band) and
# T//8=1024 (covers it fully)
WINDOWS = tuple(w for w in (T // 128, T // 32, T // 16, T // 8, T // 4) if w >= 4)
FLAGSHIP_W = T // 8                  # = 1024 at the production scale
USE_FLASH = os.environ.get(
    "GOALNET_SPOTQ_FLASH", "0" if jax.default_backend() == "cpu" else "1") == "1"


# Generator family (GOALNET_SPOTQ_FAMILY): "a" = the round-3/4 additive
# narrow-band-cue rule below; "b" = the compound-cue family (round-5 VERDICT
# #4: every quality number came from ONE generative rule, so the scorer
# ordering could be a property of that rule — family B changes the rule's
# STRUCTURE, not just its constants, and the CI is run on both).
FAMILY = os.environ.get("GOALNET_SPOTQ_FAMILY", "a")
# family B cue-lag band: twice as wide, at a different horizon (256..512 at
# T=8192 vs A's 640..768)
CUE_B_LO, CUE_B_HI = T // 32, T // 16


def make_data_b(seed: int):
    """Family B ("compound cue") — same API as :func:`make_data`, three
    structural changes to the generative rule:

    * **multiplicative cue**: the precursor is the CO-ACTIVATION of channels
      4 AND 5; each channel alone also fires (partial-cue distractors), so
      the detector must learn a product interaction, not a channel sum —
      family A's cue is purely additive on one channel;
    * **variable lag over a wide band**: the cue leads its event by a
      uniform draw from ``CUE_B_LO..CUE_B_HI`` (width T/32 vs A's T/64, at
      a different horizon), so no single fixed offset explains the data;
    * **overlapping events**: events arrive in bursts of 1–3 with bumps as
      close as 2 frames, superimposing additively — family A enforces
      ≥2·RADIUS+4 separation, so A never tests peak disentangling.

    Negatives: bump + ONE cue channel in-band (partial cue — harder than
    A's cue-free distractor) and full compound cues with no bump.
    """
    rng = np.random.default_rng(seed + 1_000_003)  # disjoint stream vs A
    feats = rng.standard_normal((T, D)).astype(np.float32) * 0.3

    def add_bump(pos):
        lo, hi = max(0, pos - RADIUS), min(T, pos + RADIUS + 1)
        feats[lo:hi, 0] += np.linspace(1.0, 2.0, hi - lo)
        feats[lo:hi, 1] += 1.5

    def add_cue(pos, channels=(4, 5)):
        lo, hi = max(0, pos - 1), min(T, pos + 2)
        for c in channels:
            feats[lo:hi, c] += 2.0

    margin = CUE_B_HI + 4 * RADIUS
    band_w = CUE_B_HI - CUE_B_LO + 1
    # burst centers sized so compound-cue density × band width ≈ 0.15
    n_bursts = 3 * max(3, round(0.05 * T / band_w))
    centers = rng.choice(np.arange(margin, T - margin), n_bursts, replace=False)
    rng.shuffle(centers)
    n = n_bursts // 3
    ev_centers, distractors, cue_only = centers[:n], centers[n:2 * n], centers[2 * n:3 * n]

    labels = np.zeros(T, np.float32)
    events = []
    for c in ev_centers:
        # 1-3 overlapping events per burst, bumps can superimpose
        for k in range(int(rng.integers(1, 4))):
            e = int(np.clip(c + k * int(rng.integers(2, 3 * RADIUS)), 0, T - 1))
            add_bump(e)
            add_cue(e - int(rng.integers(CUE_B_LO, CUE_B_HI + 1)))
            labels[int(np.clip(e + rng.integers(-JITTER, JITTER + 1), 0, T - 1))] = 1.0
            events.append(e)
    for d in distractors:   # bump + PARTIAL cue (one channel) → must reject
        add_bump(int(d))
        add_cue(int(d) - int(rng.integers(CUE_B_LO, CUE_B_HI + 1)),
                channels=(int(rng.integers(4, 6)),))
    for c in cue_only:      # full compound cue, no bump → must reject
        add_cue(int(c))
    return feats, labels, np.sort(np.array(events)), np.sort(np.asarray(distractors))


def oracle_scores_b(feats: np.ndarray) -> np.ndarray:
    """Family-B ceiling: bump evidence gated by the trailing-window max of
    the COMPOUND cue product relu(c4)·relu(c5) over ``[t−CUE_B_HI, t−CUE_B_LO]``."""
    bump = np.maximum(feats[:, 1], 0.0)
    compound = np.maximum(feats[:, 4], 0.0) * np.maximum(feats[:, 5], 0.0)
    win = CUE_B_HI - CUE_B_LO + 1
    pad = np.concatenate([np.zeros(CUE_B_HI, np.float32), compound])
    gate = np.array([pad[t : t + win].max() for t in range(feats.shape[0])],
                    np.float32)
    return bump * gate


def make_data(seed: int):
    """→ (feats (T, D), labels (T,), events, distractors)."""
    if FAMILY == "b":
        return make_data_b(seed)
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

    margin = CUE_HI + 2 * RADIUS
    slots = rng.choice(np.arange(margin, T - margin), N_SLOTS, replace=False)
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
        add_cue(e - int(rng.integers(CUE_LO, CUE_HI + 1)))
        labels[int(np.clip(e + rng.integers(-JITTER, JITTER + 1), 0, T - 1))] = 1.0
    for d in distractors:   # same bump, NO cue → must reject
        add_bump(d)
    for c in cue_only:      # cue, no bump → must reject
        add_cue(c)
    return feats, labels, np.sort(events), np.sort(distractors)


TRAIN_SEEDS = tuple(range(12))      # few events per timeline now → more timelines
EVAL_SEEDS = tuple(range(20, 28))   # HELD OUT: train==eval would let learned
                            # positions memorize event locations (the round-2
                            # benchmark's failure mode — everything aced it)


def oracle_scores(feats: np.ndarray) -> np.ndarray:
    """Feature-level ceiling: bump evidence gated by trailing cue evidence.

    Uses the generative rule directly — channel 1 carries the bump (+1.5),
    channel 2 the cue (+2.0); a frame scores high iff its local bump
    evidence co-occurs with cue evidence ``CUE_LO..CUE_HI`` frames back.
    Dispatches to the family-B rule when that generator is active.
    """
    if FAMILY == "b":
        return oracle_scores_b(feats)
    bump = np.maximum(feats[:, 1], 0.0)
    cue = np.maximum(feats[:, 2], 0.0)
    # trailing-window max of cue over [t-CUE_HI, t-CUE_LO]
    win = CUE_HI - CUE_LO + 1
    pad = np.concatenate([np.zeros(CUE_HI, np.float32), cue])
    gate = np.array([
        pad[t : t + win].max() for t in range(feats.shape[0])
    ], np.float32)
    return bump * gate


def evaluate(apply, params) -> dict:
    maps, dist_hits = [], []
    for seed in EVAL_SEEDS:
        feats, labels, events, distractors = make_data(seed)
        if params is None:
            scores = oracle_scores(feats)
        else:
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


def run(scorer: str, window: int, num_layers: int = 1, model_dim: int = 32,
        init_seed: int = 0):
    if scorer == "oracle":
        return evaluate(None, None)
    # identical budget + schedule for every contender: cosine decay to 5%
    # with a short warmup over the full step count (the round-3 fixed-lr
    # runs left everything undertrained on the cue-validation signal)
    total_steps = EPOCHS * len(TRAIN_SEEDS)
    sched = ("cosine", max(1, total_steps // 20), total_steps, 0.05)
    if scorer == "gru":
        from cvml_goalnet_tpu.models.temporal import temporal_scorer_apply

        params = temporal_scorer_init(jax.random.PRNGKey(init_seed), D, HIDDEN)
        step = make_spotting_train_step(HIDDEN, lr=5e-3, lr_schedule=sched)
        apply = lambda p, f: temporal_scorer_apply(p, f, HIDDEN)
    elif scorer == "hybrid":
        # GRU-augmented banded transformer (models/temporal_hybrid): the two
        # tied contenders composed — recurrent global context + direct cue
        # attention.  Same budget/schedule as everything else.
        from cvml_goalnet_tpu.models.temporal_hybrid import (
            temporal_hybrid_apply, temporal_hybrid_init)

        params = temporal_hybrid_init(
            jax.random.PRNGKey(init_seed), D, HIDDEN, model_dim=model_dim,
            num_layers=num_layers, num_heads=2, max_len=T,
            pos_encoding="rotary")
        step = make_spotting_train_step(
            HIDDEN, lr=5e-3, scorer="hybrid", num_heads=2, window=window,
            use_flash=USE_FLASH, lr_schedule=sched)
        apply = lambda p, f: temporal_hybrid_apply(
            p, f, HIDDEN, 2, USE_FLASH, False, window)
    else:
        # rotary positions: attention logits depend on (i − j) only — the
        # right inductive bias for "validate against a cue 640–768 frames
        # back", and it generalizes across held-out event positions where a
        # learned absolute table could only memorize training positions
        params = temporal_transformer_init(
            jax.random.PRNGKey(init_seed), D, model_dim=model_dim,
            num_layers=num_layers, num_heads=2, max_len=T,
            pos_encoding="rotary")
        step = make_spotting_train_step(
            0, lr=5e-3, scorer="transformer", num_heads=2, window=window,
            use_flash=USE_FLASH, lr_schedule=sched)
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_apply)
        apply = lambda p, f: temporal_transformer_apply(
            p, f, 2, USE_FLASH, False, window)
    opt = init_spotting_opt(params)
    train_data = [make_data(s) for s in TRAIN_SEEDS]
    for _ in range(EPOCHS):
        for feats, labels, _, _ in train_data:
            params, opt, _ = step(params, opt, jnp.asarray(feats), jnp.asarray(labels))
    return evaluate(apply, params)


def main_ci(n_seeds: int, num_layers: int = 1, model_dim: int = 32) -> None:
    """``--ci [N]``: the flagship-vs-GRU verdict with an INIT-SEED confidence
    interval (the full sweep trains each contender once from PRNGKey(0); the
    round-4 table's 0.514-vs-0.501 margin is within one eval-seed σ, so the
    "matches or beats" claim needs the seed axis measured, not assumed).
    Trains ONLY the two contenders that decide the verdict, ``N`` init seeds
    each, same data/budget/schedule as the sweep; reports per-seed mAPs,
    mean±σ, and the paired per-seed wins.  ``--ci-layers L --ci-dim D`` set
    the flagship capacity (the sweep's l2d64 probe led the seed-0 table —
    the CI decides whether that holds across seeds)."""
    out = {"metric": "spot_quality_ci", "T": T, "n_seeds": n_seeds,
           "family": FAMILY,
           "flagship_config": {"window": FLAGSHIP_W, "num_layers": num_layers,
                               "model_dim": model_dim}}
    flagship_scorer = "hybrid" if "--ci-hybrid" in sys.argv else "transformer"
    out["flagship_config"]["scorer"] = flagship_scorer
    # free ceiling row — makes the learned rows interpretable per family
    out["oracle"] = run("oracle", 0)
    pairs = []
    for name, kw in (("gru", dict(scorer="gru", window=0)),
                     ("flagship", dict(scorer=flagship_scorer, window=FLAGSHIP_W,
                                       num_layers=num_layers, model_dim=model_dim))):
        per_seed = [run(init_seed=s, **kw) for s in range(n_seeds)]
        maps = [r["average_map"] for r in per_seed]
        leaks = [r["distractor_leak"] for r in per_seed]
        out[name] = {
            "maps": maps,
            "map_mean": round(float(np.mean(maps)), 4),
            "map_std": round(float(np.std(maps)), 4),
            "leak_mean": round(float(np.mean(leaks)), 4),
        }
        pairs.append(maps)
        print(f"{name}: {maps}", flush=True)
    wins = sum(1 for g, f in zip(*pairs) if f >= g)
    out["flagship_wins_per_seed"] = f"{wins}/{n_seeds}"
    out["flagship_beats_gru_mean"] = out["flagship"]["map_mean"] >= out["gru"]["map_mean"]
    out["paired"] = paired_stats(pairs[0], pairs[1])
    print(json.dumps(out))


def paired_stats(gru_maps, flagship_maps) -> dict:
    """Paired per-seed analysis (round-5 VERDICT #3: the round-4 "measured
    WIN" was 2/3 wins with overlapping ±1σ — the seed axis is PAIRED, so
    test the per-seed deltas, not the marginal means).

    * exact two-sided sign-flip permutation test on the mean delta (all 2^n
      sign assignments — exact at n ≤ ~16, no normality assumption);
    * bootstrap 95% CI of the mean delta (10k resamples, fixed seed).
    """
    deltas = np.asarray(flagship_maps, np.float64) - np.asarray(gru_maps, np.float64)
    n = len(deltas)
    mean_d = float(deltas.mean())
    signs = np.array(
        [[1 if (m >> k) & 1 else -1 for k in range(n)] for m in range(2 ** n)],
        np.float64)
    perm_means = signs @ deltas / n
    p = float(np.mean(np.abs(perm_means) >= abs(mean_d) - 1e-12))
    bs = np.random.default_rng(0).choice(deltas, (10_000, n)).mean(axis=1)
    lo, hi = np.percentile(bs, [2.5, 97.5])
    return {
        "deltas": [round(float(d), 4) for d in deltas],
        "delta_mean": round(mean_d, 4),
        "p_sign_flip_two_sided": round(p, 4),
        "delta_ci95_bootstrap": [round(float(lo), 4), round(float(hi), 4)],
        "significant_at_05": bool(p < 0.05),
    }


def main() -> None:
    if "--ci" in sys.argv:
        idx = sys.argv.index("--ci")
        n = int(sys.argv[idx + 1]) if len(sys.argv) > idx + 1 else 3

        def _flag(name, default):
            return int(sys.argv[sys.argv.index(name) + 1]) \
                if name in sys.argv else default

        main_ci(n, num_layers=_flag("--ci-layers", 1),
                model_dim=_flag("--ci-dim", 32))
        return
    rows = {
        "oracle": run("oracle", 0),
        "gru": run("gru", 0),
        "transformer_full": run("transformer", 0),
    }
    curve = {}
    for w in WINDOWS:
        curve[w] = run("transformer", w)
        rows[f"transformer_w{w}"] = curve[w]
    # capacity probe at the production window (VERDICT r3 #3 asked for more
    # layers/width to be TRIED at bench scale — reported, win or lose)
    rows["probe_w%d_l2d64" % FLAGSHIP_W] = run(
        "transformer", FLAGSHIP_W, num_layers=2, model_dim=64)
    # knee vs the best scorer on the curve (banded can EXCEED full attention
    # here — full must attend over 8k frames of distractors, the band only
    # over the cue horizon)
    best = max(r["average_map"] for r in (*curve.values(), rows["transformer_full"]))
    knee = next(
        (w for w in WINDOWS if curve[w]["average_map"] >= 0.95 * best),
        None,
    )
    flagship = curve.get(FLAGSHIP_W, rows["transformer_full"])
    print(json.dumps({
        "metric": "spot_quality_synthetic",
        "T": T,
        "family": FAMILY,
        "cue_dist": [CUE_B_LO, CUE_B_HI] if FAMILY == "b" else [CUE_LO, CUE_HI],
        "knee_window": knee,
        "production_default_window": 1024,
        "flagship_window": FLAGSHIP_W,
        "flagship_beats_gru": flagship["average_map"] >= rows["gru"]["average_map"],
        **rows,
    }))


if __name__ == "__main__":
    main()
