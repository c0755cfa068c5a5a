"""Random-init chance baseline harness.

Capability parity with reference ``baseline.py:12-135``: evaluate N freshly
random-initialized models on the train+val sets (no-grad forward + knapsack
F-scores) and report the mean and best ("opt") loss / F-scores — the
chance-level floor that trained models must clear (report §4.2).
"""

from __future__ import annotations

import numpy as np
import jax

from cvml_goalnet_tpu.config import PipelineConfig
from cvml_goalnet_tpu.data.dataset import build_datasets
from cvml_goalnet_tpu.train.loop import _video_fscores, eval_video
from cvml_goalnet_tpu.train.state import create_train_state


def evaluate_random_models(cfg: PipelineConfig, train_ds, val_ds, n_samples: int = 10, seed: int = 0):
    """Evaluate ``n_samples`` random AVMs → per-sample metric dict lists.

    Same input guards as ``train_importance_model``: items need labels (a
    chance floor against the zero-label inference fallback is meaningless)
    and annotator masks; an empty val set is skipped rather than NaN-ing the
    reported floor (round-3 review).
    """
    for ds_name, ds in (("train_ds", train_ds), ("val_ds", val_ds)):
        for item in ds:
            if item.labels is None:
                raise ValueError(f"{ds_name} item {item.video_id!r} has no labels")
            if item.gd_summary_masks is None:
                raise ValueError(
                    f"{ds_name} item {item.video_id!r} has no annotator masks")
    metrics = {k: [] for k in ("train_loss", "train_f_avg", "train_f_max", "val_loss", "val_f_avg", "val_f_max")}
    for s in range(n_samples):
        state = create_train_state(jax.random.PRNGKey(seed + s), cfg)

        def run(ds):
            losses, favg, fmax = [], [], []
            for item in ds:
                preds, loss = eval_video(state, item, cfg)
                fa, fm = _video_fscores(item, preds, cfg)
                losses.append(loss)
                favg.append(fa)
                fmax.append(fm)
            if not losses:
                return None
            return float(np.mean(losses)), float(np.mean(favg)), float(np.mean(fmax))

        tr = run(train_ds)
        vl = run(val_ds)
        for k, v in zip(("train_loss", "train_f_avg", "train_f_max"), tr):
            metrics[k].append(v)
        if vl is not None:
            for k, v in zip(("val_loss", "val_f_avg", "val_f_max"), vl):
                metrics[k].append(v)
    return metrics


def summarize_baseline(metrics: dict) -> dict:
    """Mean + opt aggregation (reference ``baseline.py:131-135``)."""
    out = {}
    for k, vals in metrics.items():
        if not vals:  # e.g. empty val set — skipped, not NaN-reported
            continue
        out[f"mean_{k}"] = float(np.mean(vals))
        out[f"opt_{k}"] = float(np.min(vals) if "loss" in k else np.max(vals))
    return out


def run_random_baseline(
    cfg: PipelineConfig,
    video_fps,
    annotation_fp,
    mat_fp,
    h5_fp,
    n_samples: int = 10,
) -> dict:
    train_ds, val_ds = build_datasets(
        video_fps, cfg, annotation_fp, mat_fp, h5_fp,
        audio_included=cfg.model.audio_included,
    )
    metrics = evaluate_random_models(cfg, train_ds, val_ds, n_samples)
    return summarize_baseline(metrics)
