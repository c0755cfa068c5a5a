"""End-to-end learning validation on learnable synthetic data.

The reference's scientific claim is the improvement of F-score over the
random-init baseline (report Table 2 "Improvement (ΔF-avg)").  Here synthetic
videos carry a learnable signal — frame importance is a function of frame
brightness — so the full pipeline (preprocess → AVM → train scan → knapsack →
F-score) must demonstrably learn: training loss collapses and the trained
model's predictions correlate with ground truth far better than at init.
"""

import numpy as np
import jax
import pytest

from cvml_goalnet_tpu.data.dataset import VideoDataset, VideoItem
from cvml_goalnet_tpu.data.synthetic import synthetic_change_points
from cvml_goalnet_tpu.pipeline import summarize
from cvml_goalnet_tpu.train.loop import (
    eval_video,
    evaluate_dataset,
    train_importance_model,
)
from cvml_goalnet_tpu.train.state import create_train_state


def _learnable_item(cfg, n=40, seed=0, noise=0.1):
    """Frames whose joint-normalized brightness pattern encodes importance."""
    rng = np.random.default_rng(seed)
    h, w = cfg.preprocess.frame_size
    grades = rng.integers(1, 6, n).astype(np.float32)
    frames = np.empty((n, h, w, 3), np.float32)
    for i, g in enumerate(grades):
        # distinct spatial pattern per grade + mild noise
        yy, xx = np.mgrid[0:h, 0:w]
        base = 0.5 + 0.5 * np.sin(g * (yy + xx) / 7.0)
        frames[i] = base[..., None] + rng.normal(0, noise, (h, w, 3))
    audio = rng.random((n, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32)
    full_n = n * cfg.preprocess.skip_frames
    intervals = synthetic_change_points(full_n, 8, seed=seed)
    masks = []
    for a in range(20):
        noisy = np.clip(grades + rng.normal(0, 0.5, n), 1, 5)
        res = summarize(noisy, intervals, cfg.preprocess.skip_frames, full_n, cfg.knapsack)
        masks.append(res.frame_mask)
    return VideoItem(
        video_id=f"learn{seed}", title=f"learn{seed}",
        visual=frames, audio=audio, labels=grades,
        gd_summary_masks=np.stack(masks), full_n_frames=full_n,
        clip_intervals=intervals,
    )


@pytest.mark.slow
class TestEndToEndLearning:
    def test_model_learns_brightness_signal(self, small_cfg):
        cfg = small_cfg
        train_ds = VideoDataset([_learnable_item(cfg, seed=0), _learnable_item(cfg, seed=1)])
        val_ds = VideoDataset([_learnable_item(cfg, seed=2)])
        state = create_train_state(jax.random.PRNGKey(0), cfg)

        init_preds, _ = eval_video(state, val_ds[0], cfg)
        _, init_f_avg, _ = evaluate_dataset(state, val_ds, cfg)
        best, history = train_importance_model(
            cfg, train_ds, val_ds, state, num_epochs=25, verbose=False
        )
        final_preds, _ = eval_video(best, val_ds[0], cfg)

        # loss collapses on train
        assert history["train_loss"][-1] < history["train_loss"][0] * 0.5

        labels = val_ds[0].labels
        def corr(p):
            if np.std(p) < 1e-6:
                return 0.0
            return float(np.corrcoef(p, labels)[0, 1])

        assert corr(final_preds) > max(corr(init_preds), 0.0) + 0.2

        # the reference's headline scientific claim is the F-score
        # improvement over the random-init baseline (report Table 2,
        # "Improvement ΔF-avg" — 0.1667 for AVM): the full pipeline
        # (scores → knapsack summary → F vs the 20 annotator masks) must
        # improve on HELD-OUT video, not just the correlation
        _, best_f_avg, _ = evaluate_dataset(best, val_ds, cfg)
        assert best_f_avg > init_f_avg + 0.02, (init_f_avg, best_f_avg)
