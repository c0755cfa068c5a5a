"""End-to-end walkthrough: synthetic dataset → train → infer → summary mp4.

Runs entirely on CPU in about a minute:

    GOALNET_PLATFORM=cpu python examples/train_and_summarize.py

Mirrors the reference's workflow (train → best checkpoint → summarize a
video) on a generated TVSum-format dataset, exercising the same code paths
the CLI uses.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cvml_goalnet_tpu.utils import apply_platform_override

apply_platform_override()

import jax

from cvml_goalnet_tpu.config import (
    AudioConfig, ModelConfig, PipelineConfig, PreprocessConfig, TrainConfig,
)
from cvml_goalnet_tpu.data.dataset import build_datasets
from cvml_goalnet_tpu.data.synthetic import synthetic_dataset_dir
from cvml_goalnet_tpu.pipeline import fuse, summarize
from cvml_goalnet_tpu.train.loop import train_importance_model
from cvml_goalnet_tpu.train.state import create_train_state
from cvml_goalnet_tpu.viz import generate_metric_plots


def main() -> None:
    work = tempfile.mkdtemp(prefix="goalnet_example_")
    print(f"workdir: {work}")
    meta = synthetic_dataset_dir(os.path.join(work, "data"), full_n_frames=300)

    cfg = PipelineConfig(
        preprocess=PreprocessConfig(frame_size=(24, 24)),
        audio=AudioConfig(n_fft=512, hop_length=128, n_mels=40, n_mfcc=13, bin_length=12),
        model=ModelConfig(vis_channels=(8, 16, 16), vis_feature_dim=32,
                          aud_channels=(8, 16), aud_feature_dim=16, fusion_hidden=(32, 16)),
        train=TrainConfig(num_epochs=3, subbatch_size=5),
    )

    train_ds, val_ds = build_datasets(
        meta["video_fps"], cfg, meta["annotation_fp"],
        meta["mat_file_path"], meta["h5_file_path"], meta["info_fp"],
    )
    state = create_train_state(jax.random.PRNGKey(cfg.train.seed), cfg)
    best, history = train_importance_model(
        cfg, train_ds, val_ds, state,
        checkpoint_dir=os.path.join(work, "ckpt"), num_epochs=3,
    )
    generate_metric_plots(history, os.path.join(work, "curves.png"))

    item = val_ds[0]
    scores = fuse(best.params, best.model_state,
                  {"visual": item.visual, "audio": item.audio}, cfg)
    res = summarize(scores, item.clip_intervals, cfg.preprocess.skip_frames,
                    item.full_n_frames, cfg.knapsack)
    print(f"\nsummary: {res.frame_mask.sum()} of {item.full_n_frames} frames "
          f"({100 * res.frame_mask.mean():.1f}%), clips {res.selected_clips}")
    print(f"artifacts in {work}: ckpt/, curves.png")


if __name__ == "__main__":
    main()
