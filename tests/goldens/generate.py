"""Golden-fixture generator: freeze public-API outputs on fixed inputs.

SURVEY.md §7.2 step 1: "Golden data + parity harness first … tolerance tests
for every stage."  This script materializes deterministic inputs and the
CURRENT outputs of the public surfaces (``extract_features`` visual/audio,
``fuse`` scores, ``summarize`` masks/selection) into ``goldens.npz``; the
paired test (``tests/test_goldens.py``) then locks future rounds to these
values within float tolerance, so cross-round refactors can't silently shift
numerics.

Regenerate (ONLY after an intentional numerics change, with justification in
the commit message):

    GOALNET_PLATFORM=cpu python tests/goldens/generate.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from cvml_goalnet_tpu.config import (
    AudioConfig,
    ModelConfig,
    PipelineConfig,
    PreprocessConfig,
    TrainConfig,
)
from cvml_goalnet_tpu.data.synthetic import synthetic_change_points, synthetic_video_frames, synthetic_waveform
from cvml_goalnet_tpu.models.avm import avm_init
from cvml_goalnet_tpu.pipeline import extract_features, fuse, summarize

OUT = os.path.join(os.path.dirname(__file__), "goldens.npz")


def golden_cfg() -> PipelineConfig:
    return PipelineConfig(
        preprocess=PreprocessConfig(skip_frames=30, frame_size=(24, 24)),
        audio=AudioConfig(n_fft=512, hop_length=128, n_mels=40, n_mfcc=13, bin_length=12),
        model=ModelConfig(
            vis_channels=(8, 16, 16), vis_feature_dim=32,
            aud_channels=(8, 16), aud_feature_dim=16, fusion_hidden=(32, 16),
        ),
        train=TrainConfig(seed=7),
    )


def main() -> None:
    cfg = golden_cfg()
    frames = synthetic_video_frames(10, 48, 64, seed=3)
    wav = synthetic_waveform(22050 * 2, seed=3)
    feats = extract_features(frames, wav, cfg)

    params, state = avm_init(jax.random.PRNGKey(11), cfg.model, cfg.preprocess, cfg.audio)
    scores = fuse(params, state, feats, cfg)

    full_n = 10 * cfg.preprocess.skip_frames
    intervals = synthetic_change_points(full_n, 7, seed=5)
    res = summarize(scores, intervals, cfg.preprocess.skip_frames, full_n, cfg.knapsack)

    np.savez_compressed(
        OUT,
        visual=feats["visual"],
        audio=feats["audio"],
        scores=scores,
        frame_mask=res.frame_mask,
        selected_clips=np.asarray(res.selected_clips, np.int64),
        intervals=intervals,
    )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
