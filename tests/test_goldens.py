"""Golden-output regression tests: public API locked to frozen fixtures.

Inputs are deterministic (seeded synthetic); outputs were frozen by
``tests/goldens/generate.py``.  A failure here means the numerics of
``extract_features`` / ``fuse`` / ``summarize`` changed — either fix the
regression or intentionally regenerate the goldens with justification.
"""

import os

import numpy as np
import jax
import pytest

from cvml_goalnet_tpu.data.synthetic import synthetic_video_frames, synthetic_waveform
from cvml_goalnet_tpu.models.avm import avm_init
from cvml_goalnet_tpu.pipeline import extract_features, fuse, summarize

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "goldens.npz")


@pytest.fixture(scope="module")
def goldens():
    if not os.path.exists(GOLDENS):
        pytest.skip("goldens not generated (tests/goldens/generate.py)")
    return np.load(GOLDENS)


@pytest.fixture(scope="module")
def cfg():
    from tests.goldens.generate import golden_cfg

    return golden_cfg()


class TestGoldens:
    def test_extract_features(self, goldens, cfg):
        frames = synthetic_video_frames(10, 48, 64, seed=3)
        wav = synthetic_waveform(22050 * 2, seed=3)
        feats = extract_features(frames, wav, cfg)
        np.testing.assert_allclose(feats["visual"], goldens["visual"], atol=1e-5)
        np.testing.assert_allclose(feats["audio"], goldens["audio"], rtol=1e-3, atol=2e-3)

    def test_fuse_scores(self, goldens, cfg):
        params, state = avm_init(jax.random.PRNGKey(11), cfg.model, cfg.preprocess, cfg.audio)
        feats = {"visual": goldens["visual"], "audio": goldens["audio"]}
        scores = fuse(params, state, feats, cfg)
        np.testing.assert_allclose(scores, goldens["scores"], atol=1e-4)

    def test_summarize(self, goldens, cfg):
        res = summarize(
            goldens["scores"], goldens["intervals"],
            cfg.preprocess.skip_frames, 10 * cfg.preprocess.skip_frames, cfg.knapsack,
        )
        np.testing.assert_array_equal(res.frame_mask, goldens["frame_mask"])
        np.testing.assert_array_equal(res.selected_clips, goldens["selected_clips"])
