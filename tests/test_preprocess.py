"""Golden parity tests for frame preprocessing against cv2 semantics.

The reference normalizes min-max over the whole frame then cv2.resize's to
40×40 (utils.py:283-292).  These tests re-create that exact host pipeline with
cv2 and check the batched XLA path matches to float tolerance.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cvml_goalnet_tpu.ops.preprocess import (
    normalize_frames,
    preprocess_frames,
    resize_bilinear,
    resize_matrices,
)

cv2 = pytest.importorskip("cv2")


def _reference_preprocess(frames, out_hw=(40, 40), eps=1e-7):
    """Direct transcription of utils.py:283-285 (per-frame, host cv2)."""
    out = []
    for image in frames:
        image = ((image - image.min()) / (image.max() - image.min() + eps)).astype(np.float32)
        image = cv2.resize(image, (out_hw[1], out_hw[0]))  # cv2 takes (w, h)
        out.append(image)
    return np.stack(out)


class TestResize:
    def test_matrix_rows_sum_to_one(self):
        rh, rw = resize_matrices(72, 96, 40, 40)
        np.testing.assert_allclose(rh.sum(1), 1.0, atol=1e-6)
        np.testing.assert_allclose(rw.sum(1), 1.0, atol=1e-6)

    @pytest.mark.parametrize("hw", [(72, 96), (48, 64), (120, 160)])
    def test_matches_cv2_linear(self, hw, rng):
        frames = rng.random((4, *hw, 3)).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(frames), (40, 40)))
        want = np.stack([cv2.resize(f, (40, 40), interpolation=cv2.INTER_LINEAR) for f in frames])
        np.testing.assert_allclose(ours, want, atol=2e-5)

    def test_upscale(self, rng):
        frames = rng.random((2, 20, 20, 3)).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(frames), (40, 40)))
        want = np.stack([cv2.resize(f, (40, 40)) for f in frames])
        np.testing.assert_allclose(ours, want, atol=2e-5)


class TestNormalize:
    def test_joint_minmax(self, rng):
        frames = rng.integers(3, 250, (3, 8, 8, 3)).astype(np.float32)
        out = np.asarray(normalize_frames(jnp.asarray(frames)))
        for i, f in enumerate(frames):
            want = (f - f.min()) / (f.max() - f.min() + 1e-7)
            np.testing.assert_allclose(out[i], want, atol=1e-6)


class TestEndToEnd:
    def test_matches_reference_pipeline(self, rng):
        frames = rng.integers(0, 255, (6, 72, 96, 3)).astype(np.float32)
        ours = np.asarray(preprocess_frames(jnp.asarray(frames), (40, 40)))
        want = _reference_preprocess(frames)
        np.testing.assert_allclose(ours, want, atol=5e-5)

    def test_uint8_input(self, rng):
        frames = rng.integers(0, 255, (2, 60, 80, 3), dtype=np.uint8)
        ours = np.asarray(preprocess_frames(jnp.asarray(frames), (40, 40)))
        want = _reference_preprocess(frames.astype(np.float32))
        np.testing.assert_allclose(ours, want, atol=5e-5)


def test_reordered_equals_normalize_first_oracle():
    """preprocess_frames computes resize-then-affine-normalize; it must equal
    the literal normalize-then-resize order (bilinear rows sum to 1)."""
    from cvml_goalnet_tpu.ops.preprocess import (
        preprocess_frames, preprocess_frames_normalize_first)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (6, 90, 160, 3)).astype(np.uint8)
    a = np.asarray(preprocess_frames(jnp.asarray(frames), (40, 40)))
    b = np.asarray(preprocess_frames_normalize_first(jnp.asarray(frames), (40, 40)))
    np.testing.assert_allclose(a, b, atol=2e-6)
    # constant frame: degenerate min==max must not NaN
    const = np.full((2, 50, 50, 3), 7, np.uint8)
    out = np.asarray(preprocess_frames(jnp.asarray(const), (40, 40)))
    assert np.isfinite(out).all()
