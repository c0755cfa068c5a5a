"""Golden parity tests for frame preprocessing against cv2 semantics.

The reference normalizes min-max over the whole frame then cv2.resize's to
40×40 (utils.py:283-292).  These tests re-create that exact host pipeline with
cv2 and check the batched XLA path matches to float tolerance.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cvml_goalnet_tpu.ops.preprocess import (
    _axis_slice_plan,
    normalize_frames,
    preprocess_frames,
    resize_bilinear,
    resize_bilinear_sliced,
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


class TestSlicedResize:
    """The static-slice resize (no materialized cast intermediate) must use
    the SAME taps/weights as the matmul path — production shape is exact."""

    def test_production_shape_bit_exact(self, rng):
        frames = rng.integers(0, 256, (6, 180, 320, 3), dtype=np.uint8)
        a = np.asarray(resize_bilinear(jnp.asarray(frames), (40, 40)))
        b = np.asarray(resize_bilinear_sliced(jnp.asarray(frames), (40, 40)))
        assert b is not None
        np.testing.assert_array_equal(a, b)  # identical taps, ≤4-term sums

    @pytest.mark.parametrize("hw", [(72, 96), (120, 160), (90, 160)])
    def test_other_downscales_match_matmul(self, hw, rng):
        frames = rng.integers(0, 256, (4, *hw, 3), dtype=np.uint8)
        b = resize_bilinear_sliced(jnp.asarray(frames), (40, 40))
        if b is None:  # no periodic plan for this ratio — fallback covers it
            pytest.skip(f"{hw} has no slice plan")
        a = np.asarray(resize_bilinear(jnp.asarray(frames), (40, 40)))
        np.testing.assert_allclose(np.asarray(b), a, atol=1e-4)

    def test_matches_cv2(self, rng):
        frames = rng.random((4, 180, 320, 3)).astype(np.float32)
        b = np.asarray(resize_bilinear_sliced(jnp.asarray(frames), (40, 40)))
        want = np.stack([
            cv2.resize(f, (40, 40), interpolation=cv2.INTER_LINEAR) for f in frames])
        np.testing.assert_allclose(b, want, atol=2e-5)

    def test_upscale_has_no_plan(self):
        # edge-clamped taps: the periodic decomposition must refuse, and
        # preprocess_frames must silently fall back to the matmul path
        assert _axis_slice_plan(20, 40) is None
        rng = np.random.default_rng(3)
        frames = rng.integers(0, 256, (2, 20, 20, 3), dtype=np.uint8)
        auto = np.asarray(preprocess_frames(jnp.asarray(frames), (40, 40)))
        mat = np.asarray(preprocess_frames(
            jnp.asarray(frames), (40, 40), 1e-7, jnp.float32, "matmul"))
        np.testing.assert_array_equal(auto, mat)
        with pytest.raises(ValueError, match="no.*static-slice plan"):
            preprocess_frames(jnp.asarray(frames), (40, 40), 1e-7, jnp.float32, "sliced")

    def test_preprocess_auto_equals_sliced_on_production_shape(self, rng):
        frames = rng.integers(0, 256, (3, 180, 320, 3), dtype=np.uint8)
        auto = np.asarray(preprocess_frames(jnp.asarray(frames), (40, 40)))
        sl = np.asarray(preprocess_frames(
            jnp.asarray(frames), (40, 40), 1e-7, jnp.float32, "sliced"))
        mat = np.asarray(preprocess_frames(
            jnp.asarray(frames), (40, 40), 1e-7, jnp.float32, "matmul"))
        np.testing.assert_array_equal(auto, sl)
        np.testing.assert_array_equal(sl, mat)  # bit-exact at this shape

    def test_identity_ratio(self, rng):
        # src == dst: period 1, stride 1, frac 0 — plan exists and is a copy
        frames = rng.random((2, 40, 40, 3)).astype(np.float32)
        b = resize_bilinear_sliced(jnp.asarray(frames), (40, 40))
        assert b is not None
        np.testing.assert_allclose(np.asarray(b), frames, atol=1e-6)


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
