"""End-to-end parity tests for the public API: extract_features/fuse/summarize.

``summarize`` is checked against a direct transcription of the reference
postprocess chain (round → expand → clip scoring → knapsack → mask,
utils.py:606-643) on synthetic inputs.
"""

import numpy as np
import jax
import pytest

from cvml_goalnet_tpu.config import KnapsackConfig
from cvml_goalnet_tpu.data.synthetic import synthetic_change_points, synthetic_video_frames, synthetic_waveform
from cvml_goalnet_tpu.models.avm import avm_init
from cvml_goalnet_tpu.pipeline import extract_features, fuse, summarize


def _reference_postprocess(importances, clip_intervals, skip, full_n, ratio=0.15, scale=5):
    """Transcription of the reference algorithm (utils.py:606-643), host-only."""
    imp = np.round(np.asarray(importances).reshape(-1)).astype(np.int8).tolist()
    expanded = []
    if len(imp) == full_n:
        expanded = imp
    else:
        for el in imp:
            expanded += [el] * skip
        if len(expanded) >= full_n:
            expanded = expanded[:full_n]
        else:
            expanded += [expanded[-1]] * (full_n - len(expanded))
    clip_imps, clip_lens = [], []
    for a, b in clip_intervals:
        sl = expanded[a:b]
        clip_imps.append(sum(sl))
        clip_lens.append(len(sl))
    # reference knapsack (utils.py:466-510)
    weights = [int(w * scale) for w in clip_lens]
    capacity = int(int(ratio * full_n) * scale)
    n = len(clip_imps)
    K = [[0] * (capacity + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        for w in range(capacity + 1):
            if i == 0 or w == 0:
                K[i][w] = 0
            elif weights[i - 1] <= w:
                K[i][w] = max(clip_imps[i - 1] + K[i - 1][w - weights[i - 1]], K[i - 1][w])
            else:
                K[i][w] = K[i - 1][w]
    res = K[n][capacity]
    w = capacity
    sel = []
    for i in range(n, 0, -1):
        if res <= 0:
            break
        if res == K[i - 1][w]:
            continue
        sel.append(i - 1)
        res -= clip_imps[i - 1]
        w -= weights[i - 1]
    sel.reverse()
    mask = np.zeros((full_n,), np.uint8)
    for idx in sel:
        a, b = clip_intervals[idx]
        for f in range(a, min(b + 1, full_n)):
            mask[f] = 1
    return sel, mask


class TestSummarizeParity:
    @pytest.mark.parametrize("seed", range(4))
    def test_matches_reference_transcription(self, seed):
        rng = np.random.default_rng(seed)
        full_n = 600
        skip = 30
        n = full_n // skip
        scores = rng.uniform(1, 5, (n, 1)).astype(np.float32)
        intervals = synthetic_change_points(full_n, 10, seed=seed)
        want_sel, want_mask = _reference_postprocess(scores, intervals.tolist(), skip, full_n)
        res = summarize(scores, intervals, skip, full_n)
        assert res.selected_clips == want_sel
        np.testing.assert_array_equal(res.frame_mask, want_mask)

    def test_exclusive_mask_mode(self):
        intervals = np.array([[0, 10], [10, 20]])
        scores = np.array([5.0, 5.0])
        res = summarize(
            scores, intervals, 10, 20, KnapsackConfig(summary_ratio=1.0, inclusive_mask=False)
        )
        assert res.frame_mask.sum() == 20

    def test_summary_frames_concatenation(self, rng):
        full_n = 120
        frames = synthetic_video_frames(full_n, 16, 16)
        intervals = np.array([[0, 40], [40, 80], [80, 120]])
        scores = np.array([5.0, 1.0, 1.0, 1.0])
        res = summarize(scores, intervals, 30, full_n, KnapsackConfig(summary_ratio=0.4), full_frames=frames)
        assert res.summary_frames is not None
        # chosen clips use exclusive-end slices (reference utils.py:634)
        assert len(res.summary_frames) == sum(b - a for a, b in res.clip_intervals)


class TestExtractAndFuse:
    def test_full_chain_shapes(self, small_cfg):
        frames = synthetic_video_frames(8, 48, 64)
        wav = synthetic_waveform(22050 * 2)
        feats = extract_features(frames, wav, small_cfg)
        assert feats["visual"].shape == (8, *small_cfg.preprocess.frame_size, 3)
        assert feats["audio"].shape == (8, small_cfg.audio.bin_length, small_cfg.audio.n_mfcc)
        assert np.isfinite(feats["visual"]).all() and np.isfinite(feats["audio"]).all()

        params, state = avm_init(
            jax.random.PRNGKey(0), small_cfg.model, small_cfg.preprocess, small_cfg.audio
        )
        scores = fuse(params, state, feats, small_cfg)
        assert scores.shape == (8,)
        assert scores.min() >= 1.0 and scores.max() <= 5.0

    def test_visual_normalized_range(self, small_cfg):
        frames = synthetic_video_frames(4, 32, 32)
        feats = extract_features(frames, None, small_cfg)
        assert feats["audio"] is None
        assert feats["visual"].min() >= -1e-4 and feats["visual"].max() <= 1.0 + 1e-4


class TestLogMelVariant:
    def test_log_mel_end_to_end(self, small_cfg):
        """BASELINE config 2: log-mel frontend feeding the jitted fusion head."""
        import dataclasses
        import jax

        from cvml_goalnet_tpu.data.synthetic import synthetic_waveform

        cfg = dataclasses.replace(
            small_cfg, audio=dataclasses.replace(small_cfg.audio, log_mel=True)
        )
        frames = synthetic_video_frames(6, 32, 32)
        wav = synthetic_waveform(22050)
        feats = extract_features(frames, wav, cfg)
        assert feats["audio"].shape == (6, cfg.audio.bin_length, cfg.audio.n_mels)

        params, state = avm_init(jax.random.PRNGKey(0), cfg.model, cfg.preprocess, cfg.audio)
        scores = fuse(params, state, feats, cfg)
        assert scores.shape == (6,)
        assert np.isfinite(scores).all()


class TestFuseMany:
    def test_multi_video_batching(self, small_cfg):
        from cvml_goalnet_tpu.pipeline import fuse_many

        rng = np.random.default_rng(0)
        params, state = avm_init(
            jax.random.PRNGKey(0), small_cfg.model, small_cfg.preprocess, small_cfg.audio
        )
        feats = []
        for n in (4, 7, 3):
            feats.append({
                "visual": rng.random((n, *small_cfg.preprocess.frame_size, 3)).astype(np.float32),
                "audio": rng.random((n, small_cfg.audio.bin_length, small_cfg.audio.n_mfcc)).astype(np.float32),
            })
        outs = fuse_many(params, state, feats, small_cfg)
        assert [len(o) for o in outs] == [4, 7, 3]
        # identical to per-video scoring
        for f, o in zip(feats, outs):
            np.testing.assert_allclose(fuse(params, state, f, small_cfg), o, atol=1e-5)
        assert fuse_many(params, state, [], small_cfg) == []

    def test_missing_modality_raises_clearly(self, small_cfg):
        # np.concatenate over a None used to throw an opaque dtype error in
        # the batched path while fuse() guarded only text (round-3 review)
        from cvml_goalnet_tpu.pipeline import fuse, fuse_many

        rng = np.random.default_rng(1)
        params, state = avm_init(
            jax.random.PRNGKey(0), small_cfg.model, small_cfg.preprocess, small_cfg.audio
        )

        def feats(n, with_audio=True):
            f = {"visual": rng.random(
                (n, *small_cfg.preprocess.frame_size, 3)).astype(np.float32)}
            f["audio"] = (rng.random(
                (n, small_cfg.audio.bin_length, small_cfg.audio.n_mfcc)
            ).astype(np.float32) if with_audio else None)
            return f

        with pytest.raises(ValueError, match=r"features_list\[1\]\['audio'\]"):
            fuse_many(params, state, [feats(4), feats(3, with_audio=False)], small_cfg)
        with pytest.raises(ValueError, match="audio_included"):
            fuse(params, state, feats(4, with_audio=False), small_cfg)


class TestNativeFullSummarize:
    """Round-2: the all-C++ postprocess (round→expand→clip stats→knapsack→
    mask in one call) must be identical to the staged Python/XLA path."""

    @pytest.mark.parametrize("seed", range(6))
    def test_matches_staged_path(self, seed):
        from cvml_goalnet_tpu.runtime import native_knapsack_available

        if not native_knapsack_available():
            pytest.skip("native runtime unavailable")
        rng = np.random.default_rng(seed)
        n_cond = int(rng.integers(5, 60))
        skip = int(rng.integers(2, 40))
        full_n = n_cond * skip - int(rng.integers(0, skip))
        imp = rng.uniform(1.0, 5.0, n_cond).astype(np.float32)
        from cvml_goalnet_tpu.data.synthetic import synthetic_change_points

        intervals = synthetic_change_points(full_n, int(rng.integers(2, 9)), seed=seed)
        for inclusive in (True, False):
            kcfg = KnapsackConfig(inclusive_mask=inclusive)
            staged = summarize(imp, intervals, skip, full_n, kcfg)
            native = summarize(imp, intervals, skip, full_n, kcfg,
                               knapsack_engine="native-full")
            assert staged.selected_clips == native.selected_clips, (seed, inclusive)
            np.testing.assert_array_equal(staged.frame_mask, native.frame_mask)
            np.testing.assert_array_equal(
                np.asarray(staged.clip_intervals), np.asarray(native.clip_intervals))

    def test_clamped_and_empty_edges(self):
        from cvml_goalnet_tpu.runtime import native_knapsack_available

        if not native_knapsack_available():
            pytest.skip("native runtime unavailable")
        imp = np.array([5.0, 1.0, 3.0], np.float32)
        # intervals past the end + a reversed pair (Python-slice clamping)
        intervals = np.array([[0, 10], [10, 500], [30, 20]], np.int64)
        kcfg = KnapsackConfig()
        staged = summarize(imp, intervals, 10, 30, kcfg)
        native = summarize(imp, intervals, 10, 30, kcfg, knapsack_engine="native-full")
        np.testing.assert_array_equal(staged.frame_mask, native.frame_mask)
        assert staged.selected_clips == native.selected_clips
