"""Streaming inference pipeline + failure-recovery wrapper tests."""

import numpy as np
import jax
import pytest

from cvml_goalnet_tpu.models.avm import avm_init
from cvml_goalnet_tpu.pipeline import fuse
from cvml_goalnet_tpu.streaming import score_video_stream, summarize_video_stream
from cvml_goalnet_tpu.data.synthetic import synthetic_change_points
from cvml_goalnet_tpu.train.resilience import train_with_recovery
from cvml_goalnet_tpu.train.state import create_train_state


def _chunks(frames, size):
    for i in range(0, len(frames), size):
        yield frames[i : i + size]


class TestStreaming:
    @pytest.fixture(scope="class")
    def setup(self, small_cfg):
        rng = np.random.default_rng(0)
        n = 70
        frames = rng.integers(0, 255, (n, 48, 64, 3)).astype(np.uint8)
        audio = rng.random((n, small_cfg.audio.bin_length, small_cfg.audio.n_mfcc)).astype(np.float32)
        params, state = avm_init(
            jax.random.PRNGKey(0), small_cfg.model, small_cfg.preprocess, small_cfg.audio
        )
        return frames, audio, params, state

    def test_stream_matches_monolithic(self, setup, small_cfg):
        frames, audio, params, state = setup
        scores, stats = score_video_stream(
            params, state, _chunks(frames, 32), small_cfg, chunk_size=32,
            audio_chunks=_chunks(audio, 32),
        )
        assert scores.shape == (70,)
        assert stats.chunks == 3 and stats.frames == 70

        from cvml_goalnet_tpu.pipeline import extract_features

        feats = extract_features(frames, None, small_cfg)
        feats["audio"] = audio
        want = fuse(params, state, feats, small_cfg)
        np.testing.assert_allclose(scores, want, atol=1e-4)

    def test_short_audio_stream_raises_clearly(self, setup, small_cfg):
        # a shorter audio iterator used to surface as an opaque PEP-479
        # "generator raised StopIteration" RuntimeError from the prefetch
        # thread; mismatched chunk boundaries silently misaligned modalities
        frames, audio, params, state = setup
        with pytest.raises(ValueError, match="audio_chunks exhausted"):
            score_video_stream(
                params, state, _chunks(frames, 32), small_cfg, chunk_size=32,
                audio_chunks=_chunks(audio[:32], 32),  # one chunk short
            )
        with pytest.raises(ValueError, match="same boundaries"):
            score_video_stream(
                params, state, _chunks(frames, 32), small_cfg, chunk_size=32,
                audio_chunks=_chunks(audio, 16),  # wrong chunking boundary
            )

    def test_stream_with_text_matches_monolithic(self, setup, small_cfg):
        # 3-modality streaming: commentary token chunks ride the same
        # boundaries as frames/audio (round-3 continuation — streaming used
        # to crash mid-trace for text_included trunks)
        import dataclasses

        from cvml_goalnet_tpu.data.text import tokenize

        frames, audio, _, _ = setup
        cfg = dataclasses.replace(
            small_cfg, model=dataclasses.replace(small_cfg.model, text_included=True))
        params, state = avm_init(jax.random.PRNGKey(0), cfg.model, cfg.preprocess, cfg.audio)
        text = tokenize(["goal!" if i % 3 == 0 else "" for i in range(70)],
                        cfg.model.text_vocab_size, cfg.model.text_max_len)
        scores, _ = score_video_stream(
            params, state, _chunks(frames, 32), cfg, chunk_size=32,
            audio_chunks=_chunks(audio, 32), text_chunks=_chunks(text, 32),
        )
        from cvml_goalnet_tpu.pipeline import extract_features

        feats = extract_features(frames, None, cfg)
        feats["audio"], feats["text"] = audio, text
        want = fuse(params, state, feats, cfg)
        np.testing.assert_allclose(scores, want, atol=1e-4)

        # forgetting the text stream fails loudly, not mid-trace
        with pytest.raises(ValueError, match="text_chunks"):
            score_video_stream(
                params, state, _chunks(frames, 32), cfg, chunk_size=32,
                audio_chunks=_chunks(audio, 32),
            )
        # misaligned text chunking fails like audio does
        with pytest.raises(ValueError, match="same boundaries"):
            score_video_stream(
                params, state, _chunks(frames, 32), cfg, chunk_size=32,
                audio_chunks=_chunks(audio, 32), text_chunks=_chunks(text, 16),
            )

    def test_stream_no_audio(self, setup, small_cfg):
        import dataclasses

        frames, _, _, _ = setup
        cfg = dataclasses.replace(
            small_cfg, model=dataclasses.replace(small_cfg.model, audio_included=False)
        )
        params, state = avm_init(jax.random.PRNGKey(0), cfg.model, cfg.preprocess, cfg.audio)
        scores, _ = score_video_stream(params, state, _chunks(frames, 32), cfg, chunk_size=32)
        assert scores.shape == (70,)

    def test_summarize_video_stream(self, setup, small_cfg):
        frames, audio, params, state = setup
        full_n = 70 * small_cfg.preprocess.skip_frames
        intervals = synthetic_change_points(full_n, 6)
        res, stats = summarize_video_stream(
            params, state, _chunks(frames, 32), intervals, full_n, small_cfg,
            chunk_size=32, audio_chunks=_chunks(audio, 32),
        )
        assert res.frame_mask.shape == (full_n,)
        assert res.frame_mask.sum() > 0
        assert "stage_dispatch" in stats.stage_seconds


class TestRecovery:
    def test_restores_after_injected_failure(self, small_cfg, tmp_path):
        from tests.test_train import _make_item
        from cvml_goalnet_tpu.data.dataset import VideoDataset
        from cvml_goalnet_tpu.utils.metrics import MetricsLogger

        ds = VideoDataset([_make_item(small_cfg, n=10, seed=0)])
        state = create_train_state(jax.random.PRNGKey(0), small_cfg)
        ckdir = str(tmp_path / "ck")
        logger = MetricsLogger(str(tmp_path / "events.jsonl"))

        calls = {"n": 0}

        def failing_callback(epoch, history, best):
            calls["n"] += 1
            if calls["n"] == 2:  # fail once, mid-run
                raise RuntimeError("injected transient failure")

        best, history, restarts = train_with_recovery(
            small_cfg, ds, ds, state, ckdir,
            max_restarts=2, metrics_logger=logger,
            num_epochs=3, verbose=False, on_epoch_end=failing_callback,
        )
        assert restarts == 1
        events = MetricsLogger.read(str(tmp_path / "events.jsonl"))
        assert any(e["event"] == "train_failure" for e in events)
        # resumed run completed all epochs
        assert history["best_epoch"] >= -1

    def test_exhausted_budget_raises(self, small_cfg, tmp_path):
        from tests.test_train import _make_item
        from cvml_goalnet_tpu.data.dataset import VideoDataset

        ds = VideoDataset([_make_item(small_cfg, n=10, seed=0)])
        state = create_train_state(jax.random.PRNGKey(0), small_cfg)

        def always_fail(epoch, history, best):
            raise RuntimeError("persistent failure")

        with pytest.raises(RuntimeError, match="persistent"):
            train_with_recovery(
                small_cfg, ds, ds, state, str(tmp_path / "ck2"),
                max_restarts=1, num_epochs=2, verbose=False, on_epoch_end=always_fail,
            )


class TestHostPreprocessStream:
    def test_matches_device_preprocess(self, small_cfg):
        import jax as _jax

        rng = np.random.default_rng(5)
        frames = rng.integers(0, 255, (64, 48, 64, 3)).astype(np.uint8)
        params, state = avm_init(
            _jax.random.PRNGKey(0), small_cfg.model, small_cfg.preprocess, small_cfg.audio
        )
        import dataclasses

        cfg = dataclasses.replace(
            small_cfg, model=dataclasses.replace(small_cfg.model, audio_included=False)
        )
        params, state = avm_init(_jax.random.PRNGKey(0), cfg.model, cfg.preprocess, cfg.audio)
        dev, _ = score_video_stream(params, state, _chunks(frames, 32), cfg, chunk_size=32)
        host, _ = score_video_stream(
            params, state, _chunks(frames, 32), cfg, chunk_size=32, host_preprocess=True
        )
        np.testing.assert_allclose(host, dev, atol=1e-4)

    def test_f16_transfer_dtype_drift_bounded(self, small_cfg):
        # round-2: f16 host→device transfer halves bandwidth; scores must stay
        # within 1e-3 of the f32 path on the [1, 5] scale (normalized inputs
        # live in [0, 1] where f16 keeps ~3.3 decimal digits)
        import dataclasses

        import jax as _jax

        rng = np.random.default_rng(6)
        frames = rng.integers(0, 255, (64, 48, 64, 3)).astype(np.uint8)
        cfg = dataclasses.replace(
            small_cfg, model=dataclasses.replace(small_cfg.model, audio_included=False)
        )
        params, state = avm_init(_jax.random.PRNGKey(0), cfg.model, cfg.preprocess, cfg.audio)
        f32, _ = score_video_stream(
            params, state, _chunks(frames, 32), cfg, chunk_size=32, host_preprocess=True
        )
        f16, _ = score_video_stream(
            params, state, _chunks(frames, 32), cfg, chunk_size=32,
            host_preprocess=True, transfer_dtype=np.float16,
        )
        np.testing.assert_allclose(f16, f32, atol=1e-3)

    def test_uint8_transfer_dtype_drift_bounded(self, small_cfg):
        # round-3: uint8 quantized transfer (4× less H2D than f32) — the
        # per-pixel error is ≤ 1/510, so scores stay within 2e-2 on [1, 5]
        import dataclasses

        import jax as _jax

        rng = np.random.default_rng(6)
        frames = rng.integers(0, 255, (64, 48, 64, 3)).astype(np.uint8)
        cfg = dataclasses.replace(
            small_cfg, model=dataclasses.replace(small_cfg.model, audio_included=False)
        )
        params, state = avm_init(_jax.random.PRNGKey(0), cfg.model, cfg.preprocess, cfg.audio)
        f32, _ = score_video_stream(
            params, state, _chunks(frames, 32), cfg, chunk_size=32, host_preprocess=True
        )
        q8, _ = score_video_stream(
            params, state, _chunks(frames, 32), cfg, chunk_size=32,
            host_preprocess=True, transfer_dtype=np.uint8,
        )
        np.testing.assert_allclose(q8, f32, atol=2e-2)


class TestParallelDecodeStream:
    def test_ordered_chunks_match_sequential(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        from cvml_goalnet_tpu.data.synthetic import synthetic_video_frames
        from cvml_goalnet_tpu.data.video import (
            stream_condensed_frames,
            stream_condensed_frames_parallel,
        )

        fp = str(tmp_path / "clip.mp4")
        frames = synthetic_video_frames(200, 48, 64)
        out = cv2.VideoWriter(fp, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 48))
        for f in frames:
            out.write(f[..., ::-1].copy())
        out.release()

        seq = list(stream_condensed_frames(fp, 2, chunk=16))
        par = list(stream_condensed_frames_parallel(fp, 2, chunk=16, workers=4))
        assert len(seq) == len(par)
        for a, b in zip(seq, par):
            np.testing.assert_array_equal(a, b)


class TestAutoDecodeWorkers:
    def test_probe_picks_valid_count(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        from cvml_goalnet_tpu.data.synthetic import synthetic_video_frames
        from cvml_goalnet_tpu.data.video import (
            pick_decode_workers,
            resolve_decode_workers,
        )

        fp = str(tmp_path / "clip.mp4")
        frames = synthetic_video_frames(120, 48, 64)
        out = cv2.VideoWriter(fp, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 48))
        for f in frames:
            out.write(f[..., ::-1].copy())
        out.release()

        w = pick_decode_workers(fp, candidates=(1, 2), probe_seconds=0.1)
        assert w in (1, 2)
        assert resolve_decode_workers("auto", fp) >= 1
        assert resolve_decode_workers(4, fp) == 4
        assert resolve_decode_workers("2", fp) == 2

    def test_probe_result_cached_per_process(self, tmp_path, monkeypatch):
        # the multi-second probe must run ONCE per process, not per request:
        # a short clip's probe would otherwise cost more than its decode
        pytest.importorskip("cv2")
        from cvml_goalnet_tpu.data import video as V

        monkeypatch.setattr(V, "_auto_workers_cache", {})
        calls = []
        real = V._probe_decode_fps

        def counting(*a, **k):
            calls.append(a)
            return real(*a, **k)

        monkeypatch.setattr(V, "_probe_decode_fps", counting)
        monkeypatch.setattr(V.os, "cpu_count", lambda: 8)
        fp = str(tmp_path / "clip.mp4")
        import cv2

        from cvml_goalnet_tpu.data.synthetic import synthetic_video_frames
        out = cv2.VideoWriter(fp, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 48))
        for f in synthetic_video_frames(60, 48, 64):
            out.write(f[..., ::-1].copy())
        out.release()
        w1 = V.pick_decode_workers(fp, candidates=(1, 2), probe_seconds=0.05)
        n_after_first = len(calls)
        assert n_after_first == 2  # probed each candidate once
        w2 = V.pick_decode_workers(fp, candidates=(1, 2), probe_seconds=0.05)
        assert w2 == w1
        assert len(calls) == n_after_first  # second call served from cache

    def test_candidates_capped_by_cpu_count(self, tmp_path, monkeypatch):
        cv2 = pytest.importorskip("cv2")
        from cvml_goalnet_tpu.data.synthetic import synthetic_video_frames
        from cvml_goalnet_tpu.data import video as V

        fp = str(tmp_path / "clip.mp4")
        frames = synthetic_video_frames(60, 48, 64)
        out = cv2.VideoWriter(fp, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 48))
        for f in frames:
            out.write(f[..., ::-1].copy())
        out.release()

        monkeypatch.setattr(V.os, "cpu_count", lambda: 1)
        assert V.pick_decode_workers(fp, probe_seconds=0.05, use_cache=False) == 1


class TestDecodeMetadataMismatch:
    """Round-2 hardening: metadata frame count ≠ decodable count must not
    silently change frames or `full_n_frames` (VERDICT weak #2)."""

    def _write_clip(self, tmp_path, n=120):
        cv2 = pytest.importorskip("cv2")
        from cvml_goalnet_tpu.data.synthetic import synthetic_video_frames

        fp = str(tmp_path / "clip.mp4")
        frames = synthetic_video_frames(n, 48, 64)
        out = cv2.VideoWriter(fp, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 48))
        for f in frames:
            out.write(f[..., ::-1].copy())
        out.release()
        return fp

    def test_parallel_decode_falls_back_on_lying_metadata(self, tmp_path, monkeypatch):
        cv2 = pytest.importorskip("cv2")
        from cvml_goalnet_tpu.data import video as V

        fp = self._write_clip(tmp_path)
        seq_frames, seq_full_n = V.decode_condensed_frames(fp, 3)

        # Simulate a badly-muxed/VFR file: CAP_PROP_FRAME_COUNT overreports.
        real_get = cv2.VideoCapture.get

        def lying_get(self, prop):
            val = real_get(self, prop)
            if prop == cv2.CAP_PROP_FRAME_COUNT:
                return val + 30
            return val

        monkeypatch.setattr(cv2.VideoCapture, "get", lying_get)
        par_frames, par_full_n = V.decode_condensed_frames_parallel(fp, 3, workers=4)
        assert par_full_n == seq_full_n          # NOT the inflated metadata count
        np.testing.assert_array_equal(par_frames, seq_frames)

    def test_parallel_stream_recovers_on_lying_metadata(self, tmp_path, monkeypatch):
        cv2 = pytest.importorskip("cv2")
        from cvml_goalnet_tpu.data import video as V

        fp = self._write_clip(tmp_path)
        seq = np.concatenate(list(V.stream_condensed_frames(fp, 2, chunk=16)))

        real_get = cv2.VideoCapture.get

        def lying_get(self, prop):
            val = real_get(self, prop)
            if prop == cv2.CAP_PROP_FRAME_COUNT:
                return val + 40
            return val

        monkeypatch.setattr(cv2.VideoCapture, "get", lying_get)
        par = np.concatenate(list(V.stream_condensed_frames_parallel(fp, 2, chunk=16, workers=4)))
        np.testing.assert_array_equal(par, seq)

    def test_parallel_decode_reads_past_undercounting_metadata(self, tmp_path, monkeypatch):
        # The inverse lie: header frame count UNDERSTATES real content (VFR,
        # estimated duration×fps).  Every worker completes its range, so the
        # old contract check passed while trailing real frames were silently
        # dropped and full_n was the too-small metadata value (round-3
        # review) — the last worker must read to EOF like the sequential
        # decoder does.
        cv2 = pytest.importorskip("cv2")
        from cvml_goalnet_tpu.data import video as V

        fp = self._write_clip(tmp_path)
        seq_frames, seq_full_n = V.decode_condensed_frames(fp, 3)

        real_get = cv2.VideoCapture.get

        def undercounting_get(self, prop):
            val = real_get(self, prop)
            if prop == cv2.CAP_PROP_FRAME_COUNT:
                return max(val - 30, 8)
            return val

        monkeypatch.setattr(cv2.VideoCapture, "get", undercounting_get)
        par_frames, par_full_n = V.decode_condensed_frames_parallel(fp, 3, workers=4)
        assert par_full_n == seq_full_n          # actual count, not metadata
        np.testing.assert_array_equal(par_frames, seq_frames)

    def test_parallel_stream_reads_past_undercounting_metadata(self, tmp_path, monkeypatch):
        cv2 = pytest.importorskip("cv2")
        from cvml_goalnet_tpu.data import video as V

        fp = self._write_clip(tmp_path)
        seq = np.concatenate(list(V.stream_condensed_frames(fp, 2, chunk=16)))

        real_get = cv2.VideoCapture.get

        def undercounting_get(self, prop):
            val = real_get(self, prop)
            if prop == cv2.CAP_PROP_FRAME_COUNT:
                return max(val - 40, 8)
            return val

        monkeypatch.setattr(cv2.VideoCapture, "get", undercounting_get)
        par = np.concatenate(list(V.stream_condensed_frames_parallel(fp, 2, chunk=16, workers=4)))
        np.testing.assert_array_equal(par, seq)


class TestPreemptionGuard:
    """Round-2: graceful SIGTERM-style preemption — checkpoint + early exit,
    then resume with epoch and optimizer state intact."""

    def test_preempt_checkpoints_and_resumes(self, small_cfg, tmp_path):
        import os
        import signal

        from cvml_goalnet_tpu.data.dataset import VideoDataset
        from cvml_goalnet_tpu.train.checkpoint import load_checkpoint
        from cvml_goalnet_tpu.train.loop import train_importance_model
        from cvml_goalnet_tpu.train.resilience import PreemptionGuard
        from cvml_goalnet_tpu.train.state import create_train_state
        from tests.test_train import _make_item

        ds = VideoDataset([_make_item(small_cfg, n=10, seed=0)])
        state = create_train_state(jax.random.PRNGKey(0), small_cfg)
        ckdir = str(tmp_path / "ck")

        with PreemptionGuard(signals=(signal.SIGUSR1,)) as guard:
            def on_epoch_end(epoch, history, best):
                if epoch == 1:  # the "maintenance event" arrives mid-run
                    os.kill(os.getpid(), signal.SIGUSR1)

            _, history = train_importance_model(
                small_cfg, ds, ds, state, num_epochs=10,
                checkpoint_dir=ckdir, verbose=False,
                on_epoch_end=on_epoch_end, preemption_guard=guard,
            )
        assert history.get("preempted") is True
        assert len(history["train_loss"]) == 3  # initial + 2 epochs, not 11

        template = create_train_state(jax.random.PRNGKey(0), small_cfg)
        restored = load_checkpoint(ckdir, template, tag="ckp")
        assert restored.epoch == 2                  # resumes at epoch 2
        assert int(restored.opt_state.step) > 0     # Adam moments intact

        # resume finishes the run
        _, history2 = train_importance_model(
            small_cfg, ds, ds, restored, num_epochs=4, verbose=False,
        )
        assert "preempted" not in history2


class TestNpzStreaming:
    def test_npz_chunks_match_one_shot_loader(self, tmp_path):
        """`.npz` archives stream in the same chunk shapes a decoder would
        produce (the `spot --stream` journey runs on fixtures too)."""
        from cvml_goalnet_tpu.data.video import stream_condensed_frames

        frames = np.arange(50 * 4 * 4 * 3, dtype=np.uint8).reshape(50, 4, 4, 3)
        fp = str(tmp_path / "clip.npz")
        np.savez(fp, frames=frames)
        chunks = list(stream_condensed_frames(fp, skip_frames=3, chunk=7))
        assert [len(c) for c in chunks] == [7, 7, 3]  # ceil(50/3)=17 frames
        np.testing.assert_array_equal(np.concatenate(chunks), frames[::3])


class TestStreamCounterAndMaskedExport:
    def test_counter_reports_true_full_n(self, tmp_path):
        from cvml_goalnet_tpu.data.video import stream_condensed_frames

        frames = np.zeros((53, 4, 4, 3), np.uint8)
        fp = str(tmp_path / "clip.npz")
        np.savez(fp, frames=frames)
        counter = {}
        n = sum(len(c) for c in stream_condensed_frames(
            fp, skip_frames=5, chunk=8, counter=counter))
        assert n == 11  # ceil(53/5)
        assert counter["full_n"] == 53

    def test_counter_on_real_decode(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        from cvml_goalnet_tpu.data.video import stream_condensed_frames

        fp = str(tmp_path / "clip.mp4")
        out = cv2.VideoWriter(fp, cv2.VideoWriter_fourcc(*"mp4v"), 25, (32, 32))
        rng = np.random.default_rng(0)
        for _ in range(47):
            out.write(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
        out.release()
        counter = {}
        list(stream_condensed_frames(fp, skip_frames=3, chunk=8, counter=counter))
        assert counter["full_n"] == 47

    def test_masked_export_single_pass(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        from cvml_goalnet_tpu.data.video import export_selected_clips_stream

        fp = str(tmp_path / "clip.mp4")
        out = cv2.VideoWriter(fp, cv2.VideoWriter_fourcc(*"mp4v"), 25, (32, 32))
        rng = np.random.default_rng(1)
        for _ in range(60):
            out.write(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
        out.release()
        out_fp = str(tmp_path / "summary.mp4")
        written = export_selected_clips_stream(fp, [(5, 12), (30, 35)], out_fp)
        assert written == 12
        cap = cv2.VideoCapture(out_fp)
        n = 0
        while cap.read()[0]:
            n += 1
        cap.release()
        assert n == 12

    def test_masked_export_npz_matches_offline_concat(self, tmp_path):
        from cvml_goalnet_tpu.data.video import export_selected_clips_stream

        frames = np.random.default_rng(2).integers(
            0, 255, (40, 16, 16, 3), dtype=np.uint8)
        fp = str(tmp_path / "clip.npz")
        np.savez(fp, frames=frames)
        out_fp = str(tmp_path / "summary.mp4")
        written = export_selected_clips_stream(fp, [(0, 4), (10, 13)], out_fp)
        assert written == 7

    def test_masked_export_rejects_unsorted(self, tmp_path):
        from cvml_goalnet_tpu.data.video import export_selected_clips_stream

        fp = str(tmp_path / "clip.npz")
        np.savez(fp, frames=np.zeros((10, 4, 4, 3), np.uint8))
        with pytest.raises(ValueError, match="ascending"):
            export_selected_clips_stream(
                fp, [(5, 8), (0, 3)], str(tmp_path / "s.mp4"))
