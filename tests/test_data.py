"""Data-layer tests: synthetic TVSum fixtures through the full ingest path."""

import numpy as np
import pytest

from cvml_goalnet_tpu.data.annotations import AnnotationStore, load_tvsum_annotations
from cvml_goalnet_tpu.data.audio_io import load_waveform, write_wav
from cvml_goalnet_tpu.data.dataset import Prefetcher, build_datasets
from cvml_goalnet_tpu.data.synthetic import synthetic_waveform


class TestAnnotations:
    def test_tsv_mean_and_trim(self, synth_dir):
        trimmed, full = load_tvsum_annotations(synth_dir["annotation_fp"], "vidA", 30)
        assert len(full) == 240
        assert len(trimmed) == 8
        np.testing.assert_array_equal(trimmed, full[::30])
        assert full.min() >= 1 and full.max() <= 5

    def test_store_user_annotations(self, synth_dir):
        store = AnnotationStore(synth_dir["mat_file_path"], synth_dir["h5_file_path"])
        anno = store.user_annotations("vidA")
        assert anno.shape == (20, 240)
        anno_b = store.user_annotations("vidB")
        assert anno_b.shape == (20, 270)

    def test_store_change_points_mapping(self, synth_dir):
        store = AnnotationStore(synth_dir["mat_file_path"], synth_dir["h5_file_path"])
        cps = store.change_points("vidA")
        assert cps.shape[1] == 2
        # the mat↔h5 nframes+1 rule must land on the right video
        assert cps[-1][1] == 240 - 1
        assert store.change_points("vidB")[-1][1] == 270 - 1

    def test_unknown_video_id_raises_keyerror(self, synth_dir):
        # previously an opaque numpy AxisError from .mean(axis=1) on an
        # empty array (round-3 review)
        from cvml_goalnet_tpu.data.annotations import load_tvsum_annotations

        with pytest.raises(KeyError, match="no annotator rows"):
            load_tvsum_annotations(synth_dir["annotation_fp"], "nonexistent", 30)

    def test_store_caches_parsing(self, synth_dir):
        store = AnnotationStore(synth_dir["mat_file_path"], synth_dir["h5_file_path"])
        a = store._mat_data
        b = store._mat_data
        assert a is b  # cached_property: single parse


class TestAudioIO:
    def test_wav_roundtrip(self, tmp_path):
        y = synthetic_waveform(22050)
        fp = str(tmp_path / "x.wav")
        write_wav(fp, y, 22050)
        loaded, sr = load_waveform(fp, 22050)
        assert sr == 22050
        assert len(loaded) == len(y)
        np.testing.assert_allclose(loaded, y, atol=2e-4)  # PCM16 quantization

    def test_resample(self, tmp_path):
        y = synthetic_waveform(44100, sr=44100)
        fp = str(tmp_path / "y.wav")
        write_wav(fp, y, 44100)
        loaded, sr = load_waveform(fp, 22050)
        assert sr == 22050
        assert abs(len(loaded) - 22050) <= 1

    def test_native_reader_matches_scipy(self, tmp_path):
        from cvml_goalnet_tpu.runtime import wav_read_native

        y = synthetic_waveform(8000)
        fp = str(tmp_path / "z.wav")
        write_wav(fp, y, 22050)
        native = wav_read_native(fp)
        if native is None:
            pytest.skip("native runtime not built")
        ny, nsr = native
        from scipy.io import wavfile

        sr, data = wavfile.read(fp)
        ref = data.astype(np.float32) / 32768.0
        assert nsr == sr
        np.testing.assert_allclose(ny, ref, atol=1e-6)

    def test_native_reader_rejects_truncated_wav(self, tmp_path):
        # a data chunk whose header promises more bytes than the file has
        # used to "succeed" with an uninitialized buffer tail fed straight
        # into resample/MFCC (round-3 review) — it must fail instead
        from cvml_goalnet_tpu.runtime import wav_read_native

        y = synthetic_waveform(8000)
        fp = str(tmp_path / "t.wav")
        write_wav(fp, y, 22050)
        if wav_read_native(fp) is None:
            pytest.skip("native runtime not built")
        raw = open(fp, "rb").read()
        open(fp, "wb").write(raw[: len(raw) - 4000])  # chop the tail
        assert wav_read_native(fp) is None


class TestDatasetBuild:
    @pytest.fixture(scope="class")
    def datasets(self, synth_dir, small_cfg):
        return build_datasets(
            synth_dir["video_fps"], small_cfg,
            synth_dir["annotation_fp"], synth_dir["mat_file_path"], synth_dir["h5_file_path"],
            synth_dir["info_fp"], audio_included=True,
        )

    def test_split_sizes(self, datasets):
        train_ds, val_ds = datasets
        assert len(train_ds) == 1 and len(val_ds) == 1  # ratio 0.8 of 2 videos

    def test_item_tensors(self, datasets, small_cfg):
        item = datasets[0][0]
        n = len(item.visual)
        assert item.visual.shape[1:] == (*small_cfg.preprocess.frame_size, 3)
        assert item.audio.shape == (n, small_cfg.audio.bin_length, small_cfg.audio.n_mfcc)
        assert item.labels.shape == (n,)
        assert item.gd_summary_masks.shape == (20, item.full_n_frames)
        assert item.title == "Title of vidA"

    def test_gd_masks_budget(self, datasets, small_cfg):
        # knapsack GT masks respect the 15% budget approximately (inclusive ends
        # can exceed by at most n_clips frames)
        item = datasets[0][0]
        budget = 0.15 * item.full_n_frames
        assert item.gd_summary_masks.sum(axis=1).max() <= budget + len(item.clip_intervals)

    def test_prefetcher_order_and_error(self):
        items = list(range(10))
        assert list(Prefetcher(iter(items))) == items

        def boom():
            yield 1
            raise ValueError("x")

        with pytest.raises(ValueError):
            list(Prefetcher(boom()))

    def test_prefetcher_abandoned_consumer_reaps_worker(self):
        # A consumer that stops iterating early (exception, GC) must not
        # leave the worker blocked in q.put holding buffered chunks and an
        # open source — fatal leak in a long-lived serving process
        closed = []

        def src():
            try:
                for i in range(10_000):
                    yield i
            finally:
                closed.append(True)

        p = Prefetcher(src(), depth=2)
        it = iter(p)
        assert next(it) == 0
        assert next(it) == 1
        it.close()  # what generator GC / a raised exception does
        p._t.join(timeout=5.0)
        assert not p._t.is_alive()
        assert closed == [True]  # source generator was closed too


class TestCommentaryIngestion:
    """Round-2: commentary sidecar → per-frame tokens in VideoItem."""

    def test_alignment_semantics(self):
        from cvml_goalnet_tpu.data.text import commentary_per_frame

        entries = [(0, "kickoff"), (65, "shot"), (200, "goal")]
        # skip=30: condensed frames at raw 0, 30, 60, 90, ..., 240
        out = commentary_per_frame(entries, 9, 30)
        assert out == ["kickoff", "kickoff", "kickoff", "shot", "shot",
                       "shot", "shot", "goal", "goal"]

    def test_no_commentary_before_first_entry(self):
        from cvml_goalnet_tpu.data.text import commentary_per_frame

        out = commentary_per_frame([(50, "late")], 3, 30)
        assert out == ["", "", "late"]

    def test_build_video_item_reads_sidecar(self, small_cfg, tmp_path):
        import dataclasses as dc
        import json

        from cvml_goalnet_tpu.data.dataset import build_video_item

        cfg = dc.replace(
            small_cfg,
            model=dc.replace(small_cfg.model, audio_included=False, text_included=True))
        rng = np.random.default_rng(0)
        n_raw = 150
        fp = str(tmp_path / "clip.npz")
        np.savez_compressed(fp, frames=rng.integers(0, 255, (n_raw, 32, 32, 3), dtype=np.uint8))
        with open(str(tmp_path / "clip.commentary.jsonl"), "w") as f:
            f.write(json.dumps({"frame": 0, "text": "start of play"}) + "\n")
            f.write(json.dumps({"frame": 70, "text": "goal goal goal"}) + "\n")

        item = build_video_item(fp, cfg, None, None, audio_included=False)
        assert item.text is not None
        n = len(item.visual)
        assert item.text.shape == (n, cfg.model.text_max_len)
        # frames 0,30,60 carry "start of play"; 90,120 carry "goal goal goal"
        from cvml_goalnet_tpu.data.text import tokenize

        want_start = tokenize(["start of play"], cfg.model.text_vocab_size,
                              cfg.model.text_max_len)[0]
        want_goal = tokenize(["goal goal goal"], cfg.model.text_vocab_size,
                             cfg.model.text_max_len)[0]
        np.testing.assert_array_equal(item.text[0], want_start)
        np.testing.assert_array_equal(item.text[3], want_goal)

    def test_missing_sidecar_gives_empty_tokens(self, small_cfg, tmp_path):
        import dataclasses as dc

        from cvml_goalnet_tpu.data.dataset import build_video_item

        cfg = dc.replace(
            small_cfg,
            model=dc.replace(small_cfg.model, audio_included=False, text_included=True))
        rng = np.random.default_rng(1)
        fp = str(tmp_path / "plain.npz")
        np.savez_compressed(fp, frames=rng.integers(0, 255, (90, 32, 32, 3), dtype=np.uint8))
        item = build_video_item(fp, cfg, None, None, audio_included=False)
        assert item.text is not None and (item.text == 0).all()
