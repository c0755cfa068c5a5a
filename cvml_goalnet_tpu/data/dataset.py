"""Per-video dataset assembly + double-buffered device feed.

Capability parity with reference ``dataloader`` / ``get_dataloaders``
(``utils.py:16-143``): one batch = one entire video; each video carries
condensed frames, per-frame MFCC features, trimmed mean-annotator labels, and
per-annotator ground-truth summary masks (built through the SAME knapsack
pipeline used at eval — ``utils.py:104-116``).

Design differences (SURVEY.md §7.1):

* immutable :class:`VideoItem` records instead of the reference's stateful
  ``__getitem__`` side effects (``utils.py:73-74`` set ``self.title`` /
  ``full_n_frames_`` on the instance);
* annotation files parsed once through :class:`AnnotationStore`, not per call;
* ``.npz`` frame archives are accepted alongside real videos so tests and
  hosts without codecs exercise the same path;
* :class:`Prefetcher` overlaps host assembly of video *i+1* with device work
  on video *i* (the host↔device double-buffering the TPU plan requires).
"""

from __future__ import annotations

import os
import queue
import threading
from dataclasses import dataclass

import numpy as np

from cvml_goalnet_tpu.config import PipelineConfig
from cvml_goalnet_tpu.data.annotations import AnnotationStore, load_tvsum_annotations
from cvml_goalnet_tpu.data.audio_io import load_waveform
from cvml_goalnet_tpu.data.video import decode_condensed_frames
from cvml_goalnet_tpu.pipeline import extract_features, summarize


@dataclass
class VideoItem:
    video_id: str
    title: str
    visual: np.ndarray                  # (N, h, w, C) preprocessed frames
    audio: np.ndarray | None            # (N, B, n_mfcc) MFCCs
    labels: np.ndarray | None           # (N,) trimmed mean-annotator grades
    gd_summary_masks: np.ndarray | None  # (A, full_n) knapsack GT masks
    full_n_frames: int
    clip_intervals: np.ndarray          # (K, 2)
    text: np.ndarray | None = None      # (N, text_max_len) commentary token ids


class VideoDataset:
    """A list of :class:`VideoItem`; iteration yields one video per batch."""

    def __init__(self, items: list[VideoItem]):
        self.items = items

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, i: int) -> VideoItem:
        return self.items[i]

    def __iter__(self):
        return iter(self.items)


def _load_frames(path: str, skip_frames: int) -> tuple[np.ndarray, int]:
    if path.endswith(".npz"):
        frames = np.load(path)["frames"]
        return frames[::skip_frames], len(frames)
    from cvml_goalnet_tpu.data.video import resolve_decode_workers

    workers = resolve_decode_workers(
        os.environ.get("GOALNET_DECODE_WORKERS", "1"), path)
    if workers > 1:
        from cvml_goalnet_tpu.data.video import decode_condensed_frames_parallel

        return decode_condensed_frames_parallel(path, skip_frames, workers)
    return decode_condensed_frames(path, skip_frames)


def _load_titles(info_fp: str | None, video_ids: list[str]) -> dict[str, str]:
    """Title lookup from the info TSV (reference ``utils.py:55-66``)."""
    titles = {vid: vid for vid in video_ids}
    if info_fp and os.path.exists(info_fp):
        import csv

        with open(info_fp) as f:
            reader = csv.DictReader(f, delimiter="\t")
            for row in reader:
                if row.get("video_id") in titles:
                    titles[row["video_id"]] = row.get("title", row["video_id"])
    return titles


def build_video_item(
    video_fp: str,
    cfg: PipelineConfig,
    annotation_fp: str | None,
    store: AnnotationStore | None,
    audio_included: bool,
    title: str | None = None,
) -> VideoItem:
    """Assemble one video's tensors (reference ``utils.py:86-122`` per-video body)."""
    video_id = os.path.basename(video_fp).rsplit(".", 1)[0]
    skip = cfg.preprocess.skip_frames
    frames_raw, full_n = _load_frames(video_fp, skip)

    waveform = None
    if audio_included:
        audio_fp = video_fp.rsplit(".", 1)[0] + ".wav"
        if not os.path.exists(audio_fp):
            from cvml_goalnet_tpu.data.audio_io import demux_audio

            demux_audio(video_fp, audio_fp)
        waveform, _ = load_waveform(audio_fp, cfg.audio.sample_rate)

    # Commentary sidecar (text modality, BASELINE.json config 4): a
    # `<video>.commentary.jsonl` next to the video, aligned per condensed
    # frame (most recent line at or before each frame).
    commentary = None
    if cfg.model.text_included:
        commentary_fp = video_fp.rsplit(".", 1)[0] + ".commentary.jsonl"
        if os.path.exists(commentary_fp):
            from cvml_goalnet_tpu.data.text import commentary_per_frame, load_commentary_jsonl

            commentary = commentary_per_frame(
                load_commentary_jsonl(commentary_fp), len(frames_raw), skip
            )
        else:
            commentary = [""] * len(frames_raw)  # model expects the modality

    feats = extract_features(frames_raw, waveform, cfg, commentary=commentary)

    labels = gd_masks = None
    if store is None:
        # No change-point ground truth: uniform ~2-second segmentation, never
        # wider than the knapsack budget (a single whole-video clip could
        # never fit the 15% capacity and would make every summary empty).
        budget = max(1, int(cfg.knapsack.summary_ratio * full_n))
        step = max(1, min(2 * 30, budget))
        starts = np.arange(0, full_n, step, dtype=np.int64)
        clip_intervals = np.stack([starts, np.minimum(starts + step, full_n)], 1)
    if store is not None:
        clip_intervals = np.asarray(store.change_points(video_id))
        if annotation_fp is not None:
            labels, _ = load_tvsum_annotations(annotation_fp, video_id, skip)
            # annotation and decode streams can disagree by a trailing frame;
            # align every per-frame tensor to the common length
            n = min(len(labels), len(feats["visual"]))
            labels = labels[:n]
            feats["visual"] = feats["visual"][:n]
            if feats["audio"] is not None:
                feats["audio"] = feats["audio"][:n]
            if feats["text"] is not None:
                feats["text"] = feats["text"][:n]
        # Ground-truth summaries: run each annotator's importances through the
        # same expand→clips→knapsack pipeline (reference utils.py:104-116).
        masks = []
        for annotator_gd in store.user_annotations(video_id):
            res = summarize(
                annotator_gd,
                clip_intervals,
                skip_frames=skip,
                full_n_frames=full_n,
                kcfg=cfg.knapsack,
            )
            masks.append(res.frame_mask)
        gd_masks = np.stack(masks)

    return VideoItem(
        video_id=video_id,
        title=title or video_id,
        visual=feats["visual"],
        audio=feats["audio"],
        labels=labels,
        gd_summary_masks=gd_masks,
        full_n_frames=full_n,
        clip_intervals=clip_intervals,
        text=feats["text"],
    )


def build_datasets(
    video_fps: list[str],
    cfg: PipelineConfig,
    annotation_fp: str | None = None,
    mat_file_path: str | None = None,
    h5_file_path: str | None = None,
    info_fp: str | None = None,
    audio_included: bool = True,
) -> tuple[VideoDataset, VideoDataset]:
    """Train/val split by ``cfg.train.train_ratio`` (reference ``utils.py:78-143``)."""
    store = (
        AnnotationStore(mat_file_path, h5_file_path)
        if mat_file_path and h5_file_path
        else None
    )
    ids = [os.path.basename(fp).rsplit(".", 1)[0] for fp in video_fps]
    titles = _load_titles(info_fp, ids)
    items = [
        build_video_item(fp, cfg, annotation_fp, store, audio_included, titles[vid])
        for fp, vid in zip(video_fps, ids)
    ]
    offset = int(cfg.train.train_ratio * len(items))
    return VideoDataset(items[:offset]), VideoDataset(items[offset:])


class Prefetcher:
    """Background-thread prefetch: host assembles item i+1 while caller works on i.

    Abandoning the iteration early (consumer exception, generator GC) closes
    the prefetcher: the worker would otherwise block forever in ``q.put``,
    leaking the thread, ``depth`` buffered items, and the source iterator
    (e.g. an open ``VideoCapture``) — fatal in a long-lived serving process
    where each failed stream would leak permanently (round-3 review).
    """

    _SENTINEL = object()

    def __init__(self, iterable, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: BaseException | None = None
        self._stop = threading.Event()

        def worker():
            try:
                it = iter(iterable)
                while not self._stop.is_set():
                    try:
                        item = next(it)
                    except StopIteration:
                        break
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            pass
            except BaseException as e:  # re-raise in consumer
                self._err = e
            finally:
                close = getattr(iterable, "close", None)
                if close is not None:
                    try:
                        close()  # release the source (decoder handles etc.)
                    except Exception:
                        pass
                while True:  # deliver the sentinel unless the consumer left
                    try:
                        self._q.put(self._SENTINEL, timeout=0.2)
                        break
                    except queue.Full:
                        if self._stop.is_set():
                            break

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def close(self) -> None:
        """Stop the worker, release buffered items, and close the source."""
        self._stop.set()
        self._t.join(timeout=5.0)
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break

    def __iter__(self):
        try:
            while True:
                item = self._q.get()
                if item is self._SENTINEL:
                    if self._err is not None:
                        raise self._err
                    return
                yield item
        finally:
            # normal exhaustion: joins an already-finished thread (cheap);
            # early abandonment: unblocks and reaps the worker
            self.close()
