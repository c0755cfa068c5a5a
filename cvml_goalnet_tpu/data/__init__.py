"""Host-side data layer: ingest (video/audio/annotations), datasets, prefetch.

Reference counterpart: the ingest helpers and ``dataloader``/``get_dataloaders``
in ``utils.py:16-143, 274-349, 361-443, 525-550``.  Parsing stays on the host
(it is not perf-critical — SURVEY.md §2.2) but everything is cached instead of
re-read per call, and the device feed is double-buffered.
"""

from cvml_goalnet_tpu.data.annotations import (
    AnnotationStore,
    load_tvsum_annotations,
)
from cvml_goalnet_tpu.data.dataset import VideoDataset, build_datasets
from cvml_goalnet_tpu.data.synthetic import (
    synthetic_dataset_dir,
    synthetic_video_frames,
    synthetic_waveform,
)
from cvml_goalnet_tpu.data.video import decode_condensed_frames, decode_all_frames
from cvml_goalnet_tpu.data.audio_io import load_waveform

__all__ = [
    "AnnotationStore",
    "load_tvsum_annotations",
    "VideoDataset",
    "build_datasets",
    "synthetic_dataset_dir",
    "synthetic_video_frames",
    "synthetic_waveform",
    "decode_condensed_frames",
    "decode_all_frames",
    "load_waveform",
]
