"""Device-side operators (XLA + Pallas) and their host reference implementations."""

from cvml_goalnet_tpu.ops.expand import expand_scores, expand_scores_host
from cvml_goalnet_tpu.ops.clips import clip_stats, clip_stats_host
from cvml_goalnet_tpu.ops.knapsack import (
    knapsack_select,
    knapsack_table_device,
    knapsack_table_host,
)
from cvml_goalnet_tpu.ops.fscore import fscore_against_users, fscore_against_users_host
from cvml_goalnet_tpu.ops.preprocess import (
    normalize_frames,
    preprocess_frames,
    resize_bilinear,
    resize_matrices,
)

__all__ = [
    "expand_scores",
    "expand_scores_host",
    "clip_stats",
    "clip_stats_host",
    "knapsack_select",
    "knapsack_table_device",
    "knapsack_table_host",
    "fscore_against_users",
    "fscore_against_users_host",
    "normalize_frames",
    "preprocess_frames",
    "resize_bilinear",
    "resize_matrices",
]
