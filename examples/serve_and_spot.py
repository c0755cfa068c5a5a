"""Production-surface walkthrough: serving (+dynamic batching) and spotting.

Runs entirely on CPU in about a minute:

    GOALNET_PLATFORM=cpu python examples/serve_and_spot.py

1. builds a tiny config + synthetic clips;
2. serves them through :class:`Summarizer` with cross-request
   :class:`DynamicBatcher` (concurrent requests share device dispatches);
3. trains the temporal spotting head on event labels and evaluates the
   spotted events with tolerance precision/recall + average-mAP.
"""

import dataclasses
import os
import sys
import tempfile
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cvml_goalnet_tpu.utils import apply_platform_override

apply_platform_override()

import numpy as np
import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.config import (
    AudioConfig, ModelConfig, PipelineConfig, PreprocessConfig, TrainConfig,
)

cfg = PipelineConfig(
    preprocess=PreprocessConfig(skip_frames=30, frame_size=(24, 24)),
    audio=AudioConfig(n_fft=512, hop_length=128, n_mels=40, n_mfcc=13, bin_length=12),
    model=ModelConfig(vis_channels=(8, 16, 16), vis_feature_dim=32,
                      aud_channels=(8, 16), aud_feature_dim=16,
                      fusion_hidden=(32, 16), temporal_hidden=8,
                      audio_included=False),
    train=TrainConfig(num_epochs=2, subbatch_size=5),
)

# ---------------------------------------------------------------- serving
from cvml_goalnet_tpu.serve import DynamicBatcher, Summarizer

summarizer = Summarizer(cfg)
batcher = DynamicBatcher(summarizer, max_wait_ms=200.0, buckets=(64, 128))
batcher.warmup()

rng = np.random.default_rng(0)
clips = [rng.integers(0, 255, (12, 48, 64, 3), dtype=np.uint8) for _ in range(6)]
with ThreadPoolExecutor(max_workers=6) as pool:
    futs = list(pool.map(lambda iv: batcher.submit(f"clip{iv[0]}", iv[1]),
                         enumerate(clips)))
responses = [f.result(timeout=300) for f in futs]
for r in responses[:2]:
    print(f"[serve] {r.video_id}: {int(r.frame_mask.sum())} summary frames, "
          f"{len(r.clips)} clips")
print(f"[serve] {batcher.stats['requests']} requests in "
      f"{batcher.stats['batches']} device batches (dynamic batching)")

# ---------------------------------------------------------------- spotting
from cvml_goalnet_tpu.models.temporal import temporal_scorer_init
from cvml_goalnet_tpu.spotting import (
    encode_timeline, score_timeline, spot_events,
)
from cvml_goalnet_tpu.ops.spotting_metrics import average_map, spotting_pr
from cvml_goalnet_tpu.train.spotting import init_spotting_opt, make_spotting_train_step
from cvml_goalnet_tpu.train.state import create_train_state

t = 120
events_gt = np.array([10, 47, 88])
labels = np.zeros((t,), np.float32)
labels[events_gt] = 1.0
frames = rng.random((t, 24, 24, 3)).astype(np.float32)
frames[events_gt] += 0.8  # events are visually brighter

state = create_train_state(jax.random.PRNGKey(0), cfg)
feats = encode_timeline(state.params, state.model_state,
                        jnp.asarray(frames), None, cfg)
tparams = temporal_scorer_init(jax.random.PRNGKey(1), feats.shape[-1],
                               cfg.model.temporal_hidden)
opt = init_spotting_opt(tparams)
step = make_spotting_train_step(cfg.model.temporal_hidden, lr=1e-2, pos_weight=20.0)
for epoch in range(250):
    tparams, opt, loss = step(tparams, opt, feats, jnp.asarray(labels))
print(f"[spot] final training loss: {float(loss):.4f}")

scores = np.asarray(score_timeline(tparams, feats, cfg.model.temporal_hidden))
pred = spot_events(scores, window=5, threshold=0.0)
p, r, f1 = spotting_pr(pred, scores[pred], events_gt, tolerance=3)
print(f"[spot] events {pred.tolist()} vs gt {events_gt.tolist()} → "
      f"P={p:.2f} R={r:.2f} F1={f1:.2f}")
print(f"[spot] average-mAP: {average_map(pred, scores[pred], events_gt)['average_map']:.3f}")
