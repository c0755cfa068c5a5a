"""Live AV spotting walkthrough: follow footage that is STILL being produced.

Runs entirely on CPU in under a minute:

    GOALNET_PLATFORM=cpu python examples/live_follow_spotting.py

1. a PRODUCER thread drops finalized audio+video segments into a directory
   (the ``data/follow.py`` protocol: write ``<name>.part`` + the ``.wav``
   sidecar, then atomically rename; an ``END`` sentinel closes the stream);
2. the CONSUMER follows the directory with :func:`follow_condensed_chunks`
   and scores an AUDIO-INCLUDED trunk through :func:`spotting.spot_stream`
   — every event prints the moment it is FINAL, while later segments are
   still being written;
3. the streamed scores are checked against offline scoring of the final
   footage (halo-decay bound — the emission contract's accuracy class).

This is the ``goalnet spot --stream --follow DIR`` / ``POST /spot-stream
{"follow": true}`` journey as a library walkthrough.
"""

import os
import sys
import tempfile
import threading
import time
from collections import deque

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
    preprocess=PreprocessConfig(skip_frames=3, frame_size=(24, 24)),
    audio=AudioConfig(n_fft=512, hop_length=128, n_mels=40, n_mfcc=13, bin_length=12),
    model=ModelConfig(vis_channels=(8, 16, 16), vis_feature_dim=32,
                      aud_channels=(8, 16), aud_feature_dim=16,
                      fusion_hidden=(32, 16), temporal_hidden=8,
                      audio_included=True),
    train=TrainConfig(num_epochs=2, subbatch_size=5),
)

# ------------------------------------------------------------- the producer
from cvml_goalnet_tpu.data.audio_io import write_wav

rng = np.random.default_rng(0)
SEGMENTS = [45, 36, 39]          # raw frames per segment (uneven on purpose)
raw_parts = [rng.integers(0, 255, (m, 24, 24, 3), dtype=np.uint8)
             for m in SEGMENTS]
wav_parts = [rng.standard_normal(m * 300).astype(np.float32) * 0.2
             for m in SEGMENTS]
live_dir = tempfile.mkdtemp(prefix="goalnet_live_")


def producer():
    for i, (part, wav) in enumerate(zip(raw_parts, wav_parts)):
        time.sleep(0.3)  # footage takes time to happen
        # sidecar FIRST, then the atomic rename publishes the AV pair
        write_wav(os.path.join(live_dir, f"{i:05d}.wav"), wav,
                  cfg.audio.sample_rate)
        tmp = os.path.join(live_dir, f"{i:05d}.npz.part")
        with open(tmp, "wb") as f:
            np.savez(f, frames=part)
        os.replace(tmp, os.path.join(live_dir, f"{i:05d}.npz"))
        print(f"[producer] segment {i} finalized ({len(part)} raw frames)")
    open(os.path.join(live_dir, "END"), "w").close()
    print("[producer] END sentinel written")


# ------------------------------------------------------------- the consumer
from cvml_goalnet_tpu.data.follow import follow_condensed_chunks
from cvml_goalnet_tpu.ops.preprocess import preprocess_frames_host
from cvml_goalnet_tpu.spotting import (
    encode_timeline, score_timeline_auto, spot_stream, temporal_head_init_auto,
)
from cvml_goalnet_tpu.train.state import create_train_state

state = create_train_state(jax.random.PRNGKey(0), cfg)
tparams = temporal_head_init_auto(
    jax.random.PRNGKey(2),
    cfg.model.vis_feature_dim + cfg.model.aud_feature_dim, cfg.model)

pairs = follow_condensed_chunks(
    live_dir, cfg.preprocess.skip_frames, chunk=10,
    audio_cfg=cfg.audio, timeout=10.0, poll_interval=0.05)
aq: deque = deque()


def frame_chunks():
    for raw, audio in pairs:
        aq.append(audio)
        yield preprocess_frames_host(
            raw, cfg.preprocess.frame_size, cfg.preprocess.eps)


def audio_chunks():
    while aq:
        yield aq.popleft()


w = threading.Thread(target=producer)
w.start()
updates = []
for u in spot_stream(state.params, state.model_state, tparams,
                     frame_chunks(), cfg, halo=24, peak_window=3,
                     audio_chunks=audio_chunks()):
    updates.append(u)
    for e in np.asarray(u.events).ravel():
        print(f"[consumer] event FINAL at condensed frame {int(e)} "
              f"(stream still live)")
w.join()

# ------------------------------------------------- offline cross-check
from cvml_goalnet_tpu.ops.audio import extract_audio_features

streamed = np.concatenate([u.scores for u in updates])
raw = np.concatenate(raw_parts)
vis = preprocess_frames_host(
    raw[::cfg.preprocess.skip_frames], cfg.preprocess.frame_size,
    cfg.preprocess.eps)
pos, aud = 0, []
from cvml_goalnet_tpu.data.audio_io import load_waveform

for i, part in enumerate(raw_parts):
    n_cond = len(range((-pos) % cfg.preprocess.skip_frames, len(part),
                       cfg.preprocess.skip_frames))
    y, _ = load_waveform(os.path.join(live_dir, f"{i:05d}.wav"),
                         target_sr=cfg.audio.sample_rate)
    aud.append(extract_audio_features(y, n_cond, cfg.audio))
    pos += len(part)
feats = encode_timeline(state.params, state.model_state, jnp.asarray(vis),
                        jnp.asarray(np.concatenate(aud)), cfg)
offline = np.asarray(score_timeline_auto(tparams, feats, cfg))
drift = float(np.abs(streamed - offline).max())
assert streamed.shape == offline.shape and drift < 2e-2, drift
print(f"[check] streamed {len(streamed)} condensed frames over "
      f"{len(SEGMENTS)} live AV segments; max drift vs offline "
      f"{drift:.2e} (halo-decay bound)")
print("live follow spotting: done")
