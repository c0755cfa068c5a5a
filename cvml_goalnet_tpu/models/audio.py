"""Audio branch encoder.

Capability parity with reference ``AudBl`` (``utils.py:197-227``):
Conv1d(n_mfcc→64, k3, s2, p1) → ReLU → Conv1d(→128, k3, s2, p1) → ReLU →
flatten → Linear(128) → ReLU.  For a (30, 30) MFCC input the temporal trace is
30→15→8, so the flatten dim is 128·8 = 1024.

Layout is NWC (time, channels) — the TPU-friendly orientation; the pipeline
feeds MFCCs as (N, B, n_mfcc), i.e. the transpose of the reference's
(N, n_mfcc, B).
"""

from __future__ import annotations

import jax

from cvml_goalnet_tpu.config import AudioConfig, ModelConfig
from cvml_goalnet_tpu.models import layers as L

_GEOM = (3, 2, 1)  # kernel, stride, padding for both convs — utils.py:203,206


def audio_temporal_trace(length: int, n_stages: int) -> list[int]:
    k, s, p = _GEOM
    out = []
    for _ in range(n_stages):
        length = L.conv_out_size(length, k, s, p)
        out.append(length)
    return out


def audio_feature_channels(aud: AudioConfig) -> int:
    """Input channel count: n_mels for the log-mel variant, else n_mfcc."""
    return aud.n_mels if aud.log_mel else aud.n_mfcc


def audio_encoder_init(key, cfg: ModelConfig, aud: AudioConfig):
    chans = (audio_feature_channels(aud),) + cfg.aud_channels
    keys = jax.random.split(key, len(cfg.aud_channels) + 1)
    params = {}
    for i, (cin, cout) in enumerate(zip(chans[:-1], chans[1:])):
        params[f"conv{i}"] = L.conv1d_init(keys[i], cin, cout, _GEOM[0])
    t = audio_temporal_trace(aud.bin_length, len(cfg.aud_channels))[-1]
    params["head"] = L.linear_init(keys[-1], cfg.aud_channels[-1] * t, cfg.aud_feature_dim)
    return params


def audio_encoder_apply(params, x):
    """x: (N, B, n_mfcc) MFCC features → (N, aud_feature_dim)."""
    i = 0
    while f"conv{i}" in params:
        x = jax.nn.relu(L.conv1d_apply(params[f"conv{i}"], x, stride=_GEOM[1], padding=_GEOM[2]))
        i += 1
    x = x.reshape(x.shape[0], -1)
    return jax.nn.relu(L.linear_apply(params["head"], x))
