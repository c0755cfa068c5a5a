"""Test bootstrap: force the CPU platform with 8 virtual devices.

Unit/parity/mesh tests run on CPU (SURVEY.md §4: mesh tests via
``--xla_force_host_platform_device_count`` without real TPUs).  The TPU image
bootstraps an ``axon`` PJRT backend and pins ``jax_platforms="axon,cpu"`` via
sitecustomize, so the env var alone is not enough — we re-pin the config to
``cpu`` before any backend initializes.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import numpy as np
import pytest

from cvml_goalnet_tpu.config import (
    AudioConfig,
    ModelConfig,
    PipelineConfig,
    PreprocessConfig,
    TrainConfig,
)


@pytest.fixture(scope="session")
def small_cfg() -> PipelineConfig:
    """A scaled-down config so model tests compile in seconds on CPU."""
    return PipelineConfig(
        preprocess=PreprocessConfig(skip_frames=30, frame_size=(24, 24)),
        audio=AudioConfig(n_fft=512, hop_length=128, n_mels=40, n_mfcc=13, bin_length=12),
        model=ModelConfig(
            vis_channels=(8, 16, 16),
            vis_feature_dim=32,
            aud_channels=(8, 16),
            aud_feature_dim=16,
            fusion_hidden=(32, 16),
            text_vocab_size=128,
            text_embed_dim=16,
            text_num_layers=1,
            text_num_heads=2,
            text_feature_dim=16,
            text_max_len=12,
            temporal_hidden=8,
        ),
        train=TrainConfig(num_epochs=2, subbatch_size=5, seed=7),
    )


@pytest.fixture(scope="session")
def full_cfg() -> PipelineConfig:
    """Reference-default config (40×40 frames, 30 MFCC etc.)."""
    return PipelineConfig()


@pytest.fixture(scope="session")
def synth_dir(tmp_path_factory):
    from cvml_goalnet_tpu.data.synthetic import synthetic_dataset_dir

    root = tmp_path_factory.mktemp("tvsum_synth")
    return synthetic_dataset_dir(str(root), full_n_frames=240, n_clips=6)


def small_model_cfg(**overrides) -> ModelConfig:
    base = PipelineConfig().model
    return dataclasses.replace(base, **overrides)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True)
def _close_leaked_batchers():
    """Drain DynamicBatcher worker threads a test forgot to close().

    A leaked daemon worker pins its Summarizer (and device buffers) for the
    whole pytest process — round 4's full-suite run crashed inside an XLA
    compile with eight such threads alive.  Only touches the registry when
    serve.py was actually imported, so light tests stay light.
    """
    yield
    import sys

    serve_mod = sys.modules.get("cvml_goalnet_tpu.serve")
    if serve_mod is not None:
        for b in list(serve_mod._live_batchers):
            b.close()
