"""cvml_goalnet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-summarization framework.

A ground-up rebuild of the capability set of the reference repo
``Vasilispapg/CVML-GoalNet`` (multimodal audio+video frame-importance scoring
followed by knapsack keyshot selection, evaluated by F-score against human
annotators), re-designed TPU-first:

* All compute-path code is functional JAX under ``jit`` — frame preprocessing,
  the MFCC audio frontend, the audio/visual/text encoders, the fusion head,
  the training step (``lax.scan`` over sub-batches), importance expansion,
  clip scoring, and the knapsack DP table.
* Parallelism is expressed via ``jax.sharding.Mesh`` + ``NamedSharding`` /
  ``shard_map`` (data / model axes), not host-side process orchestration.
* Hot host↔device boundaries use Pallas kernels (fused normalize+resize
  preprocessing, fused fusion-MLP) where XLA fusion alone is not enough.

Public API (capability parity with the reference's entry surface,
``main.py:351-373`` / ``utils.py`` of the reference):

* :func:`extract_features`   — video frames + audio → model-ready tensors
* :func:`fuse`               — audio/visual(/text) features → importance scores
* :func:`summarize`          — importance scores → keyshot summary + mask
* :mod:`cvml_goalnet_tpu.train` — jitted training loop, Adam, checkpointing
* :mod:`cvml_goalnet_tpu.parallel` — mesh construction, shardings, collectives
"""

from cvml_goalnet_tpu.config import (
    AudioConfig,
    KnapsackConfig,
    MeshConfig,
    ModelConfig,
    PipelineConfig,
    PreprocessConfig,
    TrainConfig,
)
from cvml_goalnet_tpu.pipeline import extract_features, fuse, summarize

__version__ = "0.4.0"

__all__ = [
    "AudioConfig",
    "KnapsackConfig",
    "MeshConfig",
    "ModelConfig",
    "PipelineConfig",
    "PreprocessConfig",
    "TrainConfig",
    "extract_features",
    "fuse",
    "summarize",
    "__version__",
]
