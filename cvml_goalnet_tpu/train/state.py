"""Training state container: params, batchnorm state, optimizer state, step."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax

from cvml_goalnet_tpu.config import PipelineConfig
from cvml_goalnet_tpu.models.avm import avm_init
from cvml_goalnet_tpu.train.optim import AdamState, adam_init


class TrainState(NamedTuple):
    params: Any
    model_state: Any          # batchnorm running stats
    opt_state: AdamState
    epoch: int                # host-side epoch counter (checkpointed — the
                              # reference lost it on resume, SURVEY.md §5)


def create_train_state(rng: jax.Array, cfg: PipelineConfig, classifier: bool = False) -> TrainState:
    params, model_state = avm_init(rng, cfg.model, cfg.preprocess, cfg.audio, classifier)
    return TrainState(params=params, model_state=model_state, opt_state=adam_init(params), epoch=0)
