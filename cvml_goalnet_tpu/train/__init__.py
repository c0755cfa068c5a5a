"""Training subsystem: optimizers, jitted update loop, checkpoints, metrics.

Reference counterpart: the orchestration layer in ``main.py:26-298``
(epoch/sub-batch loops, Adam, checkpoint policy, metric aggregation) —
re-designed so the entire per-video optimization (all sub-batches) runs as ONE
jitted ``lax.scan`` device program instead of a host Python while-loop
(``main.py:177-196``).
"""

from cvml_goalnet_tpu.train.optim import (adam_init, adam_update, schedule_from_config, schedule_lr, sgd_init, sgd_update)
from cvml_goalnet_tpu.train.state import TrainState, create_train_state
from cvml_goalnet_tpu.train.loop import (
    eval_video,
    make_train_video_fn,
    train_importance_model,
)
from cvml_goalnet_tpu.train.checkpoint import load_checkpoint, save_checkpoint

__all__ = [
    "adam_init",
    "adam_update",
    "schedule_from_config",
    "schedule_lr",
    "sgd_init",
    "sgd_update",
    "TrainState",
    "create_train_state",
    "eval_video",
    "make_train_video_fn",
    "train_importance_model",
    "load_checkpoint",
    "save_checkpoint",
]
