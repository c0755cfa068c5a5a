"""Data-parallel training driver: global frame batches over the device mesh.

The single-chip loop (``train/loop.py``) preserves the reference's
sequential per-video sub-batch semantics.  This driver is the scaling path
(BASELINE.json config 5: batch axis data-parallel across a v5e-8 mesh):

* all training videos' frames/audio/labels concatenate into one pool;
* each step samples a global batch, shards it over the mesh ``"data"`` axis
  (optionally fusion-TP over ``"model"``), computes the mean loss, all-reduces
  gradients (GSPMD), and applies ONE Adam update;
* per-epoch evaluation and F-score reporting reuse the standard eval path,
  so metrics are comparable across the two training modes.

Epoch accounting: one epoch = one pass over the pooled frames (in sampled
batches), mirroring total sample exposure rather than the reference's
per-video ordering.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.config import PipelineConfig
from cvml_goalnet_tpu.parallel.dp import make_dp_train_step
from cvml_goalnet_tpu.parallel.mesh import build_mesh
from cvml_goalnet_tpu.parallel.sharding import place_params, shard_batch
from cvml_goalnet_tpu.train.loop import _video_fscores, eval_video
from cvml_goalnet_tpu.train.state import TrainState


def pool_dataset(ds) -> dict:
    """Concatenate all videos' tensors into one sample pool."""
    visual = np.concatenate([item.visual for item in ds])
    labels = np.concatenate(
        [np.asarray(item.labels, np.float32) for item in ds]
    )
    audio = None
    if ds[0].audio is not None:
        audio = np.concatenate([item.audio for item in ds])
    text = None
    if ds[0].text is not None:
        text = np.concatenate([item.text for item in ds])
    return {"visual": visual, "audio": audio, "labels": labels, "text": text}


def train_data_parallel(
    cfg: PipelineConfig,
    train_ds,
    val_ds,
    state: TrainState,
    num_epochs: int | None = None,
    global_batch: int | None = None,
    mesh=None,
    tensor_parallel: bool = False,
    verbose: bool = True,
):
    """DP training over the mesh → (final TrainState, history dict)."""
    mesh = mesh or build_mesh(cfg.mesh)
    n_data = mesh.shape[cfg.mesh.axis_names[0]]
    pool = pool_dataset(train_ds)
    n = len(pool["visual"])

    if n < n_data:
        # every step would break before running: the whole run would silently
        # train NOTHING while history fills with NaN (round-3 review)
        raise ValueError(
            f"dataset pools only {n} frames but the data axis spans {n_data} "
            "devices — add videos or shrink the mesh"
        )
    if global_batch is None:
        global_batch = max(n_data, (cfg.train.subbatch_size * n_data))
    global_batch = min(global_batch, (n // n_data) * n_data)

    step_fn = make_dp_train_step(cfg, mesh, tensor_parallel)
    params = place_params(state.params, mesh, tensor_parallel)
    model_state, opt_state = state.model_state, state.opt_state
    num_epochs = cfg.train.num_epochs if num_epochs is None else num_epochs

    rng = np.random.default_rng(cfg.train.seed)
    key = jax.random.PRNGKey(cfg.train.seed)
    history = {"train_loss": [], "val_loss": [], "val_f_avg": [], "val_f_max": []}

    steps_per_epoch = max(1, n // global_batch)
    for epoch in range(num_epochs):
        perm = rng.permutation(n)
        losses = []
        for s in range(steps_per_epoch):
            idx = perm[s * global_batch : (s + 1) * global_batch]
            if len(idx) < global_batch:
                break
            key, sub = jax.random.split(key)
            # device_put the NUMPY slice straight into its sharding —
            # jnp.asarray first would materialize the whole global batch on
            # one device and pay the H2D twice (round-3 review)
            vis = shard_batch(mesh, pool["visual"][idx])
            aud = (
                shard_batch(mesh, pool["audio"][idx])
                if pool["audio"] is not None
                else None
            )
            lab = shard_batch(mesh, pool["labels"][idx])
            txt = (
                shard_batch(mesh, pool["text"][idx])
                if pool["text"] is not None
                else None
            )
            params, model_state, opt_state, loss = step_fn(
                params, model_state, opt_state, vis, aud, lab, sub, text=txt
            )
            losses.append(float(loss))

        state = TrainState(params, model_state, opt_state, epoch + 1)
        history["train_loss"].append(float(np.mean(losses)))
        if len(val_ds):  # empty val sets must not np.mean([]) into NaN rows
            val_losses, favg, fmax = [], [], []
            for item in val_ds:
                preds, vloss = eval_video(state, item, cfg)
                fa, fm = _video_fscores(item, preds, cfg)
                val_losses.append(vloss)
                favg.append(fa)
                fmax.append(fm)
            history["val_loss"].append(float(np.mean(val_losses)))
            history["val_f_avg"].append(float(np.mean(favg)))
            history["val_f_max"].append(float(np.mean(fmax)))
        if verbose:
            val = (f"val loss {history['val_loss'][-1]:.4f} "
                   f"F-avg {history['val_f_avg'][-1]:.4f}" if len(val_ds) else "no val set")
            print(f"[dp epoch {epoch}] train loss {history['train_loss'][-1]:.4f} {val}")
    return state, history
