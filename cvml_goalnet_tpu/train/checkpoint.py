"""Pytree checkpointing: params + batchnorm state + optimizer state + epoch.

Reference counterpart: ``torch.save(state_dict)`` at ``main.py:251-282`` with
two files (``ckp_*`` every epoch, ``opt_*`` on new best).  The reference did
NOT save optimizer state or the epoch counter, so resume restarted Adam
moments and epoch numbering (SURVEY.md §5) — here the FULL train state is
captured, and a JSON manifest pins the config for shape-safe restore.

Format: flattened pytree → ``.npz`` (portable, dependency-free) + manifest.
Writes are atomic (tmp + rename) so a crash mid-save never corrupts the
previous checkpoint — crash-resume is the failure-recovery story, as upstream.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax

from cvml_goalnet_tpu.config import PipelineConfig
from cvml_goalnet_tpu.train.optim import AdamState
from cvml_goalnet_tpu.train.state import TrainState


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_checkpoint(directory: str, state: TrainState, cfg: PipelineConfig, tag: str = "ckp") -> str:
    os.makedirs(directory, exist_ok=True)
    payload = {
        "params": state.params,
        "model_state": state.model_state,
        "opt_state": state.opt_state._asdict(),
    }
    arrays, _ = _flatten_with_paths(payload)
    path = os.path.join(directory, f"{tag}_state.npz")
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)

    manifest = {"epoch": state.epoch, "config": json.loads(cfg.to_json())}
    mpath = os.path.join(directory, f"{tag}_manifest.json")
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(mpath + ".tmp", mpath)
    return path


def load_checkpoint(directory: str, template: TrainState, tag: str = "ckp") -> TrainState:
    """Restore into the structure of ``template`` (built from the same config)."""
    data = np.load(os.path.join(directory, f"{tag}_state.npz"))
    with open(os.path.join(directory, f"{tag}_manifest.json")) as f:
        manifest = json.load(f)

    payload_t = {
        "params": template.params,
        "model_state": template.model_state,
        "opt_state": template.opt_state._asdict(),
    }
    flat, treedef = jax.tree_util.tree_flatten_with_path(payload_t)
    leaves = []
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        stored = data[key]
        assert stored.shape == np.shape(leaf), f"shape mismatch for {key}"
        leaves.append(stored)
    payload = jax.tree_util.tree_unflatten(treedef, leaves)
    return TrainState(
        params=payload["params"],
        model_state=payload["model_state"],
        opt_state=AdamState(**payload["opt_state"]),
        epoch=int(manifest["epoch"]),
    )
