"""Orbax checkpoint backend: sharded-aware TrainState save/restore.

The portable ``.npz`` format (``train/checkpoint.py``) is the default — it is
dependency-light and byte-stable.  This adapter is the production multi-chip
path: `orbax.checkpoint` writes each array once from whatever devices hold
it and RESTORES DIRECTLY INTO the requested ``jax.sharding`` layout, so a
DP/TP-sharded training job resumes without gathering params to one host
(the npz path materializes every leaf as a host numpy array first).

Same contract as the npz pair: full state (params + batchnorm state + Adam
moments + epoch), config manifest for shape-safe restore, atomicity (orbax
writes to a temp dir and renames on finalize).  Reference counterpart:
``torch.save`` at ``main.py:251-282`` (which saved neither optimizer state
nor epoch — SURVEY.md §5).
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax

from cvml_goalnet_tpu.config import PipelineConfig
from cvml_goalnet_tpu.train.checkpoint import CheckpointMismatchError
from cvml_goalnet_tpu.train.optim import AdamState
from cvml_goalnet_tpu.train.state import TrainState


def _payload(state: TrainState):
    # epoch rides INSIDE the checkpointed pytree so the step counter can
    # never pair with a different epoch's weights (the manifest's epoch is
    # informational only — advisor finding, round 2)
    return {
        "params": state.params,
        "model_state": state.model_state,
        "opt_state": state.opt_state._asdict(),
        "epoch": np.asarray(state.epoch, dtype=np.int64),
    }


def _recover_interrupted_swap(path: str) -> None:
    """If a crash landed between 'old renamed away' and 'new renamed in',
    the previous finalized checkpoint survives at ``<path>.old`` — put it
    back so there is never a window with no valid checkpoint.

    Called ONLY by the saver (which owns the swap).  Loaders must never
    rename: a load running concurrently with a live save would otherwise
    resurrect ``.old`` over the path mid-swap and make the saver's final
    rename crash with ENOTEMPTY — loads fall back to READING ``.old``
    instead (see ``load_checkpoint_orbax``)."""
    if not os.path.isdir(path) and os.path.isdir(path + ".old"):
        os.rename(path + ".old", path)


def save_checkpoint_orbax(
    directory: str, state: TrainState, cfg: PipelineConfig, tag: str = "ckp"
) -> str:
    """Write ``<directory>/<tag>_orbax/`` (+ manifest); sharded arrays are
    written from their devices without a host gather.

    Atomicity (same contract as the npz backend's tmp+``os.replace``): the
    new payload is finalized at a side path ``<tag>_orbax.new`` first, then
    swapped in via two renames; the previous checkpoint stays valid (at its
    own path or at ``.old``) throughout.  A mid-swap crash is recovered by
    the NEXT save (rename ``.old`` back); concurrent loaders read ``.old``
    directly without renaming so they can never race a live swap.
    """
    import shutil

    import orbax.checkpoint as ocp

    os.makedirs(directory, exist_ok=True)
    path = os.path.abspath(os.path.join(directory, f"{tag}_orbax"))
    _recover_interrupted_swap(path)

    # manifest first: per-run constants (config) + informational epoch
    manifest = {"epoch": state.epoch, "config": json.loads(cfg.to_json())}
    mpath = os.path.join(directory, f"{tag}_orbax_manifest.json")
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(mpath + ".tmp", mpath)

    new = path + ".new"
    if os.path.isdir(new):
        shutil.rmtree(new)  # stale debris from an interrupted save
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(new, _payload(state))  # orbax finalizes via its own rename

    old = path + ".old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(new, path)
    if os.path.isdir(old):
        shutil.rmtree(old)
    return path


def load_checkpoint_orbax(
    directory: str, template: TrainState, tag: str = "ckp"
) -> TrainState:
    """Restore into ``template``'s structure — AND its shardings.

    Every leaf is restored with the shape/dtype/sharding of the corresponding
    ``template`` leaf: pass a template whose params were placed with
    ``parallel.sharding.place_params`` and the arrays come back already
    distributed across the mesh.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"{tag}_orbax"))
    # read-only mid-swap fallback: if a saver crashed between its two renames
    # the finalized previous checkpoint sits at .old — READ it from there.
    # Renaming it back here (as the saver does) would race a LIVE concurrent
    # save (serve/infer loading while train saves the same tag) and crash the
    # saver's final rename with ENOTEMPTY; the next save restores the name.
    if not os.path.isdir(path) and os.path.isdir(path + ".old"):
        path = path + ".old"
    if not os.path.isdir(path):
        raise FileNotFoundError(path)
    with open(os.path.join(directory, f"{tag}_orbax_manifest.json")) as f:
        manifest = json.load(f)

    def as_abstract(x):
        x = x if isinstance(x, jax.Array) else jax.numpy.asarray(x)
        sharding = getattr(x, "sharding", None)
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    full = _payload(template)
    with ocp.PyTreeCheckpointer() as ckptr:
        # checkpoints written before round 3 carry no 'epoch' leaf — build
        # the restore target from what is actually on disk so they keep
        # loading (their epoch comes from the manifest below)
        try:
            meta = ckptr.metadata(path)
            tree = getattr(getattr(meta, "item_metadata", None), "tree", None)
            if tree is None and hasattr(meta, "keys"):
                tree = meta  # older orbax returns the tree directly
            if tree is not None and "epoch" not in tree:
                full = {k: v for k, v in full.items() if k != "epoch"}
        except Exception:
            pass  # metadata unavailable → assume the current format
        target = jax.tree.map(as_abstract, full)
        try:
            payload = ckptr.restore(path, ocp.args.PyTreeRestore(
                item=target,
                restore_args=ocp.checkpoint_utils.construct_restore_args(target),
            ))
        except Exception as e:
            raise CheckpointMismatchError(
                f"orbax checkpoint at {path!r} does not match the current config "
                f"({type(e).__name__}: {e}) — it was saved with different model "
                "settings (e.g. audio/text branches)"
            ) from e
    # epoch comes from the payload (atomic with the weights); older
    # checkpoints without the leaf fall back to the manifest
    epoch = payload.get("epoch")
    return TrainState(
        params=payload["params"],
        model_state=payload["model_state"],
        opt_state=AdamState(**payload["opt_state"]),
        epoch=int(epoch) if epoch is not None else int(manifest["epoch"]),
    )
