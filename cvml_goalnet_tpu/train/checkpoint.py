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
    # the epoch rides INSIDE the npz so weights+epoch swap atomically — the
    # manifest renames separately, and a crash between the two renames must
    # not pair new weights with a stale-epoch manifest (same fix as the
    # orbax backend, round 3; the manifest's epoch is informational)
    arrays["__epoch__"] = np.asarray(state.epoch, dtype=np.int64)
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


class CheckpointMismatchError(ValueError):
    """A checkpoint's shapes do not match the current config's model."""


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
        if key not in data or data[key].shape != np.shape(leaf):
            got = data[key].shape if key in data else "absent"
            raise CheckpointMismatchError(
                f"checkpoint at {directory!r} does not match the current config: "
                f"{key} is {got}, expected {np.shape(leaf)} — it was saved with "
                "different model settings (e.g. audio/text branches)"
            )
        leaves.append(data[key])
    payload = jax.tree_util.tree_unflatten(treedef, leaves)
    # epoch from the payload (atomic with the weights); pre-round-3 files
    # without the leaf fall back to the manifest
    epoch = int(data["__epoch__"]) if "__epoch__" in data else int(manifest["epoch"])
    return TrainState(
        params=payload["params"],
        model_state=payload["model_state"],
        opt_state=AdamState(**payload["opt_state"]),
        epoch=epoch,
    )


class AsyncCheckpointer:
    """Background-thread checkpointing: training never blocks on disk.

    TPU trainers hide checkpoint I/O behind the next step (the orbax pattern):
    device arrays are snapshotted to host SYNCHRONOUSLY (cheap; the arrays
    are immutable so no copy-race with the optimizer) and the npz/manifest
    write happens on a worker thread.  One write runs at a time per tag —
    a newer snapshot for the same tag supersedes a queued older one, so a
    slow disk never builds a backlog.  Atomic rename semantics are inherited
    from :func:`save_checkpoint`.
    """

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._pending: dict[str, tuple] = {}
        self._thread: "threading.Thread | None" = None
        self._errors: list[BaseException] = []

    def save(self, directory: str, state: TrainState, cfg: PipelineConfig, tag: str = "ckp") -> None:
        import threading

        # snapshot to host now — jax arrays are immutable, np.asarray is the
        # only device→host sync we pay on the training thread
        host_state = TrainState(
            params=jax.tree.map(np.asarray, state.params),
            model_state=jax.tree.map(np.asarray, state.model_state),
            opt_state=jax.tree.map(np.asarray, state.opt_state),
            epoch=state.epoch,
        )
        with self._lock:
            self._pending[tag] = (directory, host_state, cfg)
            # _drain clears self._thread to None UNDER THE LOCK before
            # exiting, so "is None" here is a reliable it-will-not-see-my-
            # item test.  Checking is_alive() instead races: a worker that
            # decided to exit is still alive while terminating, the enqueue
            # would assume it drains, and the snapshot would silently never
            # be written (round-3 review — a lost final checkpoint).
            if self._thread is None:
                self._thread = threading.Thread(target=self._drain, daemon=True)
                self._thread.start()

    def _drain(self) -> None:
        while True:
            with self._lock:
                if not self._pending:
                    self._thread = None  # atomic with the exit decision
                    return
                tag, (directory, state, cfg) = next(iter(self._pending.items()))
                del self._pending[tag]
            try:
                save_checkpoint(directory, state, cfg, tag)
            except BaseException as e:  # surfaced by wait()
                self._errors.append(e)

    def wait(self) -> None:
        """Block until all queued writes land; re-raise the first failure."""
        while True:
            with self._lock:
                t = self._thread
            if t is None:
                break
            t.join()
            # a save() racing the previous worker's exit may have started a
            # NEW worker — loop until the slot stays empty
        if self._errors:
            raise self._errors[0]
