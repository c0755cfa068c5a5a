"""Orbax checkpoint backend: sharded-aware save/restore (train/orbax_io.py)."""

import dataclasses

import numpy as np
import jax
import pytest

from cvml_goalnet_tpu.train.orbax_io import (
    load_checkpoint_orbax,
    save_checkpoint_orbax,
)
from cvml_goalnet_tpu.train.state import create_train_state


def _leaves_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestOrbaxCheckpoint:
    def test_roundtrip_full_state(self, small_cfg, tmp_path):
        st = create_train_state(jax.random.PRNGKey(0), small_cfg)
        st = st._replace(epoch=7)
        save_checkpoint_orbax(str(tmp_path), st, small_cfg, tag="opt")
        tpl = create_train_state(jax.random.PRNGKey(1), small_cfg)
        st2 = load_checkpoint_orbax(str(tmp_path), tpl, tag="opt")
        _leaves_equal(st.params, st2.params)
        _leaves_equal(st.model_state, st2.model_state)
        _leaves_equal(st.opt_state, st2.opt_state)
        assert st2.epoch == 7

    def test_mismatched_config_raises(self, small_cfg, tmp_path):
        from cvml_goalnet_tpu.train.checkpoint import CheckpointMismatchError

        st = create_train_state(jax.random.PRNGKey(0), small_cfg)
        save_checkpoint_orbax(str(tmp_path), st, small_cfg)
        other = dataclasses.replace(
            small_cfg, model=dataclasses.replace(
                small_cfg.model, fusion_hidden=(24, 12)))
        tpl = create_train_state(jax.random.PRNGKey(1), other)
        with pytest.raises(CheckpointMismatchError):
            load_checkpoint_orbax(str(tmp_path), tpl)

    def test_missing_checkpoint_raises_filenotfound(self, small_cfg, tmp_path):
        tpl = create_train_state(jax.random.PRNGKey(0), small_cfg)
        with pytest.raises(FileNotFoundError):
            load_checkpoint_orbax(str(tmp_path), tpl)

    def test_sharded_restore_lands_on_mesh(self, small_cfg, tmp_path):
        """The adapter's point: a DP/TP job resumes into SHARDED arrays —
        no host gather, each leaf restored with the template's sharding."""
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh
        from cvml_goalnet_tpu.parallel.sharding import place_params

        mesh = cpu_mesh(8)
        st = create_train_state(jax.random.PRNGKey(0), small_cfg)
        sharded_params = place_params(st.params, mesh, tensor_parallel=True)
        st_sharded = st._replace(params=sharded_params, epoch=3)
        save_checkpoint_orbax(str(tmp_path), st_sharded, small_cfg)

        tpl = create_train_state(jax.random.PRNGKey(1), small_cfg)
        tpl = tpl._replace(
            params=place_params(tpl.params, mesh, tensor_parallel=True))
        st2 = load_checkpoint_orbax(str(tmp_path), tpl)
        _leaves_equal(st.params, st2.params)
        assert st2.epoch == 3
        # restored leaves carry the template's shardings (distributed, not host)
        flat_t = jax.tree_util.tree_leaves(tpl.params)
        flat_r = jax.tree_util.tree_leaves(st2.params)
        any_sharded = False
        for t, r in zip(flat_t, flat_r):
            if isinstance(r, jax.Array) and hasattr(t, "sharding"):
                assert r.sharding.is_equivalent_to(t.sharding, r.ndim), (
                    t.sharding, r.sharding)
                any_sharded |= len(r.sharding.device_set) > 1
        assert any_sharded, "expected at least one multi-device leaf"


class TestOrbaxElasticResume:
    """Elasticity across mesh sizes: a checkpoint written from an N-device
    job must restore into an M-device (or single-device) template — orbax
    re-lays every leaf out to the TEMPLATE's sharding, so resume after
    losing/gaining chips needs no reshard step."""

    def test_restore_8dev_checkpoint_on_4dev_mesh(self, small_cfg, tmp_path):
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh
        from cvml_goalnet_tpu.parallel.sharding import place_params

        st = create_train_state(jax.random.PRNGKey(0), small_cfg)
        st8 = st._replace(
            params=place_params(st.params, cpu_mesh(8), tensor_parallel=True),
            epoch=5)
        save_checkpoint_orbax(str(tmp_path), st8, small_cfg)

        mesh4 = cpu_mesh(4)
        tpl = create_train_state(jax.random.PRNGKey(1), small_cfg)
        tpl = tpl._replace(
            params=place_params(tpl.params, mesh4, tensor_parallel=True))
        st4 = load_checkpoint_orbax(str(tmp_path), tpl)
        _leaves_equal(st.params, st4.params)
        assert st4.epoch == 5
        # every restored leaf lives on the 4-device mesh's devices only
        devs4 = set(mesh4.devices.flat)
        for leaf in jax.tree_util.tree_leaves(st4.params):
            if isinstance(leaf, jax.Array):
                assert leaf.sharding.device_set <= devs4

    def test_restore_sharded_checkpoint_single_device(self, small_cfg, tmp_path):
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh
        from cvml_goalnet_tpu.parallel.sharding import place_params

        st = create_train_state(jax.random.PRNGKey(0), small_cfg)
        st8 = st._replace(
            params=place_params(st.params, cpu_mesh(8), tensor_parallel=True),
            epoch=2)
        save_checkpoint_orbax(str(tmp_path), st8, small_cfg)
        tpl = create_train_state(jax.random.PRNGKey(1), small_cfg)  # unsharded
        st1 = load_checkpoint_orbax(str(tmp_path), tpl)
        _leaves_equal(st.params, st1.params)
        for leaf in jax.tree_util.tree_leaves(st1.params):
            if isinstance(leaf, jax.Array):
                assert len(leaf.sharding.device_set) == 1


class TestOrbaxAtomicity:
    """The rolling 'ckp' must never have a window with no valid checkpoint
    (advisor finding, round 2): saves go to a side path and swap in by
    rename; a crash mid-swap leaves the previous checkpoint at `.old`.
    The next SAVE renames it back; loads READ it in place (a load that
    renamed would race a live concurrent save's swap — round-3 review)."""

    def test_overwrite_keeps_latest(self, small_cfg, tmp_path):
        st = create_train_state(jax.random.PRNGKey(0), small_cfg)
        save_checkpoint_orbax(str(tmp_path), st._replace(epoch=1), small_cfg)
        save_checkpoint_orbax(str(tmp_path), st._replace(epoch=2), small_cfg)
        tpl = create_train_state(jax.random.PRNGKey(1), small_cfg)
        st2 = load_checkpoint_orbax(str(tmp_path), tpl)
        assert st2.epoch == 2
        # no swap debris left behind
        import os
        assert not os.path.isdir(str(tmp_path / "ckp_orbax.new"))
        assert not os.path.isdir(str(tmp_path / "ckp_orbax.old"))

    def test_load_recovers_interrupted_swap(self, small_cfg, tmp_path):
        import os

        st = create_train_state(jax.random.PRNGKey(0), small_cfg)
        save_checkpoint_orbax(str(tmp_path), st._replace(epoch=5), small_cfg)
        # simulate a crash between "old renamed away" and "new renamed in"
        os.rename(str(tmp_path / "ckp_orbax"), str(tmp_path / "ckp_orbax.old"))
        tpl = create_train_state(jax.random.PRNGKey(1), small_cfg)
        st2 = load_checkpoint_orbax(str(tmp_path), tpl)
        assert st2.epoch == 5
        _leaves_equal(st.params, st2.params)
        # the load must be READ-ONLY: renaming .old back here would race a
        # live concurrent save's two-rename swap (its final rename would hit
        # an existing dir → ENOTEMPTY and kill the trainer mid-checkpoint)
        assert not os.path.isdir(str(tmp_path / "ckp_orbax"))
        assert os.path.isdir(str(tmp_path / "ckp_orbax.old"))

    def test_save_recovers_interrupted_swap(self, small_cfg, tmp_path):
        import os

        st = create_train_state(jax.random.PRNGKey(0), small_cfg)
        save_checkpoint_orbax(str(tmp_path), st._replace(epoch=5), small_cfg)
        os.rename(str(tmp_path / "ckp_orbax"), str(tmp_path / "ckp_orbax.old"))
        save_checkpoint_orbax(str(tmp_path), st._replace(epoch=6), small_cfg)
        tpl = create_train_state(jax.random.PRNGKey(1), small_cfg)
        assert load_checkpoint_orbax(str(tmp_path), tpl).epoch == 6

    def test_restores_pre_round3_checkpoint_without_epoch_leaf(self, small_cfg, tmp_path):
        """Checkpoints written before the epoch-in-payload change must keep
        loading, with the epoch taken from the manifest (review finding)."""
        import json

        import orbax.checkpoint as ocp

        st = create_train_state(jax.random.PRNGKey(0), small_cfg)
        # write the OLD format directly: payload without the epoch leaf
        import os
        path = os.path.join(str(tmp_path), "ckp_orbax")
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, {
                "params": st.params,
                "model_state": st.model_state,
                "opt_state": st.opt_state._asdict(),
            })
        manifest = {"epoch": 4, "config": json.loads(small_cfg.to_json())}
        with open(os.path.join(str(tmp_path), "ckp_orbax_manifest.json"), "w") as f:
            json.dump(manifest, f)

        tpl = create_train_state(jax.random.PRNGKey(1), small_cfg)
        st2 = load_checkpoint_orbax(str(tmp_path), tpl)
        assert st2.epoch == 4
        _leaves_equal(st.params, st2.params)

    def test_epoch_rides_in_payload_not_manifest(self, small_cfg, tmp_path):
        """A stale manifest can never pair a wrong epoch with the weights."""
        import json

        st = create_train_state(jax.random.PRNGKey(0), small_cfg)
        save_checkpoint_orbax(str(tmp_path), st._replace(epoch=9), small_cfg)
        mpath = tmp_path / "ckp_orbax_manifest.json"
        manifest = json.loads(mpath.read_text())
        manifest["epoch"] = 1  # tamper: manifest lies
        mpath.write_text(json.dumps(manifest))
        tpl = create_train_state(jax.random.PRNGKey(1), small_cfg)
        assert load_checkpoint_orbax(str(tmp_path), tpl).epoch == 9


class TestOrbaxInTrainLoop:
    def test_train_loop_with_orbax_backend(self, small_cfg, tmp_path):
        from tests.test_train import _make_item
        from cvml_goalnet_tpu.train.loop import train_importance_model

        st = create_train_state(jax.random.PRNGKey(0), small_cfg)
        items = [_make_item(small_cfg, seed=0)]
        best, hist = train_importance_model(
            small_cfg, items, [], st, num_epochs=1,
            checkpoint_dir=str(tmp_path), verbose=False,
            checkpoint_backend="orbax",
        )
        import os
        assert os.path.isdir(str(tmp_path / "ckp_orbax"))
        assert os.path.isdir(str(tmp_path / "opt_orbax"))
        restored = load_checkpoint_orbax(str(tmp_path), st, tag="ckp")
        assert restored.epoch >= 1

    def test_unknown_backend_raises(self, small_cfg):
        from cvml_goalnet_tpu.train.loop import train_importance_model

        st = create_train_state(jax.random.PRNGKey(0), small_cfg)
        with pytest.raises(ValueError, match="checkpoint_backend"):
            train_importance_model(
                small_cfg, [], [], st, num_epochs=1,
                checkpoint_backend="protobuf")


class TestCLITrunkLoading:
    """_load_trunk (cli.py) unit-level: incomplete checkpoints fail hard."""

    def test_missing_orbax_manifest_fails_hard(self, small_cfg, tmp_path):
        import os
        import types

        from cvml_goalnet_tpu.cli import _load_trunk
        from cvml_goalnet_tpu.train.checkpoint import CheckpointMismatchError

        st = create_train_state(jax.random.PRNGKey(0), small_cfg)
        save_checkpoint_orbax(str(tmp_path), st, small_cfg, tag="opt")
        os.remove(str(tmp_path / "opt_orbax_manifest.json"))
        args = types.SimpleNamespace(checkpoint_backend=None)
        with pytest.raises(CheckpointMismatchError, match="incomplete"):
            _load_trunk({"ckp_dir": str(tmp_path)}, st, args, tags=("opt",))

    def test_no_checkpoint_at_all_raises_filenotfound(self, small_cfg, tmp_path):
        import types

        from cvml_goalnet_tpu.cli import _load_trunk

        st = create_train_state(jax.random.PRNGKey(0), small_cfg)
        args = types.SimpleNamespace(checkpoint_backend=None)
        with pytest.raises(FileNotFoundError):
            _load_trunk({"ckp_dir": str(tmp_path)}, st, args, tags=("opt",))
