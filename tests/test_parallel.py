"""Mesh / sharding / collectives tests on an 8-device virtual CPU mesh.

SURVEY.md §4: "mesh tests on CPU (× N via --xla_force_host_platform_device_count)
to test DP sharding without real TPUs" — set up in conftest.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from cvml_goalnet_tpu.config import MeshConfig
from cvml_goalnet_tpu.parallel.collectives import all_gather, pmean, ppermute_ring, psum
from cvml_goalnet_tpu.parallel.dp import make_dp_train_step
from cvml_goalnet_tpu.parallel.mesh import cpu_mesh, mesh_axis_sizes
from cvml_goalnet_tpu.parallel.sharding import fusion_param_shardings, place_params, shard_batch
from cvml_goalnet_tpu.train.optim import adam_update
from cvml_goalnet_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices("cpu")) >= 8, "conftest must force 8 CPU devices"
    return cpu_mesh(8)


@pytest.fixture(scope="module")
def mesh42():
    return cpu_mesh(8, model=2)


class TestMesh:
    def test_axis_sizes(self):
        assert mesh_axis_sizes(MeshConfig(), 8) == (8, 1)
        assert mesh_axis_sizes(MeshConfig(model=2), 8) == (4, 2)
        with pytest.raises(ValueError):
            mesh_axis_sizes(MeshConfig(model=3), 8)

    def test_build(self, mesh8, mesh42):
        assert mesh8.shape == {"data": 8, "model": 1}
        assert mesh42.shape == {"data": 4, "model": 2}


class TestCollectives:
    def test_psum_pmean_allgather(self, mesh8):
        x = jnp.arange(8.0)

        def body(xs):
            return psum(xs), pmean(xs), all_gather(xs)

        f = shard_map(
            body, mesh=mesh8,
            in_specs=P("data"), out_specs=(P(), P(), P("data")),
        )
        s, m, g = f(x)
        assert float(s[0]) == 28.0
        assert float(m[0]) == 3.5
        # tiled=False all_gather: each device holds all 8 values
        assert np.asarray(g).size == 64

    def test_ppermute_ring(self, mesh8):
        x = jnp.arange(8.0)

        def body(xs):
            return ppermute_ring(xs, shift=1)

        f = shard_map(body, mesh=mesh8, in_specs=P("data"), out_specs=P("data"))
        out = np.asarray(f(x))
        np.testing.assert_array_equal(out, np.roll(np.arange(8.0), 1))

    def test_barrier_is_identity_and_emits_a_real_allreduce(self, mesh8):
        # barrier(x) must return x AND survive compilation as an actual
        # collective — a psum of a compile-time constant is replica-
        # invariant, which XLA rewrote to a local multiply with zero ICI
        # traffic (round-3 review: the old no-arg barrier synchronized
        # nothing)
        from cvml_goalnet_tpu.parallel.collectives import barrier

        x = jnp.arange(8.0)

        def body(xs):
            return barrier(xs)

        f = jax.jit(shard_map(
            body, mesh=mesh8, in_specs=P("data"), out_specs=P("data"),
            check_rep=False))
        np.testing.assert_array_equal(np.asarray(f(x)), np.arange(8.0))
        hlo = f.lower(x).compile().as_text()
        assert "all-reduce" in hlo, "barrier's collective was folded away"


class TestDataParallelStep:
    def _batch(self, cfg, n):
        rng = np.random.default_rng(0)
        vis = rng.random((n, *cfg.preprocess.frame_size, 3)).astype(np.float32)
        aud = rng.random((n, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32)
        lab = rng.integers(1, 6, n).astype(np.float32)
        return vis, aud, lab

    def test_dp_matches_single_device(self, small_cfg, mesh8):
        cfg = small_cfg
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        vis, aud, lab = self._batch(cfg, 16)
        rng = jax.random.PRNGKey(3)

        step = make_dp_train_step(cfg, mesh8)
        p_dp, ms_dp, opt_dp, loss_dp = step(
            state.params, state.model_state, state.opt_state,
            shard_batch(mesh8, jnp.asarray(vis)), shard_batch(mesh8, jnp.asarray(aud)),
            shard_batch(mesh8, jnp.asarray(lab)), rng,
        )

        # single-device equivalent: same loss fn on the full batch
        from cvml_goalnet_tpu.models.avm import avm_apply

        def loss_fn(p):
            preds, new_ms = avm_apply(
                p, state.model_state, jnp.asarray(vis), jnp.asarray(aud), None,
                cfg=cfg.model, train=True, rng=rng,
            )
            return jnp.mean((preds[:, 0] - jnp.asarray(lab)) ** 2), new_ms

        (loss1, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        p1, _ = adam_update(
            grads, state.opt_state, state.params,
            cfg.train.learning_rate, cfg.train.b1, cfg.train.b2, cfg.train.eps,
        )
        assert np.isclose(float(loss_dp), float(loss1), atol=1e-5)
        # sharded grads all-reduce in a different order than the single-device
        # reduction → small float32 drift through Adam's rsqrt is expected
        for a, b in zip(jax.tree_util.tree_leaves(p_dp), jax.tree_util.tree_leaves(p1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)

    def test_dp_with_text_matches_single_device(self, small_cfg, mesh8):
        # 3-modality DP: text tokens shard over "data" like the other
        # modalities (round-3 continuation — DP used to reject text configs)
        import dataclasses

        from cvml_goalnet_tpu.data.text import tokenize
        from cvml_goalnet_tpu.models.avm import avm_apply

        cfg = dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(small_cfg.model, text_included=True))
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        vis, aud, lab = self._batch(cfg, 16)
        txt = tokenize(["goal!" if i % 2 else "calm play" for i in range(16)],
                       cfg.model.text_vocab_size, cfg.model.text_max_len)
        rng = jax.random.PRNGKey(3)

        step = make_dp_train_step(cfg, mesh8)
        with pytest.raises(ValueError, match="text"):
            step(state.params, state.model_state, state.opt_state,
                 shard_batch(mesh8, jnp.asarray(vis)),
                 shard_batch(mesh8, jnp.asarray(aud)),
                 shard_batch(mesh8, jnp.asarray(lab)), rng)
        p_dp, _, _, loss_dp = step(
            state.params, state.model_state, state.opt_state,
            shard_batch(mesh8, jnp.asarray(vis)), shard_batch(mesh8, jnp.asarray(aud)),
            shard_batch(mesh8, jnp.asarray(lab)), rng,
            text=shard_batch(mesh8, jnp.asarray(txt)),
        )

        def loss_fn(p):
            preds, new_ms = avm_apply(
                p, state.model_state, jnp.asarray(vis), jnp.asarray(aud),
                jnp.asarray(txt), cfg=cfg.model, train=True, rng=rng,
            )
            return jnp.mean((preds[:, 0] - jnp.asarray(lab)) ** 2), new_ms

        (loss1, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        p1, _ = adam_update(
            grads, state.opt_state, state.params,
            cfg.train.learning_rate, cfg.train.b1, cfg.train.b2, cfg.train.eps,
        )
        assert np.isclose(float(loss_dp), float(loss1), atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p_dp), jax.tree_util.tree_leaves(p1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)

    def test_dp_loop_trains_text_dataset(self, small_cfg, mesh8):
        # the full DP driver pools and shards VideoItem.text end to end
        import dataclasses

        from cvml_goalnet_tpu.data.synthetic import synthetic_change_points
        from cvml_goalnet_tpu.data.text import tokenize
        from cvml_goalnet_tpu.data.dataset import VideoItem, VideoDataset
        from cvml_goalnet_tpu.train.dp_loop import train_data_parallel

        cfg = dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(
                small_cfg.model, audio_included=False, text_included=True))
        rng = np.random.default_rng(0)
        n = 24
        full_n = n * cfg.preprocess.skip_frames
        items = []
        for seed in range(2):
            is_goal = rng.random(n) < 0.4
            items.append(VideoItem(
                video_id=f"t{seed}", title=f"t{seed}",
                visual=np.full((n, *cfg.preprocess.frame_size, 3), 0.5, np.float32),
                audio=None,
                labels=np.where(is_goal, 5.0, 1.0).astype(np.float32),
                gd_summary_masks=(rng.random((20, full_n)) < 0.15).astype(np.uint8),
                full_n_frames=full_n,
                clip_intervals=synthetic_change_points(full_n, 6, seed=seed),
                text=tokenize(
                    ["goal scored" if g else "quiet play" for g in is_goal],
                    cfg.model.text_vocab_size, cfg.model.text_max_len),
            ))
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        _, hist = train_data_parallel(
            cfg, VideoDataset(items), VideoDataset([]), state,
            num_epochs=6, global_batch=16, mesh=mesh8, verbose=False)
        assert np.isfinite(hist["train_loss"]).all()
        # visual is constant: any learning signal comes from the text branch
        assert hist["train_loss"][-1] < hist["train_loss"][0]

    def test_tensor_parallel_forward_matches(self, small_cfg, mesh42):
        """Fusion-TP sharded params produce the same outputs as replicated."""
        from cvml_goalnet_tpu.models.avm import avm_apply

        cfg = small_cfg
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        vis, aud, _ = self._batch(cfg, 8)

        def fwd(params):
            out, _ = avm_apply(params, state.model_state, jnp.asarray(vis), jnp.asarray(aud), None, cfg=cfg.model)
            return out

        base = np.asarray(fwd(state.params))
        sharded_params = place_params(state.params, mesh42, tensor_parallel=True)
        tp = np.asarray(jax.jit(fwd)(sharded_params))
        np.testing.assert_allclose(tp, base, atol=1e-5)

    def test_fusion_shardings_structure(self, small_cfg, mesh42):
        state = create_train_state(jax.random.PRNGKey(0), small_cfg)
        sh = fusion_param_shardings(state.params, mesh42)
        assert isinstance(sh["fusion"], list)
        # first hidden layer: column-parallel over "model"
        assert sh["fusion"][0]["w"].spec == P(None, "model")
        # last layer (scalar head) replicated
        assert sh["fusion"][-1]["w"].spec == P()


class TestDataParallelLoop:
    def test_dp_training_learns(self, small_cfg):
        from tests.test_train import _make_item
        from cvml_goalnet_tpu.data.dataset import VideoDataset
        from cvml_goalnet_tpu.train.dp_loop import train_data_parallel

        mesh = cpu_mesh(8)
        train_ds = VideoDataset([_make_item(small_cfg, n=16, seed=0), _make_item(small_cfg, n=16, seed=1)])
        val_ds = VideoDataset([_make_item(small_cfg, n=16, seed=2)])
        state = create_train_state(jax.random.PRNGKey(0), small_cfg)
        final, history = train_data_parallel(
            small_cfg, train_ds, val_ds, state,
            num_epochs=4, global_batch=16, mesh=mesh, verbose=False,
        )
        assert len(history["train_loss"]) == 4
        assert history["train_loss"][-1] < history["train_loss"][0]
        assert final.epoch == 4

    def test_pool_smaller_than_mesh_raises(self, small_cfg):
        # 6 pooled frames over an 8-wide data axis used to break out of every
        # step silently: zero updates, NaN history (round-3 review)
        from tests.test_train import _make_item
        from cvml_goalnet_tpu.data.dataset import VideoDataset
        from cvml_goalnet_tpu.train.dp_loop import train_data_parallel

        mesh = cpu_mesh(8)
        ds = VideoDataset([_make_item(small_cfg, n=6, seed=0)])
        state = create_train_state(jax.random.PRNGKey(0), small_cfg)
        with pytest.raises(ValueError, match="pools only 6 frames"):
            train_data_parallel(small_cfg, ds, ds, state, num_epochs=1,
                                mesh=mesh, verbose=False)

    def test_empty_val_set_no_nan_history(self, small_cfg):
        from tests.test_train import _make_item
        from cvml_goalnet_tpu.data.dataset import VideoDataset
        from cvml_goalnet_tpu.train.dp_loop import train_data_parallel

        mesh = cpu_mesh(8)
        ds = VideoDataset([_make_item(small_cfg, n=16, seed=0)])
        state = create_train_state(jax.random.PRNGKey(0), small_cfg)
        _, history = train_data_parallel(
            small_cfg, ds, VideoDataset([]), state,
            num_epochs=2, global_batch=8, mesh=mesh, verbose=False)
        assert np.isfinite(history["train_loss"]).all()
        assert history["val_loss"] == []  # skipped, not NaN-filled

    def test_dp_loop_with_tensor_parallel(self, small_cfg):
        from tests.test_train import _make_item
        from cvml_goalnet_tpu.data.dataset import VideoDataset
        from cvml_goalnet_tpu.train.dp_loop import train_data_parallel

        mesh = cpu_mesh(8, model=2)
        ds = VideoDataset([_make_item(small_cfg, n=16, seed=0)])
        state = create_train_state(jax.random.PRNGKey(0), small_cfg)
        _, history = train_data_parallel(
            small_cfg, ds, ds, state,
            num_epochs=2, global_batch=8, mesh=mesh, tensor_parallel=True, verbose=False,
        )
        assert np.isfinite(history["train_loss"]).all()


class TestMultiSlice:
    def test_single_slice_degenerate(self):
        from cvml_goalnet_tpu.parallel.multislice import build_multislice_mesh, grad_reduce_axes

        mesh = build_multislice_mesh(devices=jax.devices("cpu")[:8])
        assert mesh.shape == {"slice": 1, "data": 8, "model": 1}
        assert grad_reduce_axes(mesh) == ("data",)

    def test_model_axis_split(self):
        from cvml_goalnet_tpu.parallel.multislice import build_multislice_mesh

        mesh = build_multislice_mesh(model=2, devices=jax.devices("cpu")[:8])
        assert mesh.shape == {"slice": 1, "data": 4, "model": 2}

    def test_invalid_model_axis(self):
        from cvml_goalnet_tpu.parallel.multislice import build_multislice_mesh

        with pytest.raises(ValueError):
            build_multislice_mesh(model=3, devices=jax.devices("cpu")[:8])


class TestShardMapDP:
    def test_explicit_collectives_step(self, small_cfg, mesh8):
        """Manual-pmean shard_map DP step: runs, learns, grads all-reduced.

        Exact equality with GSPMD is not expected (per-device vs global-batch
        batchnorm stats); agreement is checked loosely plus invariants.
        """
        from cvml_goalnet_tpu.parallel.dp import make_dp_train_step_shardmap

        cfg = small_cfg
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        vis = jnp.asarray(rng.random((16, *cfg.preprocess.frame_size, 3)).astype(np.float32))
        aud = jnp.asarray(rng.random((16, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32))
        lab = jnp.asarray(rng.integers(1, 6, 16).astype(np.float32))

        step = make_dp_train_step_shardmap(cfg, mesh8)
        p, ms, opt, loss = step(
            state.params, state.model_state, state.opt_state, vis, aud, lab,
            jax.random.PRNGKey(1),
        )
        assert np.isfinite(float(loss))
        assert int(opt.step) == 1
        # params actually moved
        delta = sum(
            float(jnp.sum(jnp.abs(a - b)))
            for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(state.params))
        )
        assert delta > 0

        # compare against GSPMD step loosely (BN-stats locality differs)
        gs = make_dp_train_step(cfg, mesh8)
        _, _, _, loss_g = gs(
            state.params, state.model_state, state.opt_state,
            shard_batch(mesh8, vis), shard_batch(mesh8, aud), shard_batch(mesh8, lab),
            jax.random.PRNGKey(1),
        )
        assert abs(float(loss) - float(loss_g)) < 0.2


class TestMultiSliceNonDegenerate:
    """Round-2 (VERDICT item 10): ≥2 slices simulated by synthetic partition
    of the 8 CPU devices; grad reductions span ("data", "slice")."""

    def test_hybrid_mesh_shape_and_axes(self):
        from cvml_goalnet_tpu.parallel.multislice import build_multislice_mesh, grad_reduce_axes

        mesh = build_multislice_mesh(devices=jax.devices("cpu")[:8], n_slices=2)
        assert mesh.shape == {"slice": 2, "data": 4, "model": 1}
        assert grad_reduce_axes(mesh) == ("data", "slice")

        mesh = build_multislice_mesh(model=2, devices=jax.devices("cpu")[:8], n_slices=2)
        assert mesh.shape == {"slice": 2, "data": 2, "model": 2}

    def test_invalid_synthetic_partition(self):
        from cvml_goalnet_tpu.parallel.multislice import build_multislice_mesh

        with pytest.raises(ValueError):
            build_multislice_mesh(devices=jax.devices("cpu")[:8], n_slices=3)

    def test_dp_grads_reduce_over_slice_and_data(self):
        """A shard_map DP step over the hybrid mesh: per-device grads psum'd
        over grad_reduce_axes == the full-batch gradient on one device."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from cvml_goalnet_tpu.parallel.multislice import build_multislice_mesh, grad_reduce_axes

        mesh = build_multislice_mesh(devices=jax.devices("cpu")[:8], n_slices=2)
        axes = grad_reduce_axes(mesh)

        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((6, 1)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((16, 6)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((16,)).astype(np.float32))

        def local_grad(w, x_l, y_l):
            def loss(w):
                d = (x_l @ w)[:, 0] - y_l
                return jnp.sum(d * d)  # per-shard SUM; psum then / N = global mean

            g = jax.grad(loss)(w)
            for ax in axes:
                g = jax.lax.psum(g, ax)
            return g / x.shape[0]

        fn = shard_map(
            local_grad, mesh=mesh,
            in_specs=(P(), P(("slice", "data"), None), P(("slice", "data"))),
            out_specs=P(), check_rep=False,
        )
        got = np.asarray(jax.jit(fn)(w, x, y))

        def full_loss(w):
            d = (x @ w)[:, 0] - y
            return jnp.mean(d * d)

        want = np.asarray(jax.grad(full_loss)(w))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_dp_train_step_on_hybrid_mesh(self, small_cfg):
        """The production make_dp_train_step runs on the hybrid mesh with the
        batch sharded over BOTH slice and data axes."""
        import dataclasses

        from jax.sharding import NamedSharding, PartitionSpec as P

        from cvml_goalnet_tpu.parallel.dp import make_dp_train_step
        from cvml_goalnet_tpu.parallel.multislice import build_multislice_mesh
        from cvml_goalnet_tpu.train.state import create_train_state

        cfg = dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(small_cfg.model, audio_included=False),
        )
        mesh = build_multislice_mesh(devices=jax.devices("cpu")[:8], n_slices=2)
        # data-parallel over the flattened (slice × data) product
        flat = Mesh(np.asarray(mesh.devices).reshape(8, 1), ("data", "model"))
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        step = make_dp_train_step(cfg, flat)
        rng = np.random.default_rng(1)
        b = 16
        vis = jax.device_put(
            jnp.asarray(rng.random((b, *cfg.preprocess.frame_size, 3)).astype(np.float32)),
            NamedSharding(flat, P("data")),
        )
        lab = jax.device_put(
            jnp.asarray(rng.integers(1, 6, b).astype(np.float32)),
            NamedSharding(flat, P("data")),
        )
        params, _, _, loss = step(
            state.params, state.model_state, state.opt_state, vis, None, lab,
            jax.random.PRNGKey(2),
        )
        jax.block_until_ready(params)
        assert np.isfinite(float(loss))
