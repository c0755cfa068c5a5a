"""Composed parallelism: DP × CP over one 2-D mesh.

Round-3 continuation: every strategy (DP, TP, PP, CP, EP) was validated on a
solo mesh axis; production training composes them.  These tests pin the
DP×CP composition — a batch of timelines sharded over a ``data`` axis while
each timeline's time axis shards over a ``ctx`` axis — against the monolithic
batched scorer: forward, gradients, and a full train step, for full, banded,
rotary, and multi-class variants (SURVEY.md §2.3; no reference counterpart —
the reference is single-device, `main.py:26-298`).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cvml_goalnet_tpu.models.temporal_attention import (
    temporal_transformer_apply,
    temporal_transformer_dp_cp_apply,
    temporal_transformer_init,
)
from cvml_goalnet_tpu.train.spotting import (
    init_spotting_opt,
    make_dp_cp_spotting_train_step,
    make_spotting_train_step,
)


def _mesh(nd=2, nc=4):
    devs = np.array(jax.devices()[: nd * nc]).reshape(nd, nc)
    return Mesh(devs, ("data", "ctx"))


def _params(key=0, in_dim=12, n_classes=1, pos_encoding="learned"):
    return temporal_transformer_init(
        jax.random.PRNGKey(key), in_dim, model_dim=32, num_layers=2,
        num_heads=2, max_len=64, n_classes=n_classes, pos_encoding=pos_encoding,
    )


def _batch(b=4, t=40, d=12, seed=0):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    labels = jnp.asarray((rng.random((b, t)) < 0.2).astype(np.float32))
    return feats, labels


class TestDpCpForward:
    def test_matches_vmapped_monolithic(self):
        mesh = _mesh()
        params = _params()
        feats, _ = _batch()
        out = temporal_transformer_dp_cp_apply(params, feats, mesh, 2)
        mono = jax.vmap(lambda f: temporal_transformer_apply(params, f, 2))(feats)
        np.testing.assert_allclose(np.asarray(out), np.asarray(mono), atol=1e-4)

    def test_time_padding(self):
        # T=37 not divisible by the 4-wide ctx axis — internal pad columns
        # must be masked, rows sliced back
        mesh = _mesh()
        params = _params()
        feats, _ = _batch(t=37)
        out = temporal_transformer_dp_cp_apply(params, feats, mesh, 2)
        assert out.shape == (4, 37)
        mono = jax.vmap(lambda f: temporal_transformer_apply(params, f, 2))(feats)
        np.testing.assert_allclose(np.asarray(out), np.asarray(mono), atol=1e-4)

    def test_banded(self):
        mesh = _mesh()
        params = _params()
        feats, _ = _batch()
        out = temporal_transformer_dp_cp_apply(params, feats, mesh, 2, window=8)
        mono = jax.vmap(
            lambda f: temporal_transformer_apply(params, f, 2, window=8)
        )(feats)
        np.testing.assert_allclose(np.asarray(out), np.asarray(mono), atol=1e-4)

    def test_rotary(self):
        mesh = _mesh()
        params = _params(pos_encoding="rotary")
        feats, _ = _batch()
        out = temporal_transformer_dp_cp_apply(params, feats, mesh, 2)
        mono = jax.vmap(lambda f: temporal_transformer_apply(params, f, 2))(feats)
        np.testing.assert_allclose(np.asarray(out), np.asarray(mono), atol=1e-4)

    def test_multiclass(self):
        mesh = _mesh()
        params = _params(n_classes=3)
        feats, _ = _batch()
        out = temporal_transformer_dp_cp_apply(params, feats, mesh, 2)
        assert out.shape == (4, 40, 3)
        mono = jax.vmap(lambda f: temporal_transformer_apply(params, f, 2))(feats)
        np.testing.assert_allclose(np.asarray(out), np.asarray(mono), atol=1e-4)

    def test_batch_not_divisible_raises(self):
        mesh = _mesh()
        params = _params()
        feats, _ = _batch(b=3)
        with pytest.raises(ValueError, match="divide over data axis"):
            temporal_transformer_dp_cp_apply(params, feats, mesh, 2)

    def test_degenerate_axes_match_solo_cp(self):
        # n_data=1 reduces DP×CP to plain CP over all 8 devices
        devs = np.array(jax.devices()[:8]).reshape(1, 8)
        mesh = Mesh(devs, ("data", "ctx"))
        params = _params()
        feats, _ = _batch(b=2, t=48)
        out = temporal_transformer_dp_cp_apply(params, feats, mesh, 2)
        mono = jax.vmap(lambda f: temporal_transformer_apply(params, f, 2))(feats)
        np.testing.assert_allclose(np.asarray(out), np.asarray(mono), atol=1e-4)


def _mono_loss_fn(params, feats, labels, num_heads=2, pos_weight=10.0, window=0):
    logits = jax.vmap(
        lambda f: temporal_transformer_apply(params, f, num_heads, window=window)
    )(feats).reshape(labels.shape)
    w = jnp.where(labels > 0.5, pos_weight, 1.0)
    per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.sum(w * per) / jnp.sum(w)


class TestDpCpTraining:
    def test_grads_match_monolithic(self):
        mesh = _mesh()
        params = _params()
        feats, labels = _batch()

        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_dp_cp_apply as dpcp,
        )

        def sharded_loss(p):
            logits = dpcp(p, feats, mesh, 2).reshape(labels.shape)
            w = jnp.where(labels > 0.5, 10.0, 1.0)
            per = (jnp.maximum(logits, 0) - logits * labels
                   + jnp.log1p(jnp.exp(-jnp.abs(logits))))
            return jnp.sum(w * per) / jnp.sum(w)

        gs = jax.grad(sharded_loss)(params)
        gm = jax.grad(lambda p: _mono_loss_fn(p, feats, labels))(params)
        for a, b in zip(jax.tree_util.tree_leaves(gs), jax.tree_util.tree_leaves(gm)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def test_train_step_matches_monolithic(self):
        mesh = _mesh()
        params = _params()
        feats, labels = _batch()
        step = make_dp_cp_spotting_train_step(mesh, num_heads=2)
        p1, o1, loss1 = step(params, init_spotting_opt(params), feats, labels)
        jax.block_until_ready(p1)
        assert np.isfinite(float(loss1))

        # monolithic reference step: same loss fn, same Adam
        from cvml_goalnet_tpu.train.optim import adam_update

        def mono_step(p, opt, f, l):
            loss, grads = jax.value_and_grad(_mono_loss_fn)(p, f, l)
            p, opt = adam_update(grads, opt, p, 1e-3)
            return p, opt, loss

        p2, _, loss2 = mono_step(params, init_spotting_opt(params), feats, labels)
        np.testing.assert_allclose(float(loss1), float(loss2), atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def test_banded_train_step(self):
        mesh = _mesh()
        params = _params()
        feats, labels = _batch(t=48)
        step = make_dp_cp_spotting_train_step(mesh, num_heads=2, window=8)
        p1, _, loss1 = step(params, init_spotting_opt(params), feats, labels)
        jax.block_until_ready(p1)
        gm = jax.grad(lambda p: _mono_loss_fn(p, feats, labels, window=8))(params)
        jax.block_until_ready(gm)
        assert np.isfinite(float(loss1))
        loss_mono = float(_mono_loss_fn(params, feats, labels, window=8))
        np.testing.assert_allclose(float(loss1), loss_mono, atol=1e-5)

    def test_padded_group_matches_per_timeline(self):
        # THE variable-length batching property: a group padded to its
        # longest member scores every timeline EXACTLY as the monolithic
        # scorer does on the unpadded timeline — pad rows are excluded from
        # ATTENTION (via lengths), not just from the loss.  Pad features are
        # poisoned so any leak into attention breaks the parity loudly.
        from cvml_goalnet_tpu.train.spotting import timeline_lengths

        mesh = _mesh()
        params = _params()
        feats, labels = _batch(b=4, t=40)
        lens = [40, 40, 30, 25]
        lab_pad = labels
        fpois = feats
        for i, n in enumerate(lens):
            lab_pad = lab_pad.at[i, n:].set(-1.0)
            fpois = fpois.at[i, n:].set(37.0)  # poison pad rows

        out = temporal_transformer_dp_cp_apply(
            params, fpois, mesh, 2, lengths=timeline_lengths(lab_pad))
        for i, n in enumerate(lens):
            mono = temporal_transformer_apply(params, feats[i, :n], 2)
            np.testing.assert_allclose(
                np.asarray(out[i, :n]), np.asarray(mono), atol=1e-4)

        # the train step's loss equals the shared-normalizer combination of
        # per-timeline MONOLITHIC losses on the unpadded timelines
        step = make_dp_cp_spotting_train_step(mesh, num_heads=2)
        _, _, step_loss = step(params, init_spotting_opt(params), fpois, lab_pad)
        num = den = 0.0
        for i, n in enumerate(lens):
            logits = temporal_transformer_apply(params, feats[i, :n], 2)
            lab = labels[i, :n]
            w = jnp.where(lab > 0.5, 10.0, 1.0)
            per = (jnp.maximum(logits, 0) - logits * lab
                   + jnp.log1p(jnp.exp(-jnp.abs(logits))))
            num += float(jnp.sum(w * per))
            den += float(jnp.sum(w))
        np.testing.assert_allclose(float(step_loss), num / den, rtol=1e-5)

    def test_all_pad_dummy_timeline_inert(self):
        # short groups fill with fully-masked dummy timelines (the CLI's
        # batching); a dummy must contribute nothing: changing its features
        # must not change the loss, and all gradients stay finite
        mesh = _mesh()
        params = _params()
        feats, labels = _batch(b=4, t=40)
        lab_pad = labels.at[3].set(-1.0)
        step = make_dp_cp_spotting_train_step(mesh, num_heads=2)
        _, _, loss_a = step(params, init_spotting_opt(params),
                            feats.at[3].set(0.0), lab_pad)
        p1, _, loss_b = step(params, init_spotting_opt(params),
                             feats.at[3].set(99.0), lab_pad)
        np.testing.assert_allclose(float(loss_a), float(loss_b), atol=1e-6)
        for a in jax.tree_util.tree_leaves(p1):
            assert np.all(np.isfinite(np.asarray(a)))

    def test_padded_flash_ring_matches_per_timeline(self):
        # the PRODUCTION TPU path: spot-train --cp --dp-timelines sets
        # use_flash on accelerators, so the ring hops become vmapped Pallas
        # kernels with BATCHED per-timeline valid lengths — exercise that
        # batching (interpret mode) against per-timeline monolithic scoring
        from cvml_goalnet_tpu.train.spotting import timeline_lengths

        mesh = _mesh()
        params = _params()
        feats, labels = _batch(b=4, t=40)
        lens = [40, 30, 40, 25]
        lab_pad = labels
        fpois = feats
        for i, n in enumerate(lens):
            lab_pad = lab_pad.at[i, n:].set(-1.0)
            fpois = fpois.at[i, n:].set(9.0)
        out = temporal_transformer_dp_cp_apply(
            params, fpois, mesh, 2, use_flash=True, flash_interpret=True,
            lengths=timeline_lengths(lab_pad))
        for i, n in enumerate(lens):
            mono = temporal_transformer_apply(params, feats[i, :n], 2)
            np.testing.assert_allclose(
                np.asarray(out[i, :n]), np.asarray(mono), atol=2e-4)

    def test_padded_flash_halo_matches_per_timeline(self):
        # banded variant: vmapped halo exchange + bounded flash kernel with
        # batched [lo, hi) validity scalars
        from cvml_goalnet_tpu.train.spotting import timeline_lengths

        mesh = _mesh()
        params = _params()
        feats, labels = _batch(b=4, t=48)
        lens = [48, 36, 48, 29]
        lab_pad = labels
        fpois = feats
        for i, n in enumerate(lens):
            lab_pad = lab_pad.at[i, n:].set(-1.0)
            fpois = fpois.at[i, n:].set(-7.0)
        out = temporal_transformer_dp_cp_apply(
            params, fpois, mesh, 2, window=8, use_flash=True,
            flash_interpret=True, lengths=timeline_lengths(lab_pad))
        for i, n in enumerate(lens):
            mono = temporal_transformer_apply(params, feats[i, :n], 2, window=8)
            np.testing.assert_allclose(
                np.asarray(out[i, :n]), np.asarray(mono), atol=2e-4)

    def test_padded_banded_matches_per_timeline(self):
        # same no-leak property through the halo (banded) CP path
        from cvml_goalnet_tpu.train.spotting import timeline_lengths

        mesh = _mesh()
        params = _params()
        feats, labels = _batch(b=4, t=48)
        lens = [48, 36, 48, 29]
        lab_pad = labels
        fpois = feats
        for i, n in enumerate(lens):
            lab_pad = lab_pad.at[i, n:].set(-1.0)
            fpois = fpois.at[i, n:].set(-41.0)
        out = temporal_transformer_dp_cp_apply(
            params, fpois, mesh, 2, window=8,
            lengths=timeline_lengths(lab_pad))
        for i, n in enumerate(lens):
            mono = temporal_transformer_apply(params, feats[i, :n], 2, window=8)
            np.testing.assert_allclose(
                np.asarray(out[i, :n]), np.asarray(mono), atol=1e-4)

    def test_loss_decreases(self):
        mesh = _mesh()
        params = _params()
        feats, labels = _batch(t=48, seed=3)
        step = make_dp_cp_spotting_train_step(mesh, num_heads=2)
        opt = init_spotting_opt(params)
        losses = []
        for _ in range(8):
            params, opt, loss = step(params, opt, feats, labels)
            losses.append(float(loss))
        assert losses[-1] < losses[0]


class TestTransformerTP:
    """Megatron TP for the temporal transformer via GSPMD placement: the
    UNCHANGED jitted step runs tensor-parallel once params are placed with
    transformer_param_shardings; composed DP×TP shards the feature batch
    over "data" at the same time."""

    def _tp_mesh(self, nd=2, nm=4):
        devs = np.array(jax.devices()[: nd * nm]).reshape(nd, nm)
        return Mesh(devs, ("data", "model"))

    def test_placement_actually_shards(self):
        from cvml_goalnet_tpu.parallel.sharding import place_transformer_params

        mesh = self._tp_mesh()
        params = _params(in_dim=12)
        placed = place_transformer_params(params, mesh)
        wq = placed["layers"][0]["wq"]["w"]
        # column-parallel: local shard holds 1/4 of the output features
        local = wq.addressable_shards[0].data
        assert local.shape == (32, 32 // 4)
        wo = placed["layers"][0]["wo"]["w"]
        assert wo.addressable_shards[0].data.shape == (32 // 4, 32)
        # replicated leaves stay whole
        assert placed["proj_in"]["w"].addressable_shards[0].data.shape == (12, 32)

    def test_forward_matches_replicated(self):
        from cvml_goalnet_tpu.parallel.sharding import place_transformer_params

        mesh = self._tp_mesh()
        params = _params(in_dim=12)
        placed = place_transformer_params(params, mesh)
        feats, _ = _batch(b=1)
        out_tp = jax.jit(
            lambda p, f: temporal_transformer_apply(p, f, 2)
        )(placed, feats[0])
        out = temporal_transformer_apply(params, feats[0], 2)
        np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out), atol=1e-4)

    def test_dp_tp_train_step_preserves_layout(self):
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from cvml_goalnet_tpu.parallel.sharding import place_transformer_params
        from cvml_goalnet_tpu.train.optim import adam_update

        mesh = self._tp_mesh()
        params = _params(in_dim=12)
        placed = place_transformer_params(params, mesh)
        feats, labels = _batch(b=4)
        feats = jax.device_put(feats, NamedSharding(mesh, P("data", None, None)))
        labels = jax.device_put(labels, NamedSharding(mesh, P("data", None)))

        @jax.jit
        def step(p, opt, f, l):
            loss, grads = jax.value_and_grad(_mono_loss_fn)(p, f, l)
            p, opt = adam_update(grads, opt, p, 1e-3)
            return p, opt, loss

        p1, _, loss1 = step(placed, init_spotting_opt(placed), feats, labels)
        jax.block_until_ready(p1)
        # updates keep the Megatron layout — no silent re-replication
        wq1 = p1["layers"][0]["wq"]["w"]
        assert wq1.addressable_shards[0].data.shape == (32, 32 // 4)

        # numerics equal the fully-replicated step
        p2, _, loss2 = step(params, init_spotting_opt(params), feats, labels)
        np.testing.assert_allclose(float(loss1), float(loss2), atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def _pp_mesh(nd=2, ns=4):
    devs = np.array(jax.devices()[: nd * ns]).reshape(nd, ns)
    return Mesh(devs, ("data", "pipe"))


class TestDpPp:
    """DP×PP: n_data GPipe replicas over a (data, pipe) mesh, each draining
    1/n_data of every microbatch; stage grads psum over the data axis."""

    def test_forward_matches_vmapped_monolithic(self):
        from cvml_goalnet_tpu.parallel.pp import pipeline_transformer_apply

        mesh = _pp_mesh()
        params = temporal_transformer_init(
            jax.random.PRNGKey(1), 12, model_dim=32, num_layers=4,
            num_heads=2, max_len=64,
        )
        feats, _ = _batch(b=8, t=24)
        out = pipeline_transformer_apply(
            params, feats, mesh, "pipe", 2, data_axis="data")
        mono = jax.vmap(lambda f: temporal_transformer_apply(params, f, 2))(feats)
        np.testing.assert_allclose(np.asarray(out), np.asarray(mono), atol=1e-4)

    def test_microbatch_not_divisible_raises(self):
        from cvml_goalnet_tpu.parallel.pp import pipeline_transformer_apply

        mesh = _pp_mesh()
        params = temporal_transformer_init(
            jax.random.PRNGKey(1), 12, model_dim=32, num_layers=4,
            num_heads=2, max_len=64,
        )
        feats, _ = _batch(b=4, t=24)
        # 4 microbatches of size 1 cannot shard over the 2-wide data axis
        with pytest.raises(ValueError, match="divide over data axis"):
            pipeline_transformer_apply(
                params, feats, mesh, "pipe", 2, n_micro=4, data_axis="data")

    def test_train_step_matches_monolithic(self):
        from cvml_goalnet_tpu.parallel.pp import make_pp_spotting_train_step
        from cvml_goalnet_tpu.train.optim import adam_update

        mesh = _pp_mesh()
        params = temporal_transformer_init(
            jax.random.PRNGKey(1), 12, model_dim=32, num_layers=4,
            num_heads=2, max_len=64,
        )
        feats, labels = _batch(b=8, t=24, seed=5)
        step = make_pp_spotting_train_step(
            mesh, "pipe", num_heads=2, data_axis="data")
        p1, _, loss1 = step(params, init_spotting_opt(params), feats, labels)
        jax.block_until_ready(p1)

        def mono_step(p, opt, f, l):
            loss, grads = jax.value_and_grad(_mono_loss_fn)(p, f, l)
            p, opt = adam_update(grads, opt, p, 1e-3)
            return p, opt, loss

        p2, _, loss2 = mono_step(params, init_spotting_opt(params), feats, labels)
        np.testing.assert_allclose(float(loss1), float(loss2), atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def test_rotary_forward(self):
        from cvml_goalnet_tpu.parallel.pp import pipeline_transformer_apply

        mesh = _pp_mesh()
        params = temporal_transformer_init(
            jax.random.PRNGKey(2), 12, model_dim=32, num_layers=4,
            num_heads=2, max_len=64, pos_encoding="rotary",
        )
        feats, _ = _batch(b=8, t=24)
        out = pipeline_transformer_apply(
            params, feats, mesh, "pipe", 2, data_axis="data")
        mono = jax.vmap(lambda f: temporal_transformer_apply(params, f, 2))(feats)
        np.testing.assert_allclose(np.asarray(out), np.asarray(mono), atol=1e-4)


class TestTpCp:
    """Explicit Megatron TP × ring/halo CP in one shard_map: each device holds
    H/n_model heads of T/n_ctx timeline."""

    def _mesh(self, nm=2, nc=4):
        devs = np.array(jax.devices()[: nm * nc]).reshape(nm, nc)
        return Mesh(devs, ("model", "ctx"))

    def test_forward_matches_monolithic(self):
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_tp_cp_apply,
        )

        mesh = self._mesh()
        params = _params()  # num_heads=2, model_dim=32, mlp 128 — all % 2
        feats, _ = _batch(b=1, t=40)
        out = temporal_transformer_tp_cp_apply(params, feats[0], mesh, 2)
        mono = temporal_transformer_apply(params, feats[0], 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(mono), atol=1e-4)

    def test_banded_and_padded(self):
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_tp_cp_apply,
        )

        mesh = self._mesh()
        params = _params()
        feats, _ = _batch(b=1, t=37)  # pads to 40 over the 4-wide ctx axis
        out = temporal_transformer_tp_cp_apply(params, feats[0], mesh, 2, window=6)
        mono = temporal_transformer_apply(params, feats[0], 2, window=6)
        assert out.shape == (37,)
        np.testing.assert_allclose(np.asarray(out), np.asarray(mono), atol=1e-4)

    def test_rotary(self):
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_tp_cp_apply,
        )

        mesh = self._mesh()
        params = _params(pos_encoding="rotary")
        feats, _ = _batch(b=1, t=40)
        out = temporal_transformer_tp_cp_apply(params, feats[0], mesh, 2)
        mono = temporal_transformer_apply(params, feats[0], 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(mono), atol=1e-4)

    def test_indivisible_heads_raise(self):
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_tp_cp_apply,
        )

        devs = np.array(jax.devices()[:8]).reshape(4, 2)
        mesh = Mesh(devs, ("model", "ctx"))
        params = _params()  # 2 heads cannot split over 4 model devices
        feats, _ = _batch(b=1)
        with pytest.raises(ValueError, match="must divide num_heads"):
            temporal_transformer_tp_cp_apply(params, feats[0], mesh, 2)


class Test3DParallel:
    """DP × TP × CP — all three in one shard_map over a 3-D mesh."""

    def _mesh(self):
        devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
        return Mesh(devs, ("data", "model", "ctx"))

    def test_forward_matches_vmapped_monolithic(self):
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_3d_apply,
        )

        mesh = self._mesh()
        params = _params()
        feats, _ = _batch(b=4, t=24)
        out = temporal_transformer_3d_apply(params, feats, mesh, 2)
        mono = jax.vmap(lambda f: temporal_transformer_apply(params, f, 2))(feats)
        np.testing.assert_allclose(np.asarray(out), np.asarray(mono), atol=1e-4)

    def test_grads_match_monolithic(self):
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_3d_apply,
        )

        mesh = self._mesh()
        params = _params()
        feats, labels = _batch(b=4, t=24)

        def sharded_loss(p):
            logits = temporal_transformer_3d_apply(p, feats, mesh, 2).reshape(
                labels.shape)
            w = jnp.where(labels > 0.5, 10.0, 1.0)
            per = (jnp.maximum(logits, 0) - logits * labels
                   + jnp.log1p(jnp.exp(-jnp.abs(logits))))
            return jnp.sum(w * per) / jnp.sum(w)

        gs = jax.grad(sharded_loss)(params)
        gm = jax.grad(lambda p: _mono_loss_fn(p, feats, labels))(params)
        for a, b in zip(jax.tree_util.tree_leaves(gs), jax.tree_util.tree_leaves(gm)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def test_train_step_matches_monolithic(self):
        from cvml_goalnet_tpu.train.optim import adam_update
        from cvml_goalnet_tpu.train.spotting import make_3d_spotting_train_step

        mesh = self._mesh()
        params = _params()
        feats, labels = _batch(b=4, t=24, seed=9)
        step = make_3d_spotting_train_step(mesh, num_heads=2)
        p1, _, loss1 = step(params, init_spotting_opt(params), feats, labels)
        jax.block_until_ready(p1)

        def mono_step(p, opt, f, l):
            loss, grads = jax.value_and_grad(_mono_loss_fn)(p, f, l)
            p, opt = adam_update(grads, opt, p, 1e-3)
            return p, opt, loss

        p2, _, loss2 = mono_step(params, init_spotting_opt(params), feats, labels)
        np.testing.assert_allclose(float(loss1), float(loss2), atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def test_banded_3d_train_step(self):
        from cvml_goalnet_tpu.train.spotting import make_3d_spotting_train_step

        mesh = self._mesh()
        params = _params()
        feats, labels = _batch(b=4, t=24, seed=4)
        step = make_3d_spotting_train_step(mesh, num_heads=2, window=6)
        p1, _, loss1 = step(params, init_spotting_opt(params), feats, labels)
        jax.block_until_ready(p1)
        loss_mono = float(_mono_loss_fn(params, feats, labels, window=6))
        np.testing.assert_allclose(float(loss1), loss_mono, atol=1e-5)

    def test_padded_group_matches_per_timeline(self):
        # variable-length batching through the 3-D path: poisoned pad rows
        # must not leak into attention (lengths mask them as keys)
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_3d_apply,
        )
        from cvml_goalnet_tpu.train.spotting import timeline_lengths

        mesh = self._mesh()
        params = _params()
        feats, labels = _batch(b=4, t=24)
        lens = [24, 17, 24, 11]
        lab_pad = labels
        fpois = feats
        for i, n in enumerate(lens):
            lab_pad = lab_pad.at[i, n:].set(-1.0)
            fpois = fpois.at[i, n:].set(53.0)
        out = temporal_transformer_3d_apply(
            params, fpois, mesh, 2, lengths=timeline_lengths(lab_pad))
        for i, n in enumerate(lens):
            mono = temporal_transformer_apply(params, feats[i, :n], 2)
            np.testing.assert_allclose(
                np.asarray(out[i, :n]), np.asarray(mono), atol=1e-4)
