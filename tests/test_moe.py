"""MoE fusion layer + expert parallelism (SURVEY.md §2.3 row "EP").

Anchors: (1) with identical experts the MoE layer IS the dense linear it
replaces; (2) the expert-parallel shard_map is exactly the single-device
layer, forward and gradients; (3) the MoE-fusion AVM trains.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvml_goalnet_tpu.models import layers as L
from cvml_goalnet_tpu.models.moe import (
    moe_apply,
    moe_gate_probs,
    moe_init,
    moe_load_balance_loss,
)
from cvml_goalnet_tpu.parallel.ep import moe_apply_expert_parallel
from cvml_goalnet_tpu.parallel.mesh import cpu_mesh

DIN, DOUT, E, N = 24, 16, 8, 32


def _layer(seed=0):
    return moe_init(jax.random.PRNGKey(seed), DIN, DOUT, E)


def _x(seed=1, n=N):
    return jax.random.normal(jax.random.PRNGKey(seed), (n, DIN))


class TestMoeLayer:
    def test_identical_experts_equal_dense(self):
        """Gates sum to 1 ⇒ identical experts reduce to the dense layer —
        the parity anchor tying MoE to reference utils.py:242-258."""
        p = _layer()
        dense = L.linear_init(jax.random.PRNGKey(9), DIN, DOUT)
        p["experts"]["w"] = jnp.broadcast_to(dense["w"], (E,) + dense["w"].shape)
        p["experts"]["b"] = jnp.broadcast_to(dense["b"], (E,) + dense["b"].shape)
        x = _x()
        for k in (1, 2, E):
            np.testing.assert_allclose(
                moe_apply(p, x, top_k=k), L.linear_apply(dense, x), atol=1e-5)

    def test_top1_routes_to_argmax_expert(self):
        p = _layer()
        x = _x()
        out = moe_apply(p, x, top_k=1)
        probs = moe_gate_probs(p, x, 1)
        picked = jnp.argmax(probs, axis=-1)
        ew, eb = p["experts"]["w"], p["experts"]["b"]
        expected = jnp.einsum("nd,ndo->no", x, ew[picked]) + eb[picked]
        np.testing.assert_allclose(out, expected, atol=1e-5)
        # exactly one nonzero combine weight per token, and it is 1
        np.testing.assert_allclose(np.sort(np.asarray(probs), axis=-1)[:, -1], 1.0,
                                   atol=1e-6)
        assert int((np.asarray(probs) > 0).sum()) == N

    def test_topk_probs_sum_to_one_with_k_support(self):
        probs = np.asarray(moe_gate_probs(_layer(), _x(), 3))
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-6)
        assert ((probs > 0).sum(-1) == 3).all()

    def test_load_balance_loss_minimized_at_uniform(self):
        # balanced hard dispatch (token i → expert i mod E), soft probs ≈ uniform
        balanced = jnp.full((N, E), 1.0 / E)
        balanced = balanced + jax.nn.one_hot(jnp.arange(N) % E, E) * 1e-3
        balanced = balanced / balanced.sum(-1, keepdims=True)
        skew = jnp.zeros((N, E)).at[:, 0].set(1.0)
        lb = float(moe_load_balance_loss(balanced))
        ls = float(moe_load_balance_loss(skew))
        assert abs(lb - 1.0) < 1e-2   # Switch loss → 1 when balanced
        assert abs(ls - E) < 1e-5     # fully collapsed → E
        assert ls > lb


class TestExpertParallel:
    @pytest.mark.parametrize("shards", [2, 4, 8])
    def test_matches_single_device(self, shards):
        mesh = cpu_mesh(8, model=shards) if shards < 8 else cpu_mesh(8, model=8)
        p, x = _layer(), _x()
        out = moe_apply_expert_parallel(p, x, mesh, "model", top_k=2)
        np.testing.assert_allclose(out, moe_apply(p, x, 2), atol=1e-5)

    def test_gradients_match_single_device(self):
        mesh = cpu_mesh(8, model=4)
        p, x = _layer(), _x()
        tgt = jax.random.normal(jax.random.PRNGKey(5), (N, DOUT))

        def loss_ep(p):
            return jnp.mean((moe_apply_expert_parallel(p, x, mesh, "model", 2) - tgt) ** 2)

        def loss_sd(p):
            return jnp.mean((moe_apply(p, x, 2) - tgt) ** 2)

        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
            jax.grad(loss_ep)(p), jax.grad(loss_sd)(p))

    def test_indivisible_experts_raise(self):
        mesh = cpu_mesh(8, model=8)
        p = moe_init(jax.random.PRNGKey(0), DIN, DOUT, 6)
        with pytest.raises(ValueError, match="divisible"):
            moe_apply_expert_parallel(p, _x(), mesh, "model")


class TestMoeFusionAVM:
    def _cfg(self, small_cfg):
        return dataclasses.replace(
            small_cfg.model, fusion_moe_experts=4, fusion_moe_top_k=2,
            audio_included=False)

    def test_forward_shape_and_train(self, small_cfg):
        from cvml_goalnet_tpu.models.avm import avm_apply, avm_init
        from cvml_goalnet_tpu.train.optim import adam_init, adam_update

        mc = self._cfg(small_cfg)
        params, state = avm_init(
            jax.random.PRNGKey(0), mc, small_cfg.preprocess, small_cfg.audio)
        h, w = small_cfg.preprocess.frame_size
        frames = jax.random.uniform(jax.random.PRNGKey(1), (6, h, w, 3))
        labels = jax.random.uniform(jax.random.PRNGKey(2), (6,)) * 4 + 1
        scores, _ = avm_apply(params, state, frames, cfg=mc)
        assert scores.shape == (6, 1)
        assert float(scores.min()) >= 1.0 and float(scores.max()) <= 5.0

        def loss_fn(p, rng):
            s, _ = avm_apply(p, state, frames, cfg=mc, train=True, rng=rng)
            return jnp.mean((s[:, 0] - labels) ** 2)

        opt = adam_init(params)
        step = jax.jit(
            lambda p, o, r: (lambda l, g: adam_update(g, o, p, 1e-3) + (l,))(
                *jax.value_and_grad(loss_fn)(p, r)))
        losses = []
        for i in range(25):
            params, opt, loss = step(params, opt, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses[::5]

    def test_cli_flag_overrides_config(self, small_cfg, tmp_path):
        import types

        from cvml_goalnet_tpu.cli import _load_cfg

        fp = str(tmp_path / "cfg.json")
        small_cfg.save(fp)
        args = types.SimpleNamespace(config=fp, moe_experts=8)
        assert _load_cfg(args).model.fusion_moe_experts == 8
        args = types.SimpleNamespace(config=fp, moe_experts=None)
        assert _load_cfg(args).model.fusion_moe_experts == 0

    def test_config_roundtrip(self, small_cfg):
        import cvml_goalnet_tpu.config as C

        cfg = dataclasses.replace(small_cfg, model=self._cfg(small_cfg))
        again = C.PipelineConfig.from_json(cfg.to_json())
        assert again.model.fusion_moe_experts == 4
        assert again.model.fusion_moe_top_k == 2

    def test_aux_loss_wired_into_train_loop(self, small_cfg):
        """The training objective must include the load-balance penalty
        whenever MoE is on — a collapsed gate otherwise trains one expert
        and calls it a mixture (round-3 review finding)."""
        from cvml_goalnet_tpu.models.avm import avm_init
        from cvml_goalnet_tpu.train.loop import make_train_video_fn
        from cvml_goalnet_tpu.train.optim import adam_init

        def run(aux_weight):
            cfg = dataclasses.replace(
                small_cfg,
                model=dataclasses.replace(
                    self._cfg(small_cfg), fusion_moe_aux_weight=aux_weight))
            params, state = avm_init(
                jax.random.PRNGKey(0), cfg.model, cfg.preprocess, cfg.audio)
            h, w = cfg.preprocess.frame_size
            S = cfg.train.subbatch_size
            frames = jax.random.uniform(jax.random.PRNGKey(1), (S, h, w, 3))
            labels = jnp.linspace(1.0, 5.0, S)
            fn = make_train_video_fn(cfg)
            _, _, _, _, loss = fn(
                params, state, adam_init(params), frames, None, labels,
                jnp.ones((S,)), jax.random.PRNGKey(3))
            return float(loss)

        base, with_aux = run(0.0), run(0.5)
        # the penalty is n_experts·Σ frac·mean_p ≥ 1, so it must show up
        assert with_aux > base + 0.25, (base, with_aux)

    def test_gate_receives_balance_gradient(self, small_cfg):
        """With aux weight on, the gate's gradient includes the balance
        term: identical experts make the TASK loss gate-invariant, so any
        gate gradient must come from the auxiliary loss."""
        from cvml_goalnet_tpu.models.avm import avm_apply, avm_init
        from cvml_goalnet_tpu.models.moe import moe_load_balance_loss

        mc = self._cfg(small_cfg)
        params, state = avm_init(
            jax.random.PRNGKey(0), mc, small_cfg.preprocess, small_cfg.audio)
        dense = L.linear_init(jax.random.PRNGKey(9), *params["fusion"][0]["experts"]["w"].shape[1:])
        params["fusion"][0]["experts"]["w"] = jnp.broadcast_to(
            dense["w"], params["fusion"][0]["experts"]["w"].shape)
        params["fusion"][0]["experts"]["b"] = jnp.broadcast_to(
            dense["b"], params["fusion"][0]["experts"]["b"].shape)
        h, w = small_cfg.preprocess.frame_size
        frames = jax.random.uniform(jax.random.PRNGKey(1), (6, h, w, 3))

        def loss(p, aux_w):
            s, _, probs = avm_apply(p, state, frames, cfg=mc,
                                    return_moe_probs=True)
            return jnp.mean(s) + aux_w * moe_load_balance_loss(probs)

        g_no = jax.grad(loss)(params, 0.0)["fusion"][0]["gate"]["w"]
        g_aux = jax.grad(loss)(params, 1.0)["fusion"][0]["gate"]["w"]
        np.testing.assert_allclose(np.asarray(g_no), 0.0, atol=1e-6)
        assert float(jnp.max(jnp.abs(g_aux))) > 1e-6


class TestMoeTpSharding:
    def test_place_params_moe_plus_tp(self, small_cfg):
        """fusion TP placement must survive a MoE first layer: the spec tree
        has to be CONGRUENT with the {gate, experts} sub-dicts (round-3
        review — this combination used to crash jax.tree.map)."""
        from cvml_goalnet_tpu.models.avm import avm_init
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh
        from cvml_goalnet_tpu.parallel.sharding import place_params

        mc = self._moe_cfg(small_cfg)
        params, _ = avm_init(
            jax.random.PRNGKey(0), mc, small_cfg.preprocess, small_cfg.audio)
        mesh = cpu_mesh(8, model=4)
        placed = place_params(params, mesh, tensor_parallel=True)
        # MoE layer stays replicated (EP is its sharding story)
        ew = placed["fusion"][0]["experts"]["w"]
        assert ew.addressable_shards[0].data.shape == ew.shape
        # later dense layers still shard Megatron-style
        w1 = placed["fusion"][1]["w"]
        assert w1.addressable_shards[0].data.shape[0] == w1.shape[0] // 4

    def _moe_cfg(self, small_cfg):
        return dataclasses.replace(
            small_cfg.model, fusion_moe_experts=4, fusion_moe_top_k=2,
            audio_included=False)
