"""Pipeline parallelism (GPipe) — exactness vs the monolithic scorer.

GPipe is math-identical to sequential execution (only the schedule differs),
so every test here demands near-exact agreement with
``temporal_transformer_apply`` — forward, gradients, and a full train step —
on the virtual 8-CPU-device mesh.  SURVEY.md §2.3 row "Pipeline parallelism".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvml_goalnet_tpu.models.temporal_attention import (
    temporal_transformer_apply,
    temporal_transformer_init,
)
from cvml_goalnet_tpu.parallel.mesh import cpu_mesh
from cvml_goalnet_tpu.parallel.pp import (
    make_pp_spotting_train_step,
    pipeline_transformer_apply,
    stack_pipeline_stages,
)

D_IN, DM, HEADS, T, B = 12, 16, 2, 32, 4


def _params(pos_encoding="learned", num_layers=4, n_classes=1, seed=0):
    return temporal_transformer_init(
        jax.random.PRNGKey(seed), D_IN, model_dim=DM, num_layers=num_layers,
        num_heads=HEADS, max_len=T, n_classes=n_classes,
        pos_encoding=pos_encoding)


def _feats(seed=1, b=B):
    return jax.random.normal(jax.random.PRNGKey(seed), (b, T, D_IN))


def _mono(params, feats, window=0):
    return jax.vmap(
        lambda f: temporal_transformer_apply(params, f, HEADS, False, False, window)
    )(feats)


class TestStacking:
    def test_roundtrip_shapes(self):
        p = _params(num_layers=4)
        stacked = stack_pipeline_stages(p["layers"], 2)
        assert stacked["wq"]["w"].shape == (2, 2, DM, DM)

    def test_indivisible_layers_raise(self):
        p = _params(num_layers=4)
        with pytest.raises(ValueError, match="not divisible"):
            stack_pipeline_stages(p["layers"], 3)


class TestForwardParity:
    @pytest.mark.parametrize("pos", ["learned", "rotary"])
    def test_matches_monolithic_4_stages(self, pos):
        mesh = cpu_mesh(4, model=4)
        p = _params(pos)
        feats = _feats()
        out = pipeline_transformer_apply(p, feats, mesh, "model", HEADS)
        np.testing.assert_allclose(out, _mono(p, feats), atol=1e-5)

    def test_matches_monolithic_2_stages_on_8dev_mesh(self):
        mesh = cpu_mesh(8, model=2)  # data=4 idle for PP; stage axis = model
        p = _params()
        feats = _feats()
        out = pipeline_transformer_apply(p, feats, mesh, "model", HEADS)
        np.testing.assert_allclose(out, _mono(p, feats), atol=1e-5)

    def test_banded_attention_window(self):
        mesh = cpu_mesh(4, model=4)
        p = _params("rotary")
        feats = _feats()
        out = pipeline_transformer_apply(p, feats, mesh, "model", HEADS, window=8)
        np.testing.assert_allclose(out, _mono(p, feats, window=8), atol=1e-5)

    def test_multiclass_head(self):
        mesh = cpu_mesh(4, model=4)
        p = _params(n_classes=3)
        feats = _feats()
        out = pipeline_transformer_apply(p, feats, mesh, "model", HEADS)
        assert out.shape == (B, T, 3)
        np.testing.assert_allclose(out, _mono(p, feats), atol=1e-5)

    @pytest.mark.parametrize("n_micro", [1, 2, 4])
    def test_microbatch_counts(self, n_micro):
        mesh = cpu_mesh(4, model=4)
        p = _params()
        feats = _feats()
        out = pipeline_transformer_apply(p, feats, mesh, "model", HEADS, n_micro=n_micro)
        np.testing.assert_allclose(out, _mono(p, feats), atol=1e-5)

    def test_indivisible_batch_raises(self):
        mesh = cpu_mesh(4, model=4)
        with pytest.raises(ValueError, match="microbatch"):
            pipeline_transformer_apply(_params(), _feats(b=5), mesh, "model",
                                       HEADS, n_micro=4)


class TestGradientParity:
    def test_grads_match_monolithic(self):
        """The AD transpose of the forward schedule IS the reverse pipeline —
        parameter gradients must equal the monolithic scorer's."""
        mesh = cpu_mesh(4, model=4)
        p = _params()
        feats = _feats()
        tgt = jax.random.normal(jax.random.PRNGKey(7), (B, T))

        def loss_pp(p):
            s = pipeline_transformer_apply(p, feats, mesh, "model", HEADS)
            return jnp.mean((s - tgt) ** 2)

        def loss_mono(p):
            return jnp.mean((_mono(p, feats) - tgt) ** 2)

        g_pp = jax.grad(loss_pp)(p)
        g_mono = jax.grad(loss_mono)(p)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=2e-5),
            g_pp, g_mono)


class TestTrainStep:
    def _data(self):
        feats = _feats(2)
        labels = (jax.random.uniform(jax.random.PRNGKey(3), (B, T)) < 0.1).astype(
            jnp.float32)
        return feats, labels

    def test_step_matches_monolithic_batched_step(self):
        from cvml_goalnet_tpu.train.optim import adam_init, adam_update

        mesh = cpu_mesh(4, model=4)
        p = _params()
        feats, labels = self._data()
        step = make_pp_spotting_train_step(mesh, "model", HEADS, lr=1e-3)
        p_pp, _, loss_pp = step(p, adam_init(p), feats, labels)

        def loss_mono(params):
            logits = _mono(params, feats)
            w = jnp.where(labels > 0.5, 10.0, 1.0)
            per = (jnp.maximum(logits, 0) - logits * labels
                   + jnp.log1p(jnp.exp(-jnp.abs(logits))))
            return jnp.sum(w * per) / jnp.sum(w)

        l_mono, g = jax.value_and_grad(loss_mono)(p)
        p_mono, _ = adam_update(g, adam_init(p), p, 1e-3)
        assert abs(float(loss_pp) - float(l_mono)) < 1e-5
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
            p_pp, p_mono)

    def test_training_reduces_loss(self):
        mesh = cpu_mesh(4, model=4)
        from cvml_goalnet_tpu.train.optim import adam_init

        p = _params("rotary")
        feats, labels = self._data()
        step = make_pp_spotting_train_step(mesh, "model", HEADS, lr=3e-3)
        opt = adam_init(p)
        losses = []
        for _ in range(30):
            p, opt, loss = step(p, opt, feats, labels)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.7, losses[::6]
