"""bfloat16 inference path: casting contract + numerical closeness to f32."""

import numpy as np
import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.models.avm import avm_apply, avm_init
from cvml_goalnet_tpu.models.layers import linear_apply, linear_init


def _cast_tree(tree, dtype):
    return jax.tree.map(lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


class TestBF16:
    def test_linear_f32_accumulation(self):
        params = linear_init(jax.random.PRNGKey(0), 256, 64)
        x = jax.random.normal(jax.random.PRNGKey(1), (32, 256))
        y32 = linear_apply(params, x)
        y16 = linear_apply(params, x.astype(jnp.bfloat16))
        assert y16.dtype == jnp.bfloat16
        # f32 accumulation keeps bf16 outputs close to the f32 result
        np.testing.assert_allclose(
            np.asarray(y16, np.float32), np.asarray(y32), rtol=0.05, atol=0.15
        )

    def test_avm_bf16_forward_close_to_f32(self, small_cfg):
        cfg = small_cfg
        params, state = avm_init(jax.random.PRNGKey(0), cfg.model, cfg.preprocess, cfg.audio)
        rng = np.random.default_rng(0)
        vis = rng.random((6, *cfg.preprocess.frame_size, 3)).astype(np.float32)
        aud = rng.random((6, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32)

        out32, _ = avm_apply(params, state, jnp.asarray(vis), jnp.asarray(aud), cfg=cfg.model)
        out16, _ = avm_apply(
            _cast_tree(params, jnp.bfloat16),
            _cast_tree(state, jnp.bfloat16),
            jnp.asarray(vis, jnp.bfloat16),
            jnp.asarray(aud, jnp.bfloat16),
            cfg=cfg.model,
        )
        assert out16.dtype == jnp.bfloat16
        # scores live in [1,5]; bf16 end-to-end drift stays small
        np.testing.assert_allclose(
            np.asarray(out16, np.float32), np.asarray(out32), atol=0.1
        )


class TestMixedPrecisionTraining:
    def test_bf16_train_step_runs_and_learns(self, small_cfg):
        import dataclasses

        from tests.test_train import _make_item
        from cvml_goalnet_tpu.train.loop import make_train_video_fn
        from cvml_goalnet_tpu.train.state import create_train_state
        import jax.numpy as jnp2

        cfg = dataclasses.replace(
            small_cfg, train=dataclasses.replace(small_cfg.train, compute_dtype="bfloat16")
        )
        item = _make_item(cfg, n=10)
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        fn = make_train_video_fn(cfg)
        params, ms, opt = state.params, state.model_state, state.opt_state
        losses = []
        for i in range(5):
            params, ms, opt, preds, loss = fn(
                params, ms, opt, jnp2.asarray(item.visual), jnp2.asarray(item.audio),
                jnp2.asarray(item.labels), jnp2.ones(10), jax.random.PRNGKey(i),
            )
            losses.append(float(loss))
        # master params stay f32, loss finite and improving
        assert all(l == l for l in losses)
        assert losses[-1] < losses[0]
        assert all(
            leaf.dtype == jnp2.float32
            for leaf in jax.tree_util.tree_leaves(params)
        )
