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
