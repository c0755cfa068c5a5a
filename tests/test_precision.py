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


class TestInt8Quantized:
    """Int8 MXU inference path (ops/quant.py + ModelConfig.quantized_inference)."""

    def test_weight_quant_roundtrip_bound(self):
        from cvml_goalnet_tpu.ops.quant import quantize_weights_per_channel

        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((3, 3, 16, 32)).astype(np.float32) *
                        rng.gamma(2.0, 1.0, (1, 1, 1, 32)).astype(np.float32))
        q, s = quantize_weights_per_channel(w, axis=3)
        assert q.dtype == jnp.int8 and s.shape == (1, 1, 1, 32)
        # symmetric rounding: reconstruction error ≤ half a quantization step
        err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(w))
        assert (err <= np.asarray(s) / 2 + 1e-7).all()

    def test_quantized_conv_close_to_float(self):
        from cvml_goalnet_tpu.ops.quant import quantized_conv2d

        rng = np.random.default_rng(1)
        x = jnp.asarray(np.abs(rng.standard_normal((4, 11, 11, 16))).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 16, 32)).astype(np.float32))
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        want = jax.lax.conv_general_dilated(x, w, (1, 1), [(1, 1)] * 2,
                                            dimension_numbers=dn)
        got = quantized_conv2d(x, w, stride=1, padding=1)
        w_, g_ = np.asarray(want), np.asarray(got)
        denom = np.abs(w_).max()
        assert np.abs(g_ - w_).max() / denom < 0.02, np.abs(g_ - w_).max() / denom

    def test_avm_quantized_scores_close_to_f32(self, small_cfg):
        import dataclasses

        cfg = small_cfg
        qcfg = dataclasses.replace(cfg.model, quantized_inference=True)
        params, state = avm_init(jax.random.PRNGKey(0), cfg.model, cfg.preprocess, cfg.audio)
        rng = np.random.default_rng(2)
        vis = rng.random((6, *cfg.preprocess.frame_size, 3)).astype(np.float32)
        aud = rng.random((6, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32)

        out32, _ = avm_apply(params, state, jnp.asarray(vis), jnp.asarray(aud), cfg=cfg.model)
        outq, _ = avm_apply(params, state, jnp.asarray(vis), jnp.asarray(aud), cfg=qcfg)
        # same drift gate as bf16: scores live on the [1, 5] scale
        np.testing.assert_allclose(np.asarray(outq), np.asarray(out32), atol=0.1)
        assert not np.array_equal(np.asarray(outq), np.asarray(out32))

    def test_train_mode_ignores_quant_flag(self, small_cfg):
        import dataclasses

        cfg = small_cfg
        qcfg = dataclasses.replace(cfg.model, quantized_inference=True)
        params, state = avm_init(jax.random.PRNGKey(0), cfg.model, cfg.preprocess, cfg.audio)
        rng = np.random.default_rng(3)
        vis = jnp.asarray(rng.random((4, *cfg.preprocess.frame_size, 3)).astype(np.float32))
        aud = jnp.asarray(rng.random((4, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32))
        key = jax.random.PRNGKey(7)
        out_q, _ = avm_apply(params, state, vis, aud, cfg=qcfg, train=True, rng=key)
        out_f, _ = avm_apply(params, state, vis, aud, cfg=cfg.model, train=True, rng=key)
        np.testing.assert_array_equal(np.asarray(out_q), np.asarray(out_f))


class TestInt8HostMirrors:
    """Repo convention: every device op has a NumPy mirror + parity test —
    the int8 quantization chain was the one ops module without them
    (round-3 review)."""

    def test_quantize_ops_match_host(self):
        from cvml_goalnet_tpu.ops.quant import (
            quantize_act_per_tensor,
            quantize_act_per_tensor_host,
            quantize_weights_per_channel,
            quantize_weights_per_channel_host,
        )

        rng = np.random.default_rng(0)
        w = rng.standard_normal((3, 3, 4, 8)).astype(np.float32)
        x = rng.standard_normal((2, 9, 9, 4)).astype(np.float32)
        wq_d, sw_d = quantize_weights_per_channel(jnp.asarray(w), 3)
        wq_h, sw_h = quantize_weights_per_channel_host(w, 3)
        np.testing.assert_array_equal(np.asarray(wq_d), wq_h)
        np.testing.assert_allclose(np.asarray(sw_d), sw_h, rtol=1e-6)
        xq_d, sx_d = quantize_act_per_tensor(jnp.asarray(x))
        xq_h, sx_h = quantize_act_per_tensor_host(x)
        np.testing.assert_array_equal(np.asarray(xq_d), xq_h)
        np.testing.assert_allclose(float(sx_d), float(sx_h), rtol=1e-6)

    def test_int8_conv_matches_host_exactly(self):
        # int32 accumulation of int8 operands is exact on both engines —
        # the parity must be EQUAL, not close
        from cvml_goalnet_tpu.ops.quant import (
            conv2d_int8,
            conv2d_int8_host,
            quantized_conv2d,
            quantized_conv2d_host,
        )

        rng = np.random.default_rng(1)
        xq = rng.integers(-127, 128, (2, 9, 9, 4)).astype(np.int8)
        wq = rng.integers(-127, 128, (3, 3, 4, 8)).astype(np.int8)
        for stride, pad in ((1, 1), (2, 0), (3, 3)):
            dev = np.asarray(conv2d_int8(jnp.asarray(xq), jnp.asarray(wq), stride, pad))
            host = conv2d_int8_host(xq, wq, stride, pad)
            np.testing.assert_array_equal(dev, host)
        x = rng.standard_normal((2, 9, 9, 4)).astype(np.float32)
        w = rng.standard_normal((3, 3, 4, 8)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(quantized_conv2d(jnp.asarray(x), jnp.asarray(w), 1, 1)),
            quantized_conv2d_host(x, w, 1, 1), atol=1e-5)

    def test_int8_linear_matches_host(self):
        # round-4 GEMM path (ViT blocks / attention projections): int8×int8
        # accumulation is exact, so the int8 GEMM must be EQUAL and the
        # float-in/float-out wrapper equal to the host mirror up to f32 eps
        from cvml_goalnet_tpu.ops.quant import (
            linear_int8,
            quantized_linear,
            quantized_linear_host,
        )

        rng = np.random.default_rng(2)
        xq = rng.integers(-127, 128, (5, 7, 24)).astype(np.int8)
        wq = rng.integers(-127, 128, (24, 16)).astype(np.int8)
        dev = np.asarray(linear_int8(jnp.asarray(xq), jnp.asarray(wq)))
        host = np.asarray(xq, np.int32).reshape(-1, 24) @ np.asarray(wq, np.int32)
        np.testing.assert_array_equal(dev, host.reshape(5, 7, 16))

        params = {
            "w": jnp.asarray(rng.standard_normal((24, 16)).astype(np.float32)),
            "b": jnp.asarray(rng.standard_normal(16).astype(np.float32)),
        }
        x = rng.standard_normal((5, 7, 24)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(quantized_linear(params, jnp.asarray(x))),
            quantized_linear_host(params, x), atol=1e-4)

    def test_quantized_linear_close_to_float(self):
        from cvml_goalnet_tpu.models.layers import linear_apply, linear_init
        from cvml_goalnet_tpu.ops.quant import quantized_linear

        params = linear_init(jax.random.PRNGKey(3), 128, 64)
        x = jax.random.normal(jax.random.PRNGKey(4), (8, 128))
        want = np.asarray(linear_apply(params, x))
        got = np.asarray(quantized_linear(params, x))
        assert np.abs(got - want).max() / np.abs(want).max() < 0.02
