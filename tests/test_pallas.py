"""Pallas kernels vs their XLA reference paths (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.models.avm import avm_init
from cvml_goalnet_tpu.models.layers import linear_apply
from cvml_goalnet_tpu.ops.pallas.fused_mlp import fused_fusion_mlp
from cvml_goalnet_tpu.ops.pallas.fused_preprocess import fused_preprocess_frames
from cvml_goalnet_tpu.ops.preprocess import preprocess_frames


class TestFusedPreprocess:
    def test_matches_xla_path(self, rng):
        frames = rng.integers(0, 255, (5, 48, 64, 3)).astype(np.float32)
        want = np.asarray(preprocess_frames(jnp.asarray(frames), (24, 24)))
        got = np.asarray(
            fused_preprocess_frames(jnp.asarray(frames), (24, 24), interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_uint8_input(self, rng):
        frames = rng.integers(0, 255, (3, 36, 36, 3), dtype=np.uint8)
        want = np.asarray(preprocess_frames(jnp.asarray(frames), (24, 24)))
        got = np.asarray(
            fused_preprocess_frames(jnp.asarray(frames), (24, 24), interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestFusedMLP:
    def test_matches_eval_fusion_chain(self, small_cfg):
        params, _ = avm_init(
            jax.random.PRNGKey(0), small_cfg.model, small_cfg.preprocess, small_cfg.audio
        )
        fusion = tuple(params["fusion"])
        d = fusion[0]["w"].shape[0]
        x = jnp.asarray(np.random.default_rng(0).standard_normal((37, d)).astype(np.float32))

        # XLA reference: the exact eval-mode chain from models/avm.py
        h = x
        for i, lp in enumerate(fusion):
            h = linear_apply(lp, h)
            if i < len(fusion) - 1:
                h = jax.nn.relu(h)
        want = 4.0 * jax.nn.sigmoid(h) + 1.0

        got = fused_fusion_mlp(x, fusion, block_rows=16, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
        assert got.shape == (37, 1)  # padding stripped


class TestFusedConvPoolStage:
    """Fused conv+relu+maxpool Pallas stage (interpret-mode parity; on TPU it
    measured slower than XLA's fusion and is NOT the production path —
    see the module docstring + docs/BENCHMARKS.md)."""

    @pytest.mark.parametrize("shape", [(20, 13, 13, 8, 16), (9, 11, 11, 16, 32)])
    def test_matches_xla_chain(self, shape):
        from cvml_goalnet_tpu.ops.pallas.fused_stage import (
            fused_conv_pool_stage, reference_stage)

        n, h, w, c, co = shape
        rng = np.random.default_rng(n)
        x = jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32))
        wt = jnp.asarray(rng.standard_normal((3, 3, c, co)).astype(np.float32) * 0.05)
        b = jnp.asarray(rng.standard_normal((h, w, co)).astype(np.float32) * 0.1)
        want = np.asarray(reference_stage(x, wt, b))
        got = np.asarray(fused_conv_pool_stage(x, wt, b, 8, True))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestHeadMatmul:
    """K-streamed tiled matmul for the flatten→linear head
    (ops/pallas/matmul.py) — interpret-mode parity vs the XLA chain,
    including the K-accumulator reset across M tiles, batch padding, and
    the no-ReLU epilogue."""

    @pytest.mark.parametrize("m,k,n,bm,bk", [
        (100, 4608, 512, 64, 2304),   # padded batch, 2 K steps
        (64, 4608, 128, 64, 1536),    # 3 K steps, single M tile
        (130, 2304, 256, 32, 2304),   # single K step (epilogue == init step)
    ])
    def test_matches_xla_gemm(self, m, k, n, bm, bk):
        from cvml_goalnet_tpu.ops.pallas.matmul import head_matmul_pallas

        rng = np.random.default_rng(m + k)
        x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32) * 0.1)
        w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.02)
        b = jnp.asarray(rng.standard_normal((n,)).astype(np.float32))
        got = np.asarray(head_matmul_pallas(x, w, b, True, bm, bk, True))
        want = np.asarray(jnp.maximum(x @ w + b, 0.0))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_no_relu(self):
        from cvml_goalnet_tpu.ops.pallas.matmul import head_matmul_pallas

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((32, 2304)).astype(np.float32) * 0.1)
        w = jnp.asarray(rng.standard_normal((2304, 128)).astype(np.float32) * 0.02)
        b = jnp.asarray(rng.standard_normal((128,)).astype(np.float32))
        got = np.asarray(head_matmul_pallas(x, w, b, False, 32, 1152, True))
        want = np.asarray(x @ w + b)
        assert (want < 0).any()  # ReLU-off actually observable
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_indivisible_block_k_raises(self):
        from cvml_goalnet_tpu.ops.pallas.matmul import head_matmul_pallas

        x = jnp.zeros((8, 1000), jnp.float32)
        w = jnp.zeros((1000, 64), jnp.float32)
        with pytest.raises(ValueError, match="must divide K"):
            head_matmul_pallas(x, w, jnp.zeros((64,)), True, 8, 512, True)
