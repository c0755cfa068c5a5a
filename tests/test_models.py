"""Model-layer tests: shapes, output ranges, grads, state, and variants."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.models.audio import audio_encoder_apply, audio_encoder_init, audio_temporal_trace
from cvml_goalnet_tpu.models.avm import avm_apply, avm_init, fusion_input_dim
from cvml_goalnet_tpu.models.layers import count_params
from cvml_goalnet_tpu.models.temporal import detect_peaks, temporal_scorer_apply, temporal_scorer_init
from cvml_goalnet_tpu.models.text import text_encoder_apply, text_encoder_init
from cvml_goalnet_tpu.models.visual import visual_encoder_apply, visual_encoder_init, visual_spatial_trace


class TestVisual:
    def test_reference_spatial_trace(self, full_cfg):
        # 40→15→13 / 13→13→11 / 11→11→9 (SURVEY.md C8) → flatten 512·81.
        assert visual_spatial_trace((40, 40), 3) == [(13, 13), (11, 11), (9, 9)]
        params, _ = visual_encoder_init(jax.random.PRNGKey(0), full_cfg.model, full_cfg.preprocess)
        assert params["head"]["w"].shape == (512 * 9 * 9, 512)

    def test_forward_shapes_and_state(self, small_cfg):
        params, state = visual_encoder_init(jax.random.PRNGKey(0), small_cfg.model, small_cfg.preprocess)
        x = jnp.asarray(np.random.default_rng(0).random((4, 24, 24, 3), ).astype(np.float32))
        out, new_state = visual_encoder_apply(
            params, state, x, train=True, rng=jax.random.PRNGKey(1), dropout_rate=0.2
        )
        assert out.shape == (4, small_cfg.model.vis_feature_dim)
        # batchnorm running stats must move in train mode
        assert not np.allclose(np.asarray(new_state["bn0"]["mean"]), 0.0)


class TestAudioBranch:
    def test_reference_temporal_trace(self, full_cfg):
        # 30→15→8 (SURVEY.md C8a) → flatten 128·8=1024.
        assert audio_temporal_trace(30, 2) == [15, 8]
        params = audio_encoder_init(jax.random.PRNGKey(0), full_cfg.model, full_cfg.audio)
        assert params["head"]["w"].shape == (1024, 128)

    def test_forward(self, small_cfg):
        params = audio_encoder_init(jax.random.PRNGKey(0), small_cfg.model, small_cfg.audio)
        x = jnp.asarray(np.random.default_rng(0).random((5, small_cfg.audio.bin_length, small_cfg.audio.n_mfcc)).astype(np.float32))
        out = audio_encoder_apply(params, x)
        assert out.shape == (5, small_cfg.model.aud_feature_dim)


class TestAVM:
    def _batch(self, cfg, n=6):
        rng = np.random.default_rng(0)
        vis = jnp.asarray(rng.random((n, *cfg.preprocess.frame_size, 3)).astype(np.float32))
        aud = jnp.asarray(rng.random((n, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32))
        return vis, aud

    def test_output_range(self, small_cfg):
        params, state = avm_init(jax.random.PRNGKey(0), small_cfg.model, small_cfg.preprocess, small_cfg.audio)
        vis, aud = self._batch(small_cfg)
        out, _ = avm_apply(params, state, vis, aud, cfg=small_cfg.model)
        assert out.shape == (6, 1)
        assert float(out.min()) >= 1.0 and float(out.max()) <= 5.0

    def test_no_audio_variant(self, small_cfg):
        mc = dataclasses.replace(small_cfg.model, audio_included=False)
        params, state = avm_init(jax.random.PRNGKey(0), mc, small_cfg.preprocess, small_cfg.audio)
        assert "audio" not in params
        vis, _ = self._batch(small_cfg)
        out, _ = avm_apply(params, state, vis, None, cfg=mc)
        assert out.shape == (6, 1)

    def test_classifier_variant(self, small_cfg):
        params, state = avm_init(
            jax.random.PRNGKey(0), small_cfg.model, small_cfg.preprocess, small_cfg.audio, classifier=True
        )
        vis, aud = self._batch(small_cfg)
        out, _ = avm_apply(params, state, vis, aud, cfg=small_cfg.model, classifier=True)
        assert out.shape == (6, 5)

    def test_grads_finite_and_nonzero(self, small_cfg):
        params, state = avm_init(jax.random.PRNGKey(0), small_cfg.model, small_cfg.preprocess, small_cfg.audio)
        vis, aud = self._batch(small_cfg)
        labels = jnp.asarray(np.random.default_rng(1).uniform(1, 5, 6).astype(np.float32))

        def loss(p):
            out, _ = avm_apply(p, state, vis, aud, cfg=small_cfg.model, train=True, rng=jax.random.PRNGKey(2))
            return jnp.mean((out[:, 0] - labels) ** 2)

        grads = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
        assert total > 0

    def test_dropout_rng_determinism(self, small_cfg):
        params, state = avm_init(jax.random.PRNGKey(0), small_cfg.model, small_cfg.preprocess, small_cfg.audio)
        vis, aud = self._batch(small_cfg)
        a, _ = avm_apply(params, state, vis, aud, cfg=small_cfg.model, train=True, rng=jax.random.PRNGKey(5))
        b, _ = avm_apply(params, state, vis, aud, cfg=small_cfg.model, train=True, rng=jax.random.PRNGKey(5))
        c, _ = avm_apply(params, state, vis, aud, cfg=small_cfg.model, train=True, rng=jax.random.PRNGKey(6))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.allclose(np.asarray(a), np.asarray(c))

    def test_three_modality_fusion(self, small_cfg):
        mc = dataclasses.replace(small_cfg.model, text_included=True)
        params, state = avm_init(jax.random.PRNGKey(0), mc, small_cfg.preprocess, small_cfg.audio)
        assert fusion_input_dim(mc) == mc.vis_feature_dim + mc.aud_feature_dim + mc.text_feature_dim
        vis, aud = self._batch(small_cfg)
        tokens = jnp.asarray(np.random.default_rng(0).integers(1, mc.text_vocab_size, (6, mc.text_max_len)))
        out, _ = avm_apply(params, state, vis, aud, tokens, cfg=mc)
        assert out.shape == (6, 1)


class TestText:
    def test_masked_pooling_ignores_padding(self, small_cfg):
        mc = small_cfg.model
        params = text_encoder_init(jax.random.PRNGKey(0), mc)
        toks = np.zeros((2, mc.text_max_len), np.int32)
        toks[0, :4] = [5, 6, 7, 8]
        toks[1, :4] = [5, 6, 7, 8]
        toks[1, 4:8] = 0  # same content, padding only differs in zeros
        out = text_encoder_apply(params, jnp.asarray(toks), cfg=mc)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]), atol=1e-5)


class TestTemporal:
    def test_scan_scorer_and_peaks(self, small_cfg):
        params = temporal_scorer_init(jax.random.PRNGKey(0), 16, small_cfg.model.temporal_hidden)
        feats = jnp.asarray(np.random.default_rng(0).standard_normal((50, 16)).astype(np.float32))
        scores = temporal_scorer_apply(params, feats, small_cfg.model.temporal_hidden)
        assert scores.shape == (50,)
        mask = np.asarray(detect_peaks(scores, window=3, threshold=-1e9))
        assert mask.any()
        # peaks are local maxima
        s = np.asarray(scores)
        for i in np.nonzero(mask)[0]:
            lo, hi = max(0, i - 3), min(50, i + 4)
            assert s[i] >= s[lo:hi].max() - 1e-6

    def test_param_count_positive(self, small_cfg):
        params = temporal_scorer_init(jax.random.PRNGKey(0), 16, 8)
        assert count_params(params) > 0


class TestTemporalHybrid:
    """GRU-augmented banded transformer (models/temporal_hybrid)."""

    def _init(self, n_classes=1, window_len=64):
        from cvml_goalnet_tpu.models.temporal_hybrid import temporal_hybrid_init

        return temporal_hybrid_init(
            jax.random.PRNGKey(0), 16, 8, model_dim=16, num_layers=1,
            num_heads=2, max_len=window_len, n_classes=n_classes,
            pos_encoding="rotary")

    def test_shapes_single_and_multiclass(self):
        from cvml_goalnet_tpu.models.temporal_hybrid import temporal_hybrid_apply

        feats = jnp.asarray(
            np.random.default_rng(0).standard_normal((40, 16)).astype(np.float32))
        s1 = temporal_hybrid_apply(self._init(), feats, 8, 2, False, False, 4)
        assert s1.shape == (40,)
        s3 = temporal_hybrid_apply(self._init(n_classes=3), feats, 8, 2, False, False, 4)
        assert s3.shape == (40, 3)

    def test_gru_carries_context_beyond_the_band(self):
        """The design intent: with a band of ±4, a feature change at t=0 must
        still move the score at t=12 — the GRU state carries it through the
        band, where a 1-layer banded transformer provably cannot (its
        receptive field ends at |i−j| = 4).  t=12 keeps the probe within the
        random-init GRU's float32 memory horizon (gated decay zeroes a t=0
        perturbation long before t=32)."""
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_apply, temporal_transformer_init)
        from cvml_goalnet_tpu.models.temporal_hybrid import temporal_hybrid_apply

        params = self._init()
        rng = np.random.default_rng(1)
        base = rng.standard_normal((40, 16)).astype(np.float32)
        spiked = base.copy()
        spiked[0] += 5.0
        w, probe = 4, 12
        h0 = temporal_hybrid_apply(params, jnp.asarray(base), 8, 2, False, False, w)
        h1 = temporal_hybrid_apply(params, jnp.asarray(spiked), 8, 2, False, False, w)
        assert abs(float(h1[probe] - h0[probe])) > 1e-7

        tparams = temporal_transformer_init(
            jax.random.PRNGKey(0), 16, model_dim=16, num_layers=1,
            num_heads=2, max_len=64, pos_encoding="rotary")
        t0 = temporal_transformer_apply(tparams, jnp.asarray(base), 2, False, False, w)
        t1 = temporal_transformer_apply(tparams, jnp.asarray(spiked), 2, False, False, w)
        np.testing.assert_allclose(t1[probe], t0[probe], atol=1e-6)  # band-blind

    def test_train_step_reduces_loss(self):
        from cvml_goalnet_tpu.train.spotting import (
            init_spotting_opt, make_spotting_train_step)

        params = self._init()
        step = make_spotting_train_step(
            8, lr=3e-3, scorer="hybrid", num_heads=2, window=4)
        opt = init_spotting_opt(params)
        rng = np.random.default_rng(2)
        feats = jnp.asarray(rng.standard_normal((48, 16)).astype(np.float32))
        labels = jnp.asarray((rng.random(48) < 0.1).astype(np.float32))
        losses = []
        for _ in range(30):
            params, opt, loss = step(params, opt, feats, labels)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestResNetBackbone:
    def test_forward_and_train_step(self, small_cfg):
        import dataclasses
        from cvml_goalnet_tpu.models.resnet import resnet_encoder_init, resnet_encoder_apply

        cfg = dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(small_cfg.model, vis_backbone="resnet", vis_channels=(8, 16)),
        )
        params, state = resnet_encoder_init(jax.random.PRNGKey(0), cfg.model, cfg.preprocess)
        x = jnp.asarray(np.random.default_rng(0).random((4, 24, 24, 3)).astype(np.float32))
        out, new_state = resnet_encoder_apply(
            params, state, x, train=True, rng=jax.random.PRNGKey(1), dropout_rate=0.1
        )
        assert out.shape == (4, cfg.model.vis_feature_dim)
        assert not np.allclose(np.asarray(new_state["bn_stem"]["mean"]), 0.0)

        # full AVM with resnet backbone, grads flow
        p, s = avm_init(jax.random.PRNGKey(0), cfg.model, cfg.preprocess, cfg.audio)
        aud = jnp.asarray(np.random.default_rng(0).random((4, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32))

        def loss(pp):
            o, _ = avm_apply(pp, s, x, aud, cfg=cfg.model, train=True, rng=jax.random.PRNGKey(2))
            return jnp.mean(o)

        g = jax.grad(loss)(p)
        total = sum(float(jnp.sum(jnp.abs(t))) for t in jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0

    def test_imagenet_stem_selected_and_downsamples(self, small_cfg):
        # frames ≥ 32 px → 7×7/2 conv + 3×3/2 maxpool (4× reduction before
        # stage 0 — ResNet-18's actual layout; the full-res stage 0 was why
        # this family sat below the 50× floor).  <32 px keeps the CIFAR stem.
        import dataclasses
        from cvml_goalnet_tpu.models.resnet import resnet_encoder_apply, resnet_encoder_init

        mc = dataclasses.replace(small_cfg.model, vis_backbone="resnet", vis_channels=(8, 16))
        pre40 = dataclasses.replace(small_cfg.preprocess, frame_size=(40, 40))
        params, state = resnet_encoder_init(jax.random.PRNGKey(0), mc, pre40)
        assert params["stem"]["w"].shape[:2] == (7, 7)
        x = jnp.asarray(np.random.default_rng(1).random((2, 40, 40, 3)).astype(np.float32))
        out, _ = resnet_encoder_apply(
            params, state, x, train=False, rng=None, dropout_rate=0.0)
        assert out.shape == (2, mc.vis_feature_dim)
        out_q, _ = resnet_encoder_apply(
            params, state, x, train=False, rng=None, dropout_rate=0.0, quant=True)
        assert out_q.shape == (2, mc.vis_feature_dim)

        p24, _ = resnet_encoder_init(jax.random.PRNGKey(0), mc, small_cfg.preprocess)
        assert p24["stem"]["w"].shape[:2] == (3, 3)

    def test_quant_eval_close_to_float(self, small_cfg):
        # round-4 int8 path: bn-folded block convs on the int8 MXU must track
        # the float eval path within the shared [1,5]-scale drift gate — with
        # REAL running stats (one train-mode pass first), so the fold itself
        # is exercised, not just identity bn
        import dataclasses
        from cvml_goalnet_tpu.models.resnet import resnet_encoder_apply, resnet_encoder_init

        cfg = dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(small_cfg.model, vis_backbone="resnet", vis_channels=(8, 16)),
        )
        params, state = resnet_encoder_init(jax.random.PRNGKey(0), cfg.model, cfg.preprocess)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.random((4, 24, 24, 3)).astype(np.float32))
        _, state = resnet_encoder_apply(
            params, state, x, train=True, rng=jax.random.PRNGKey(1), dropout_rate=0.0)
        kw = dict(train=False, rng=None, dropout_rate=0.0)
        out_f, _ = resnet_encoder_apply(params, state, x, **kw)
        out_q, _ = resnet_encoder_apply(params, state, x, quant=True, **kw)
        f, q = np.asarray(out_f), np.asarray(out_q)
        assert not np.array_equal(q, f)  # int8 rounding must be live
        scale = max(np.abs(f).max(), 1e-6)
        assert np.abs(q - f).max() / scale < 0.05, np.abs(q - f).max() / scale


class TestFoldedBatchnormEval:
    """Round-2 roofline work: eval-mode batchnorm folding into the consuming
    conv/linear must be exact — incl. negative gammas and padded borders
    (the additive term is computed with a batch-1 conv so zero-padding edge
    outputs, which see fewer t-taps, stay correct)."""

    def test_folded_equals_unfolded(self, small_cfg):
        from cvml_goalnet_tpu.config import ModelConfig, PreprocessConfig
        from cvml_goalnet_tpu.models import layers as L
        from cvml_goalnet_tpu.models.visual import (
            _STAGE_GEOM, visual_encoder_apply, visual_encoder_init)

        cfg = ModelConfig()
        pre = PreprocessConfig()
        params, state = visual_encoder_init(jax.random.PRNGKey(0), cfg, pre)
        rng = np.random.default_rng(0)
        for i in range(3):
            c = params[f"conv{i}"]["b"].shape[0]
            params[f"bn{i}"]["scale"] = jnp.asarray(rng.normal(1.0, 0.3, c).astype(np.float32))
            params[f"bn{i}"]["bias"] = jnp.asarray(rng.normal(0, 0.2, c).astype(np.float32))
            state[f"bn{i}"]["mean"] = jnp.asarray(rng.normal(0, 0.5, c).astype(np.float32))
            state[f"bn{i}"]["var"] = jnp.asarray((rng.random(c) * 2 + 0.1).astype(np.float32))
        # a negative gamma: max-pool does NOT commute with it, but the fold
        # targets the NEXT conv (linear in its input), so it must stay exact
        params["bn1"]["scale"] = params["bn1"]["scale"].at[0].set(-0.7)

        x = jnp.asarray(rng.random((4, 40, 40, 3)).astype(np.float32))

        def unfolded(params, state, x):
            for i in range(3):
                _, s, p = _STAGE_GEOM[i]
                x = L.conv2d_apply(params[f"conv{i}"], x, stride=s, padding=p)
                x = jax.nn.relu(x)
                x = L.maxpool2d(x, 3, 1)
                x, _ = L.batchnorm_apply(params[f"bn{i}"], state[f"bn{i}"], x, train=False)
            x = x.reshape(x.shape[0], -1)
            return jax.nn.relu(L.linear_apply(params["head"], x))

        ref = np.asarray(unfolded(params, state, x))
        got, _ = visual_encoder_apply(
            params, state, x, train=False, rng=jax.random.PRNGKey(0), dropout_rate=0.2)
        np.testing.assert_allclose(np.asarray(got), ref, atol=5e-5)

    def test_folded_rectangular_frames(self):
        """The conv-formulated head (round 3: flatten+GEMM re-expressed as an
        H×W VALID conv) must reshape the folded weight H-major for ANY
        spatial trace, not just the square 40×40 one."""
        from cvml_goalnet_tpu.config import ModelConfig, PreprocessConfig
        from cvml_goalnet_tpu.models import layers as L
        from cvml_goalnet_tpu.models.visual import (
            _STAGE_GEOM, visual_encoder_apply, visual_encoder_init)

        cfg = ModelConfig(vis_channels=(8, 16, 16), vis_feature_dim=24)
        pre = PreprocessConfig(frame_size=(40, 28))
        params, state = visual_encoder_init(jax.random.PRNGKey(1), cfg, pre)
        rng = np.random.default_rng(1)
        for i in range(3):
            c = params[f"conv{i}"]["b"].shape[0]
            state[f"bn{i}"]["mean"] = jnp.asarray(rng.normal(0, 0.5, c).astype(np.float32))
            state[f"bn{i}"]["var"] = jnp.asarray((rng.random(c) * 2 + 0.1).astype(np.float32))

        x = jnp.asarray(rng.random((3, 40, 28, 3)).astype(np.float32))

        def unfolded(params, state, x):
            for i in range(3):
                _, s, p = _STAGE_GEOM[i]
                x = L.conv2d_apply(params[f"conv{i}"], x, stride=s, padding=p)
                x = jax.nn.relu(x)
                x = L.maxpool2d(x, 3, 1)
                x, _ = L.batchnorm_apply(params[f"bn{i}"], state[f"bn{i}"], x, train=False)
            x = x.reshape(x.shape[0], -1)
            return jax.nn.relu(L.linear_apply(params["head"], x))

        ref = np.asarray(unfolded(params, state, x))
        got, _ = visual_encoder_apply(
            params, state, x, train=False, rng=jax.random.PRNGKey(0), dropout_rate=0.2)
        assert got.shape == (3, 24)
        np.testing.assert_allclose(np.asarray(got), ref, atol=5e-5)


class TestViTBackbone:
    """Third visual model family (models/vit.py): patch-transformer encoder
    behind the same init/apply contract as the conv backbones."""

    def _cfg(self, small_cfg):
        return dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(
                small_cfg.model, vis_backbone="vit",
                vit_patch_size=8, vit_embed_dim=32, vit_depth=2,
                vit_num_heads=2),
        )

    def test_forward_shape_state_and_determinism(self, small_cfg):
        from cvml_goalnet_tpu.models.vit import vit_encoder_apply, vit_encoder_init

        cfg = self._cfg(small_cfg)
        params, state = vit_encoder_init(jax.random.PRNGKey(0), cfg.model, cfg.preprocess)
        assert state == {}  # no batch statistics — LayerNorm only
        # 24×24 at patch 8 → 3×3 grid = 9 tokens
        assert params["pos"].shape == (9, cfg.model.vit_embed_dim)
        x = jnp.asarray(np.random.default_rng(0).random((4, 24, 24, 3)).astype(np.float32))
        out, new_state = vit_encoder_apply(
            params, state, x, train=False, rng=jax.random.PRNGKey(1),
            dropout_rate=0.2, num_heads=2, patch=8)
        assert out.shape == (4, cfg.model.vis_feature_dim)
        assert new_state == {}
        out2, _ = vit_encoder_apply(
            params, state, x, train=False, rng=jax.random.PRNGKey(99),
            dropout_rate=0.2, num_heads=2, patch=8)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))  # eval: no rng

    def test_patchify_matches_manual_slices(self, small_cfg):
        from cvml_goalnet_tpu.models.vit import _patchify

        rng = np.random.default_rng(1)
        x = rng.random((2, 24, 16, 3)).astype(np.float32)  # non-square
        toks = np.asarray(_patchify(jnp.asarray(x), 8))
        assert toks.shape == (2, 3 * 2, 8 * 8 * 3)
        # token (i, j) must be the raster-order flatten of the (i, j) patch
        for i in range(3):
            for j in range(2):
                expect = x[:, i * 8:(i + 1) * 8, j * 8:(j + 1) * 8, :].reshape(2, -1)
                np.testing.assert_array_equal(toks[:, i * 2 + j], expect)

    def test_full_avm_trains(self, small_cfg):
        from cvml_goalnet_tpu.train.optim import adam_init, adam_update

        cfg = self._cfg(small_cfg)
        # dropout off: the smoke asserts a deterministic loss decrease
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, dropout_rate=0.0))
        p, s = avm_init(jax.random.PRNGKey(0), cfg.model, cfg.preprocess, cfg.audio)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((8, 24, 24, 3)).astype(np.float32))
        aud = jnp.asarray(rng.random(
            (8, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32))
        y = jnp.asarray(rng.uniform(1, 5, 8).astype(np.float32))

        def loss_fn(pp, key):
            o, _ = avm_apply(pp, s, x, aud, cfg=cfg.model, train=True, rng=key)
            d = o[:, 0] - y
            return jnp.mean(d * d)

        opt = adam_init(p)
        losses = []
        for i in range(20):
            l, g = jax.value_and_grad(loss_fn)(p, jax.random.PRNGKey(i))
            p, opt = adam_update(g, opt, p, 3e-3)
            losses.append(float(l))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.8

    def test_geometry_validation(self, small_cfg):
        import pytest

        from cvml_goalnet_tpu.models.vit import vit_encoder_init

        cfg = self._cfg(small_cfg)
        bad_patch = dataclasses.replace(cfg.model, vit_patch_size=7)
        with pytest.raises(ValueError, match="vit_patch_size"):
            vit_encoder_init(jax.random.PRNGKey(0), bad_patch, cfg.preprocess)
        bad_heads = dataclasses.replace(cfg.model, vit_num_heads=5)
        with pytest.raises(ValueError, match="vit_num_heads"):
            vit_encoder_init(jax.random.PRNGKey(0), bad_heads, cfg.preprocess)

    def test_unknown_backbone_fails_loudly(self, small_cfg):
        import pytest

        from cvml_goalnet_tpu.models.avm import _visual_init

        bad = dataclasses.replace(small_cfg.model, vis_backbone="resnett")
        with pytest.raises(ValueError, match="unknown vis_backbone"):
            _visual_init(bad)

    def test_quant_flag_routes_to_int8(self, small_cfg):
        # round 2-3 warned-and-floated here; since round 4 every backbone
        # family has an int8 path, so the flag must change the numbers (int8
        # rounding) while staying inside the shared drift gate
        cfg = self._cfg(small_cfg)
        mc = dataclasses.replace(cfg.model, audio_included=False)
        qc = dataclasses.replace(mc, quantized_inference=True)
        p, s = avm_init(jax.random.PRNGKey(0), mc, cfg.preprocess, cfg.audio)
        x = jnp.asarray(np.random.default_rng(0).random((4, 24, 24, 3)).astype(np.float32))
        out_f, _ = avm_apply(p, s, x, None, cfg=mc, train=False)
        out_q, _ = avm_apply(p, s, x, None, cfg=qc, train=False)
        assert out_q.shape == (4, 1)
        assert not np.array_equal(np.asarray(out_q), np.asarray(out_f))
        np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_f), atol=0.1)

    def test_checkpoint_roundtrip(self, small_cfg, tmp_path):
        from cvml_goalnet_tpu.train.checkpoint import load_checkpoint, save_checkpoint
        from cvml_goalnet_tpu.train.state import create_train_state

        cfg = self._cfg(small_cfg)
        state = create_train_state(jax.random.PRNGKey(3), cfg)
        save_checkpoint(str(tmp_path), state, cfg, tag="opt")
        fresh = create_train_state(jax.random.PRNGKey(4), cfg)
        restored = load_checkpoint(str(tmp_path), fresh, tag="opt")
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_torch_migration_guard(self, small_cfg):
        import pytest

        from cvml_goalnet_tpu.compat import (
            export_reference_state_dict,
            import_reference_state_dict,
        )
        from cvml_goalnet_tpu.train.state import create_train_state

        cfg = self._cfg(small_cfg)
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError, match="vis_backbone='reference'"):
            export_reference_state_dict(
                state.params, state.model_state, cfg.model, cfg.preprocess, cfg.audio)
        with pytest.raises(ValueError, match="vis_backbone='reference'"):
            import_reference_state_dict({}, cfg.model, cfg.preprocess, cfg.audio)
