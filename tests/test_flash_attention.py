"""Flash-attention kernel parity (interpret mode) + transformer scorer tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvml_goalnet_tpu.models.temporal_attention import (
    temporal_transformer_apply,
    temporal_transformer_init,
)
from cvml_goalnet_tpu.ops.pallas.flash_attention import attention_reference, flash_attention


def _qkv(h, t, d, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((h, t, d)).astype(np.float32))
    return mk(), mk(), mk()


class TestFlashAttention:
    @pytest.mark.parametrize("t", [128, 256, 384])
    def test_matches_reference_aligned(self, t):
        q, k, v = _qkv(2, t, 128)
        want = np.asarray(attention_reference(q, k, v))
        got = np.asarray(flash_attention(q, k, v, interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-5)

    @pytest.mark.parametrize("t", [100, 257, 300])
    def test_unaligned_lengths_padded_and_masked(self, t):
        q, k, v = _qkv(1, t, 128, seed=1)
        want = np.asarray(attention_reference(q, k, v))
        got = np.asarray(flash_attention(q, k, v, interpret=True))
        assert got.shape == (1, t, 128)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_multi_block_online_softmax(self):
        # spread of magnitudes across KV tiles exercises the running-max path
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.standard_normal((1, 128, 128)).astype(np.float32))
        k = jnp.asarray(np.concatenate([
            rng.standard_normal((1, 128, 128)) * 0.1,
            rng.standard_normal((1, 128, 128)) * 5.0,   # large scores late
            rng.standard_normal((1, 128, 128)) * 0.1,
        ], axis=1).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((1, 384, 128)).astype(np.float32))
        want = np.asarray(attention_reference(q, k, v))
        got = np.asarray(flash_attention(q, k, v, interpret=True))
        np.testing.assert_allclose(got, want, atol=3e-5)

    def test_bf16_inputs(self):
        q, k, v = _qkv(1, 256, 128, seed=3)
        q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
        want = np.asarray(attention_reference(q, k, v), dtype=np.float32)
        got = np.asarray(flash_attention(q, k, v, interpret=True), dtype=np.float32)
        np.testing.assert_allclose(got, want, atol=0.05)


class TestTemporalTransformer:
    def test_scores_shape_and_grads(self):
        params = temporal_transformer_init(
            jax.random.PRNGKey(0), in_dim=48, model_dim=32, num_layers=2, num_heads=2, max_len=64
        )
        feats = jnp.asarray(np.random.default_rng(0).standard_normal((50, 48)).astype(np.float32))
        scores = temporal_transformer_apply(params, feats, num_heads=2)
        assert scores.shape == (50,)

        def loss(p):
            return jnp.mean(temporal_transformer_apply(p, feats, 2) ** 2)

        g = jax.grad(loss)(params)
        total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0

    def test_long_timeline_beyond_max_len(self):
        params = temporal_transformer_init(
            jax.random.PRNGKey(0), in_dim=16, model_dim=32, num_layers=1, max_len=32
        )
        feats = jnp.asarray(np.random.default_rng(1).standard_normal((100, 16)).astype(np.float32))
        scores = temporal_transformer_apply(params, feats)
        assert scores.shape == (100,)
        assert np.isfinite(np.asarray(scores)).all()

    def test_config_dispatch_in_spotting(self, small_cfg):
        import dataclasses

        from cvml_goalnet_tpu.spotting import score_timeline_auto

        cfg = dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(small_cfg.model, temporal_model="transformer"),
        )
        feats = jnp.asarray(np.random.default_rng(2).standard_normal((40, 16)).astype(np.float32))
        params = temporal_transformer_init(
            jax.random.PRNGKey(0), 16, model_dim=32, num_layers=1, max_len=64
        )
        scores = score_timeline_auto(params, feats, cfg)
        assert scores.shape == (40,)

        # default GRU dispatch still works
        from cvml_goalnet_tpu.models.temporal import temporal_scorer_init

        gparams = temporal_scorer_init(jax.random.PRNGKey(1), 16, small_cfg.model.temporal_hidden)
        scores2 = score_timeline_auto(gparams, feats, small_cfg)
        assert scores2.shape == (40,)


class TestTransformerSpottingTraining:
    def test_transformer_scorer_learns(self):
        from cvml_goalnet_tpu.train.spotting import init_spotting_opt, make_spotting_train_step

        rng = np.random.default_rng(0)
        t, d = 96, 8
        labels = (rng.random(t) < 0.08).astype(np.float32)
        feats = rng.standard_normal((t, d)).astype(np.float32) * 0.1
        feats[labels > 0.5, 0] += 3.0
        params = temporal_transformer_init(
            jax.random.PRNGKey(0), d, model_dim=16, num_layers=1, num_heads=2, max_len=128
        )
        opt = init_spotting_opt(params)
        step = make_spotting_train_step(0, lr=3e-3, scorer="transformer", num_heads=2)
        losses = []
        for _ in range(40):
            params, opt, loss = step(params, opt, jnp.asarray(feats), jnp.asarray(labels))
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.7


class TestRingAttention:
    def test_exact_vs_monolithic_on_mesh(self):
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh
        from cvml_goalnet_tpu.parallel.ring_attention import ring_attention

        mesh = cpu_mesh(8)
        q, k, v = _qkv(2, 256, 64, seed=7)  # 32 frames per device shard
        want = np.asarray(attention_reference(q, k, v))
        got = np.asarray(ring_attention(q, k, v, mesh))
        np.testing.assert_allclose(got, want, atol=3e-5)

    def test_extreme_magnitude_blocks(self):
        # running-max merge across ring hops with wildly different score scales
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh
        from cvml_goalnet_tpu.parallel.ring_attention import ring_attention

        mesh = cpu_mesh(8)
        rng = np.random.default_rng(8)
        q = jnp.asarray(rng.standard_normal((1, 128, 64)).astype(np.float32))
        k = jnp.asarray((rng.standard_normal((1, 128, 64)) *
                         np.repeat([0.1, 8.0, 0.1, 0.1, 8.0, 0.1, 0.1, 0.1], 16)[None, :, None]
                         ).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((1, 128, 64)).astype(np.float32))
        want = np.asarray(attention_reference(q, k, v))
        got = np.asarray(ring_attention(q, k, v, mesh))
        np.testing.assert_allclose(got, want, atol=5e-5)


class TestFlashTrainable:
    def test_grads_match_reference(self):
        from cvml_goalnet_tpu.ops.pallas.flash_attention import flash_attention_trainable

        q, k, v = _qkv(1, 128, 128, seed=9)

        # interpret-mode forward inside the custom_vjp isn't reachable here;
        # on CPU the pallas kernel runs via interpret only — so compare grads
        # of the custom_vjp (XLA bwd) against grads of the pure XLA fn.
        def loss_flash(q, k, v):
            return jnp.sum(flash_attention_trainable(q, k, v) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(attention_reference(q, k, v) ** 2)

        try:
            g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        except Exception:
            import pytest as _pytest

            _pytest.skip("pallas compiled path unavailable on this backend")
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


class TestFlashBackwardTiled:
    """Round-2: the tiled Pallas backward (O(T·d) memory) replaces the old
    O(T²) XLA recompute backward (VERDICT item 1)."""

    @pytest.mark.parametrize("t", [256, 300, 700])
    def test_grad_parity_vs_reference(self, t):
        from cvml_goalnet_tpu.ops.pallas.flash_attention import flash_attention_trainable

        q, k, v = _qkv(1, t, 128, seed=t)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention_trainable(q, k, v, None, True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(attention_reference(q, k, v) ** 2)

        g1 = jax.grad(loss_flash, (0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)

    def test_grad_parity_multihead_unequal_kv(self):
        from cvml_goalnet_tpu.ops.pallas.flash_attention import flash_attention_trainable

        rng = np.random.default_rng(11)
        q = jnp.asarray(rng.standard_normal((2, 200, 128)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, 450, 128)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((2, 450, 128)).astype(np.float32))

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention_trainable(q, k, v, None, True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(attention_reference(q, k, v) ** 2)

        g1 = jax.grad(loss_flash, (0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)

    def test_extreme_magnitudes_no_nan(self):
        # online-softmax statistics must survive huge score spreads in bwd too
        from cvml_goalnet_tpu.ops.pallas.flash_attention import flash_attention_trainable

        rng = np.random.default_rng(12)
        q = jnp.asarray(rng.standard_normal((1, 256, 128)).astype(np.float32) * 10)
        k = jnp.asarray(rng.standard_normal((1, 256, 128)).astype(np.float32) * 10)
        v = jnp.asarray(rng.standard_normal((1, 256, 128)).astype(np.float32))
        g = jax.grad(lambda q, k, v: jnp.sum(
            flash_attention_trainable(q, k, v, None, True) ** 2), (0, 1, 2))(q, k, v)
        for a in g:
            assert np.isfinite(np.asarray(a)).all()

    def test_memory_scaling_at_32k(self):
        """At T=32k the XLA backward's residual score matrix costs GBs; the
        tiled backward stays O(T·d).  Asserted via compile-time memory
        analysis (execution at this T is a TPU benchmark, not a CPU test)."""
        from cvml_goalnet_tpu.ops.pallas.flash_attention import flash_attention_trainable

        h, t, d = 1, 32768, 128
        spec = jax.ShapeDtypeStruct((h, t, d), jnp.float32)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention_trainable(q, k, v, None, True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(attention_reference(q, k, v) ** 2)

        xla = jax.jit(jax.grad(loss_ref, (0, 1, 2))).lower(spec, spec, spec).compile()
        flash = jax.jit(jax.grad(loss_flash, (0, 1, 2))).lower(spec, spec, spec).compile()
        xla_temp = xla.memory_analysis().temp_size_in_bytes
        flash_temp = flash.memory_analysis().temp_size_in_bytes
        assert xla_temp > 4e9          # the T×T residuals: measured ~13 GB
        assert flash_temp < 5e8        # measured ~0.30 GB
        assert flash_temp * 8 < xla_temp

    def test_training_step_at_long_t_interpret(self):
        """An actual optimizer step through the tiled bwd at T=4096 (CPU
        interpret mode; the T=135k full-rate run is benchmarks/timeline_bench)."""
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_apply, temporal_transformer_init)
        from cvml_goalnet_tpu.train.spotting import init_spotting_opt, make_spotting_train_step

        rng = np.random.default_rng(13)
        t, dim = 4096, 16
        labels = (rng.random(t) < 0.05).astype(np.float32)
        feats = rng.standard_normal((t, dim)).astype(np.float32) * 0.1
        feats[labels > 0.5, 0] += 3.0
        params = temporal_transformer_init(
            jax.random.PRNGKey(0), dim, model_dim=128, num_layers=1, num_heads=1, max_len=4096
        )
        opt = init_spotting_opt(params)
        step = make_spotting_train_step(
            0, lr=3e-3, scorer="transformer", num_heads=1, use_flash=True, flash_interpret=True
        )
        p1, o1, loss = step(params, opt, jnp.asarray(feats), jnp.asarray(labels))
        assert np.isfinite(float(loss))


class TestShardedTransformer:
    """Round-2 (VERDICT item 4): ring attention is a reachable capability —
    sharded timeline scoring + context-parallel training."""

    def _params(self, dim=16, model_dim=32, layers=2, heads=2, max_len=128):
        return temporal_transformer_init(
            jax.random.PRNGKey(0), dim, model_dim=model_dim,
            num_layers=layers, num_heads=heads, max_len=max_len,
        )

    def test_sharded_equals_monolithic(self):
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_sharded_apply)
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh

        mesh = cpu_mesh(8)
        params = self._params()
        feats = jnp.asarray(
            np.random.default_rng(0).standard_normal((96, 16)).astype(np.float32))
        mono = np.asarray(temporal_transformer_apply(params, feats, 2))
        shard = np.asarray(temporal_transformer_sharded_apply(params, feats, mesh, 2))
        np.testing.assert_allclose(shard, mono, atol=1e-4)

    def test_sharded_with_padding_masked(self):
        # T=90 not divisible by 8 devices — pad columns must be masked
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_sharded_apply)
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh

        mesh = cpu_mesh(8)
        params = self._params()
        feats = jnp.asarray(
            np.random.default_rng(1).standard_normal((90, 16)).astype(np.float32))
        mono = np.asarray(temporal_transformer_apply(params, feats, 2))
        shard = np.asarray(temporal_transformer_sharded_apply(params, feats, mesh, 2))
        assert shard.shape == (90,)
        np.testing.assert_allclose(shard, mono, atol=1e-4)

    def test_score_timeline_sharded_entry(self, small_cfg):
        import dataclasses

        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh
        from cvml_goalnet_tpu.spotting import score_timeline_auto, score_timeline_sharded

        mesh = cpu_mesh(8)
        cfg = dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(
                small_cfg.model, temporal_model="transformer", temporal_num_heads=2),
        )
        params = self._params()
        feats = jnp.asarray(
            np.random.default_rng(2).standard_normal((64, 16)).astype(np.float32))
        mono = np.asarray(score_timeline_auto(params, feats, cfg))
        shard = np.asarray(score_timeline_sharded(params, feats, mesh, cfg))
        np.testing.assert_allclose(shard, mono, atol=1e-4)

        # GRU dispatch also reachable on the mesh
        from cvml_goalnet_tpu.models.temporal import temporal_scorer_init

        gcfg = dataclasses.replace(
            small_cfg, model=dataclasses.replace(small_cfg.model, temporal_hidden=8))
        gparams = temporal_scorer_init(jax.random.PRNGKey(1), 16, 8)
        out = score_timeline_sharded(gparams, feats, mesh, gcfg)
        assert np.asarray(out).shape == (64,)

    def test_gru_sharded_chunks_match_single_device(self, small_cfg):
        # the GRU CP path runs each device's OWN slice of the chunk list via
        # shard_map (a replicated jit used to run every chunk everywhere —
        # round-3 review); results must equal the single-device chunked oracle
        import dataclasses

        from cvml_goalnet_tpu.models.temporal import temporal_scorer_init
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh
        from cvml_goalnet_tpu.spotting import (
            score_timeline_chunked,
            score_timeline_sharded,
        )

        mesh = cpu_mesh(8)
        gcfg = dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(
                small_cfg.model, temporal_hidden=8, temporal_chunk=16,
                temporal_halo=4),
        )
        gparams = temporal_scorer_init(jax.random.PRNGKey(1), 16, 8)
        # 200 frames / chunk 16 → 13 chunks, padded to 16 over 8 devices
        feats = jnp.asarray(
            np.random.default_rng(5).standard_normal((200, 16)).astype(np.float32))
        sharded = np.asarray(score_timeline_sharded(gparams, feats, mesh, gcfg))
        mono = np.asarray(score_timeline_chunked(gparams, feats, 8, 16, 4))
        assert sharded.shape == (200,)
        np.testing.assert_allclose(sharded, mono, atol=1e-5)


class TestContextParallelTraining:
    def test_cp_grads_match_single_device(self):
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_sharded_apply)
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh

        mesh = cpu_mesh(8)
        params = temporal_transformer_init(
            jax.random.PRNGKey(0), 12, model_dim=32, num_layers=1, num_heads=1, max_len=128)
        rng = np.random.default_rng(3)
        feats = jnp.asarray(rng.standard_normal((96, 12)).astype(np.float32))
        labels = jnp.asarray((rng.random(96) < 0.1).astype(np.float32))

        def bce(logits, labels):
            per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            return jnp.mean(per)

        def loss_mono(p):
            return bce(temporal_transformer_apply(p, feats, 1), labels)

        def loss_cp(p):
            return bce(temporal_transformer_sharded_apply(p, feats, mesh, 1), labels)

        g1 = jax.grad(loss_mono)(params)
        g2 = jax.grad(loss_cp)(params)
        flat1 = jax.tree_util.tree_leaves(g1)
        flat2 = jax.tree_util.tree_leaves(g2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)

    def test_cp_train_step_learns(self):
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh
        from cvml_goalnet_tpu.train.spotting import (
            init_spotting_opt, make_sharded_spotting_train_step)

        mesh = cpu_mesh(8)
        rng = np.random.default_rng(4)
        t, dim = 128, 8
        labels = (rng.random(t) < 0.1).astype(np.float32)
        feats = rng.standard_normal((t, dim)).astype(np.float32) * 0.1
        feats[labels > 0.5, 0] += 3.0
        params = temporal_transformer_init(
            jax.random.PRNGKey(0), dim, model_dim=16, num_layers=1, num_heads=1, max_len=128)
        opt = init_spotting_opt(params)
        step = make_sharded_spotting_train_step(mesh, num_heads=1, lr=3e-3)
        losses = []
        for _ in range(30):
            params, opt, loss = step(params, opt, jnp.asarray(feats), jnp.asarray(labels))
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.8


class TestFlashRingAttention:
    """Round-2: ring hops through the tiled flash forward — O(T_local·d) per
    device — merged via stable log-sum-exp; exact vs monolithic attention."""

    def test_flash_ring_equals_monolithic(self):
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh
        from cvml_goalnet_tpu.parallel.ring_attention import ring_attention

        mesh = cpu_mesh(8)
        q, k, v = _qkv(1, 1024, 128, seed=21)  # 128 frames/device shard
        want = np.asarray(attention_reference(q, k, v))
        got = np.asarray(ring_attention(q, k, v, mesh, use_flash=True,
                                        flash_interpret=True))
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_flash_ring_with_global_padding(self):
        # T=1000 over 8 devices → internal pad on the tail shard must be
        # masked by the dynamic per-hop valid length
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_sharded_apply)
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh

        mesh = cpu_mesh(8)
        params = temporal_transformer_init(
            jax.random.PRNGKey(0), 16, model_dim=128, num_layers=1,
            num_heads=1, max_len=1024)
        feats = jnp.asarray(
            np.random.default_rng(22).standard_normal((1000, 16)).astype(np.float32))
        mono = np.asarray(temporal_transformer_apply(params, feats, 1))
        shard = np.asarray(temporal_transformer_sharded_apply(
            params, feats, mesh, 1, use_flash=True, flash_interpret=True))
        assert shard.shape == (1000,)
        np.testing.assert_allclose(shard, mono, atol=1e-4)


class TestFlashRingTraining:
    """Round-2: context-parallel training streams through the flash kernels
    in both directions (lse-cotangent custom VJP)."""

    def test_with_lse_grads_match_reference(self):
        from cvml_goalnet_tpu.ops.pallas.flash_attention import flash_attention_with_lse

        q, k, v = _qkv(1, 300, 128, seed=31)

        def loss_flash(q, k, v):
            out, lse = flash_attention_with_lse(q, k, v, jnp.float32(300), True)
            return jnp.sum(out ** 2) + jnp.sum(jnp.sin(lse))

        def loss_ref(q, k, v):
            d = q.shape[-1]
            s = jnp.einsum("htd,hsd->hts", q, k) / jnp.sqrt(1.0 * d)
            out = jnp.einsum("hts,hsd->htd", jax.nn.softmax(s, -1), v)
            lse = jax.scipy.special.logsumexp(s, axis=-1)[..., None]
            return jnp.sum(out ** 2) + jnp.sum(jnp.sin(lse))

        g1 = jax.grad(loss_flash, (0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_flash_ring_grads_match_monolithic(self):
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh
        from cvml_goalnet_tpu.parallel.ring_attention import ring_attention

        mesh = cpu_mesh(8)
        q, k, v = _qkv(1, 256, 128, seed=32)

        def loss_ring(q, k, v):
            return jnp.sum(ring_attention(
                q, k, v, mesh, use_flash=True, flash_interpret=True) ** 2)

        def loss_mono(q, k, v):
            return jnp.sum(attention_reference(q, k, v) ** 2)

        g1 = jax.grad(loss_ring, (0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_mono, (0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_cp_flash_train_step_learns(self):
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh
        from cvml_goalnet_tpu.train.spotting import (
            init_spotting_opt, make_sharded_spotting_train_step)

        mesh = cpu_mesh(8)
        rng = np.random.default_rng(33)
        t, dim = 256, 8
        labels = (rng.random(t) < 0.1).astype(np.float32)
        feats = rng.standard_normal((t, dim)).astype(np.float32) * 0.1
        feats[labels > 0.5, 0] += 3.0
        params = temporal_transformer_init(
            jax.random.PRNGKey(0), dim, model_dim=128, num_layers=1,
            num_heads=1, max_len=256)
        opt = init_spotting_opt(params)
        step = make_sharded_spotting_train_step(
            mesh, num_heads=1, lr=3e-3, use_flash=True, flash_interpret=True)
        losses = []
        for _ in range(12):
            params, opt, loss = step(params, opt, jnp.asarray(feats), jnp.asarray(labels))
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.9, losses


class TestFlashAttentionLocal:
    """Sliding-window (banded) flash attention: O(T·W·d) compute, tiled
    Pallas forward AND backward.  Parity oracle: attention_local_reference
    (XLA banded softmax)."""

    @pytest.mark.parametrize("t,window", [(256, 37), (300, 64), (513, 130)])
    def test_forward_matches_banded_reference(self, t, window):
        from cvml_goalnet_tpu.ops.pallas.flash_attention import (
            attention_local_reference, flash_attention_local)

        q, k, v = _qkv(2, t, 64, seed=t + window)
        want = np.asarray(attention_local_reference(q, k, v, window))
        got = np.asarray(flash_attention_local(q, k, v, window, None, True))
        np.testing.assert_allclose(got, want, atol=3e-5)

    def test_window_covering_everything_equals_full(self):
        from cvml_goalnet_tpu.ops.pallas.flash_attention import flash_attention_local

        q, k, v = _qkv(1, 200, 64, seed=5)
        want = np.asarray(attention_reference(q, k, v))
        got = np.asarray(flash_attention_local(q, k, v, 200, None, True))
        np.testing.assert_allclose(got, want, atol=3e-5)

    def test_tiny_window_is_near_diagonal(self):
        # window=0 → each frame attends only to itself → out == v
        from cvml_goalnet_tpu.ops.pallas.flash_attention import flash_attention_local

        q, k, v = _qkv(1, 160, 64, seed=6)
        got = np.asarray(flash_attention_local(q, k, v, 0, None, True))
        np.testing.assert_allclose(got, np.asarray(v), atol=3e-6)

    @pytest.mark.parametrize("t,window", [(256, 40), (300, 100)])
    def test_grads_match_banded_reference(self, t, window):
        from cvml_goalnet_tpu.ops.pallas.flash_attention import (
            attention_local_reference, flash_attention_local)

        q, k, v = _qkv(1, t, 64, seed=100 + t)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention_local(q, k, v, window, None, True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(attention_local_reference(q, k, v, window) ** 2)

        g1 = jax.grad(loss_flash, (0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_extreme_magnitudes_no_nan(self):
        from cvml_goalnet_tpu.ops.pallas.flash_attention import flash_attention_local

        rng = np.random.default_rng(41)
        q = jnp.asarray(rng.standard_normal((1, 256, 64)).astype(np.float32) * 10)
        k = jnp.asarray(rng.standard_normal((1, 256, 64)).astype(np.float32) * 10)
        v = jnp.asarray(rng.standard_normal((1, 256, 64)).astype(np.float32))
        g = jax.grad(lambda q, k, v: jnp.sum(
            flash_attention_local(q, k, v, 48, None, True) ** 2), (0, 1, 2))(q, k, v)
        for a in g:
            assert np.isfinite(np.asarray(a)).all()

    def test_rejects_cross_attention_shapes(self):
        from cvml_goalnet_tpu.ops.pallas.flash_attention import flash_attention_local

        q, _, _ = _qkv(1, 128, 64)
        _, k, v = _qkv(1, 256, 64)
        with pytest.raises(ValueError):
            flash_attention_local(q, k, v, 16, None, True)


class TestWindowedTransformer:
    """temporal_window wiring: banded attention through the scorer + dispatch."""

    def _params(self, dim=16, model_dim=32, layers=1, heads=2, max_len=128):
        return temporal_transformer_init(
            jax.random.PRNGKey(0), dim, model_dim=model_dim,
            num_layers=layers, num_heads=heads, max_len=max_len)

    def test_window_changes_scores_and_matches_banded_semantics(self):
        params = self._params()
        feats = jnp.asarray(
            np.random.default_rng(0).standard_normal((96, 16)).astype(np.float32))
        full = np.asarray(temporal_transformer_apply(params, feats, 2))
        banded = np.asarray(temporal_transformer_apply(params, feats, 2, window=8))
        assert banded.shape == full.shape
        assert not np.allclose(banded, full)  # restricting context must matter
        # a window covering the whole timeline IS full attention
        wide = np.asarray(temporal_transformer_apply(params, feats, 2, window=96))
        np.testing.assert_allclose(wide, full, atol=1e-5)

    def test_config_dispatch_passes_window(self, small_cfg):
        import dataclasses

        from cvml_goalnet_tpu.spotting import score_timeline_auto

        params = self._params()
        feats = jnp.asarray(
            np.random.default_rng(1).standard_normal((64, 16)).astype(np.float32))
        mk = lambda w: dataclasses.replace(
            small_cfg, model=dataclasses.replace(
                small_cfg.model, temporal_model="transformer",
                temporal_num_heads=2, temporal_window=w))
        full = np.asarray(score_timeline_auto(params, feats, mk(0)))
        banded = np.asarray(score_timeline_auto(params, feats, mk(6)))
        want = np.asarray(temporal_transformer_apply(params, feats, 2, window=6))
        np.testing.assert_allclose(banded, want, atol=1e-6)
        assert not np.allclose(banded, full)

    def test_windowed_training_learns(self):
        from cvml_goalnet_tpu.train.spotting import (
            init_spotting_opt, make_spotting_train_step)

        rng = np.random.default_rng(2)
        t, dim = 96, 8
        labels = (rng.random(t) < 0.1).astype(np.float32)
        feats = rng.standard_normal((t, dim)).astype(np.float32) * 0.1
        feats[labels > 0.5, 0] += 3.0
        params = self._params(dim=dim, model_dim=16, heads=1, max_len=128)
        opt = init_spotting_opt(params)
        step = make_spotting_train_step(
            0, lr=3e-3, scorer="transformer", num_heads=1, window=8)
        losses = []
        for _ in range(30):
            params, opt, loss = step(params, opt, jnp.asarray(feats), jnp.asarray(labels))
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.8


class TestHaloBandedContextParallel:
    """Banded CP: one ppermute halo per neighbor instead of a full ring —
    exact vs the monolithic banded scorer."""

    def _params(self, dim=16, model_dim=32, layers=2, heads=2, max_len=128):
        return temporal_transformer_init(
            jax.random.PRNGKey(0), dim, model_dim=model_dim,
            num_layers=layers, num_heads=heads, max_len=max_len)

    def test_halo_attention_equals_banded_reference(self):
        from cvml_goalnet_tpu.ops.pallas.flash_attention import (
            attention_local_reference)
        from cvml_goalnet_tpu.parallel.halo_attention import halo_attention_local
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        mesh = cpu_mesh(8)
        q, k, v = _qkv(2, 256, 64, seed=50)   # 32 frames/device
        window = 16
        want = np.asarray(attention_local_reference(q, k, v, window))
        seq = P(None, "data", None)
        fn = shard_map(
            lambda ql, kl, vl: halo_attention_local(
                ql, kl, vl, "data", window, t_valid=256),
            mesh=mesh, in_specs=(seq, seq, seq), out_specs=seq, check_rep=False)
        got = np.asarray(jax.jit(fn)(q, k, v))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_halo_flash_equals_banded_reference(self):
        from cvml_goalnet_tpu.ops.pallas.flash_attention import (
            attention_local_reference)
        from cvml_goalnet_tpu.parallel.halo_attention import halo_attention_local
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        mesh = cpu_mesh(8)
        q, k, v = _qkv(1, 1024, 128, seed=51)  # 128 frames/device
        window = 64
        want = np.asarray(attention_local_reference(q, k, v, window))
        seq = P(None, "data", None)
        fn = shard_map(
            lambda ql, kl, vl: halo_attention_local(
                ql, kl, vl, "data", window, t_valid=1024,
                use_flash=True, flash_interpret=True),
            mesh=mesh, in_specs=(seq, seq, seq), out_specs=seq, check_rep=False)
        got = np.asarray(jax.jit(fn)(q, k, v))
        np.testing.assert_allclose(got, want, atol=3e-5)

    def test_sharded_windowed_transformer_equals_monolithic(self):
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_sharded_apply)
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh

        mesh = cpu_mesh(8)
        params = self._params()
        feats = jnp.asarray(
            np.random.default_rng(52).standard_normal((96, 16)).astype(np.float32))
        mono = np.asarray(temporal_transformer_apply(params, feats, 2, window=8))
        shard = np.asarray(temporal_transformer_sharded_apply(
            params, feats, mesh, 2, window=8))
        np.testing.assert_allclose(shard, mono, atol=1e-4)

    def test_sharded_windowed_with_global_padding(self):
        # T=90 over 8 devices: internal pad masked by the [lo, hi) bounds
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_sharded_apply)
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh

        mesh = cpu_mesh(8)
        params = self._params()
        feats = jnp.asarray(
            np.random.default_rng(53).standard_normal((90, 16)).astype(np.float32))
        mono = np.asarray(temporal_transformer_apply(params, feats, 2, window=6))
        shard = np.asarray(temporal_transformer_sharded_apply(
            params, feats, mesh, 2, window=6))
        assert shard.shape == (90,)
        np.testing.assert_allclose(shard, mono, atol=1e-4)

    def test_cp_banded_grads_match_monolithic(self):
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_sharded_apply)
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh

        mesh = cpu_mesh(8)
        params = temporal_transformer_init(
            jax.random.PRNGKey(0), 12, model_dim=32, num_layers=1,
            num_heads=1, max_len=128)
        rng = np.random.default_rng(54)
        feats = jnp.asarray(rng.standard_normal((96, 12)).astype(np.float32))
        labels = jnp.asarray((rng.random(96) < 0.1).astype(np.float32))

        def bce(logits, labels):
            per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            return jnp.mean(per)

        def loss_mono(p):
            return bce(temporal_transformer_apply(p, feats, 1, window=8), labels)

        def loss_cp(p):
            return bce(temporal_transformer_sharded_apply(
                p, feats, mesh, 1, window=8), labels)

        g1 = jax.tree_util.tree_leaves(jax.grad(loss_mono)(params))
        g2 = jax.tree_util.tree_leaves(jax.grad(loss_cp)(params))
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-3)

    def test_cp_banded_train_step_learns(self):
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh
        from cvml_goalnet_tpu.train.spotting import (
            init_spotting_opt, make_sharded_spotting_train_step)

        mesh = cpu_mesh(8)
        rng = np.random.default_rng(55)
        t, dim = 128, 8
        labels = (rng.random(t) < 0.1).astype(np.float32)
        feats = rng.standard_normal((t, dim)).astype(np.float32) * 0.1
        feats[labels > 0.5, 0] += 3.0
        params = temporal_transformer_init(
            jax.random.PRNGKey(0), dim, model_dim=16, num_layers=1,
            num_heads=1, max_len=128)
        opt = init_spotting_opt(params)
        step = make_sharded_spotting_train_step(mesh, num_heads=1, lr=3e-3, window=8)
        losses = []
        for _ in range(30):
            params, opt, loss = step(params, opt, jnp.asarray(feats), jnp.asarray(labels))
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.8

    def test_single_device_mesh_halo_wraps_to_self_masked(self):
        # n=1: the ppermute halos wrap to the device itself; the [lo, hi)
        # bounds must mask them so the result equals plain banded attention
        from cvml_goalnet_tpu.ops.pallas.flash_attention import (
            attention_local_reference)
        from cvml_goalnet_tpu.parallel.halo_attention import halo_attention_local
        from jax.experimental.shard_map import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices("cpu")[:1]), ("data",))
        q, k, v = _qkv(1, 96, 32, seed=57)
        want = np.asarray(attention_local_reference(q, k, v, 12))
        seq = P(None, "data", None)
        fn = shard_map(
            lambda ql, kl, vl: halo_attention_local(
                ql, kl, vl, "data", 12, t_valid=96),
            mesh=mesh, in_specs=(seq, seq, seq), out_specs=seq, check_rep=False)
        got = np.asarray(jax.jit(fn)(q, k, v))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_window_exceeding_shard_raises(self):
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_sharded_apply)
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh

        mesh = cpu_mesh(8)
        params = self._params()
        feats = jnp.asarray(
            np.random.default_rng(56).standard_normal((64, 16)).astype(np.float32))
        with pytest.raises(ValueError, match="window"):
            temporal_transformer_sharded_apply(params, feats, mesh, 2, window=32)


class TestBoundedLocalDeadRows:
    """Rows whose whole band is masked out must return 0 (and lse 0) — the
    documented convention, exercised directly (not just via sliced callers)."""

    def test_bounded_kernel_matches_reference_including_dead_rows(self):
        from cvml_goalnet_tpu.ops.pallas.flash_attention import (
            attention_local_bounded_reference, flash_attention_local_bounded)

        q, k, v = _qkv(1, 256, 64, seed=60)
        window, lo, hi = 16, 64, 200   # rows < 48 and >= 216 have empty bands
        want = np.asarray(attention_local_bounded_reference(q, k, v, lo, hi, window))
        got = np.asarray(flash_attention_local_bounded(
            q, k, v, jnp.float32(lo), jnp.float32(hi), window, True))
        np.testing.assert_allclose(got, want, atol=3e-5)
        assert np.all(got[:, :window] == 0.0)          # dead head rows
        assert np.all(got[:, hi + window:] == 0.0)     # dead tail rows
        assert np.abs(got[:, lo:hi]).max() > 0

    def test_dead_rows_have_zero_gradients(self):
        from cvml_goalnet_tpu.ops.pallas.flash_attention import (
            flash_attention_local_bounded)

        q, k, v = _qkv(1, 128, 32, seed=61)
        window, lo, hi = 8, 32, 96

        def loss(q, k, v):
            out = flash_attention_local_bounded(
                q, k, v, jnp.float32(lo), jnp.float32(hi), window, True)
            return jnp.sum(out ** 2)

        dq, dk, dv = jax.grad(loss, (0, 1, 2))(q, k, v)
        assert np.isfinite(np.asarray(dq)).all()
        assert np.isfinite(np.asarray(dk)).all()
        assert np.isfinite(np.asarray(dv)).all()
        # dead query rows (band entirely outside [lo, hi)) get zero dq
        assert np.all(np.asarray(dq)[:, :window] == 0.0)
        # masked-out keys get zero dk/dv
        assert np.all(np.asarray(dk)[:, :lo] == 0.0)
        assert np.all(np.asarray(dv)[:, hi:] == 0.0)


class TestOffsetBandKernel:
    """The q_offset band shift (halo-CP layout: local queries vs extended
    keys, Tq != Tk) — parity vs the bounded oracle, forward and grads."""

    def test_offset_forward_matches_oracle(self):
        from cvml_goalnet_tpu.ops.pallas.flash_attention import (
            attention_local_bounded_reference, flash_attention_local_bounded)

        rng = np.random.default_rng(70)
        w, tq = 16, 160
        tk = tq + 2 * w
        q = jnp.asarray(rng.standard_normal((2, tq, 32)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, tk, 32)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((2, tk, 32)).astype(np.float32))
        lo, hi = 10, 180
        want = np.asarray(attention_local_bounded_reference(
            q, k, v, lo, hi, w, q_offset=w))
        got = np.asarray(flash_attention_local_bounded(
            q, k, v, jnp.float32(lo), jnp.float32(hi), w, True, w))
        assert got.shape == (2, tq, 32)
        np.testing.assert_allclose(got, want, atol=3e-5)

    def test_offset_grads_match_oracle(self):
        from cvml_goalnet_tpu.ops.pallas.flash_attention import (
            attention_local_bounded_reference, flash_attention_local_bounded)

        rng = np.random.default_rng(71)
        w, tq = 8, 96
        tk = tq + 2 * w
        q = jnp.asarray(rng.standard_normal((1, tq, 32)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((1, tk, 32)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((1, tk, 32)).astype(np.float32))
        lo, hi = 0, tk

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention_local_bounded(
                q, k, v, jnp.float32(lo), jnp.float32(hi), w, True, w) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(attention_local_bounded_reference(
                q, k, v, lo, hi, w, q_offset=w) ** 2)

        g1 = jax.grad(loss_flash, (0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


class TestBandedBlock1024:
    """The production banded configuration (long T → block 1024) must be
    covered by interpret-mode parity, not just TPU benchmarks."""

    def test_forward_and_grads_at_block_1024(self):
        from cvml_goalnet_tpu.ops.pallas.flash_attention import (
            attention_local_reference, flash_attention_local,
            _local_block_default)

        t, window = 2048, 512
        assert _local_block_default(t, window) == 1024  # production geometry
        q, k, v = _qkv(1, t, 32, seed=80)
        want = np.asarray(attention_local_reference(q, k, v, window))
        got = np.asarray(flash_attention_local(q, k, v, window, None, True))
        np.testing.assert_allclose(got, want, atol=3e-5)

        g1 = jax.grad(lambda q, k, v: jnp.sum(
            flash_attention_local(q, k, v, window, None, True) ** 2), (0, 1, 2))(q, k, v)
        g2 = jax.grad(lambda q, k, v: jnp.sum(
            attention_local_reference(q, k, v, window) ** 2), (0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)
