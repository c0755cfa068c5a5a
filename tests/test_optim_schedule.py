"""LR schedules + true gradient accumulation (production features the
reference lacked: it runs fixed Adam lr=1e-3 with an immediate step per
10-frame sub-batch for all 150 epochs — ``main.py:49,70,177-196``)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvml_goalnet_tpu.models.avm import avm_apply
from cvml_goalnet_tpu.train.loop import make_train_video_fn
from cvml_goalnet_tpu.train.optim import (
    adam_init,
    adam_update,
    schedule_from_config,
    schedule_lr,
)
from cvml_goalnet_tpu.train.state import create_train_state


class TestScheduleLr:
    def test_constant(self):
        for step in (0, 10, 10_000):
            assert float(schedule_lr(step, 1e-3)) == pytest.approx(1e-3)

    def test_warmup_ramp(self):
        # linear ramp: never an exact-zero first step, base at the boundary
        lrs = [float(schedule_lr(s, 1.0, warmup_steps=4)) for s in range(6)]
        assert lrs == pytest.approx([0.25, 0.5, 0.75, 1.0, 1.0, 1.0])

    def test_cosine_endpoints_and_midpoint(self):
        kw = dict(schedule="cosine", decay_steps=100, min_ratio=0.1)
        assert float(schedule_lr(0, 1.0, **kw)) == pytest.approx(1.0)
        assert float(schedule_lr(50, 1.0, **kw)) == pytest.approx(0.55)
        assert float(schedule_lr(100, 1.0, **kw)) == pytest.approx(0.1)
        # the floor holds past the decay horizon
        assert float(schedule_lr(10_000, 1.0, **kw)) == pytest.approx(0.1)

    def test_linear_decay(self):
        kw = dict(schedule="linear", decay_steps=10)
        assert float(schedule_lr(5, 1.0, **kw)) == pytest.approx(0.5)
        assert float(schedule_lr(10, 1.0, **kw)) == pytest.approx(0.0)

    def test_warmup_composes_with_decay(self):
        # during warmup the decayed value is scaled by the ramp
        lr = schedule_lr(0, 1.0, "linear", warmup_steps=2, decay_steps=100)
        assert float(lr) == pytest.approx(0.5 * 1.0)

    def test_unknown_schedule_raises(self):
        with pytest.raises(ValueError, match="unknown lr schedule"):
            schedule_lr(0, 1e-3, "cyclical")

    def test_traced_step(self):
        # composes with jit/scan: step may be a traced array
        f = jax.jit(lambda s: schedule_lr(s, 1.0, "cosine", 2, 10, 0.0))
        assert np.isfinite(float(f(jnp.asarray(3))))

    def test_from_config_validates_now(self):
        from cvml_goalnet_tpu.config import TrainConfig

        with pytest.raises(ValueError):
            schedule_from_config(TrainConfig(lr_schedule="nope"))
        fn = schedule_from_config(
            TrainConfig(learning_rate=2e-3, lr_schedule="cosine",
                        lr_decay_steps=10))
        assert float(fn(0)) == pytest.approx(2e-3)


def _det_cfg(small_cfg):
    """Deterministic training config for the equivalence oracle: no dropout
    (grads depend only on the data) and Adam eps=1.0 — at step 1 default-eps
    Adam moves every param by ~lr·sign(g), so a 1-ulp gradient difference
    between two compiled programs flips near-zero grads by ±lr; eps=1.0 makes
    the update LINEAR in g, so fp noise stays fp-sized in the comparison."""
    return dataclasses.replace(
        small_cfg,
        model=dataclasses.replace(small_cfg.model, dropout_rate=0.0),
        train=dataclasses.replace(small_cfg.train, eps=1.0),
    )


def _rand_batch(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    visual = rng.random((n, *cfg.preprocess.frame_size, 3)).astype(np.float32)
    audio = rng.random(
        (n, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32)
    labels = rng.integers(1, 6, n).astype(np.float32)
    return visual, audio, labels


class TestGradAccumulation:
    def _manual_accum_oracle(self, cfg, state, visual, audio, labels, rng, K):
        """Hand-threaded reference: per-sub-batch grads (BN state advancing
        exactly like the scan), mean over K, one Adam step per K."""
        S = cfg.train.subbatch_size
        n_sub = len(visual) // S
        params, ms, opt = state.params, state.model_state, state.opt_state
        rngs = jax.random.split(rng, n_sub)
        gacc, n_acc = None, 0
        for i in range(n_sub):
            sl = slice(i * S, (i + 1) * S)

            def loss_of(p, vis=visual[sl], aud=audio[sl], lab=labels[sl],
                        ms=ms, r=rngs[i]):
                preds, new_ms = avm_apply(
                    p, ms, vis, aud, cfg=cfg.model, train=True, rng=r,
                    valid=jnp.ones((S,), jnp.float32),
                )
                d = preds[:, 0] - lab
                return jnp.mean(d * d), new_ms

            (_, new_ms), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
            ms = new_ms
            gacc = grads if gacc is None else jax.tree.map(
                lambda a, g: a + g, gacc, grads)
            n_acc += 1
            if n_acc == K or i == n_sub - 1:
                params, opt = adam_update(
                    jax.tree.map(lambda a: a / n_acc, gacc), opt, params,
                    cfg.train.learning_rate, cfg.train.b1, cfg.train.b2,
                    cfg.train.eps)
                gacc, n_acc = None, 0
        return params, opt

    @pytest.mark.parametrize("n,K", [(20, 2), (15, 2), (20, 4)])
    def test_scan_accum_matches_manual(self, small_cfg, n, K):
        """K-accumulated scan == hand loop (incl. the short-tail flush when
        n_sub % K != 0)."""
        cfg = _det_cfg(small_cfg)
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, grad_accum_steps=K))
        visual, audio, labels = _rand_batch(cfg, n)
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        rng = jax.random.PRNGKey(7)

        fn = make_train_video_fn(cfg)
        p1, ms1, opt1, preds, loss = fn(
            state.params, state.model_state, state.opt_state,
            visual, audio, labels, np.ones(n, np.float32), rng)

        p2, opt2 = self._manual_accum_oracle(
            _det_cfg(small_cfg), state, visual, audio, labels, rng, K)

        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)
        n_sub = n // cfg.train.subbatch_size
        expected_steps = n_sub // K + (1 if n_sub % K else 0)
        assert int(opt1.step) == int(opt2.step) == expected_steps

    def test_k1_preserves_reference_semantics(self, small_cfg):
        """grad_accum_steps=1 (default) is bit-identical to the pre-feature
        step-per-sub-batch program."""
        cfg = _det_cfg(small_cfg)
        visual, audio, labels = _rand_batch(cfg, 10)
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        fn = make_train_video_fn(cfg)
        p1, _, opt1, _, _ = fn(
            state.params, state.model_state, state.opt_state,
            visual, audio, labels, np.ones(10, np.float32),
            jax.random.PRNGKey(1))
        # oracle with K=1 reduces to one Adam step per sub-batch
        p2, opt2 = self._manual_accum_oracle(
            cfg, state, visual, audio, labels, jax.random.PRNGKey(1), 1)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)
        assert int(opt1.step) == int(opt2.step) == 2


class TestScheduledTraining:
    def test_warmup_shrinks_first_update(self, small_cfg):
        """A long warmup must make the epoch-0 parameter movement smaller
        than constant-lr training from the same init."""
        base = _det_cfg(small_cfg)
        warm = dataclasses.replace(
            base, train=dataclasses.replace(
                base.train, lr_schedule="cosine", lr_warmup_steps=1000,
                lr_decay_steps=10_000))
        visual, audio, labels = _rand_batch(base, 10)
        state = create_train_state(jax.random.PRNGKey(0), base)
        valid = np.ones(10, np.float32)

        def movement(cfg):
            fn = make_train_video_fn(cfg)
            p, *_ = fn(state.params, state.model_state, state.opt_state,
                       visual, audio, labels, valid, jax.random.PRNGKey(1))
            return sum(float(jnp.abs(a - b).sum()) for a, b in zip(
                jax.tree.leaves(p), jax.tree.leaves(state.params)))

        assert movement(warm) < 0.01 * movement(base)

    def test_spotting_step_schedule(self):
        """The spotting factory's lr_schedule tuple scales the update."""
        from cvml_goalnet_tpu.models.temporal import temporal_scorer_init
        from cvml_goalnet_tpu.train.spotting import (
            init_spotting_opt,
            make_spotting_train_step,
        )

        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.random((32, 6)), jnp.float32)
        labels = jnp.asarray((rng.random(32) < 0.2), jnp.float32)
        params = temporal_scorer_init(jax.random.PRNGKey(0), 6, 8)
        opt = init_spotting_opt(params)

        plain = make_spotting_train_step(8, lr=1e-3)
        # warmup_steps=1000 → first-step lr = 1e-3/1000
        warm = make_spotting_train_step(
            8, lr=1e-3, lr_schedule=("constant", 1000, 0, 0.0))
        p1, _, _ = plain(params, opt, feats, labels)
        p2, _, _ = warm(params, opt, feats, labels)
        d1 = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
            jax.tree.leaves(p1), jax.tree.leaves(params)))
        d2 = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
            jax.tree.leaves(p2), jax.tree.leaves(params)))
        assert d2 < 0.01 * d1

    def test_config_json_roundtrip(self, tmp_path, small_cfg):
        from cvml_goalnet_tpu.config import PipelineConfig

        cfg = dataclasses.replace(
            small_cfg, train=dataclasses.replace(
                small_cfg.train, lr_schedule="linear", lr_warmup_steps=5,
                lr_decay_steps=50, lr_min_ratio=0.1, grad_accum_steps=3))
        fp = tmp_path / "cfg.json"
        cfg.save(str(fp))
        back = PipelineConfig.load(str(fp))
        assert back.train.lr_schedule == "linear"
        assert back.train.lr_warmup_steps == 5
        assert back.train.lr_decay_steps == 50
        assert back.train.lr_min_ratio == pytest.approx(0.1)
        assert back.train.grad_accum_steps == 3


class TestClipAndDecay:
    def test_global_norm(self):
        from cvml_goalnet_tpu.train.optim import global_norm

        tree = {"a": jnp.asarray([3.0, 0.0]), "b": jnp.asarray(4.0)}
        assert float(global_norm(tree)) == pytest.approx(5.0)

    def test_clip_scales_only_above_threshold(self):
        from cvml_goalnet_tpu.train.optim import clip_by_global_norm, global_norm

        tree = {"a": jnp.asarray([3.0, 0.0]), "b": jnp.asarray(4.0)}  # ‖g‖=5
        clipped = clip_by_global_norm(tree, 1.0)
        assert float(global_norm(clipped)) == pytest.approx(1.0, rel=1e-4)
        # direction preserved
        assert float(clipped["b"]) == pytest.approx(4.0 / 5.0, rel=1e-4)
        # within bounds → (near-)identity
        same = clip_by_global_norm(tree, 100.0)
        assert float(same["b"]) == pytest.approx(4.0, rel=1e-5)
        # disabled and zero-grad cases are safe
        assert clip_by_global_norm(tree, 0.0) is tree
        z = clip_by_global_norm({"a": jnp.zeros(3)}, 1.0)
        assert np.all(np.isfinite(np.asarray(z["a"])))

    def test_adamw_decoupled_decay_closed_form(self):
        params = {"w": jnp.asarray(2.0)}
        state = adam_init(params)
        grads = {"w": jnp.asarray(0.5)}
        plain, _ = adam_update(grads, state, params, lr=0.1)
        decayed, _ = adam_update(grads, state, params, lr=0.1, weight_decay=0.01)
        # decoupled: exactly lr·wd·p subtracted on top of the Adam step
        # f32: the difference of two ~1.9 values carries ~1e-7 ulp noise
        assert float(plain["w"]) - float(decayed["w"]) == pytest.approx(
            0.1 * 0.01 * 2.0, rel=1e-3, abs=1e-6)

    def test_loop_clip_caps_movement(self, small_cfg):
        """A tiny clip norm must cap the epoch-0 parameter movement."""
        base = _det_cfg(small_cfg)
        # default-eps Adam so updates are sign-scaled (movement ≈ lr per elt
        # unclipped); the clipped run's TOTAL movement must shrink hard
        base = dataclasses.replace(
            base, train=dataclasses.replace(base.train, eps=1e-8))
        clipped = dataclasses.replace(
            base, train=dataclasses.replace(base.train, grad_clip_norm=1e-4))
        visual, audio, labels = _rand_batch(base, 10)
        state = create_train_state(jax.random.PRNGKey(0), base)
        valid = np.ones(10, np.float32)

        def movement(cfg):
            fn = make_train_video_fn(cfg)
            p, *_ = fn(state.params, state.model_state, state.opt_state,
                       visual, audio, labels, valid, jax.random.PRNGKey(1))
            return sum(float(jnp.abs(a - b).sum()) for a, b in zip(
                jax.tree.leaves(p), jax.tree.leaves(state.params)))

        # clipping rescales g but Adam renormalizes by √v̂ of the SAME
        # rescaled grads, so sign-level movement persists — compare against
        # a run whose per-step grads saturate the same clip: the ratio test
        # here is clip vs no-clip on identical data, which differs whenever
        # the clip binds (it must, at 1e-4)
        m_clip, m_base = movement(clipped), movement(base)
        assert m_clip != pytest.approx(m_base, rel=1e-3)

    def test_loop_weight_decay_shrinks_params(self, small_cfg):
        """wd > 0 pulls weights toward zero relative to the plain run."""
        base = _det_cfg(small_cfg)
        wd = dataclasses.replace(
            base, train=dataclasses.replace(base.train, weight_decay=0.5))
        visual, audio, labels = _rand_batch(base, 10)
        state = create_train_state(jax.random.PRNGKey(0), base)
        valid = np.ones(10, np.float32)

        def l2(cfg):
            fn = make_train_video_fn(cfg)
            p, *_ = fn(state.params, state.model_state, state.opt_state,
                       visual, audio, labels, valid, jax.random.PRNGKey(1))
            return sum(float(jnp.square(a).sum()) for a in jax.tree.leaves(p))

        assert l2(wd) < l2(base)

    def test_spotting_step_clip(self):
        from cvml_goalnet_tpu.models.temporal import temporal_scorer_init
        from cvml_goalnet_tpu.train.spotting import (
            init_spotting_opt,
            make_spotting_train_step,
        )

        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.random((32, 6)), jnp.float32)
        labels = jnp.asarray((rng.random(32) < 0.2), jnp.float32)
        params = temporal_scorer_init(jax.random.PRNGKey(0), 6, 8)
        opt = init_spotting_opt(params)
        plain = make_spotting_train_step(8, lr=1e-3)
        clip = make_spotting_train_step(8, lr=1e-3, grad_clip_norm=1e-5)
        p1, _, l1 = plain(params, opt, feats, labels)
        p2, _, l2_ = clip(params, opt, feats, labels)
        assert float(l1) == pytest.approx(float(l2_))  # same forward
        d1 = [np.asarray(a) for a in jax.tree.leaves(p1)]
        d2 = [np.asarray(a) for a in jax.tree.leaves(p2)]
        assert any(not np.allclose(a, b) for a, b in zip(d1, d2))


def test_cli_spot_opt_kwargs_mapping():
    """spot-train derives the factory schedule/clip kwargs from TrainConfig."""
    from cvml_goalnet_tpu.cli import _spot_opt_kwargs
    from cvml_goalnet_tpu.config import TrainConfig
    from cvml_goalnet_tpu.train.spotting import make_spotting_train_step

    assert _spot_opt_kwargs(TrainConfig()) == {}
    kw = _spot_opt_kwargs(TrainConfig(
        lr_schedule="cosine", lr_warmup_steps=3, lr_decay_steps=50,
        lr_min_ratio=0.2, grad_clip_norm=2.0))
    assert kw == {"lr_schedule": ("cosine", 3, 50, 0.2), "grad_clip_norm": 2.0}
    # hashable: the lru_cached factories must accept it
    make_spotting_train_step(8, **kw)


def test_early_stopping_on_flat_runs(small_cfg):
    """lr=0 freezes the model, so train-F-avg can never IMPROVE — patience
    must end the run after exactly `patience` post-baseline epochs."""
    from cvml_goalnet_tpu.data.dataset import VideoDataset
    from cvml_goalnet_tpu.train.loop import train_importance_model
    from tests.test_train import _make_item

    cfg = dataclasses.replace(
        small_cfg, train=dataclasses.replace(
            small_cfg.train, learning_rate=0.0, early_stop_patience=2))
    train_ds = VideoDataset([_make_item(cfg, n=10, seed=0)])
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    _, history = train_importance_model(
        cfg, train_ds, VideoDataset([]), state, num_epochs=50, verbose=False)
    assert history.get("early_stopped") is True
    # initial eval + 2 patience epochs recorded, nothing more
    assert len(history["train_loss"]) == 3
    assert history["best_epoch"] == -1


def test_empty_batch_fuse_and_folded_head(small_cfg):
    """B=0: fuse yields an empty score vector and the conv-formulated head
    no longer ZeroDivisionErrors on reshape(-1) inference (serving edge)."""
    import jax.numpy as jnp

    from cvml_goalnet_tpu.models.visual import visual_encoder_apply
    from cvml_goalnet_tpu.pipeline import fuse

    cfg = small_cfg
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    h, w = cfg.preprocess.frame_size
    out = fuse(state.params, state.model_state,
               {"visual": np.zeros((0, h, w, 3), np.float32),
                "audio": np.zeros((0, cfg.audio.bin_length, cfg.audio.n_mfcc),
                                  np.float32),
                "text": None}, cfg)
    assert out.shape == (0,) and out.dtype == np.float32
    y, _ = visual_encoder_apply(
        state.params["visual"], state.model_state["visual"],
        jnp.zeros((0, h, w, 3)), train=False, rng=jax.random.PRNGKey(0),
        dropout_rate=0.0)
    assert y.shape == (0, cfg.model.vis_feature_dim)


def test_tokenize_vocab_guard():
    from cvml_goalnet_tpu.data.text import tokenize

    with pytest.raises(ValueError, match="reserved for padding"):
        tokenize(["x"], 1, 4)


def test_history_records_effective_lr(small_cfg):
    """The train loop logs the scheduled lr per epoch (observability)."""
    from cvml_goalnet_tpu.data.dataset import VideoDataset
    from cvml_goalnet_tpu.train.loop import train_importance_model
    from tests.test_train import _make_item

    cfg = dataclasses.replace(
        small_cfg, train=dataclasses.replace(
            small_cfg.train, learning_rate=1e-3, lr_schedule="linear",
            lr_decay_steps=4))
    train_ds = VideoDataset([_make_item(cfg, n=10, seed=0)])
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    _, history = train_importance_model(
        cfg, train_ds, VideoDataset([]), state, num_epochs=2, verbose=False)
    # index 0 = initial (step 0); 2 sub-batches/epoch → steps 2 then 4;
    # linear decay over 4 steps
    assert history["lr"] == pytest.approx([1e-3, 1e-3 * 0.5, 0.0])


class TestOptimumMetricPolicy:
    def _run(self, small_cfg, metric, with_val=True):
        from cvml_goalnet_tpu.data.dataset import VideoDataset
        from cvml_goalnet_tpu.train.loop import train_importance_model
        from tests.test_train import _make_item

        cfg = dataclasses.replace(
            small_cfg, train=dataclasses.replace(
                small_cfg.train, optimum_metric=metric))
        train_ds = VideoDataset([_make_item(cfg, n=10, seed=0)])
        val_ds = VideoDataset([_make_item(cfg, n=10, seed=1)] if with_val else [])
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        return train_importance_model(
            cfg, train_ds, val_ds, state, num_epochs=3, verbose=False)

    def test_val_policy_tracks_val_best(self, small_cfg):
        _, history = self._run(small_cfg, "val_f_avg")
        # the recorded best epoch must be the argmax of the VAL F-avg series
        # (index 0 = initial eval = epoch -1)
        series = history["val_f_avg"]
        assert history["best_epoch"] == int(np.argmax(series)) - 1

    def test_val_loss_policy(self, small_cfg):
        _, history = self._run(small_cfg, "val_loss")
        series = history["val_loss"]
        assert history["best_epoch"] == int(np.argmin(series)) - 1

    def test_val_policy_requires_val_split(self, small_cfg):
        with pytest.raises(ValueError, match="non-empty val split"):
            self._run(small_cfg, "val_f_avg", with_val=False)

    def test_unknown_metric_rejected(self, small_cfg):
        with pytest.raises(ValueError, match="unknown optimum_metric"):
            self._run(small_cfg, "test_f_avg")

    def test_default_is_reference_policy(self, small_cfg):
        _, history = self._run(small_cfg, "train_f_avg")
        series = history["train_f_avg"]
        assert history["best_epoch"] == int(np.argmax(series)) - 1
