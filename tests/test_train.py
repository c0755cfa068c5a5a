"""Training-loop tests: scan sub-batch semantics, learning, checkpoints, baseline."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvml_goalnet_tpu.data.dataset import VideoItem, VideoDataset
from cvml_goalnet_tpu.data.synthetic import synthetic_change_points
from cvml_goalnet_tpu.train.checkpoint import load_checkpoint
from cvml_goalnet_tpu.train.loop import eval_video, make_train_video_fn, train_importance_model
from cvml_goalnet_tpu.train.optim import adam_init, adam_update
from cvml_goalnet_tpu.train.state import TrainState, create_train_state


def _make_item(cfg, n=20, seed=0, with_audio=True):
    rng = np.random.default_rng(seed)
    full_n = n * cfg.preprocess.skip_frames
    visual = rng.random((n, *cfg.preprocess.frame_size, 3)).astype(np.float32)
    audio = (
        rng.random((n, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32)
        if with_audio
        else None
    )
    labels = rng.integers(1, 6, n).astype(np.float32)
    masks = (rng.random((20, full_n)) < 0.15).astype(np.uint8)
    return VideoItem(
        video_id=f"synth{seed}",
        title=f"synth{seed}",
        visual=visual,
        audio=audio,
        labels=labels,
        gd_summary_masks=masks,
        full_n_frames=full_n,
        clip_intervals=synthetic_change_points(full_n, 6, seed=seed),
    )


class TestAdam:
    def test_matches_scalar_reference(self):
        # One-parameter closed-form check of bias-corrected Adam.
        params = {"w": jnp.asarray(1.0)}
        state = adam_init(params)
        grads = {"w": jnp.asarray(0.5)}
        new_params, state2 = adam_update(grads, state, params, lr=0.1)
        # step1: m=0.05, v=2.5e-4 ⇒ m̂=0.5, v̂=0.25 ⇒ p - 0.1*0.5/(0.5+1e-8)
        assert np.isclose(float(new_params["w"]), 1.0 - 0.1 * 0.5 / (0.5 + 1e-8), atol=1e-6)
        assert int(state2.step) == 1


class TestTrainStep:
    def test_scan_equals_manual_subbatch_loop(self, small_cfg):
        """The fused lax.scan pass must equal per-sub-batch jitted steps."""
        cfg = small_cfg
        item = _make_item(cfg, n=10)
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        fn = make_train_video_fn(cfg)
        rng = jax.random.PRNGKey(42)
        S = cfg.train.subbatch_size

        p, ms, opt, preds, loss = fn(
            state.params, state.model_state, state.opt_state,
            jnp.asarray(item.visual), jnp.asarray(item.audio),
            jnp.asarray(item.labels), jnp.ones(10), rng,
        )

        # manual: same rng split sequence, one jitted update per sub-batch
        from cvml_goalnet_tpu.models.avm import avm_apply

        @jax.jit
        def manual_step(params, ms, opt, vis, aud, lab, step_rng):
            def loss_of(pp):
                out, new_ms = avm_apply(pp, ms, vis, aud, cfg=cfg.model, train=True, rng=step_rng)
                return jnp.mean((out[:, 0] - lab) ** 2), new_ms

            (l, new_ms), g = jax.value_and_grad(loss_of, has_aux=True)(params)
            params, opt = adam_update(
                g, opt, params, cfg.train.learning_rate, cfg.train.b1, cfg.train.b2, cfg.train.eps
            )
            return params, new_ms, opt, l

        params2, ms2, opt2 = state.params, state.model_state, state.opt_state
        rngs = jax.random.split(rng, 2)
        losses = []
        for i in range(2):
            sl = slice(i * S, (i + 1) * S)
            params2, ms2, opt2, l = manual_step(
                params2, ms2, opt2, jnp.asarray(item.visual[sl]), jnp.asarray(item.audio[sl]),
                jnp.asarray(item.labels[sl]), rngs[i],
            )
            losses.append(float(l))

        # scan body and unrolled steps compile separately → small float drift
        # is expected; semantics (sequential per-sub-batch updates) must agree.
        for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(params2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
        assert np.isclose(float(loss), np.mean(losses), atol=1e-4)

    def test_padding_masks_loss(self, small_cfg):
        item = _make_item(small_cfg, n=7)  # pads to 10 with subbatch 5
        state = create_train_state(jax.random.PRNGKey(0), small_cfg)
        preds, loss = eval_video(state, item, small_cfg)
        assert preds.shape == (7,)
        assert np.isfinite(loss)

    def test_padding_kept_out_of_batchnorm_stats(self, small_cfg):
        # The reference trains its final SHORT sub-batch unpadded
        # (main.py:177-196), so its train-mode BN statistics see only real
        # frames.  Our fixed-shape scan pads — the valid mask must keep
        # those zero frames out of the batch statistics or predictions,
        # gradients, AND running stats silently diverge (round-3 review).
        import dataclasses

        import jax.numpy as jnp

        from cvml_goalnet_tpu.models.avm import avm_apply, avm_init

        cfg = dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(
                small_cfg.model, dropout_rate=0.0, audio_included=False),
        )
        params, state = avm_init(
            jax.random.PRNGKey(0), cfg.model, cfg.preprocess, cfg.audio)
        rng = np.random.default_rng(0)
        h, w = cfg.preprocess.frame_size
        real = jnp.asarray(rng.random((7, h, w, 3)).astype(np.float32))

        # unpadded short batch == what the reference computes
        want, want_state = avm_apply(
            params, state, real, cfg=cfg.model, train=True,
            rng=jax.random.PRNGKey(1))

        # padded to 10 with a validity mask: real rows must match exactly
        padded = jnp.concatenate([real, jnp.zeros((3, h, w, 3))])
        valid = jnp.asarray([1.0] * 7 + [0.0] * 3)
        got, got_state = avm_apply(
            params, state, padded, cfg=cfg.model, train=True,
            rng=jax.random.PRNGKey(1), valid=valid)
        np.testing.assert_allclose(
            np.asarray(got[:7]), np.asarray(want), atol=1e-5)
        # running BN stats must match the unpadded run's too
        for a, b in zip(jax.tree_util.tree_leaves(got_state),
                        jax.tree_util.tree_leaves(want_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        # and WITHOUT the mask the padding visibly skews the result
        # (guards against the mask silently becoming a no-op)
        unmasked, _ = avm_apply(
            params, state, padded, cfg=cfg.model, train=True,
            rng=jax.random.PRNGKey(1))
        assert float(jnp.max(jnp.abs(unmasked[:7] - want))) > 1e-4

    def test_training_requires_labels_and_masks(self, small_cfg):
        # labels=None used to silently train toward 0 via the zero-label
        # fallback; gd_summary_masks=None crashed mid-eval with an opaque
        # 0-d-iteration TypeError (round-3 review)
        import dataclasses

        state = create_train_state(jax.random.PRNGKey(0), small_cfg)
        good = _make_item(small_cfg, n=10)
        no_labels = dataclasses.replace(good, labels=None)
        with pytest.raises(ValueError, match="has no labels"):
            train_importance_model(
                small_cfg, VideoDataset([no_labels]), VideoDataset([]),
                state, num_epochs=1, verbose=False)
        no_masks = dataclasses.replace(good, gd_summary_masks=None)
        with pytest.raises(ValueError, match="ground-truth masks"):
            train_importance_model(
                small_cfg, VideoDataset([no_masks]), VideoDataset([]),
                state, num_epochs=1, verbose=False)


class TestTrainLoop:
    @pytest.fixture(scope="class")
    def trained(self, small_cfg, tmp_path_factory):
        ckdir = str(tmp_path_factory.mktemp("ckpt"))
        train_ds = VideoDataset([_make_item(small_cfg, n=10, seed=0)])
        val_ds = VideoDataset([_make_item(small_cfg, n=10, seed=1)])
        state = create_train_state(jax.random.PRNGKey(small_cfg.train.seed), small_cfg)
        best, history = train_importance_model(
            small_cfg, train_ds, val_ds, state,
            num_epochs=3, checkpoint_dir=ckdir, verbose=False,
        )
        return best, history, ckdir, small_cfg

    def test_loss_decreases(self, trained):
        _, history, _, _ = trained
        assert history["train_loss"][-1] < history["train_loss"][0]

    def test_history_lengths_consistent(self, trained):
        _, history, _, _ = trained
        lens = {len(v) for k, v in history.items() if isinstance(v, list)}
        assert lens == {4}  # initial + 3 epochs

    def test_checkpoint_roundtrip(self, trained, small_cfg):
        best, _, ckdir, cfg = trained
        template = create_train_state(jax.random.PRNGKey(0), cfg)
        restored = load_checkpoint(ckdir, template, tag="ckp")
        assert restored.epoch == 3
        item = _make_item(cfg, n=10, seed=2)
        p1, _ = eval_video(restored, item, cfg)
        # the rolling ckp holds the final state; recompute from it directly
        final_state = TrainState(restored.params, restored.model_state, restored.opt_state, restored.epoch)
        p2, _ = eval_video(final_state, item, cfg)
        np.testing.assert_allclose(p1, p2, atol=1e-6)

    def test_checkpoint_preserves_opt_state(self, trained, small_cfg):
        _, _, ckdir, cfg = trained
        template = create_train_state(jax.random.PRNGKey(0), cfg)
        restored = load_checkpoint(ckdir, template, tag="ckp")
        assert int(restored.opt_state.step) > 0  # reference lost Adam moments on resume

    def test_no_audio_training(self, small_cfg):
        cfg = dataclasses.replace(
            small_cfg, model=dataclasses.replace(small_cfg.model, audio_included=False)
        )
        ds = VideoDataset([_make_item(cfg, n=10, seed=0, with_audio=False)])
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        _, history = train_importance_model(cfg, ds, ds, state, num_epochs=1, verbose=False)
        assert np.isfinite(history["train_loss"]).all()


class TestBroadcastCompatLoss:
    def test_bug_mode_differs(self, small_cfg):
        """broadcast_loss_compat reproduces the (n,n) reference loss (main.py:191)."""
        cfg_bug = dataclasses.replace(
            small_cfg, train=dataclasses.replace(small_cfg.train, broadcast_loss_compat=True)
        )
        item = _make_item(small_cfg, n=10)
        state = create_train_state(jax.random.PRNGKey(0), small_cfg)
        _, loss_fixed = eval_video(state, item, small_cfg)
        _, loss_bug = eval_video(state, item, cfg_bug)
        assert not np.isclose(loss_fixed, loss_bug)
        # bug semantics: mean over all (pred_i - label_j) pairs
        preds, _ = eval_video(state, item, small_cfg)
        want = np.mean((preds[:, None] - item.labels[None, :]) ** 2)
        assert np.isclose(loss_bug, want, atol=1e-5)


class TestClassifierTraining:
    def test_cavm_classifier_learns(self, small_cfg):
        """CAVM/CVM classifier variant (reference's commented-out ablation,
        main.py:96-97/189-190) trains with cross-entropy."""
        item = _make_item(small_cfg, n=10, seed=3)
        state = create_train_state(jax.random.PRNGKey(0), small_cfg, classifier=True)
        fn = make_train_video_fn(small_cfg, classifier=True)
        params, ms, opt = state.params, state.model_state, state.opt_state
        losses = []
        for i in range(6):
            params, ms, opt, preds, loss = fn(
                params, ms, opt, jnp.asarray(item.visual), jnp.asarray(item.audio),
                jnp.asarray(item.labels), jnp.ones(10), jax.random.PRNGKey(i),
            )
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        # predictions are argmax+1 grades in [1, 5]
        p = np.asarray(preds)
        assert ((p >= 1) & (p <= 5)).all()


class TestEmptyValSet:
    """Round-2 hardening: one-video datasets (empty val split) must not NaN."""

    def test_training_with_empty_val_set(self, small_cfg):
        cfg = dataclasses.replace(
            small_cfg, train=dataclasses.replace(small_cfg.train, subbatch_size=5)
        )
        train_ds = VideoDataset([_make_item(cfg, n=10, seed=0)])
        val_ds = VideoDataset([])
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        best, history = train_importance_model(
            cfg, train_ds, val_ds, state, num_epochs=2, verbose=False
        )
        assert history["val_loss"] == []          # skipped, not NaN
        assert len(history["train_loss"]) == 3    # initial + 2 epochs
        assert all(np.isfinite(history["train_loss"]))
        assert history["best_epoch"] in (-1, 0, 1)

    def test_empty_train_set_raises(self, small_cfg):
        state = create_train_state(jax.random.PRNGKey(0), small_cfg)
        with pytest.raises(ValueError, match="train_ds is empty"):
            train_importance_model(
                small_cfg, VideoDataset([]), VideoDataset([]), state,
                num_epochs=1, verbose=False,
            )


class TestTextModalityTraining:
    """Round-2 (VERDICT item 5): the text/commentary branch has a full data +
    training path — importance decodable ONLY from commentary is learned."""

    def _text_cfg(self, small_cfg):
        return dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(
                small_cfg.model, audio_included=False, text_included=True),
            train=dataclasses.replace(small_cfg.train, subbatch_size=5,
                                      learning_rate=3e-3),
        )

    def _text_item(self, cfg, n=40, seed=0):
        from cvml_goalnet_tpu.data.synthetic import synthetic_change_points
        from cvml_goalnet_tpu.data.text import tokenize

        rng = np.random.default_rng(seed)
        full_n = n * cfg.preprocess.skip_frames
        # visual carries ZERO information (constant frames) — importance is
        # decodable only from the commentary text
        visual = np.full((n, *cfg.preprocess.frame_size, 3), 0.5, np.float32)
        is_goal = rng.random(n) < 0.4
        commentary = ["goal scored now" if g else "quiet midfield play" for g in is_goal]
        labels = np.where(is_goal, 5.0, 1.0).astype(np.float32)
        text = tokenize(commentary, cfg.model.text_vocab_size, cfg.model.text_max_len)
        masks = (rng.random((20, full_n)) < 0.15).astype(np.uint8)
        return VideoItem(
            video_id=f"text{seed}", title=f"text{seed}", visual=visual, audio=None,
            labels=labels, gd_summary_masks=masks, full_n_frames=full_n,
            clip_intervals=synthetic_change_points(full_n, 6, seed=seed), text=text,
        )

    def test_importance_learned_from_text_only(self, small_cfg):
        from cvml_goalnet_tpu.train.loop import _pad_video, eval_video

        cfg = self._text_cfg(small_cfg)
        item = self._text_item(cfg)

        # integration: the full driver runs with a text-bearing dataset
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        _, history = train_importance_model(
            cfg, VideoDataset([item]), VideoDataset([]), state,
            num_epochs=3, verbose=False)
        assert history["train_loss"][-1] < history["train_loss"][0], history["train_loss"]

        # learning: train longer with the raw step fn, then check that
        # predictions separate goal/non-goal frames on FRESH noise visuals —
        # decodable only through the commentary tokens
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        train_fn = make_train_video_fn(cfg)
        visual, audio, labels, valid, n, text = _pad_video(item, cfg.train.subbatch_size)
        params, ms, opt = state.params, state.model_state, state.opt_state
        rng = jax.random.PRNGKey(1)
        losses = []
        for _ in range(25):
            rng, vrng = jax.random.split(rng)
            params, ms, opt, _, loss = train_fn(
                params, ms, opt, jnp.asarray(visual), None,
                jnp.asarray(labels), jnp.asarray(valid), vrng, jnp.asarray(text))
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.35, losses

        item2 = self._text_item(cfg, seed=1)
        trained = TrainState(params, ms, opt, 0)
        preds, _ = eval_video(trained, item2, cfg)
        goal = preds[item2.labels > 3]
        quiet = preds[item2.labels < 3]
        assert goal.mean() - quiet.mean() > 1.0, (goal.mean(), quiet.mean())

    def test_fuse_many_carries_text(self, small_cfg):
        from cvml_goalnet_tpu.pipeline import fuse, fuse_many
        from cvml_goalnet_tpu.train.state import create_train_state as cts

        cfg = self._text_cfg(small_cfg)
        state = cts(jax.random.PRNGKey(0), cfg)
        items = [self._text_item(cfg, n=10, seed=s) for s in (2, 3)]
        feats = [{"visual": it.visual, "audio": None, "text": it.text} for it in items]
        many = fuse_many(state.params, state.model_state, feats, cfg)
        for it, got in zip(items, many):
            one = fuse(state.params, state.model_state,
                       {"visual": it.visual, "audio": None, "text": it.text}, cfg)
            np.testing.assert_allclose(got, one, atol=1e-5)


class TestAsyncCheckpointer:
    def test_async_save_roundtrip_and_supersede(self, small_cfg, tmp_path):
        from cvml_goalnet_tpu.train.checkpoint import AsyncCheckpointer, load_checkpoint

        cfg = small_cfg
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        ck = AsyncCheckpointer()
        # queue two saves for the same tag — the newer must win
        ck.save(str(tmp_path), state, cfg, tag="ckp")
        state2 = TrainState(state.params, state.model_state, state.opt_state, epoch=7)
        ck.save(str(tmp_path), state2, cfg, tag="ckp")
        ck.wait()
        restored = load_checkpoint(str(tmp_path), state, tag="ckp")
        assert restored.epoch == 7
        a = jax.tree_util.tree_leaves(restored.params)
        b = jax.tree_util.tree_leaves(state.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_rapid_saves_never_drop_the_last_snapshot(self, small_cfg, tmp_path):
        # a save() racing the worker's exit decision used to see is_alive()
        # True, start no new worker, and silently never write (round-3
        # review) — hammer the race window and require the LAST epoch on disk
        from cvml_goalnet_tpu.train.checkpoint import AsyncCheckpointer, load_checkpoint

        state = create_train_state(jax.random.PRNGKey(0), small_cfg)
        ck = AsyncCheckpointer()
        for e in range(30):
            ck.save(str(tmp_path), state._replace(epoch=e), small_cfg, tag="ckp")
        ck.wait()
        assert load_checkpoint(str(tmp_path), state, tag="ckp").epoch == 29
        # and across many enqueue/drain-exit cycles
        for e in range(5):
            ck.save(str(tmp_path), state._replace(epoch=100 + e), small_cfg, tag="ckp")
            ck.wait()
            assert load_checkpoint(str(tmp_path), state, tag="ckp").epoch == 100 + e

    def test_epoch_rides_inside_the_npz(self, small_cfg, tmp_path):
        # weights+epoch must swap atomically: a crash between the npz and
        # manifest renames used to pair new weights with a stale-epoch
        # manifest (round-3 review) — the payload epoch wins
        import json

        from cvml_goalnet_tpu.train.checkpoint import load_checkpoint, save_checkpoint

        state = create_train_state(jax.random.PRNGKey(0), small_cfg)
        save_checkpoint(str(tmp_path), state._replace(epoch=5), small_cfg, tag="ckp")
        mpath = tmp_path / "ckp_manifest.json"
        manifest = json.loads(mpath.read_text())
        manifest["epoch"] = 3  # simulate the stale manifest
        mpath.write_text(json.dumps(manifest))
        assert load_checkpoint(str(tmp_path), state, tag="ckp").epoch == 5

        # pre-round-3 files without the payload leaf fall back to the manifest
        import numpy as _np
        fp = tmp_path / "ckp_state.npz"
        data = dict(_np.load(fp))
        del data["__epoch__"]
        _np.savez(fp, **data)
        assert load_checkpoint(str(tmp_path), state, tag="ckp").epoch == 3

    def test_wait_surfaces_write_errors(self, small_cfg, tmp_path):
        from cvml_goalnet_tpu.train.checkpoint import AsyncCheckpointer

        state = create_train_state(jax.random.PRNGKey(0), small_cfg)
        ck = AsyncCheckpointer()
        bad = tmp_path / "not_a_dir"
        bad.write_text("file blocks mkdir")
        ck.save(str(bad), state, small_cfg, tag="ckp")
        with pytest.raises(Exception):
            ck.wait()


class TestAsyncCheckpointInLoop:
    def test_training_with_async_checkpoint(self, small_cfg, tmp_path):
        ds = VideoDataset([_make_item(small_cfg, n=10, seed=0)])
        state = create_train_state(jax.random.PRNGKey(0), small_cfg)
        best, history = train_importance_model(
            small_cfg, ds, ds, state, num_epochs=2,
            checkpoint_dir=str(tmp_path), verbose=False, async_checkpoint=True,
        )
        template = create_train_state(jax.random.PRNGKey(0), small_cfg)
        restored = load_checkpoint(str(tmp_path), template, tag="ckp")
        assert restored.epoch == 2


class TestNanGuard:
    """Non-finite-loss guard (TrainConfig.nan_guard): one poisoned video must
    cost its own updates, not the run (rollback), or fail loudly (raise) —
    the reference records whatever the loss was (off)."""

    def _poisoned(self, cfg, n=10, seed=3):
        # labels at 1e25 overflow the f32 squared error → inf loss/grads
        item = _make_item(cfg, n=n, seed=seed)
        return dataclasses.replace(
            item, video_id="poison", labels=np.full(n, 1e25, np.float32))

    def _cfg(self, small_cfg, guard, limit=3, epochs=1):
        return dataclasses.replace(
            small_cfg,
            train=dataclasses.replace(
                small_cfg.train, nan_guard=guard, nan_guard_limit=limit,
                num_epochs=epochs),
        )

    def test_rollback_discards_exactly_the_poisoned_updates(self, small_cfg, tmp_path):
        cfg = self._cfg(small_cfg, "rollback", limit=5, epochs=1)
        good = _make_item(cfg, n=10, seed=0)
        state0 = create_train_state(jax.random.PRNGKey(1), cfg)

        dir_a, dir_b = str(tmp_path / "a"), str(tmp_path / "b")
        _, hist_a = train_importance_model(
            cfg, VideoDataset([good, self._poisoned(cfg)]), VideoDataset([]),
            state0, checkpoint_dir=dir_a, verbose=False)
        _, hist_b = train_importance_model(
            cfg, VideoDataset([good]), VideoDataset([]),
            state0, checkpoint_dir=dir_b, verbose=False)

        assert hist_a["nan_rollbacks"] == 1
        assert "nan_rollbacks" not in hist_b
        # index 0 is the initial EVAL (epoch -1), which legitimately records
        # the poisoned video's inf; the TRAINING epochs must be finite
        assert np.isfinite(hist_a["train_loss"][1:]).all()
        # the rolling checkpoints after epoch 0 must be IDENTICAL: the
        # poisoned video's params/BN/Adam updates were fully discarded
        sa = load_checkpoint(dir_a, create_train_state(jax.random.PRNGKey(2), cfg), tag="ckp")
        sb = load_checkpoint(dir_b, create_train_state(jax.random.PRNGKey(3), cfg), tag="ckp")
        for a, b in zip(jax.tree_util.tree_leaves((sa.params, sa.model_state, sa.opt_state)),
                        jax.tree_util.tree_leaves((sb.params, sb.model_state, sb.opt_state))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_raise_mode_fails_loudly(self, small_cfg):
        cfg = self._cfg(small_cfg, "raise")
        state0 = create_train_state(jax.random.PRNGKey(1), cfg)
        with pytest.raises(FloatingPointError, match="poison"):
            train_importance_model(
                cfg, VideoDataset([_make_item(cfg, seed=0), self._poisoned(cfg)]),
                VideoDataset([]), state0, verbose=False)

    def test_rollback_limit_exhausted_raises(self, small_cfg):
        cfg = self._cfg(small_cfg, "rollback", limit=1, epochs=3)
        state0 = create_train_state(jax.random.PRNGKey(1), cfg)
        with pytest.raises(FloatingPointError, match="after 1 rollbacks"):
            train_importance_model(
                cfg, VideoDataset([_make_item(cfg, seed=0), self._poisoned(cfg)]),
                VideoDataset([]), state0, verbose=False)

    def test_all_videos_poisoned_raises(self, small_cfg):
        cfg = self._cfg(small_cfg, "rollback", limit=10, epochs=1)
        state0 = create_train_state(jax.random.PRNGKey(1), cfg)
        with pytest.raises(FloatingPointError, match="every training video"):
            train_importance_model(
                cfg, VideoDataset([self._poisoned(cfg)]), VideoDataset([]),
                state0, verbose=False)

    def test_off_preserves_reference_semantics(self, small_cfg):
        cfg = self._cfg(small_cfg, "off", epochs=1)
        state0 = create_train_state(jax.random.PRNGKey(1), cfg)
        _, hist = train_importance_model(
            cfg, VideoDataset([_make_item(cfg, seed=0), self._poisoned(cfg)]),
            VideoDataset([]), state0, verbose=False)
        assert not np.isfinite(hist["train_loss"][-1])  # recorded, not raised

    def test_unknown_guard_rejected(self, small_cfg):
        cfg = self._cfg(small_cfg, "explode")
        state0 = create_train_state(jax.random.PRNGKey(1), cfg)
        with pytest.raises(ValueError, match="nan_guard"):
            train_importance_model(
                cfg, VideoDataset([_make_item(cfg, seed=0)]), VideoDataset([]),
                state0, verbose=False)
