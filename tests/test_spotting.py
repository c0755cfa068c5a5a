"""Temporal spotting tests: timeline scoring, chunked parity, training, e2e."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvml_goalnet_tpu.data.synthetic import synthetic_change_points
from cvml_goalnet_tpu.data.text import tokenize
from cvml_goalnet_tpu.models.avm import avm_init
from cvml_goalnet_tpu.models.temporal import temporal_scorer_init
from cvml_goalnet_tpu.pipeline import extract_features
from cvml_goalnet_tpu.spotting import (
    encode_timeline,
    score_timeline,
    score_timeline_chunked,
    spot_events,
    summarize_match,
)
from cvml_goalnet_tpu.train.spotting import init_spotting_opt, make_spotting_train_step


def _features(d=16, t=300, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal((t, d)).astype(np.float32))


class TestTimelineScoring:
    def test_chunked_matches_monolithic_away_from_borders(self):
        params = temporal_scorer_init(jax.random.PRNGKey(0), 16, 8)
        feats = _features(t=300)
        full = np.asarray(score_timeline(params, feats, 8))
        chunked = np.asarray(score_timeline_chunked(params, feats, 8, chunk=100, overlap=40))
        assert chunked.shape == full.shape
        # GRU state decays across the 40-frame halo → interior agreement
        np.testing.assert_allclose(chunked, full, atol=2e-2)

    def test_chunked_handles_non_divisible_lengths(self):
        params = temporal_scorer_init(jax.random.PRNGKey(0), 16, 8)
        feats = _features(t=257)
        out = np.asarray(score_timeline_chunked(params, feats, 8, chunk=100, overlap=20))
        assert out.shape == (257,)
        assert np.isfinite(out).all()

    def test_spot_events_returns_indices(self):
        scores = np.zeros(100, np.float32)
        scores[[10, 50, 90]] = 5.0
        events = spot_events(scores, window=5, threshold=1.0)
        np.testing.assert_array_equal(events, [10, 50, 90])


class TestSpottingTraining:
    def test_loss_decreases_on_separable_events(self):
        rng = np.random.default_rng(0)
        t, d, hidden = 200, 8, 8
        labels = (rng.random(t) < 0.05).astype(np.float32)
        # events carry a distinctive feature signature
        feats = rng.standard_normal((t, d)).astype(np.float32) * 0.1
        feats[labels > 0.5, 0] += 3.0
        params = temporal_scorer_init(jax.random.PRNGKey(0), d, hidden)
        opt = init_spotting_opt(params)
        step = make_spotting_train_step(hidden, lr=1e-2)
        losses = []
        for _ in range(30):
            params, opt, loss = step(params, opt, jnp.asarray(feats), jnp.asarray(labels))
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.5


class TestTrunkBackbones:
    def test_encode_timeline_resnet_backbone(self, small_cfg):
        # the trunk must dispatch on vis_backbone like avm_apply does —
        # hardcoding the conv encoder crashed every spotting entry point
        # for resnet checkpoints (round-3 review)
        import dataclasses

        import jax

        from cvml_goalnet_tpu.spotting import encode_timeline
        from cvml_goalnet_tpu.train.state import create_train_state

        cfg = dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(
                small_cfg.model, vis_backbone="resnet", audio_included=False),
        )
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        h, w = cfg.preprocess.frame_size
        frames = np.random.default_rng(0).random((6, h, w, 3)).astype(np.float32)
        feats = encode_timeline(
            state.params, state.model_state, jnp.asarray(frames), None, cfg)
        assert feats.shape == (6, cfg.model.vis_feature_dim)

    def test_encode_timeline_vit_backbone(self, small_cfg):
        # third model family (models/vit.py) through the spotting trunk —
        # same dispatch contract as resnet
        import dataclasses

        import jax

        from cvml_goalnet_tpu.spotting import encode_timeline
        from cvml_goalnet_tpu.train.state import create_train_state

        cfg = dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(
                small_cfg.model, vis_backbone="vit", audio_included=False,
                vit_patch_size=8, vit_embed_dim=32, vit_depth=1,
                vit_num_heads=2),
        )
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        h, w = cfg.preprocess.frame_size
        frames = np.random.default_rng(0).random((6, h, w, 3)).astype(np.float32)
        feats = encode_timeline(
            state.params, state.model_state, jnp.asarray(frames), None, cfg)
        assert feats.shape == (6, cfg.model.vis_feature_dim)


class TestEncodeTimelineText:
    """3-modality (commentary) trunks through the spotting path — the text
    features must reach the fused timeline (round-3 continuation: text
    trunks previously could not spot at all)."""

    def _cfg(self, small_cfg):
        import dataclasses

        return dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(small_cfg.model, text_included=True))

    def test_text_features_reach_the_timeline(self, small_cfg):
        import dataclasses

        from cvml_goalnet_tpu.data.text import tokenize
        from cvml_goalnet_tpu.models.avm import avm_init
        from cvml_goalnet_tpu.spotting import encode_timeline

        cfg = self._cfg(small_cfg)
        rng = np.random.default_rng(0)
        n = 5
        vis = jnp.asarray(rng.random((n, *cfg.preprocess.frame_size, 3)).astype(np.float32))
        aud = jnp.asarray(rng.random((n, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32))
        params, state = avm_init(jax.random.PRNGKey(0), cfg.model, cfg.preprocess, cfg.audio)
        toks_a = jnp.asarray(tokenize(["goal!"] * n, cfg.model.text_vocab_size,
                                      cfg.model.text_max_len))
        toks_b = jnp.asarray(tokenize([""] * n, cfg.model.text_vocab_size,
                                      cfg.model.text_max_len))
        fa = encode_timeline(params, state, vis, aud, cfg, text=toks_a)
        fb = encode_timeline(params, state, vis, aud, cfg, text=toks_b)
        d = (cfg.model.vis_feature_dim + cfg.model.aud_feature_dim
             + cfg.model.text_feature_dim)
        assert fa.shape == (n, d)
        # the text slice responds to the commentary; audio+visual slices don't
        base = cfg.model.vis_feature_dim + cfg.model.aud_feature_dim
        assert not np.allclose(np.asarray(fa[:, base:]), np.asarray(fb[:, base:]))
        np.testing.assert_allclose(np.asarray(fa[:, :base]), np.asarray(fb[:, :base]))

    def test_missing_text_raises(self, small_cfg):
        from cvml_goalnet_tpu.models.avm import avm_init
        from cvml_goalnet_tpu.spotting import encode_timeline

        cfg = self._cfg(small_cfg)
        rng = np.random.default_rng(1)
        vis = jnp.asarray(rng.random((3, *cfg.preprocess.frame_size, 3)).astype(np.float32))
        aud = jnp.asarray(rng.random((3, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32))
        params, state = avm_init(jax.random.PRNGKey(0), cfg.model, cfg.preprocess, cfg.audio)
        with pytest.raises(ValueError, match="text"):
            encode_timeline(params, state, vis, aud, cfg)


class TestMatchSummarization:
    def test_end_to_end(self, small_cfg):
        cfg = small_cfg
        rng = np.random.default_rng(0)
        n = 20
        visual = jnp.asarray(rng.random((n, *cfg.preprocess.frame_size, 3)).astype(np.float32))
        audio = jnp.asarray(rng.random((n, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32))
        params, state = avm_init(jax.random.PRNGKey(0), cfg.model, cfg.preprocess, cfg.audio)

        feats = encode_timeline(params, state, visual, audio, cfg)
        d = cfg.model.vis_feature_dim + cfg.model.aud_feature_dim
        assert feats.shape == (n, d)

        tparams = temporal_scorer_init(jax.random.PRNGKey(1), d, cfg.model.temporal_hidden)
        full_n = n * cfg.preprocess.skip_frames
        intervals = synthetic_change_points(full_n, 6)
        result = summarize_match(
            params, state, tparams, visual, audio, intervals, cfg,
            full_n_frames=full_n, peak_threshold=-1e9,
        )
        assert result.scores.shape == (n,)
        assert result.summary.frame_mask.shape == (full_n,)
        assert result.summary.frame_mask.sum() > 0
        assert len(result.events) > 0


class TestTextPipeline:
    def test_tokenizer_deterministic_and_padded(self):
        toks = tokenize(["Goal by PLAYER!", "goal by player", ""], 128, 8)
        assert toks.shape == (3, 8)
        np.testing.assert_array_equal(toks[0], toks[1])  # case-insensitive
        assert (toks[2] == 0).all()
        assert toks.max() < 128 and toks.min() >= 0

    def test_extract_features_with_commentary(self, small_cfg):
        import dataclasses

        cfg = dataclasses.replace(
            small_cfg, model=dataclasses.replace(small_cfg.model, text_included=True)
        )
        frames = np.random.default_rng(0).integers(0, 255, (4, 32, 32, 3)).astype(np.float32)
        feats = extract_features(frames, None, cfg, commentary=["a b", "c", "", "d e f"])
        assert feats["text"].shape == (4, cfg.model.text_max_len)

        from cvml_goalnet_tpu.pipeline import fuse

        params, state = avm_init(jax.random.PRNGKey(0), cfg.model, cfg.preprocess, cfg.audio)
        cfg_no_audio = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, audio_included=False, text_included=True)
        )
        params2, state2 = avm_init(jax.random.PRNGKey(0), cfg_no_audio.model, cfg.preprocess, cfg.audio)
        scores = fuse(params2, state2, feats, cfg_no_audio)
        assert scores.shape == (4,)


class TestRematSpotting:
    def test_remat_matches_plain(self):
        rng = np.random.default_rng(0)
        t, d, hidden = 64, 8, 8
        feats = jnp.asarray(rng.standard_normal((t, d)).astype(np.float32))
        labels = jnp.asarray((rng.random(t) < 0.1).astype(np.float32))
        params = temporal_scorer_init(jax.random.PRNGKey(0), d, hidden)
        opt = init_spotting_opt(params)

        p1, _, l1 = make_spotting_train_step(hidden)(params, opt, feats, labels)
        p2, _, l2 = make_spotting_train_step(hidden, remat=True)(params, opt, feats, labels)
        assert np.isclose(float(l1), float(l2), atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestSpottingCheckpoint:
    def test_roundtrip(self, tmp_path):
        from cvml_goalnet_tpu.train.spotting import (
            load_spotting_checkpoint,
            save_spotting_checkpoint,
        )

        params = temporal_scorer_init(jax.random.PRNGKey(3), 16, 8)
        fp = str(tmp_path / "temporal.npz")
        save_spotting_checkpoint(fp, params)
        template = temporal_scorer_init(jax.random.PRNGKey(9), 16, 8)
        restored = load_spotting_checkpoint(fp, template)
        for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestChunkedDefaultDispatch:
    """Round-2: the public score path and the headline number are now the
    same code path — long GRU timelines route to chunked+halo."""

    def test_auto_routes_long_timelines_to_chunked(self, small_cfg):
        import dataclasses

        from cvml_goalnet_tpu.models.temporal import temporal_scorer_init
        from cvml_goalnet_tpu.spotting import score_timeline_auto, score_timeline_chunked

        cfg = dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(
                small_cfg.model,
                temporal_hidden=8,
                temporal_chunk_threshold=256,
                temporal_chunk=128,
                temporal_halo=32,
            ),
        )
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.standard_normal((700, 12)).astype(np.float32))
        params = temporal_scorer_init(jax.random.PRNGKey(0), 12, hidden=8)
        auto = np.asarray(score_timeline_auto(params, feats, cfg))
        chunked = np.asarray(score_timeline_chunked(params, feats, 8, 128, 32))
        np.testing.assert_array_equal(auto, chunked)

    def test_auto_monolithic_below_threshold(self, small_cfg):
        import dataclasses

        from cvml_goalnet_tpu.models.temporal import temporal_scorer_apply, temporal_scorer_init
        from cvml_goalnet_tpu.spotting import score_timeline_auto

        cfg = dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(small_cfg.model, temporal_hidden=8),
        )
        rng = np.random.default_rng(1)
        feats = jnp.asarray(rng.standard_normal((100, 12)).astype(np.float32))
        params = temporal_scorer_init(jax.random.PRNGKey(0), 12, hidden=8)
        auto = np.asarray(score_timeline_auto(params, feats, cfg))
        mono = np.asarray(temporal_scorer_apply(params, feats, 8))
        np.testing.assert_array_equal(auto, mono)


class TestMultiClassSpotting:
    """Multi-class event spotting (goal/card/sub-style): per-class heads,
    labels, peaks, and SoccerNet-style multi-class average-mAP."""

    def test_load_event_labels_multiclass(self, tmp_path):
        import json

        from cvml_goalnet_tpu.spotting import load_event_labels

        fp = str(tmp_path / "v.events.json")
        with open(fp, "w") as f:
            json.dump([
                {"frame": 0, "label": "goal"},
                {"frame": 35, "label": "card"},
                {"frame": 60, "label": "unknown"},   # dropped
                {"frame": 90},                        # no label → dropped
                10_000,                               # beyond timeline
            ], f)
        lab = load_event_labels(fp, 4, 30, classes=["goal", "card"])
        assert lab.shape == (4, 2)
        np.testing.assert_array_equal(lab[:, 0], [1, 0, 0, 0])
        np.testing.assert_array_equal(lab[:, 1], [0, 1, 0, 0])
        # binary mode counts every event inside the timeline
        binary = load_event_labels(fp, 4, 30)
        np.testing.assert_array_equal(binary, [1, 1, 1, 1])

    @pytest.mark.parametrize("scorer", ["gru", "transformer"])
    def test_multiclass_head_learns_separable_classes(self, scorer):
        from cvml_goalnet_tpu.models.temporal import temporal_scorer_init
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_init)
        from cvml_goalnet_tpu.spotting import spot_events_multi
        from cvml_goalnet_tpu.train.spotting import (
            init_spotting_opt, make_spotting_train_step)

        rng = np.random.default_rng(0)
        t, d, c = 120, 8, 2
        labels = np.zeros((t, c), np.float32)
        labels[rng.choice(t, 6, replace=False), 0] = 1.0
        labels[rng.choice(t, 6, replace=False), 1] = 1.0
        feats = rng.standard_normal((t, d)).astype(np.float32) * 0.1
        feats[labels[:, 0] > 0.5, 0] += 3.0   # class 0 lives in dim 0
        feats[labels[:, 1] > 0.5, 1] += 3.0   # class 1 lives in dim 1

        if scorer == "gru":
            params = temporal_scorer_init(jax.random.PRNGKey(0), d, 16, n_classes=c)
            step = make_spotting_train_step(16, lr=3e-3)
        else:
            params = temporal_transformer_init(
                jax.random.PRNGKey(0), d, model_dim=16, num_layers=1,
                num_heads=1, max_len=128, n_classes=c)
            step = make_spotting_train_step(
                0, lr=3e-3, scorer="transformer", num_heads=1)
        opt = init_spotting_opt(params)
        losses = []
        for _ in range(40):
            params, opt, loss = step(params, opt, jnp.asarray(feats), jnp.asarray(labels))
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.6, losses[::10]

        # per-class peaks recover the planted events (loose containment)
        if scorer == "gru":
            from cvml_goalnet_tpu.models.temporal import temporal_scorer_apply

            scores = np.asarray(temporal_scorer_apply(params, jnp.asarray(feats), 16))
        else:
            from cvml_goalnet_tpu.models.temporal_attention import (
                temporal_transformer_apply)

            scores = np.asarray(temporal_transformer_apply(params, jnp.asarray(feats), 1))
        assert scores.shape == (t, c)
        events = spot_events_multi(scores, window=3, threshold=0.0)
        assert len(events) == c
        gt0 = set(np.nonzero(labels[:, 0])[0])
        hits = sum(1 for e in events[0] if any(abs(e - g) <= 2 for g in gt0))
        assert hits >= 3, (sorted(events[0]), sorted(gt0))

    def test_multiclass_average_map(self):
        from cvml_goalnet_tpu.ops.spotting_metrics import multiclass_average_map

        # class 0: perfect; class 1: nothing predicted
        out = multiclass_average_map(
            pred_by_class=[np.array([10, 50]), np.array([], int)],
            scores_by_class=[np.array([0.9, 0.8]), np.array([])],
            gt_by_class=[np.array([11, 49]), np.array([70])],
        )
        assert out["per_class"][0]["average_map"] == 1.0
        assert out["per_class"][1]["average_map"] == 0.0
        assert abs(out["average_map"] - 0.5) < 1e-9

    def test_multiclass_average_map_excludes_absent_classes(self):
        # SoccerNet convention: configured classes ABSENT from a match's
        # ground truth must not deflate the mean — a model perfect on the
        # present classes used to score len(present)/len(configured)
        # (round-3 review)
        from cvml_goalnet_tpu.ops.spotting_metrics import multiclass_average_map

        out = multiclass_average_map(
            pred_by_class=[np.array([10, 50]), np.array([], int), np.array([], int)],
            scores_by_class=[np.array([0.9, 0.8]), np.array([]), np.array([])],
            gt_by_class=[np.array([11, 49]), np.array([], int), np.array([], int)],
        )
        assert out["average_map"] == 1.0
        assert out["per_class"][0]["present"] is True
        assert out["per_class"][1]["present"] is False
        # all-absent ground truth degrades to 0.0, not NaN
        out2 = multiclass_average_map(
            pred_by_class=[np.array([], int)],
            scores_by_class=[np.array([])],
            gt_by_class=[np.array([], int)],
        )
        assert out2["average_map"] == 0.0

    def test_multiclass_sharded_transformer(self):
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_apply, temporal_transformer_init,
            temporal_transformer_sharded_apply)
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh

        mesh = cpu_mesh(8)
        params = temporal_transformer_init(
            jax.random.PRNGKey(0), 12, model_dim=32, num_layers=1,
            num_heads=2, max_len=128, n_classes=3)
        feats = jnp.asarray(
            np.random.default_rng(1).standard_normal((90, 12)).astype(np.float32))
        mono = np.asarray(temporal_transformer_apply(params, feats, 2))
        shard = np.asarray(temporal_transformer_sharded_apply(params, feats, mesh, 2))
        assert mono.shape == (90, 3)
        np.testing.assert_allclose(shard, mono, atol=1e-4)


class TestRotaryPositions:
    """Round-2 VERDICT weak #6: learned positions tile mod max_len, so the
    FULL scorer cannot distinguish period-max_len aliases at match scale.
    pos_encoding="rotary" is the alias-free alternative."""

    def _init(self, pos_encoding, max_len=32, n_classes=1):
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_init)

        return temporal_transformer_init(
            jax.random.PRNGKey(0), 12, model_dim=32, num_layers=1,
            num_heads=2, max_len=max_len, n_classes=n_classes,
            pos_encoding=pos_encoding)

    def test_learned_positions_alias_with_period_max_len(self):
        """Documents the failure mode: with constant features, a learned-pos
        model's outputs repeat with period max_len beyond the table."""
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_apply)

        params = self._init("learned", max_len=32)
        feats = jnp.ones((96, 12), jnp.float32)
        out = np.asarray(temporal_transformer_apply(params, feats, 2))
        np.testing.assert_allclose(out[:32], out[32:64], atol=1e-5)

    def test_rotary_distinguishes_aliased_positions(self):
        """At the logit level: rotary attention scores keep discriminating
        relative distance beyond any table period (a learned table of
        max_len=32 makes keys at j and j+32 positionally IDENTICAL), while
        staying purely relative (logits depend on i−j only)."""
        from cvml_goalnet_tpu.models.temporal_attention import rope_rotate

        params = self._init("rotary", max_len=32)
        assert "pos" not in params
        ones = jnp.ones((1, 96, 16), jnp.float32)
        pos = jnp.arange(96)
        k = np.asarray(rope_rotate(ones, pos))[0]          # (96, 16)
        q0 = np.asarray(rope_rotate(ones[:, :1], jnp.array([0])))[0, 0]
        logits = k @ q0                                     # logit(0, j)
        # no aliasing: distance 31 and distance 63 score differently
        assert not np.isclose(logits[31], logits[63], atol=1e-4)
        # relative: logit(i, j) == logit(0, j - i)
        q10 = np.asarray(rope_rotate(ones[:, :1], jnp.array([10])))[0, 0]
        logits10 = k @ q10                                  # logit(10, j)
        np.testing.assert_allclose(logits10[10:], logits[:-10], atol=1e-4)

    def test_rotary_is_shift_relative(self):
        """RoPE logits depend on i−j only: scoring a timeline under a global
        position OFFSET (via the sharded path's global indexing) equals the
        same features scored with banded attention anywhere in the timeline.
        Checked via interior-window agreement of a banded scorer on a
        repeated pattern."""
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_apply)

        params = self._init("rotary")
        block = np.random.default_rng(3).standard_normal((40, 12)).astype(np.float32)
        feats = jnp.asarray(np.concatenate([block, block]))   # (80, 12)
        out = np.asarray(temporal_transformer_apply(params, feats, 2, window=8))
        # away from band edges, the two copies see identical relative
        # neighborhoods → identical banded scores
        np.testing.assert_allclose(out[8:32], out[48:72], atol=1e-4)

    def test_rotary_sharded_matches_monolithic(self):
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_apply, temporal_transformer_sharded_apply)
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh

        mesh = cpu_mesh(8)
        params = self._init("rotary", n_classes=3)
        feats = jnp.asarray(
            np.random.default_rng(1).standard_normal((90, 12)).astype(np.float32))
        mono = np.asarray(temporal_transformer_apply(params, feats, 2))
        shard = np.asarray(temporal_transformer_sharded_apply(params, feats, mesh, 2))
        assert mono.shape == (90, 3)
        np.testing.assert_allclose(shard, mono, atol=1e-4)

    def test_rotary_sharded_banded_matches_monolithic(self):
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_apply, temporal_transformer_sharded_apply)
        from cvml_goalnet_tpu.parallel.mesh import cpu_mesh

        mesh = cpu_mesh(8)
        params = self._init("rotary")
        feats = jnp.asarray(
            np.random.default_rng(2).standard_normal((96, 12)).astype(np.float32))
        mono = np.asarray(temporal_transformer_apply(params, feats, 2, window=6))
        shard = np.asarray(
            temporal_transformer_sharded_apply(params, feats, mesh, 2, window=6))
        np.testing.assert_allclose(shard, mono, atol=1e-4)

    def test_rotary_trains(self):
        from cvml_goalnet_tpu.train.spotting import (
            init_spotting_opt, make_spotting_train_step)

        params = self._init("rotary")
        step = make_spotting_train_step(
            0, lr=5e-3, scorer="transformer", num_heads=2)
        opt = init_spotting_opt(params)
        rng = np.random.default_rng(0)
        feats = rng.standard_normal((64, 12)).astype(np.float32)
        labels = np.zeros(64, np.float32)
        labels[[10, 40]] = 1.0
        feats[10] += 3.0
        feats[40] += 3.0
        first = last = None
        for i in range(40):
            params, opt, loss = step(params, opt, jnp.asarray(feats), jnp.asarray(labels))
            first = float(loss) if i == 0 else first
            last = float(loss)
        assert last < first


def test_encode_timeline_quantized_close(small_cfg):
    import dataclasses

    from cvml_goalnet_tpu.spotting import encode_timeline

    cfg = small_cfg
    qcfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, quantized_inference=True))
    params, state = avm_init(jax.random.PRNGKey(0), cfg.model, cfg.preprocess, cfg.audio)
    rng = np.random.default_rng(0)
    vis = jnp.asarray(rng.random((12, *cfg.preprocess.frame_size, 3)).astype(np.float32))
    aud = jnp.asarray(rng.random((12, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32))
    f32 = np.asarray(encode_timeline(params, state, vis, aud, cfg))
    q = np.asarray(encode_timeline(params, state, vis, aud, qcfg))
    assert f32.shape == q.shape
    scale = np.abs(f32).max()
    assert np.abs(f32 - q).max() / max(scale, 1e-6) < 0.05
    assert not np.array_equal(f32, q)


def test_chunked_scorer_multiclass():
    from cvml_goalnet_tpu.models.temporal import (
        temporal_scorer_apply, temporal_scorer_init)
    from cvml_goalnet_tpu.spotting import score_timeline_chunked

    params = temporal_scorer_init(jax.random.PRNGKey(0), 8, 8, n_classes=3)
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((200, 8)).astype(np.float32))
    mono = np.asarray(temporal_scorer_apply(params, feats, 8))
    chunked = np.asarray(score_timeline_chunked(params, feats, 8, chunk=64, overlap=32))
    assert chunked.shape == mono.shape == (200, 3)
    # first/last chunks agree exactly at the timeline boundaries
    np.testing.assert_allclose(chunked[:32], mono[:32], atol=1e-5)
    np.testing.assert_allclose(chunked[-32:], mono[-32:], atol=1e-5)
    # interior borders agree up to halo decay (documented tolerance)
    np.testing.assert_allclose(chunked, mono, atol=2e-2)


def test_summarize_match_rejects_multiclass_head(small_cfg):
    from cvml_goalnet_tpu.models.temporal import temporal_scorer_init
    from cvml_goalnet_tpu.spotting import summarize_match
    from cvml_goalnet_tpu.data.synthetic import synthetic_change_points

    cfg = small_cfg
    params, state = avm_init(jax.random.PRNGKey(0), cfg.model, cfg.preprocess, cfg.audio)
    tparams = temporal_scorer_init(
        jax.random.PRNGKey(1),
        cfg.model.vis_feature_dim + cfg.model.aud_feature_dim,
        cfg.model.temporal_hidden, n_classes=2)
    rng = np.random.default_rng(0)
    vis = jnp.asarray(rng.random((8, *cfg.preprocess.frame_size, 3)).astype(np.float32))
    aud = jnp.asarray(rng.random((8, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32))
    cps = synthetic_change_points(8 * cfg.preprocess.skip_frames, 4)
    with pytest.raises(ValueError, match="multi-class"):
        summarize_match(params, state, tparams, vis, aud, cps, cfg)


class TestSingleClassClassesMode:
    """Regression: --classes with exactly ONE class must behave like C=1,
    not broadcast (T,1)x(T,) losses or crash axis-1 indexing."""

    def test_train_step_single_class_labels_match_binary(self):
        from cvml_goalnet_tpu.models.temporal import temporal_scorer_init
        from cvml_goalnet_tpu.train.spotting import (
            init_spotting_opt, make_spotting_train_step)

        rng = np.random.default_rng(0)
        t, d = 64, 8
        labels = (rng.random(t) < 0.1).astype(np.float32)
        feats = jnp.asarray(rng.standard_normal((t, d)).astype(np.float32))
        params = temporal_scorer_init(jax.random.PRNGKey(0), d, 8, n_classes=1)
        opt = init_spotting_opt(params)
        step = make_spotting_train_step(8, lr=1e-3)
        _, _, loss_flat = step(params, opt, feats, jnp.asarray(labels))
        _, _, loss_col = step(params, opt, feats, jnp.asarray(labels[:, None]))
        np.testing.assert_allclose(float(loss_flat), float(loss_col), rtol=1e-6)

    def test_spot_events_multi_accepts_1d(self):
        from cvml_goalnet_tpu.spotting import spot_events_multi

        scores = np.zeros(50, np.float32)
        scores[[10, 30]] = 5.0
        events = spot_events_multi(scores, window=3, threshold=1.0)
        assert len(events) == 1
        np.testing.assert_array_equal(events[0], [10, 30])

    def test_unlabeled_sidecar_warns_in_class_mode(self, tmp_path):
        import json
        import warnings

        from cvml_goalnet_tpu.spotting import load_event_labels

        fp = str(tmp_path / "v.events.json")
        with open(fp, "w") as f:
            json.dump([0, 60, 150], f)   # plain ints: no labels
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            lab = load_event_labels(fp, 8, 30, classes=["goal"])
        assert lab.sum() == 0
        assert any("NONE matched" in str(w.message) for w in caught)


def test_cp_training_multiclass_head():
    """spot-train --cp --classes combination: context-parallel training with
    a (T, C) head must learn (sharded loss reshapes logits to labels)."""
    from cvml_goalnet_tpu.models.temporal_attention import temporal_transformer_init
    from cvml_goalnet_tpu.parallel.mesh import cpu_mesh
    from cvml_goalnet_tpu.train.spotting import (
        init_spotting_opt, make_sharded_spotting_train_step)

    mesh = cpu_mesh(8)
    rng = np.random.default_rng(0)
    t, dim, c = 128, 8, 2
    labels = np.zeros((t, c), np.float32)
    labels[rng.choice(t, 8, replace=False), 0] = 1.0
    labels[rng.choice(t, 8, replace=False), 1] = 1.0
    feats = rng.standard_normal((t, dim)).astype(np.float32) * 0.1
    feats[labels[:, 0] > 0.5, 0] += 3.0
    feats[labels[:, 1] > 0.5, 1] += 3.0
    params = temporal_transformer_init(
        jax.random.PRNGKey(0), dim, model_dim=16, num_layers=1,
        num_heads=1, max_len=128, n_classes=c)
    opt = init_spotting_opt(params)
    step = make_sharded_spotting_train_step(mesh, num_heads=1, lr=3e-3, window=8)
    losses = []
    for _ in range(25):
        params, opt, loss = step(params, opt, jnp.asarray(feats), jnp.asarray(labels))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses[::8]


class TestSpottingCheckpointStructure:
    """Round-3 review finding: a pos_encoding mismatch between spot-train
    and spot must raise, not silently drop the learned pos table."""

    def _roundtrip(self, save_mode, load_mode, tmp_path):
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_init)
        from cvml_goalnet_tpu.train.spotting import (
            load_spotting_checkpoint, save_spotting_checkpoint)

        saved = temporal_transformer_init(
            jax.random.PRNGKey(0), 12, model_dim=32, num_layers=1,
            num_heads=2, max_len=32, pos_encoding=save_mode)
        fp = str(tmp_path / "head.npz")
        save_spotting_checkpoint(fp, saved)
        template = temporal_transformer_init(
            jax.random.PRNGKey(1), 12, model_dim=32, num_layers=1,
            num_heads=2, max_len=32, pos_encoding=load_mode)
        return load_spotting_checkpoint(fp, template)

    def test_matching_modes_roundtrip(self, tmp_path):
        out = self._roundtrip("learned", "learned", tmp_path)
        assert "pos" in out
        out = self._roundtrip("rotary", "rotary", tmp_path / "r")
        assert "pos" not in out

    def test_learned_file_rotary_template_raises(self, tmp_path):
        with pytest.raises(ValueError, match="temporal_pos_encoding"):
            self._roundtrip("learned", "rotary", tmp_path)

    def test_rotary_file_learned_template_raises(self, tmp_path):
        with pytest.raises(ValueError, match="temporal_pos_encoding"):
            self._roundtrip("rotary", "learned", tmp_path)


class TestSpottingCheckpointClasses:
    """Multi-class head channels are POSITIONAL: loading a goal,card head
    as card,goal would silently swap every score.  The checkpoint embeds
    the training-time class names and loaders verify them."""

    def _head(self, n_classes):
        from cvml_goalnet_tpu.models.temporal import temporal_scorer_init

        return temporal_scorer_init(jax.random.PRNGKey(0), 12, 8, n_classes=n_classes)

    def test_matching_classes_roundtrip(self, tmp_path):
        from cvml_goalnet_tpu.train.spotting import (
            load_spotting_checkpoint, save_spotting_checkpoint)

        fp = str(tmp_path / "head.npz")
        save_spotting_checkpoint(fp, self._head(2), classes=["goal", "card"])
        out = load_spotting_checkpoint(fp, self._head(2), classes=["goal", "card"])
        assert out["head"]["w"].shape[-1] == 2

    def test_swapped_order_raises(self, tmp_path):
        from cvml_goalnet_tpu.train.spotting import (
            load_spotting_checkpoint, save_spotting_checkpoint)

        fp = str(tmp_path / "head.npz")
        save_spotting_checkpoint(fp, self._head(2), classes=["goal", "card"])
        with pytest.raises(ValueError, match="positional"):
            load_spotting_checkpoint(fp, self._head(2), classes=["card", "goal"])

    def test_missing_classes_arg_raises(self, tmp_path):
        from cvml_goalnet_tpu.train.spotting import (
            load_spotting_checkpoint, save_spotting_checkpoint)

        fp = str(tmp_path / "head.npz")
        save_spotting_checkpoint(fp, self._head(2), classes=["goal", "card"])
        with pytest.raises(ValueError, match="no --classes"):
            load_spotting_checkpoint(fp, self._head(2))

    def test_legacy_checkpoint_without_metadata_loads(self, tmp_path):
        # pre-round-3 heads carry no names; they load as before
        from cvml_goalnet_tpu.train.spotting import (
            load_spotting_checkpoint, save_spotting_checkpoint)

        fp = str(tmp_path / "head.npz")
        save_spotting_checkpoint(fp, self._head(2))  # no classes recorded
        out = load_spotting_checkpoint(fp, self._head(2), classes=["goal", "card"])
        assert out["head"]["w"].shape[-1] == 2


class TestSpotStream:
    """Online spotting (spot_stream): bounded-latency streamed scores must
    match the offline scan up to GRU halo decay, and the streamed EVENTS
    must equal detect_peaks on the streamed scores exactly."""

    def _setup(self, small_cfg, n_classes=1, t=60, seed=0):
        import dataclasses

        from cvml_goalnet_tpu.models.temporal import temporal_scorer_init
        from cvml_goalnet_tpu.train.state import create_train_state

        cfg = dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(small_cfg.model, audio_included=False),
        )
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        tparams = temporal_scorer_init(
            jax.random.PRNGKey(2), cfg.model.vis_feature_dim,
            cfg.model.temporal_hidden, n_classes=n_classes)
        h, w = cfg.preprocess.frame_size
        frames = np.random.default_rng(seed).integers(
            0, 255, (t, h, w, 3), dtype=np.uint8).astype(np.float32) / 255.0
        return cfg, state, tparams, frames

    def _stream(self, frames, chunk):
        for i in range(0, len(frames), chunk):
            yield frames[i:i + chunk]

    def test_streamed_scores_and_events_match_offline(self, small_cfg):
        from cvml_goalnet_tpu.models.temporal import detect_peaks
        from cvml_goalnet_tpu.spotting import (
            encode_timeline,
            score_timeline,
            spot_stream,
        )

        cfg, state, tparams, frames = self._setup(small_cfg, t=60)
        updates = list(spot_stream(
            state.params, state.model_state, tparams,
            self._stream(frames, 16), cfg, halo=8, peak_window=3))
        streamed = np.concatenate([u.scores for u in updates])
        assert streamed.shape == (60,)

        feats = encode_timeline(
            state.params, state.model_state, jnp.asarray(frames), None, cfg)
        offline = np.asarray(score_timeline(
            tparams, feats, cfg.model.temporal_hidden))
        # GRU state decay across the halo bounds the streamed-vs-monolithic
        # difference (same contract as score_timeline_chunked)
        np.testing.assert_allclose(streamed, offline, atol=2e-2)

        # events are EXACT vs detect_peaks on the streamed scores, and final
        ev_stream = np.concatenate([np.asarray(u.events) for u in updates])
        ev_offline = np.nonzero(
            np.asarray(detect_peaks(jnp.asarray(streamed), 3, 0.0)))[0]
        np.testing.assert_array_equal(np.sort(ev_stream), ev_offline)
        assert len(np.unique(ev_stream)) == len(ev_stream)

    def test_single_chunk_is_exact(self, small_cfg):
        from cvml_goalnet_tpu.spotting import (
            encode_timeline,
            score_timeline,
            spot_stream,
        )

        cfg, state, tparams, frames = self._setup(small_cfg, t=20)
        updates = list(spot_stream(
            state.params, state.model_state, tparams,
            self._stream(frames, 64), cfg, halo=8))
        assert len(updates) == 1
        feats = encode_timeline(
            state.params, state.model_state, jnp.asarray(frames), None, cfg)
        offline = np.asarray(score_timeline(
            tparams, feats, cfg.model.temporal_hidden))
        np.testing.assert_allclose(updates[0].scores, offline, atol=1e-5)

    def test_multiclass_stream(self, small_cfg):
        from cvml_goalnet_tpu.spotting import spot_stream

        cfg, state, tparams, frames = self._setup(small_cfg, n_classes=3, t=40)
        updates = list(spot_stream(
            state.params, state.model_state, tparams,
            self._stream(frames, 16), cfg, halo=8, peak_window=2))
        streamed = np.concatenate([u.scores for u in updates])
        assert streamed.shape == (40, 3)
        for u in updates:
            assert set(u.events) == {0, 1, 2}

    def test_full_attention_transformer_rejected(self, small_cfg):
        # window == 0 → unbounded receptive field → no finite halo can make
        # streamed scores final; the banded scorer is the streamable one
        import dataclasses

        import pytest

        from cvml_goalnet_tpu.spotting import spot_stream

        cfg, state, tparams, frames = self._setup(small_cfg, t=20)
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, temporal_model="transformer"))
        with pytest.raises(ValueError, match="banded"):
            list(spot_stream(state.params, state.model_state, tparams,
                             self._stream(frames, 16), cfg))

    def _setup_hybrid(self, small_cfg, t=60, seed=0, W=4):
        import dataclasses

        from cvml_goalnet_tpu.spotting import temporal_head_init_auto
        from cvml_goalnet_tpu.train.state import create_train_state

        cfg = dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(
                small_cfg.model, audio_included=False,
                temporal_model="hybrid", temporal_window=W,
                temporal_pos_encoding="rotary"),
        )
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        tparams = temporal_head_init_auto(
            jax.random.PRNGKey(2), cfg.model.vis_feature_dim, cfg.model)
        h, w = cfg.preprocess.frame_size
        frames = np.random.default_rng(seed).integers(
            0, 255, (t, h, w, 3), dtype=np.uint8).astype(np.float32) / 255.0
        return cfg, state, tparams, frames

    def test_hybrid_stream_matches_offline_to_halo_decay(self, small_cfg):
        """Streamed hybrid scores track the offline monolithic hybrid to the
        GRU's halo-decay bound (the scan resets at window edges; the banded
        attention part stays within its derived receptive-field halo), and
        streamed events equal detect_peaks on the streamed scores."""
        from cvml_goalnet_tpu.models.temporal import detect_peaks
        from cvml_goalnet_tpu.spotting import (
            encode_timeline, score_timeline_auto, spot_stream)

        cfg, state, tparams, frames = self._setup_hybrid(small_cfg, t=60)
        updates = list(spot_stream(
            state.params, state.model_state, tparams,
            self._stream(frames, 16), cfg, halo=16, peak_window=3))
        streamed = np.concatenate([u.scores for u in updates])
        assert streamed.shape == (60,)
        feats = encode_timeline(
            state.params, state.model_state, jnp.asarray(frames), None, cfg)
        offline = np.asarray(score_timeline_auto(tparams, feats, cfg))
        np.testing.assert_allclose(streamed, offline, atol=2e-2)

        ev_stream = np.concatenate([np.asarray(u.events) for u in updates])
        ev_offline = np.nonzero(
            np.asarray(detect_peaks(jnp.asarray(streamed), 3, 0.0)))[0]
        np.testing.assert_array_equal(np.sort(ev_stream), ev_offline)

    def test_hybrid_production_chunk_halo_decay_bound(self, small_cfg):
        """Pin the HYBRID streamed-vs-offline decay bound at the production
        default chunk/halo (256/64), like the GRU's
        ``test_default_chunk_halo_decay_bound`` — round 4 pinned the hybrid
        only at toy scale (t=60, W=4), but the hybrid is the documented
        distractor-rejection pick (``configs/tpu_spotting_quality.json``), so its
        production-shape streaming error is load-bearing.  W=16 with 2
        layers keeps the banded receptive field (32) under the halo (64),
        mirroring the production halo ≥ L·W exactness floor."""
        from cvml_goalnet_tpu.spotting import (
            encode_timeline, score_timeline_auto, spot_stream)

        cfg, state, tparams, frames = self._setup_hybrid(small_cfg, t=640, W=16)
        updates = list(spot_stream(
            state.params, state.model_state, tparams,
            self._stream(frames, 256), cfg, halo=64))
        streamed = np.concatenate([u.scores for u in updates])
        assert streamed.shape == (640,)
        feats = encode_timeline(
            state.params, state.model_state, jnp.asarray(frames), None, cfg)
        offline = np.asarray(score_timeline_auto(tparams, feats, cfg))
        np.testing.assert_allclose(streamed, offline, atol=2e-2)

    def test_hybrid_single_chunk_is_exact(self, small_cfg):
        from cvml_goalnet_tpu.spotting import (
            encode_timeline, score_timeline_auto, spot_stream)

        cfg, state, tparams, frames = self._setup_hybrid(small_cfg, t=20)
        updates = list(spot_stream(
            state.params, state.model_state, tparams,
            self._stream(frames, 64), cfg, halo=8))
        assert len(updates) == 1
        feats = encode_timeline(
            state.params, state.model_state, jnp.asarray(frames), None, cfg)
        offline = np.asarray(score_timeline_auto(tparams, feats, cfg))
        np.testing.assert_allclose(updates[0].scores, offline, atol=1e-5)

    def test_hybrid_full_attention_rejected(self, small_cfg):
        import dataclasses

        import pytest

        from cvml_goalnet_tpu.spotting import spot_stream

        cfg, state, tparams, frames = self._setup_hybrid(small_cfg, t=20)
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, temporal_window=0))
        with pytest.raises(ValueError, match="banded"):
            list(spot_stream(state.params, state.model_state, tparams,
                             self._stream(frames, 16), cfg))

    def _setup_transformer(self, small_cfg, n_classes=1, t=60, seed=0, W=4,
                           pos_encoding="learned", max_len=8192):
        import dataclasses

        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_init,
        )
        from cvml_goalnet_tpu.train.state import create_train_state

        cfg = dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(
                small_cfg.model, audio_included=False,
                temporal_model="transformer", temporal_window=W,
                temporal_pos_encoding=pos_encoding, temporal_max_len=max_len),
        )
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        tparams = temporal_transformer_init(
            jax.random.PRNGKey(2), cfg.model.vis_feature_dim,
            model_dim=cfg.model.temporal_hidden,
            num_layers=cfg.model.temporal_num_layers,
            num_heads=cfg.model.temporal_num_heads,
            max_len=max_len, n_classes=n_classes, pos_encoding=pos_encoding)
        h, w = cfg.preprocess.frame_size
        frames = np.random.default_rng(seed).integers(
            0, 255, (t, h, w, 3), dtype=np.uint8).astype(np.float32) / 255.0
        return cfg, state, tparams, frames

    def _offline_banded(self, cfg, state, tparams, frames):
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_apply,
        )
        from cvml_goalnet_tpu.spotting import encode_timeline

        feats = encode_timeline(
            state.params, state.model_state, jnp.asarray(frames), None, cfg)
        return np.asarray(temporal_transformer_apply(
            tparams, feats, cfg.model.temporal_num_heads, False, False,
            cfg.model.temporal_window))

    @pytest.mark.parametrize("pos_encoding", ["learned", "rotary"])
    @pytest.mark.parametrize("chunk", [16, 6])
    def test_banded_transformer_stream_is_exact(self, small_cfg, pos_encoding,
                                                chunk):
        """Streamed banded-transformer scores EQUAL the offline monolithic
        banded scorer — the band's finite receptive field (layers·window)
        makes streaming exact, not decay-bounded like the GRU.  chunk=6 <
        the derived halo (2·4=8) exercises chunk accumulation; halo=0 proves
        the exactness floor is derived, not caller-supplied."""
        from cvml_goalnet_tpu.models.temporal import detect_peaks
        from cvml_goalnet_tpu.spotting import spot_stream

        cfg, state, tparams, frames = self._setup_transformer(
            small_cfg, t=60, pos_encoding=pos_encoding)
        updates = list(spot_stream(
            state.params, state.model_state, tparams,
            self._stream(frames, chunk), cfg, halo=0, peak_window=3))
        streamed = np.concatenate([u.scores for u in updates])
        assert streamed.shape == (60,)
        offline = self._offline_banded(cfg, state, tparams, frames)
        np.testing.assert_allclose(streamed, offline, atol=1e-5)

        ev_stream = np.concatenate([np.asarray(u.events) for u in updates])
        ev_offline = np.nonzero(
            np.asarray(detect_peaks(jnp.asarray(streamed), 3, 0.0)))[0]
        np.testing.assert_array_equal(np.sort(ev_stream), ev_offline)
        assert len(np.unique(ev_stream)) == len(ev_stream)

    def test_banded_transformer_stream_positions_stay_global(self, small_cfg):
        # max_len < T forces the learned-position mod path: streamed windows
        # must index the table by GLOBAL frame position (pos_offset), not by
        # their window-local row — without it every window would restart the
        # position table at 0 and this parity fails
        from cvml_goalnet_tpu.spotting import spot_stream

        cfg, state, tparams, frames = self._setup_transformer(
            small_cfg, t=50, max_len=16)
        updates = list(spot_stream(
            state.params, state.model_state, tparams,
            self._stream(frames, 16), cfg))
        streamed = np.concatenate([u.scores for u in updates])
        offline = self._offline_banded(cfg, state, tparams, frames)
        np.testing.assert_allclose(streamed, offline, atol=1e-5)

    def test_banded_transformer_multiclass_stream(self, small_cfg):
        from cvml_goalnet_tpu.spotting import spot_stream

        cfg, state, tparams, frames = self._setup_transformer(
            small_cfg, n_classes=3, t=40)
        updates = list(spot_stream(
            state.params, state.model_state, tparams,
            self._stream(frames, 16), cfg, peak_window=2))
        streamed = np.concatenate([u.scores for u in updates])
        assert streamed.shape == (40, 3)
        for u in updates:
            assert set(u.events) == {0, 1, 2}

    def test_missing_or_misaligned_modalities_fail_loudly(self, small_cfg):
        import dataclasses

        import pytest

        from cvml_goalnet_tpu.spotting import spot_stream

        cfg, state, tparams, frames = self._setup(small_cfg, t=32)
        audio_cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, audio_included=True))
        with pytest.raises(ValueError, match="audio_chunks"):
            list(spot_stream(state.params, state.model_state, tparams,
                             self._stream(frames, 16), audio_cfg))
        text_cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, text_included=True))
        with pytest.raises(ValueError, match="text_chunks"):
            list(spot_stream(state.params, state.model_state, tparams,
                             self._stream(frames, 16), text_cfg))
        # misaligned / exhausted modality streams need a trunk that HAS the
        # audio branch (otherwise the trunk itself fails first)
        from cvml_goalnet_tpu.train.state import create_train_state

        astate = create_train_state(jax.random.PRNGKey(0), audio_cfg)
        B, C = audio_cfg.audio.bin_length, audio_cfg.audio.n_mfcc
        bad_audio = iter([np.zeros((7, B, C), np.float32)] * 4)
        with pytest.raises(ValueError, match="same boundaries"):
            list(spot_stream(astate.params, astate.model_state, tparams,
                             self._stream(frames, 16), audio_cfg,
                             audio_chunks=bad_audio))
        short_audio = iter([np.zeros((16, B, C), np.float32)] * 1)
        with pytest.raises(ValueError, match="exhausted"):
            list(spot_stream(astate.params, astate.model_state, tparams,
                             self._stream(frames, 16), audio_cfg,
                             audio_chunks=short_audio))

    def test_emission_contract_update_counts(self, small_cfg):
        """The documented emission contract: first chunk defers, then at
        most one update per chunk (emitted when >halo frames are buffered),
        plus one final flush — spotting.py::spot_stream docstring."""
        from cvml_goalnet_tpu.spotting import spot_stream

        cfg, state, tparams, frames = self._setup(small_cfg, t=60)
        # chunk>halo: chunks 16,16,16,12 → defer, 3 eager updates, 1 flush
        updates = list(spot_stream(
            state.params, state.model_state, tparams,
            self._stream(frames, 16), cfg, halo=8, peak_window=3))
        assert [len(u.scores) for u in updates] == [24, 16, 12, 8]
        # chunk<halo: chunks of 6 accumulate until >halo frames are buffered
        updates = list(spot_stream(
            state.params, state.model_state, tparams,
            self._stream(frames[:30], 6), cfg, halo=8, peak_window=3))
        assert [len(u.scores) for u in updates] == [4, 6, 6, 6, 8]

    def test_halo_zero_stream_reports_trailing_events(self, small_cfg):
        """halo=0 (reachable via `spot --stream --stream-halo 0`): memory
        stays bounded (no left-context growth via the `[-0:]` pitfall) and
        events inside the trailing peak_window are still delivered by an
        empty final update (round-3 ADVICE.md finding)."""
        from cvml_goalnet_tpu.models.temporal import detect_peaks
        from cvml_goalnet_tpu.spotting import spot_stream

        cfg, state, tparams, frames = self._setup(small_cfg, t=40)
        updates = list(spot_stream(
            state.params, state.model_state, tparams,
            self._stream(frames, 10), cfg, halo=0, peak_window=3))
        streamed = np.concatenate([u.scores for u in updates])
        assert streamed.shape == (40,)
        # buffer drains fully every chunk → the final update is the empty
        # event-stabilization drain
        assert len(updates[-1].scores) == 0
        ev_stream = np.concatenate([np.asarray(u.events) for u in updates])
        ev_offline = np.nonzero(
            np.asarray(detect_peaks(jnp.asarray(streamed), 3, 0.0)))[0]
        np.testing.assert_array_equal(np.sort(ev_stream), ev_offline)

    def test_default_chunk_halo_decay_bound(self, small_cfg):
        """Pin the GRU streamed-vs-offline decay bound at the production
        default chunk/halo (256/64) — the round-3 eager-emission change
        shrank effective left context, so the bound is load-bearing."""
        from cvml_goalnet_tpu.spotting import (
            encode_timeline, score_timeline, spot_stream)

        cfg, state, tparams, frames = self._setup(small_cfg, t=640)
        updates = list(spot_stream(
            state.params, state.model_state, tparams,
            self._stream(frames, 256), cfg, halo=64))
        streamed = np.concatenate([u.scores for u in updates])
        assert streamed.shape == (640,)
        feats = encode_timeline(
            state.params, state.model_state, jnp.asarray(frames), None, cfg)
        offline = np.asarray(score_timeline(
            tparams, feats, cfg.model.temporal_hidden))
        np.testing.assert_allclose(streamed, offline, atol=2e-2)
