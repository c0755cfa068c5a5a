"""LIVE A/B against the actual reference implementation (VERDICT r2 item 1).

These tests execute ``/root/reference/main.py``'s real code paths — not
transcriptions — on a synthetic corpus written in the reference's on-disk
layout, next to the rebuild in bug-compat mode
(``broadcast_loss_compat=True`` + ``eval_train_mode_compat=True`` +
``dropout_rate=0``), starting from byte-identical initial weights
(``compat.torch_import``).  Compared per epoch: losses, F-scores, and (item
7) the end-to-end summary mask from the reference's own rolling checkpoint.

Divergence budget: both stacks run f32 on CPU (torch vs XLA); single-forward
quantities agree to ~1e-6 and the gap compounds through Adam steps — the
per-epoch loss tolerance grows with epoch index.  F-scores and knapsack masks
are integer-valued downstream of a round() and must match EXACTLY.
"""

import dataclasses as dc
import os

import numpy as np
import pytest

from cvml_goalnet_tpu.compat.reference_runner import (
    REFERENCE_VIDEO_IDS,
    build_reference_corpus,
    reference_available,
    reference_eval_and_postprocess,
    reference_session,
    run_reference_training,
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(), reason="reference repo not present"),
]

EPOCHS = 4


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("ref_ab")
    return build_reference_corpus(str(root))


@pytest.fixture(scope="module", params=[False, True], ids=["noaudio", "audio"])
def audio_included(request):
    """Every trajectory/checkpoint/export lock runs for BOTH reference
    variants (round-3 VERDICT item 2: the audio path had never been A/B'd
    against the living reference).  The librosa frontend is environment-
    blocked, so both sides consume the same deterministic
    ``synthetic_audio_features`` — AudBl, the 640-dim concat fusion, and the
    audio checkpoint pair all execute for real."""
    return request.param


def _make_cfg(audio_included: bool):
    from cvml_goalnet_tpu.config import PipelineConfig

    base = PipelineConfig()
    return dc.replace(
        base,
        model=dc.replace(
            base.model, audio_included=audio_included, dropout_rate=0.0),
        train=dc.replace(
            base.train,
            broadcast_loss_compat=True,
            eval_train_mode_compat=True,
            num_epochs=EPOCHS,
        ),
    )


@pytest.fixture(scope="module")
def ab_cfg(audio_included):
    return _make_cfg(audio_included)


@pytest.fixture(scope="module")
def noaudio_cfg():
    """For the locks that are no-audio by the REFERENCE's own construction
    (baseline.py:14 hard-codes audio_included=False; the short-subbatch BN
    case is orthogonal to modalities)."""
    return _make_cfg(False)


def _build_datasets(corpus, cfg, audio_included: bool):
    from cvml_goalnet_tpu.compat.reference_runner import synthetic_audio_features
    from cvml_goalnet_tpu.data.dataset import VideoDataset, build_datasets

    # the wavs are empty sidecars (they exist only to skip the reference's
    # moviepy demux), so our own MFCC frontend never runs here: both sides
    # ingest the SAME synthetic features — ours transposed to the NWC layout
    train, val = build_datasets(
        corpus["video_fps"], cfg,
        annotation_fp=corpus["annotation_fp"],
        mat_file_path=corpus["mat_file_path"],
        h5_file_path=corpus["h5_file_path"],
        info_fp=corpus["info_fp"],
        audio_included=False,
    )
    if not audio_included:
        return train, val

    def inject(ds):
        return VideoDataset([
            dc.replace(i, audio=np.transpose(
                synthetic_audio_features(i.video_id, len(i.visual)), (0, 2, 1)))
            for i in ds
        ])

    return inject(train), inject(val)


@pytest.fixture(scope="module")
def our_datasets(corpus, ab_cfg, audio_included):
    return _build_datasets(corpus, ab_cfg, audio_included)


@pytest.fixture(scope="module")
def noaudio_datasets(corpus, noaudio_cfg):
    return _build_datasets(corpus, noaudio_cfg, False)


@pytest.fixture(scope="module")
def reference_run(corpus, audio_included):
    return run_reference_training(
        corpus["root"], epochs=EPOCHS, audio_included=audio_included)


class TestDatasetParityLive:
    """Our ``build_datasets`` vs the LIVE ``get_dataloaders`` on the same
    mp4 corpus (ingest + annotations + per-annotator knapsack GT chain)."""

    @pytest.fixture(scope="class")
    def ref_datasets(self, corpus, audio_included):
        with reference_session(
            corpus["root"], synthetic_audio=audio_included
        ) as ref:
            train_ds, val_ds = ref.utils.get_dataloaders(
                video_fps=[
                    f"./ydata-tvsum50-v1_1/video/{v}.mp4" for v in corpus["video_ids"]
                ],
                skip_frames=30, train_ratio=0.8,
                annotation_fp="ydata-tvsum50-v1_1/data/ydata-tvsum50-anno.tsv",
                mat_file_path="ydata-tvsum50-v1_1/ground_truth/ydata-tvsum50.mat",
                h5_file_path="ydata-tvsum50-v1_1/ground_truth/eccv16_dataset_tvsum_google_pool5.h5",
                audio_included=audio_included,
            )
            out = []
            for ds in (train_ds, val_ds):
                for i in range(len(ds)):
                    vid, frames, audios, labels, gd = ds[i]
                    out.append({
                        "video_id": vid,
                        "frames": np.asarray(frames),          # (N, 3, 40, 40)
                        "audios": (np.asarray(audios)           # (N, 30, B)
                                   if audio_included else None),
                        "labels": np.asarray(labels),
                        "gd": np.asarray(gd),                   # (20, full_n)
                        "full_n": int(ds.full_n_frames_),
                    })
        return out

    def test_split_sizes(self, ref_datasets, our_datasets):
        train, val = our_datasets
        assert len(train) + len(val) == len(ref_datasets) == 2
        assert len(train) == 1 and len(val) == 1

    def test_per_video_tensors(self, ref_datasets, our_datasets):
        train, val = our_datasets
        ours = list(train) + list(val)
        for ref, item in zip(ref_datasets, ours):
            assert item.video_id == ref["video_id"]
            assert item.full_n_frames == ref["full_n"]
            # preprocessed frames: NHWC (ours) vs NCHW (ref); both decode the
            # same lossy mp4 with cv2 then min-max-normalize + resize to 40×40
            ours_nchw = np.transpose(item.visual, (0, 3, 1, 2))
            np.testing.assert_allclose(ours_nchw, ref["frames"], atol=1e-5)
            # trimmed mean-annotator labels: exact (round of identical means)
            np.testing.assert_array_equal(item.labels, ref["labels"])
            # audio features: the reference's dataloader tensor (N, 30, B)
            # must be OUR NWC tensor transposed, byte-exact
            if ref["audios"] is not None:
                np.testing.assert_array_equal(
                    np.transpose(item.audio, (0, 2, 1)), ref["audios"])
            else:
                assert item.audio is None
            # per-annotator knapsack ground-truth masks: exact
            np.testing.assert_array_equal(item.gd_summary_masks, ref["gd"])
            assert ref["gd"].sum() > 0, "degenerate corpus: empty GT summaries"


class TestTrainingTrajectoryLive:
    """Same init, no dropout → per-epoch losses within fp-drift tolerance,
    F-scores exact, vs the LIVE reference training loop."""

    @pytest.fixture(scope="class")
    def our_history(self, corpus, ab_cfg, our_datasets, reference_run):
        from cvml_goalnet_tpu.compat.torch_import import import_reference_state_dict
        from cvml_goalnet_tpu.train.loop import train_importance_model
        from cvml_goalnet_tpu.train.optim import adam_init
        from cvml_goalnet_tpu.train.state import TrainState

        params, model_state = import_reference_state_dict(
            reference_run["init_state_dict"], ab_cfg.model, ab_cfg.preprocess,
            ab_cfg.audio,
        )
        state = TrainState(
            params=params, model_state=model_state,
            opt_state=adam_init(params), epoch=0,
        )
        train_ds, val_ds = our_datasets
        _, hist = train_importance_model(
            ab_cfg, train_ds, val_ds, state, num_epochs=EPOCHS, verbose=False
        )
        return hist

    def test_loss_trajectories_match(self, reference_run, our_history):
        ref = reference_run["metrics"]
        assert len(our_history["train_loss"]) == len(ref["train_loss"]) == EPOCHS + 1
        for e in range(EPOCHS + 1):
            # fp drift compounds with optimizer steps, and the broadcast
            # loss's (n,n) objective makes the trajectory chaotic: epochs 0-2
            # prove NUMERICAL parity (tight abs tol), later epochs prove
            # trajectory TRACKING (relative tol — torch's own thread-level
            # reduction nondeterminism lands in the same band)
            a, b = our_history["train_loss"][e], ref["train_loss"][e]
            av, bv = our_history["val_loss"][e], ref["val_loss"][e]
            if e <= 2:
                tol = 1e-5 * (10 ** e)
                assert abs(a - b) < tol, (e, our_history["train_loss"], ref["train_loss"])
                assert abs(av - bv) < tol * 5, (e, our_history["val_loss"], ref["val_loss"])
            else:
                assert abs(a - b) / max(abs(b), 1e-6) < 0.15, (
                    e, our_history["train_loss"], ref["train_loss"])
                assert abs(av - bv) / max(abs(bv), 1e-6) < 0.15, (
                    e, our_history["val_loss"], ref["val_loss"])

    def test_fscores_match_exactly(self, reference_run, our_history):
        ref = reference_run["metrics"]
        for key in ("train_f_avg", "train_f_max", "val_f_avg", "val_f_max"):
            np.testing.assert_allclose(
                our_history[key], ref[key], atol=1e-12, err_msg=key)

    def test_fscores_nondegenerate(self, reference_run):
        # the comparison only proves something if the knapsack actually
        # selects clips on both sides, for BOTH videos
        assert max(reference_run["metrics"]["val_f_avg"]) > 0
        assert max(reference_run["metrics"]["train_f_avg"]) > 0


class TestShortSubbatchBatchnormParityLive:
    """Non-divisible condensed counts vs the LIVE reference.

    The reference trains its final sub-batch SHORT (``main.py:177-196``: 11
    condensed frames → batches of 10 and 1; 9 frames → one batch of 9) while
    our scan pads every sub-batch to a fixed shape — masked batchnorm
    statistics (round-3 second review pass, finding 1) are what make the two
    numerically equal.  ``build_reference_corpus``'s default corpus
    deliberately side-stepped this case; this one forces it.
    """

    N_EPOCHS = 2

    @pytest.fixture(scope="class")
    def short_corpus(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("ref_ab_short")
        # 330/270 raw frames → 11/9 condensed at skip 30: one short final
        # sub-batch (size 1) and one whole-video short batch (size 9)
        return build_reference_corpus(str(root), n_frames=(330, 270))

    @pytest.fixture(scope="class")
    def short_reference_run(self, short_corpus):
        return run_reference_training(short_corpus["root"], epochs=self.N_EPOCHS)

    def test_loss_trajectories_match_with_short_subbatches(
        self, short_corpus, noaudio_cfg, short_reference_run
    ):
        ab_cfg = noaudio_cfg
        from cvml_goalnet_tpu.compat.torch_import import import_reference_state_dict
        from cvml_goalnet_tpu.data.dataset import build_datasets
        from cvml_goalnet_tpu.train.loop import train_importance_model
        from cvml_goalnet_tpu.train.optim import adam_init
        from cvml_goalnet_tpu.train.state import TrainState

        cfg = dc.replace(
            ab_cfg, train=dc.replace(ab_cfg.train, num_epochs=self.N_EPOCHS)
        )
        train_ds, val_ds = build_datasets(
            short_corpus["video_fps"], cfg,
            annotation_fp=short_corpus["annotation_fp"],
            mat_file_path=short_corpus["mat_file_path"],
            h5_file_path=short_corpus["h5_file_path"],
            info_fp=short_corpus["info_fp"],
            audio_included=False,
        )
        # the corpus really does force short sub-batches
        assert any(
            len(item.visual) % cfg.train.subbatch_size != 0 for item in train_ds
        )
        params, model_state = import_reference_state_dict(
            short_reference_run["init_state_dict"], cfg.model, cfg.preprocess,
            cfg.audio,
        )
        state = TrainState(
            params=params, model_state=model_state,
            opt_state=adam_init(params), epoch=0,
        )
        _, hist = train_importance_model(
            cfg, train_ds, val_ds, state, num_epochs=self.N_EPOCHS, verbose=False
        )
        ref = short_reference_run["metrics"]
        for e in range(self.N_EPOCHS + 1):
            # epoch 0 (pre-training eval) is EXACT — the semantic proof that
            # masked-BN == the reference's short-batch BN.  Later epochs
            # carry 2× the main test's fp budget: a size-1 BN batch has
            # near-zero variance, so rsqrt amplifies the ordinary torch-vs-
            # XLA reduction-order drift (measured 1.2e-4 at epoch 1).
            tol = 2e-5 * (10 ** e) if e else 1e-6
            assert abs(hist["train_loss"][e] - ref["train_loss"][e]) < tol, (
                e, hist["train_loss"], ref["train_loss"])
            assert abs(hist["val_loss"][e] - ref["val_loss"][e]) < tol * 5, (
                e, hist["val_loss"], ref["val_loss"])
        for key in ("train_f_avg", "train_f_max", "val_f_avg", "val_f_max"):
            np.testing.assert_allclose(hist[key], ref[key], atol=1e-12, err_msg=key)


class TestStrictTrajectoryLive:
    """Round-3 VERDICT weak #4: the headline trajectory lock holds TIGHT
    tolerance only for epochs 0–2 because lr=1e-3 on the broadcast (n, n)
    objective is chaotic — fp drift is amplified, not created, by the
    dynamics.  This variant reruns the live A/B at lr=1e-4 (``lr_scale=0.1``
    patches the lr the reference passes to ``optim.Adam`` at ``main.py:70``;
    ours sets ``TrainConfig.learning_rate`` to the same value) where the
    trajectory is contractive enough that ABSOLUTE tolerance survives every
    epoch — numerical parity, not just trajectory tracking."""

    N_EPOCHS = 6

    @pytest.fixture(scope="class")
    def strict_reference_run(self, corpus):
        return run_reference_training(
            corpus["root"], epochs=self.N_EPOCHS, lr_scale=0.1)

    def test_tight_tolerance_every_epoch(
        self, corpus, noaudio_cfg, noaudio_datasets, strict_reference_run
    ):
        from cvml_goalnet_tpu.compat.torch_import import import_reference_state_dict
        from cvml_goalnet_tpu.train.loop import train_importance_model
        from cvml_goalnet_tpu.train.optim import adam_init
        from cvml_goalnet_tpu.train.state import TrainState

        cfg = dc.replace(
            noaudio_cfg,
            train=dc.replace(
                noaudio_cfg.train, learning_rate=1e-4, num_epochs=self.N_EPOCHS),
        )
        params, model_state = import_reference_state_dict(
            strict_reference_run["init_state_dict"], cfg.model, cfg.preprocess,
            cfg.audio,
        )
        state = TrainState(
            params=params, model_state=model_state,
            opt_state=adam_init(params), epoch=0,
        )
        train_ds, val_ds = noaudio_datasets
        _, hist = train_importance_model(
            cfg, train_ds, val_ds, state, num_epochs=self.N_EPOCHS, verbose=False
        )
        ref = strict_reference_run["metrics"]
        for e in range(self.N_EPOCHS + 1):
            # tight ABSOLUTE parity through all epochs: drift compounds
            # gently at lr=1e-4 (vs 10×/epoch at lr=1e-3)
            tol = 1e-5 * (2 ** e)
            assert abs(hist["train_loss"][e] - ref["train_loss"][e]) < tol, (
                e, hist["train_loss"], ref["train_loss"])
            assert abs(hist["val_loss"][e] - ref["val_loss"][e]) < tol * 5, (
                e, hist["val_loss"], ref["val_loss"])
        for key in ("train_f_avg", "train_f_max", "val_f_avg", "val_f_max"):
            np.testing.assert_allclose(hist[key], ref[key], atol=1e-12, err_msg=key)


class TestBaselineLive:
    """C4 live lock (the last reference orchestrator without one): the
    reference's OWN random-baseline script (``baseline.py:12-135``) executes
    for real via runpy; each of its 10 random models' recorded weights
    replays through the rebuild's eval path — predictions, broadcast losses,
    and F-scores must match."""

    def test_replay_matches_reference_baseline(self, corpus, noaudio_cfg, noaudio_datasets):
        ab_cfg, our_datasets = noaudio_cfg, noaudio_datasets
        from cvml_goalnet_tpu.compat.reference_runner import run_reference_baseline
        from cvml_goalnet_tpu.compat.torch_import import import_reference_state_dict
        from cvml_goalnet_tpu.train.loop import _video_fscores, eval_video
        from cvml_goalnet_tpu.train.optim import adam_init
        from cvml_goalnet_tpu.train.state import TrainState

        records = run_reference_baseline(corpus["root"])
        assert len(records) == 10  # the script's s_l (baseline.py:57)
        items = {i.video_id: i for ds in our_datasets for i in ds}
        for rec in records:
            params, mstate = import_reference_state_dict(
                rec["sd"], ab_cfg.model, ab_cfg.preprocess, ab_cfg.audio)
            state = TrainState(params, mstate, adam_init(params), 0)
            # 1 train + 1 val video per model on the 2-video corpus
            assert len(rec["preds"]) == len(rec["fscores"]) == 2
            for (vid, fa, fm), tpred in zip(rec["fscores"], rec["preds"]):
                item = items[vid]
                ours, loss = eval_video(state, item, ab_cfg)
                np.testing.assert_allclose(ours, tpred[:, 0], atol=2e-4)
                # the reference's loss is the broadcast (n, n) MSE of ITS
                # preds (baseline.py:73 hits the same main.py:191 bug shape)
                lab = np.asarray(item.labels, np.float32)
                ref_loss = float(np.mean((tpred - lab[None, :]) ** 2))
                assert abs(loss - ref_loss) < 5e-4
                # the masks are integer-valued downstream of round(); the
                # per-annotator F1 MEAN differs only by summation order (ulp)
                ofa, ofm = _video_fscores(item, ours, ab_cfg)
                np.testing.assert_allclose((ofa, ofm), (fa, fm), rtol=1e-12)


class TestCheckpointEndToEndLock:
    """VERDICT r2 item 7: the reference's own trained ``.pt`` imported via
    ``compat.torch_import`` must reproduce the reference's inference-time
    scores and knapsack summary mask end to end."""

    def test_imported_checkpoint_matches_reference_postprocess(
        self, corpus, ab_cfg, our_datasets, reference_run, audio_included
    ):
        from cvml_goalnet_tpu.compat.torch_import import import_reference_state_dict
        from cvml_goalnet_tpu.pipeline import fuse, summarize

        sd = reference_run["ckp_state_dict"]
        ref_scores, ref_mask, full_n = reference_eval_and_postprocess(
            corpus["root"], sd, video_index=0, audio_included=audio_included
        )

        params, model_state = import_reference_state_dict(
            sd, ab_cfg.model, ab_cfg.preprocess, ab_cfg.audio
        )
        item = our_datasets[0][0]
        assert item.video_id == REFERENCE_VIDEO_IDS[0]
        scores = np.asarray(fuse(
            params, model_state,
            {"visual": item.visual, "audio": item.audio, "text": None}, ab_cfg,
        ))
        np.testing.assert_allclose(scores, ref_scores, atol=1e-4)
        res = summarize(
            scores, item.clip_intervals, ab_cfg.preprocess.skip_frames,
            item.full_n_frames, ab_cfg.knapsack,
        )
        assert item.full_n_frames == full_n
        np.testing.assert_array_equal(res.frame_mask, ref_mask)
        assert ref_mask.sum() > 0, "degenerate lock: empty reference summary"


class TestExportToLiveReference:
    """Outbound migration lock: a pytree EXPORTED to the reference format
    must load into the LIVE reference's own ``AVM.load_state_dict``
    (strict — ``num_batches_tracked`` keys included) and reproduce the same
    inference scores and knapsack mask the reference computes from its own
    checkpoint."""

    def test_exported_state_dict_drives_live_reference(
        self, corpus, ab_cfg, reference_run, audio_included
    ):
        from cvml_goalnet_tpu.compat.torch_import import (
            export_reference_state_dict,
            import_reference_state_dict,
        )

        sd = reference_run["ckp_state_dict"]
        params, model_state = import_reference_state_dict(
            sd, ab_cfg.model, ab_cfg.preprocess, ab_cfg.audio
        )
        exported = export_reference_state_dict(
            params, model_state, ab_cfg.model, ab_cfg.preprocess, ab_cfg.audio
        )
        ref_scores, ref_mask, _ = reference_eval_and_postprocess(
            corpus["root"], sd, video_index=0, audio_included=audio_included
        )
        exp_scores, exp_mask, _ = reference_eval_and_postprocess(
            corpus["root"], exported, video_index=0,
            audio_included=audio_included
        )
        # the live reference, fed our export, equals the live reference fed
        # its own checkpoint — weights round-tripped bit-exactly
        np.testing.assert_array_equal(exp_scores, ref_scores)
        np.testing.assert_array_equal(exp_mask, ref_mask)
