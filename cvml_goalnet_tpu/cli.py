"""CLI: train / train-no-audio / infer / infer-no-audio / baseline (+resume).

Capability parity with the reference entry (``main.py:351-373``), upgraded
from raw ``sys.argv`` inspection to argparse with a real config layer:

* ``goalnet train [--no-audio] [--checkpoint] [--config cfg.json] ...``
* ``goalnet infer VIDEO [--no-audio]`` — the reference hard-coded the
  inference path (``main.py:363``) and its audio infer path was broken
  (``main.py:321``); both fixed here.
* ``goalnet baseline`` — the 10-random-model chance baseline
  (reference ``baseline.py``).

Run as ``python -m cvml_goalnet_tpu.cli ...``.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import zipfile

import numpy as np

from cvml_goalnet_tpu.config import PipelineConfig
import dataclasses


def _load_cfg(args) -> PipelineConfig:
    cfg = PipelineConfig.load(args.config) if args.config else PipelineConfig()
    if getattr(args, "no_audio", False):
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, audio_included=False))
    if getattr(args, "commentary", False):
        # three-modality fusion: per-frame commentary from a
        # `<video>.commentary.jsonl` sidecar (BASELINE.json config 4)
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, text_included=True))
    if getattr(args, "moe_experts", None):
        # MoE fusion head (models/moe.py): top-k gated mixture of linear
        # experts on the first fusion hidden layer; experts shard over the
        # mesh "model" axis for expert parallelism (parallel/ep.py)
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, fusion_moe_experts=args.moe_experts))
    return cfg


def _artifact_paths(root: str, audio_included: bool) -> dict:
    suffix = "" if audio_included else "_no_audio"
    return {
        "ckp_dir": os.path.join(root, "models", f"importance{suffix}"),
        "curves": os.path.join(root, "tmp", f"train_states{suffix}.png"),
        "indices": os.path.join(root, "tmp", f"indices{suffix}.png"),
    }


def _checkpoint_present(ckp_dir: str, tag: str, backend: str) -> bool:
    if backend == "orbax":
        base = os.path.join(ckp_dir, f"{tag}_orbax")
        return os.path.isdir(base) or os.path.isdir(base + ".old")
    return os.path.exists(os.path.join(ckp_dir, f"{tag}_state.npz"))


def _load_tag(ckp_dir: str, state, tag: str, backend: str):
    if backend == "orbax":
        from cvml_goalnet_tpu.train.orbax_io import load_checkpoint_orbax

        return load_checkpoint_orbax(ckp_dir, state, tag=tag)
    from cvml_goalnet_tpu.train.checkpoint import load_checkpoint

    return load_checkpoint(ckp_dir, state, tag=tag)


def _load_trunk(paths: dict, state, args, tags=("opt", "ckp")):
    """Load the trunk checkpoint, auto-detecting the npz/orbax backend.

    ``--checkpoint-backend`` pins a backend; otherwise both layouts are
    probed (npz first, then a ``<tag>_orbax`` dir) so a model trained with
    ``train --checkpoint-backend orbax`` is found by infer/spot/spot-train
    without extra flags (advisor finding, round 2).  Raises
    ``FileNotFoundError`` when no checkpoint exists under any backend;
    load errors for an EXISTING checkpoint propagate (callers must fail
    hard rather than fall back to a random trunk).
    """
    from cvml_goalnet_tpu.train.checkpoint import CheckpointMismatchError

    requested = getattr(args, "checkpoint_backend", None)
    backends = [requested] if requested else ["npz", "orbax"]
    for tag in tags:
        for backend in backends:
            if _checkpoint_present(paths["ckp_dir"], tag, backend):
                if tag != tags[0]:
                    print(f"W: no {tags[0]} checkpoint found, falling back to rolling {tag}")
                try:
                    return _load_tag(paths["ckp_dir"], state, tag, backend)
                except FileNotFoundError as e:
                    # the checkpoint EXISTS but a piece is missing (e.g. the
                    # orbax manifest was deleted): this must fail hard, not
                    # read as "no checkpoint" → random-trunk fallback
                    raise CheckpointMismatchError(
                        f"{backend} checkpoint '{tag}' under "
                        f"{paths['ckp_dir']!r} is incomplete ({e})"
                    ) from e
    raise FileNotFoundError(
        f"no {'/'.join(tags)} checkpoint (npz or orbax) under {paths['ckp_dir']!r}"
    )


def _add_data_args(p: argparse.ArgumentParser):
    p.add_argument("--data-root", default="./ydata-tvsum50-v1_1")
    p.add_argument("--videos", nargs="*", default=None, help="explicit video paths")
    p.add_argument("--annotation-fp", default=None)
    p.add_argument("--mat-fp", default=None)
    p.add_argument("--h5-fp", default=None)
    p.add_argument("--info-fp", default=None)
    p.add_argument("--config", default=None, help="PipelineConfig JSON path")
    p.add_argument("--workdir", default=".", help="artifact root (tmp/, models/)")


def _resolve_data(args) -> dict:
    root = args.data_root
    return {
        "videos": args.videos
        or sorted(glob.glob(os.path.join(root, "video", "*.mp4"))),
        "annotation_fp": args.annotation_fp
        or os.path.join(root, "data", "ydata-tvsum50-anno.tsv"),
        "mat_fp": args.mat_fp
        or os.path.join(root, "ground_truth", "ydata-tvsum50.mat"),
        "h5_fp": args.h5_fp
        or os.path.join(root, "ground_truth", "eccv16_dataset_tvsum_google_pool5.h5"),
        "info_fp": args.info_fp or os.path.join(root, "data", "ydata-tvsum50-info.tsv"),
    }


def cmd_train(args) -> int:
    import jax

    from cvml_goalnet_tpu.data.dataset import build_datasets
    from cvml_goalnet_tpu.train.checkpoint import load_checkpoint
    from cvml_goalnet_tpu.train.loop import train_importance_model
    from cvml_goalnet_tpu.train.state import create_train_state
    from cvml_goalnet_tpu.viz import generate_metric_plots

    cfg = _load_cfg(args)
    data = _resolve_data(args)
    paths = _artifact_paths(args.workdir, cfg.model.audio_included)
    os.makedirs(os.path.dirname(paths["curves"]), exist_ok=True)

    train_ds, val_ds = build_datasets(
        data["videos"], cfg, data["annotation_fp"], data["mat_fp"], data["h5_fp"],
        data["info_fp"], audio_included=cfg.model.audio_included,
    )
    print(f"Number of train videos: {len(train_ds)}")
    print(f"Number of val videos: {len(val_ds)}")

    backend = getattr(args, "checkpoint_backend", "npz")
    state = create_train_state(jax.random.PRNGKey(cfg.train.seed), cfg)
    if args.checkpoint:
        if backend == "orbax":
            from cvml_goalnet_tpu.train.orbax_io import load_checkpoint_orbax

            state = load_checkpoint_orbax(paths["ckp_dir"], state, tag="ckp")
        else:
            state = load_checkpoint(paths["ckp_dir"], state, tag="ckp")
        print(f"Resumed from epoch {state.epoch}")

    if getattr(args, "dp", False):
        # mesh-parallel global-batch training (train/dp_loop.py)
        from cvml_goalnet_tpu.train.checkpoint import save_checkpoint
        from cvml_goalnet_tpu.train.dp_loop import train_data_parallel

        state, history = train_data_parallel(
            cfg, train_ds, val_ds, state,
            num_epochs=args.epochs, global_batch=args.global_batch,
        )
        save_checkpoint(paths["ckp_dir"], state, cfg, tag="ckp")
        save_checkpoint(paths["ckp_dir"], state, cfg, tag="opt")
        print("Operation completed")
        return 0

    from cvml_goalnet_tpu.train.loop import eval_video
    from cvml_goalnet_tpu.pipeline import summarize
    from cvml_goalnet_tpu.utils.metrics import MetricsLogger
    from cvml_goalnet_tpu.viz import export_indices

    metrics_logger = MetricsLogger(os.path.join(args.workdir, "tmp", "events.jsonl"))

    def on_epoch_end(epoch, history, best):
        generate_metric_plots(history, paths["curves"])
        if best["epoch"] == epoch and len(train_ds):
            # summary-mask png on each new optimum (reference main.py:265-280)
            item = train_ds[len(train_ds) - 1]
            preds, _ = eval_video(best["state"], item, cfg)
            res = summarize(
                preds, item.clip_intervals, cfg.preprocess.skip_frames,
                item.full_n_frames, cfg.knapsack,
            )
            export_indices(res.frame_mask, item.gd_summary_masks, paths["indices"])

    _, history = train_importance_model(
        cfg, train_ds, val_ds, state,
        num_epochs=args.epochs, checkpoint_dir=paths["ckp_dir"],
        on_epoch_end=on_epoch_end, metrics_logger=metrics_logger,
        checkpoint_backend=backend,
    )
    print(f"Optimal epoch: {history['best_epoch']}")
    print("Operation completed")
    return 0


def cmd_infer(args) -> int:
    import jax

    from cvml_goalnet_tpu.data.annotations import AnnotationStore
    from cvml_goalnet_tpu.data.dataset import build_video_item
    from cvml_goalnet_tpu.data.video import decode_all_frames, export_video
    from cvml_goalnet_tpu.pipeline import fuse, summarize
    from cvml_goalnet_tpu.train.state import create_train_state

    cfg = _load_cfg(args)
    data = _resolve_data(args)
    paths = _artifact_paths(args.workdir, cfg.model.audio_included)
    store = (
        AnnotationStore(data["mat_fp"], data["h5_fp"])
        if os.path.exists(data["mat_fp"]) and os.path.exists(data["h5_fp"])
        else None
    )

    print("Input video:\n", args.video)
    stream_mode = getattr(args, "stream", False)
    if getattr(args, "follow", False) and not stream_mode:
        print("E: --follow is a --stream mode (a live segment directory "
              "cannot be summarized offline — the footage isn't finished)",
              file=sys.stderr)
        return 2
    if stream_mode and (cfg.model.audio_included or cfg.model.text_included):
        # config validation beats checkpoint discovery: a missing-checkpoint
        # error for a mode this config can never run would mislead
        print("E: infer --stream supports visual-only trunks — audio MFCC "
              "slotting and commentary alignment need the timeline length up "
              "front; run offline infer or use a --no-audio trunk",
              file=sys.stderr)
        return 2
    item = None
    if not stream_mode:
        item = build_video_item(args.video, cfg, None, store, cfg.model.audio_included)

    from cvml_goalnet_tpu.train.checkpoint import CheckpointMismatchError

    state = create_train_state(jax.random.PRNGKey(cfg.train.seed), cfg)
    try:
        state = _load_trunk(paths, state, args)
    except CheckpointMismatchError as e:
        print(f"E: {e}\nE: re-train with the current flags or pass the matching "
              "--config/--no-audio/--commentary/--moe-experts combination", file=sys.stderr)
        return 2

    if stream_mode:
        return _run_infer_stream(args, cfg, state, store)

    scores = fuse(
        state.params, state.model_state,
        {"visual": item.visual, "audio": item.audio, "text": item.text}, cfg,
    )
    full_frames = decode_all_frames(args.video) if not args.video.endswith(".npz") else np.load(args.video)["frames"]
    res = summarize(
        scores, item.clip_intervals, cfg.preprocess.skip_frames,
        item.full_n_frames, cfg.knapsack, full_frames=full_frames,
    )
    if res.summary_frames is None or not len(res.summary_frames):
        print("W: knapsack selected no clips within the budget; nothing to export")
        return 0
    out_fp = os.path.join(args.workdir, "tmp", f"{item.title}.mp4")
    os.makedirs(os.path.dirname(out_fp), exist_ok=True)
    export_video(res.summary_frames, out_fp, fps=30)
    print(f"\n[Exported video details]\n\nID: {item.video_id}\nTitle: {item.title}\nOutput: {out_fp}")
    return 0


def _run_infer_stream(args, cfg, state, store) -> int:
    """``goalnet infer --stream``: bounded-memory summarization.

    Chunked decode → streaming device scoring (`streaming.score_video_stream`
    — decode, host/device preprocess, H2D, and compute all pipelined) →
    knapsack → a SECOND single-pass decode that writes only the selected
    clips.  Nothing ever holds the full timeline: peak memory is one chunk
    of condensed frames plus the (N,) score vector, vs the offline path's
    decode-everything (reference ``get_frame_tensor``, ``utils.py:294-305``).
    """
    from cvml_goalnet_tpu.data.video import (
        export_selected_clips_stream,
        stream_condensed_frames,
    )
    from cvml_goalnet_tpu.pipeline import summarize
    from cvml_goalnet_tpu.serve import _uniform_clip_intervals
    from cvml_goalnet_tpu.streaming import score_video_stream

    counter: dict = {}
    follow = getattr(args, "follow", False)
    if follow:
        # LIVE segment directory (data/follow.py): score chunks WHILE the
        # producer is still writing; knapsack at the END sentinel; the
        # export pass then walks the (now complete) segments.  The summary
        # is ready moments after the footage ends instead of a full
        # decode+score later.
        from cvml_goalnet_tpu.data.follow import stream_condensed_frames_follow

        chunks = stream_condensed_frames_follow(
            args.video, cfg.preprocess.skip_frames, args.stream_chunk,
            counter=counter, poll_interval=args.follow_poll,
            timeout=args.follow_timeout, end_sentinel=args.follow_end)
    else:
        chunks = stream_condensed_frames(
            args.video, cfg.preprocess.skip_frames, args.stream_chunk,
            counter=counter)
    tdtype = {"float16": np.float16, "uint8": np.uint8}.get(
        args.transfer_dtype or "")
    if tdtype is not None and not args.host_preprocess:
        print("E: --transfer-dtype only applies with --host-preprocess "
              "(device preprocess ships raw frames)", file=sys.stderr)
        return 2
    scores, stats = score_video_stream(
        state.params, state.model_state, chunks, cfg,
        chunk_size=args.stream_chunk,
        host_preprocess=args.host_preprocess, transfer_dtype=tdtype)
    full_n = counter["full_n"]
    video_id = os.path.basename(args.video).rsplit(".", 1)[0]
    intervals = (np.asarray(store.change_points(video_id))
                 if store is not None
                 else _uniform_clip_intervals(cfg, full_n))
    res = summarize(scores, intervals, cfg.preprocess.skip_frames, full_n,
                    cfg.knapsack)
    print(f"streamed {stats.frames} condensed frames in {stats.chunks} chunks")
    if not len(res.clip_intervals):
        print("W: knapsack selected no clips within the budget; nothing to export")
        return 0
    out_fp = os.path.join(args.workdir, "tmp", f"{video_id}.mp4")
    os.makedirs(os.path.dirname(out_fp), exist_ok=True)
    if follow:
        from cvml_goalnet_tpu.data.follow import export_selected_clips_from_segments

        written = export_selected_clips_from_segments(
            args.video, res.clip_intervals, out_fp,
            end_sentinel=args.follow_end)
    else:
        written = export_selected_clips_stream(
            args.video, res.clip_intervals, out_fp)
    print(f"\n[Exported video details]\n\nID: {video_id}\nTitle: {video_id}\n"
          f"Output: {out_fp}\nFrames: {written}")
    return 0


def cmd_profile(args) -> int:
    """Per-stage wall-clock profile of the summarize pipeline on one video.

    Observability as a CLI journey (the reference only printed epoch-level
    wall-clock deltas, ``main.py:83,145-146``): decode → features → device
    scoring → knapsack postprocess, each timed across ``--repeats`` passes
    (first pass carries the jit compile; per-stage means are reported for
    the steady-state repeats when ``--repeats > 1``).  ``--trace-dir``
    additionally captures a ``jax.profiler`` device trace with the same
    stage names as annotations (viewable in xprof/tensorboard).
    """
    import json

    import jax

    from cvml_goalnet_tpu.data.annotations import AnnotationStore
    from cvml_goalnet_tpu.data.dataset import _load_frames
    from cvml_goalnet_tpu.pipeline import extract_features, fuse, summarize
    from cvml_goalnet_tpu.serve import _uniform_clip_intervals
    from cvml_goalnet_tpu.train.checkpoint import CheckpointMismatchError
    from cvml_goalnet_tpu.train.state import create_train_state
    from cvml_goalnet_tpu.utils.profiling import StageTimer, start_trace, stop_trace

    cfg = _load_cfg(args)
    data = _resolve_data(args)
    paths = _artifact_paths(args.workdir, cfg.model.audio_included)
    state = create_train_state(jax.random.PRNGKey(cfg.train.seed), cfg)
    try:
        state = _load_trunk(paths, state, args)
    except FileNotFoundError:
        print("W: no trained importance checkpoint; profiling a random-init trunk")
    except CheckpointMismatchError as e:
        print(f"E: {e}", file=sys.stderr)
        return 2

    video_id = os.path.basename(args.video).rsplit(".", 1)[0]
    store = (
        AnnotationStore(data["mat_fp"], data["h5_fp"])
        if os.path.exists(data["mat_fp"]) and os.path.exists(data["h5_fp"])
        else None
    )
    repeats = max(1, args.repeats)
    if args.trace_dir:
        start_trace(args.trace_dir)
    timer = StageTimer()
    first = StageTimer()  # pass 0 carries the jit compiles — report it apart
    try:
        for rep in range(repeats):
            t = first if (rep == 0 and repeats > 1) else timer
            with t.stage("decode"):
                frames, full_n = _load_frames(args.video, cfg.preprocess.skip_frames)
            waveform = None
            if cfg.model.audio_included:
                with t.stage("audio_load"):
                    audio_fp = args.video.rsplit(".", 1)[0] + ".wav"
                    if not os.path.exists(audio_fp):
                        from cvml_goalnet_tpu.data.audio_io import demux_audio

                        demux_audio(args.video, audio_fp)
                    from cvml_goalnet_tpu.data.audio_io import load_waveform

                    waveform, _ = load_waveform(audio_fp, cfg.audio.sample_rate)
            commentary = None
            if cfg.model.text_included:
                commentary_fp = args.video.rsplit(".", 1)[0] + ".commentary.jsonl"
                if os.path.exists(commentary_fp):
                    from cvml_goalnet_tpu.data.text import (
                        commentary_per_frame,
                        load_commentary_jsonl,
                    )

                    commentary = commentary_per_frame(
                        load_commentary_jsonl(commentary_fp), len(frames),
                        cfg.preprocess.skip_frames)
                else:
                    commentary = [""] * len(frames)
            with t.stage("features"):
                feats = extract_features(frames, waveform, cfg, commentary=commentary)
            with t.stage("score"):
                scores = fuse(state.params, state.model_state, feats, cfg)
            with t.stage("postprocess"):
                intervals = (np.asarray(store.change_points(video_id))
                             if store is not None
                             else _uniform_clip_intervals(cfg, full_n))
                res = summarize(scores, intervals, cfg.preprocess.skip_frames,
                                full_n, cfg.knapsack)
    finally:
        if args.trace_dir:
            stop_trace()

    summary = timer.summary()
    total_s = sum(v["mean_s"] for v in summary.values())
    payload = {
        "video_id": video_id,
        "backend": jax.default_backend(),
        "repeats": repeats,
        "condensed_frames": int(len(scores)),
        "full_n_frames": int(full_n),
        "stages_mean_s": {k: round(v["mean_s"], 4) for k, v in summary.items()},
        "total_mean_s": round(total_s, 4),
        "condensed_fps": round(len(scores) / total_s, 1) if total_s else None,
        "selected_clips": int(len(res.clip_intervals)),
    }
    if repeats > 1:
        payload["first_pass_s"] = {
            k: round(v["mean_s"], 4) for k, v in first.summary().items()}
    if args.trace_dir:
        payload["trace_dir"] = args.trace_dir
    print(json.dumps(payload, indent=2))
    return 0


def _apply_temporal_overrides(cfg, args):
    """Fold --temporal-model / --attn-window / --heads into the config."""
    if getattr(args, "temporal_model", None):
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, temporal_model=args.temporal_model)
        )
    if getattr(args, "attn_window", None) is not None:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, temporal_window=args.attn_window)
        )
    if getattr(args, "heads", None) is not None:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, temporal_num_heads=args.heads)
        )
    return cfg


def cmd_spot(args) -> int:
    """Temporal event spotting over one video (new capability — spotting.py)."""
    import json

    import jax

    from cvml_goalnet_tpu.data.annotations import AnnotationStore
    from cvml_goalnet_tpu.data.dataset import build_video_item
    from cvml_goalnet_tpu.spotting import summarize_match
    from cvml_goalnet_tpu.train.checkpoint import CheckpointMismatchError
    from cvml_goalnet_tpu.train.spotting import load_spotting_checkpoint
    from cvml_goalnet_tpu.train.state import create_train_state

    cfg = _load_cfg(args)
    data = _resolve_data(args)
    paths = _artifact_paths(args.workdir, cfg.model.audio_included)
    store = (
        AnnotationStore(data["mat_fp"], data["h5_fp"])
        if os.path.exists(data["mat_fp"]) and os.path.exists(data["h5_fp"])
        else None
    )
    if getattr(args, "follow", False) and not args.stream:
        print("E: --follow is a --stream mode (a live segment directory "
              "cannot be spotted offline — the footage isn't finished)",
              file=sys.stderr)
        return 2
    # --stream never holds the whole timeline (that is its point), so the
    # one-shot decode is skipped entirely in that mode
    item = None
    if not args.stream:
        item = build_video_item(
            args.video, cfg, None, store, cfg.model.audio_included)

    state = create_train_state(jax.random.PRNGKey(cfg.train.seed), cfg)
    try:
        state = _load_trunk(paths, state, args, tags=("opt",))
    except FileNotFoundError:
        print("W: no trained importance checkpoint; using random-init trunk")
    except CheckpointMismatchError as e:
        # a checkpoint EXISTS but doesn't fit the flags — scoring with a
        # random trunk would be silently meaningless, so fail hard
        print(f"E: {e}\nE: re-train with the current flags or pass the matching "
              "--config/--no-audio/--commentary/--moe-experts combination", file=sys.stderr)
        return 2

    cfg = _apply_temporal_overrides(cfg, args)
    classes = args.classes.split(",") if getattr(args, "classes", None) else None
    d = (cfg.model.vis_feature_dim
         + (cfg.model.aud_feature_dim if cfg.model.audio_included else 0)
         + (cfg.model.text_feature_dim if cfg.model.text_included else 0))
    n_classes = len(classes) if classes else 1
    from cvml_goalnet_tpu.spotting import temporal_head_init_auto

    tparams = temporal_head_init_auto(
        jax.random.PRNGKey(1), d, cfg.model, n_classes=n_classes)
    if args.temporal_checkpoint:
        tparams = load_spotting_checkpoint(
            args.temporal_checkpoint, tparams, classes=classes)
    else:
        print("W: no --temporal-checkpoint; scoring with a random-init temporal head")

    import jax.numpy as jnp

    from cvml_goalnet_tpu.data.video import probe_video_fps

    # frame→seconds conversion must use the CONTAINER's fps (production
    # footage is 25 fps; 30.0 is only the reference's export convention,
    # utils.py:523, and the npz-fixture fallback) — serve.py /spot already
    # does this; keep the CLI consistent
    fps = probe_video_fps(args.video) or 30.0

    if args.stream:
        if getattr(args, "eval_events", False):
            # silently ignoring the flag would read as "evaluated, no output"
            print("E: --eval-events is an offline option (it compares against "
                  "a complete sidecar); run spot without --stream to evaluate",
                  file=sys.stderr)
            return 2
        return _run_spot_stream(args, cfg, state, tparams, classes, fps)

    if classes:
        # multi-class: per-class event streams; the knapsack summary uses the
        # class-agnostic eventness (max over classes) on the shared contract
        from cvml_goalnet_tpu.pipeline import summarize
        from cvml_goalnet_tpu.spotting import (
            encode_timeline, score_timeline_auto, scores_to_importance,
            spot_events_multi)

        feats = encode_timeline(
            state.params, state.model_state, jnp.asarray(item.visual),
            jnp.asarray(item.audio) if item.audio is not None else None, cfg,
            text=jnp.asarray(item.text) if item.text is not None else None)
        scores_mc = np.asarray(score_timeline_auto(tparams, feats, cfg))
        if scores_mc.ndim == 1:   # one-channel head (--classes with one name)
            scores_mc = scores_mc[:, None]
        events_by_class = spot_events_multi(
            scores_mc, args.peak_window, args.peak_threshold)
        importances = scores_to_importance(scores_mc.max(axis=1))
        summary = summarize(importances, item.clip_intervals,
                            cfg.preprocess.skip_frames, item.full_n_frames,
                            cfg.knapsack)
        payload = {
            "video_id": item.video_id,
            "classes": classes,
            "events_condensed_frames": {
                c: ev.tolist() for c, ev in zip(classes, events_by_class)},
            "events_seconds": {
                c: [round(float(e * cfg.preprocess.skip_frames) / fps, 2) for e in ev]
                for c, ev in zip(classes, events_by_class)},
            "summary_clips": np.asarray(summary.clip_intervals).tolist(),
            "summary_frames": int(summary.frame_mask.sum()),
        }
        events_fp = args.video.rsplit(".", 1)[0] + ".events.json"
        if getattr(args, "eval_events", False) and os.path.exists(events_fp):
            from cvml_goalnet_tpu.ops.spotting_metrics import (
                multiclass_average_map, spotting_pr)
            from cvml_goalnet_tpu.spotting import load_event_labels

            gt_mc = load_event_labels(
                events_fp, len(item.visual), cfg.preprocess.skip_frames, classes)
            gt_by_class = [np.nonzero(gt_mc[:, c])[0] for c in range(len(classes))]
            score_by_class = [
                scores_mc[ev, c] if len(ev) else np.zeros((0,))
                for c, ev in enumerate(events_by_class)]
            mm = multiclass_average_map(events_by_class, score_by_class, gt_by_class)
            per_class = {}
            for i, c in enumerate(classes):
                pr, rc, f1 = spotting_pr(
                    events_by_class[i], score_by_class[i], gt_by_class[i],
                    tolerance=args.eval_tolerance)
                per_class[c] = {
                    "precision": round(pr, 4), "recall": round(rc, 4),
                    "f1": round(f1, 4), **mm["per_class"][i],
                }
            payload["eval"] = {
                "gt_events": {c: g.tolist() for c, g in zip(classes, gt_by_class)},
                "tolerance": args.eval_tolerance,
                "average_map": mm["average_map"],
                "per_class": per_class,
            }
        print(json.dumps(payload, indent=2))
        return 0

    result = summarize_match(
        state.params, state.model_state, tparams,
        jnp.asarray(item.visual),
        jnp.asarray(item.audio) if item.audio is not None else None,
        item.clip_intervals, cfg,
        full_n_frames=item.full_n_frames,
        peak_window=args.peak_window, peak_threshold=args.peak_threshold,
        text=jnp.asarray(item.text) if item.text is not None else None,
    )
    payload = {
        "video_id": item.video_id,
        "events_condensed_frames": result.events.tolist(),
        "events_seconds": [round(float(e * cfg.preprocess.skip_frames) / fps, 2) for e in result.events],
        "summary_clips": np.asarray(result.summary.clip_intervals).tolist(),
        "summary_frames": int(result.summary.frame_mask.sum()),
    }

    # optional evaluation vs an events sidecar (tolerance P/R + average-mAP)
    events_fp = args.video.rsplit(".", 1)[0] + ".events.json"
    if getattr(args, "eval_events", False) and os.path.exists(events_fp):
        from cvml_goalnet_tpu.ops.spotting_metrics import average_map, spotting_pr
        from cvml_goalnet_tpu.spotting import load_event_labels

        gt = np.nonzero(load_event_labels(
            events_fp, len(item.visual), cfg.preprocess.skip_frames))[0]
        pred = result.events
        scores = np.asarray(result.scores)[pred] if len(pred) else np.zeros((0,))
        p, r, f1 = spotting_pr(pred, scores, gt, tolerance=args.eval_tolerance)
        payload["eval"] = {
            "gt_events": gt.tolist(),
            "tolerance": args.eval_tolerance,
            "precision": round(p, 4), "recall": round(r, 4), "f1": round(f1, 4),
            **average_map(pred, scores, gt),
        }

    print(json.dumps(payload, indent=2))
    return 0


def _run_spot_stream(args, cfg, state, tparams, classes, fps) -> int:
    """``goalnet spot --stream``: bounded-latency LIVE spotting.

    Decodes the input in chunks and emits one jsonl line per event the
    moment it becomes FINAL (:func:`spotting.spot_stream` — scores wait for
    a halo of right context, events for their full peak window), then a
    closing summary payload.  Worst-case decision latency is one chunk +
    halo + peak-window condensed frames, and nothing ever holds the whole
    timeline.  GRU scores are final up to halo decay; banded-transformer
    scores are EXACTLY the offline banded scorer's (halo = layers·window
    receptive field).

    Two ingest modes:

    * default — VIDEO is a complete on-disk file, decoded in chunks (a
      replay/backfill surface; visual-only).
    * ``--follow`` — VIDEO is a LIVE segment DIRECTORY a producer is still
      writing (``data/follow.py`` protocol: lexicographic finalized
      segments, ``.part`` scratch names, ``END`` sentinel).  This is the
      genuinely-growing-input path, and the one that streams AUDIO: each
      segment ships its own finished ``<stem>.wav`` span, so audio trunks
      spot live (round-4 VERDICT missing #3/#4).
    """
    import json

    from cvml_goalnet_tpu.data.video import stream_condensed_frames
    from cvml_goalnet_tpu.ops.preprocess import preprocess_frames_host
    from cvml_goalnet_tpu.spotting import spot_stream

    if (cfg.model.temporal_model in ("transformer", "hybrid")
            and cfg.model.temporal_window <= 0):
        print(f"E: --stream with the {cfg.model.temporal_model} scorer needs "
              "a banded window (--attn-window N): full attention has an "
              "unbounded receptive field so streamed scores could never be "
              "final; band it or spot offline", file=sys.stderr)
        return 2
    follow = getattr(args, "follow", False)
    if cfg.model.text_included:
        print("E: --stream supports trunks without --commentary — there is "
              "no live ingest protocol for commentary tokens (documented "
              "contract, docs/ARCHITECTURE.md); use a visual(/audio) trunk "
              "or spot offline", file=sys.stderr)
        return 2
    if cfg.model.audio_included and not follow:
        print("E: audio trunks stream via --follow (a live segment directory "
              "where each segment ships its .wav span) — a single complete "
              "file has no per-chunk audio contract; use --follow, a "
              "--no-audio trunk, or spot offline", file=sys.stderr)
        return 2

    skip = cfg.preprocess.skip_frames
    audio_chunks = None

    if follow:
        from collections import deque

        from cvml_goalnet_tpu.data.follow import follow_condensed_chunks

        pairs = follow_condensed_chunks(
            args.video, skip, args.stream_chunk,
            audio_cfg=cfg.audio if cfg.model.audio_included else None,
            poll_interval=args.follow_poll, timeout=args.follow_timeout,
            end_sentinel=args.follow_end)
        # split aligned (frames, audio) pairs into the two iterators
        # spot_stream consumes; it pulls the frame chunk first, then its
        # audio chunk, so queuing audio before yielding frames keeps lockstep
        aq: deque = deque()

        def chunks():
            for raw, audio in pairs:
                if audio is not None:
                    aq.append(audio)
                yield preprocess_frames_host(
                    raw, cfg.preprocess.frame_size, cfg.preprocess.eps)

        def audio_gen():
            while True:
                if not aq:
                    return
                yield aq.popleft()

        if cfg.model.audio_included:
            audio_chunks = audio_gen()
    else:
        def chunks():
            for raw in stream_condensed_frames(args.video, skip, args.stream_chunk):
                # host preprocess: the trunk's timeline encoder consumes
                # normalized+resized frames (same contract as build_video_item)
                yield preprocess_frames_host(
                    raw, cfg.preprocess.frame_size, cfg.preprocess.eps)

    names = classes or [None]
    all_events: dict[int, list[int]] = {c: [] for c in range(len(names))}
    n_scores = 0
    for u in spot_stream(
        state.params, state.model_state, tparams, chunks(), cfg,
        halo=args.stream_halo, peak_window=args.peak_window,
        peak_threshold=args.peak_threshold, audio_chunks=audio_chunks,
    ):
        n_scores += len(u.scores)
        per_class = u.events if isinstance(u.events, dict) else {0: u.events}
        for c, ev in sorted(per_class.items()):
            all_events[c].extend(int(e) for e in ev)
            for e in ev:
                line = {"event_condensed_frame": int(e),
                        "event_seconds": round(float(e * skip) / fps, 2)}
                if names[c] is not None:
                    line["class"] = names[c]
                print(json.dumps(line), flush=True)

    video_id = os.path.basename(args.video).rsplit(".", 1)[0]
    payload = {"video_id": video_id, "streamed_frames": n_scores}
    if names[0] is None:
        payload["events_condensed_frames"] = all_events[0]
        payload["events_seconds"] = [
            round(float(e * skip) / fps, 2) for e in all_events[0]]
    else:
        payload["classes"] = list(names)
        payload["events_condensed_frames"] = {
            c: all_events[i] for i, c in enumerate(names)}
        payload["events_seconds"] = {
            c: [round(float(e * skip) / fps, 2) for e in all_events[i]]
            for i, c in enumerate(names)}
    print(json.dumps(payload, indent=2))
    return 0


def _spot_opt_kwargs(tc) -> dict:
    """Schedule/clip kwargs for the spotting step factories, derived from
    ``TrainConfig`` so `spot-train` honors the same optimizer controls as
    `train` (base lr stays the --lr flag; the schedule scales it)."""
    kw = {}
    if tc.lr_schedule != "constant" or tc.lr_warmup_steps or tc.lr_decay_steps:
        kw["lr_schedule"] = (tc.lr_schedule, tc.lr_warmup_steps,
                             tc.lr_decay_steps, tc.lr_min_ratio)
    if tc.grad_clip_norm:
        kw["grad_clip_norm"] = tc.grad_clip_norm
    return kw


def cmd_spot_train(args) -> int:
    """Train the temporal spotting head on event-labelled videos.

    Supervision: a ``<video>.events.json`` sidecar per video (raw frame
    indices of events).  The AVM trunk encodes each timeline once; the
    GRU/transformer scorer trains with weighted BCE
    (``train/spotting.make_spotting_train_step``); the head is saved with
    ``save_spotting_checkpoint`` for ``goalnet spot --temporal-checkpoint``.
    This closes the spotting user journey the reference never had
    (SURVEY.md §2.3: no temporal model upstream).
    """
    import jax
    import jax.numpy as jnp

    from cvml_goalnet_tpu.data.annotations import AnnotationStore
    from cvml_goalnet_tpu.data.dataset import build_video_item
    from cvml_goalnet_tpu.spotting import encode_timeline, load_event_labels
    from cvml_goalnet_tpu.train.checkpoint import CheckpointMismatchError
    from cvml_goalnet_tpu.train.spotting import (
        init_spotting_opt,
        make_spotting_train_step,
        save_spotting_checkpoint,
    )
    from cvml_goalnet_tpu.train.state import create_train_state

    cfg = _apply_temporal_overrides(_load_cfg(args), args)
    data = _resolve_data(args)
    paths = _artifact_paths(args.workdir, cfg.model.audio_included)
    store = (
        AnnotationStore(data["mat_fp"], data["h5_fp"])
        if os.path.exists(data["mat_fp"]) and os.path.exists(data["h5_fp"])
        else None
    )
    state = create_train_state(jax.random.PRNGKey(cfg.train.seed), cfg)
    try:
        state = _load_trunk(paths, state, args, tags=("opt",))
    except FileNotFoundError:
        print("W: no trained importance checkpoint; encoding with a random-init trunk")
    except CheckpointMismatchError as e:
        print(f"E: {e}\nE: re-train with the current flags or pass the matching "
              "--config/--no-audio/--commentary/--moe-experts combination", file=sys.stderr)
        return 2

    classes = args.classes.split(",") if getattr(args, "classes", None) else None

    if not getattr(args, "cp", False) and (
            max(1, int(getattr(args, "dp_timelines", 1) or 1)) > 1
            or max(1, int(getattr(args, "tp", 1) or 1)) > 1):
        # these flags only select mesh axes of the CP layouts; silently
        # ignoring them would train single-device while the user believes
        # the run is parallel
        print("E: --dp-timelines/--tp require --cp", file=sys.stderr)
        return 2

    # encode every labelled video once
    def encode_pairs(video_fps, required: bool):
        out = []
        for fp in video_fps:
            events_fp = fp.rsplit(".", 1)[0] + ".events.json"
            if not os.path.exists(events_fp):
                if required:
                    # a val video with no labels cannot validate anything —
                    # silently skipping would select/early-stop on less data
                    # than the user asked for
                    print(f"E: val video {fp}: no .events.json sidecar",
                          file=sys.stderr)
                    return None
                print(f"W: {fp}: no events sidecar, skipping")
                continue
            item = build_video_item(fp, cfg, None, store, cfg.model.audio_included)
            feats = encode_timeline(
                state.params, state.model_state, jnp.asarray(item.visual),
                jnp.asarray(item.audio) if item.audio is not None else None, cfg,
                text=jnp.asarray(item.text) if item.text is not None else None,
            )
            labels = load_event_labels(
                events_fp, len(item.visual), cfg.preprocess.skip_frames, classes)
            out.append((item.video_id, feats, jnp.asarray(labels)))
        return out

    val_fps = list(getattr(args, "val_videos", None) or [])
    if getattr(args, "early_stop", 0) and not val_fps:
        print("E: --early-stop needs --val-videos (a held-out metric to "
              "stop on)", file=sys.stderr)
        return 2
    # dedupe by resolved path, not raw string: `--videos data/vidA.npz
    # --val-videos ./data/vidA.npz` must NOT silently train on the val video
    # (a train/val leak would corrupt exactly the held-out selection this
    # flag exists for)
    val_real = {os.path.realpath(fp) for fp in val_fps}
    train_fps = [fp for fp in data["videos"]
                 if os.path.realpath(fp) not in val_real]
    if val_fps and not train_fps:
        print("E: every --videos path is held out by --val-videos; "
              "nothing left to train on", file=sys.stderr)
        return 2
    pairs = encode_pairs(train_fps, required=False)
    val_pairs = encode_pairs(val_fps, required=True)
    if val_pairs is None:
        return 2
    if not pairs:
        print("E: no videos with .events.json sidecars", file=sys.stderr)
        return 2

    d = int(pairs[0][1].shape[-1])
    if getattr(args, "cp", False) and cfg.model.temporal_model != "transformer":
        print("E: --cp needs the transformer scorer (--temporal-model transformer)",
              file=sys.stderr)
        return 2
    npp = max(1, int(getattr(args, "pp", 1) or 1))
    if npp > 1:
        if cfg.model.temporal_model != "transformer":
            print("E: --pp needs the transformer scorer "
                  "(--temporal-model transformer)", file=sys.stderr)
            return 2
        if getattr(args, "cp", False):
            print("E: --pp and --cp are mutually exclusive (pipeline stages "
                  "and context shards lay the mesh out differently)",
                  file=sys.stderr)
            return 2
        if cfg.model.temporal_num_layers % npp:
            print(f"E: --pp {npp} must divide temporal_num_layers "
                  f"({cfg.model.temporal_num_layers}) — one stage per device "
                  "needs an even split of blocks", file=sys.stderr)
            return 2
        if len(jax.devices()) < npp:
            print(f"E: --pp {npp} needs {npp} devices, have "
                  f"{len(jax.devices())}", file=sys.stderr)
            return 2
        if len({int(f.shape[0]) for _, f, _ in pairs}) > 1:
            print("E: --pp requires equal-length timelines (the GPipe path "
                  "does not mask pad rows out of attention) — use --cp for "
                  "variable lengths", file=sys.stderr)
            return 2
    from cvml_goalnet_tpu.spotting import temporal_head_init_auto

    tparams = temporal_head_init_auto(
        jax.random.PRNGKey(1), d, cfg.model,
        n_classes=len(classes) if classes else 1)
    if cfg.model.temporal_model == "transformer":
        if getattr(args, "cp", False):
            # context parallel: each timeline shards over ALL devices; the
            # attention runs as a ppermute ring (or one halo hop per neighbor
            # when temporal_window > 0) — train/spotting.py.  --dp-timelines N
            # composes DP×CP: N timelines batch over a "data" mesh axis while
            # time shards over the remaining "ctx" axis.
            from jax.sharding import Mesh

            ndp = max(1, int(getattr(args, "dp_timelines", 1) or 1))
            ntp = max(1, int(getattr(args, "tp", 1) or 1))
            devs = jax.devices()
            if ntp > 1:
                # 3-D: heads split Megatron-style over a "model" axis on top
                # of the DP×CP layout (models/temporal_attention.py
                # ::temporal_transformer_3d_apply).
                if len(devs) % (ndp * ntp):
                    print(f"E: --dp-timelines {ndp} × --tp {ntp} does not "
                          f"divide the {len(devs)}-device mesh", file=sys.stderr)
                    return 2
                if cfg.model.temporal_num_heads % ntp:
                    print(f"E: --tp {ntp} must divide the head count "
                          f"({cfg.model.temporal_num_heads}); pass --heads",
                          file=sys.stderr)
                    return 2
                from cvml_goalnet_tpu.train.spotting import (
                    make_3d_spotting_train_step,
                )

                nctx = len(devs) // (ndp * ntp)
                mesh = Mesh(np.array(devs).reshape(ndp, ntp, nctx),
                            ("data", "model", "ctx"))
                print(f"DP×TP×CP: {ndp} timelines × {ntp}-way tensor × "
                      f"{nctx}-way context parallel")
                step = make_3d_spotting_train_step(
                    mesh, num_heads=cfg.model.temporal_num_heads,
                    lr=args.lr, pos_weight=args.pos_weight,
                    use_flash=jax.default_backend() not in ("cpu",),
                    window=cfg.model.temporal_window,
                    **_spot_opt_kwargs(cfg.train),
                )
            elif ndp > 1:
                if len(devs) % ndp:
                    print(f"E: --dp-timelines {ndp} does not divide the "
                          f"{len(devs)}-device mesh", file=sys.stderr)
                    return 2
                from cvml_goalnet_tpu.train.spotting import (
                    make_dp_cp_spotting_train_step,
                )

                mesh = Mesh(np.array(devs).reshape(ndp, -1), ("data", "ctx"))
                print(f"DP×CP: {ndp} timelines × {len(devs) // ndp}-way context "
                      "parallel")
                step = make_dp_cp_spotting_train_step(
                    mesh, num_heads=cfg.model.temporal_num_heads,
                    lr=args.lr, pos_weight=args.pos_weight,
                    use_flash=jax.default_backend() not in ("cpu",),
                    window=cfg.model.temporal_window,
                    **_spot_opt_kwargs(cfg.train),
                )
            else:
                from cvml_goalnet_tpu.train.spotting import (
                    make_sharded_spotting_train_step,
                )

                mesh = Mesh(np.array(devs), ("data",))
                print(f"context-parallel over {len(devs)} devices")
                step = make_sharded_spotting_train_step(
                    mesh, num_heads=cfg.model.temporal_num_heads,
                    lr=args.lr, pos_weight=args.pos_weight,
                    use_flash=jax.default_backend() not in ("cpu",),
                    window=cfg.model.temporal_window,
                    **_spot_opt_kwargs(cfg.train),
                )
        elif npp > 1:
            # GPipe pipeline parallelism (parallel/pp.py): the transformer's
            # blocks shard one-stage-per-device over a "model" mesh axis;
            # microbatches drain through a lax.scan-of-ppermute tick loop and
            # jax.grad derives the reverse pipeline from the AD transpose.
            from jax.sharding import Mesh

            from cvml_goalnet_tpu.parallel.pp import make_pp_spotting_train_step

            b = len(pairs)
            n_micro = max(k for k in range(1, min(b, npp) + 1) if b % k == 0)
            mesh = Mesh(np.array(jax.devices()[:npp]), ("model",))
            print(f"pipeline-parallel: {npp} stages x {n_micro} microbatches")
            step = make_pp_spotting_train_step(
                mesh, "model", num_heads=cfg.model.temporal_num_heads,
                lr=args.lr, pos_weight=args.pos_weight, n_micro=n_micro,
                use_flash=jax.default_backend() not in ("cpu",),
                window=cfg.model.temporal_window,
                **_spot_opt_kwargs(cfg.train),
            )
        else:
            step = make_spotting_train_step(
                0, lr=args.lr, pos_weight=args.pos_weight,
                scorer="transformer", num_heads=cfg.model.temporal_num_heads,
                window=cfg.model.temporal_window,
                **_spot_opt_kwargs(cfg.train),
            )
    elif cfg.model.temporal_model == "hybrid":
        step = make_spotting_train_step(
            cfg.model.temporal_hidden, lr=args.lr, pos_weight=args.pos_weight,
            scorer="hybrid", num_heads=cfg.model.temporal_num_heads,
            window=cfg.model.temporal_window,
            **_spot_opt_kwargs(cfg.train),
        )
    else:
        step = make_spotting_train_step(
            cfg.model.temporal_hidden, lr=args.lr, pos_weight=args.pos_weight,
            **_spot_opt_kwargs(cfg.train),
        )

    ndp_batch = (max(1, int(getattr(args, "dp_timelines", 1) or 1))
                 if getattr(args, "cp", False) else 1)
    # the 3-D (--tp) step consumes batched (B, T, D) input even at B=1
    batched = ndp_batch > 1 or (getattr(args, "cp", False)
                                and max(1, int(getattr(args, "tp", 1) or 1)) > 1)
    if npp > 1:
        # PP consumes ONE (B, T, D) batch of all (equal-length, checked
        # above) timelines — the group builder below pads nothing and fills
        # no dummies at ndp_batch == len(pairs)
        ndp_batch = len(pairs)
        batched = True
    if batched:
        # DP×CP: group timelines into batches of ndp, padded to the longest
        # (labels -1 on pads → zero loss weight; short groups fill with
        # fully-masked dummy timelines so the batch axis stays divisible)
        groups = []
        for i in range(0, len(pairs), ndp_batch):
            chunk = pairs[i : i + ndp_batch]
            tmax = max(int(f.shape[0]) for _, f, _ in chunk)
            fs, ls = [], []
            for _, f, l in chunk:
                pad_t = tmax - int(f.shape[0])
                fs.append(jnp.pad(f, ((0, pad_t), (0, 0))))
                lpad = ((0, pad_t),) + ((0, 0),) * (l.ndim - 1)
                ls.append(jnp.pad(l, lpad, constant_values=-1.0))
            while len(fs) < ndp_batch:
                fs.append(jnp.zeros_like(fs[0]))
                ls.append(jnp.full_like(ls[0], -1.0))
            groups.append((jnp.stack(fs), jnp.stack(ls)))

    def val_loss_of(tp) -> float:
        # held-out loss on the SAME objective the steps train (scores are
        # logits; weighted_bce is the one shared spotting loss) — scored
        # single-device via the public dispatch, independent of the train
        # step's mesh layout
        from cvml_goalnet_tpu.spotting import score_timeline_auto
        from cvml_goalnet_tpu.train.spotting import weighted_bce

        # a one-name --classes head scores (T,) against (T, 1) labels —
        # reshape instead of letting the subtraction broadcast to (T, T)
        return float(np.mean([
            float(weighted_bce(
                jnp.reshape(score_timeline_auto(tp, f, cfg), l.shape), l,
                args.pos_weight))
            for _, f, l in val_pairs]))

    def val_map_of(tp) -> float:
        # the spotting field's quality metric alongside the loss: detect
        # peaks on each val timeline and average-mAP them against the GT
        # events (SoccerNet convention — classes without GT are excluded),
        # at the SAME peak window/threshold `goalnet spot` will deploy with
        from cvml_goalnet_tpu.ops.spotting_metrics import multiclass_average_map
        from cvml_goalnet_tpu.spotting import score_timeline_auto, spot_events_multi

        maps = []
        for _, f, l in val_pairs:
            l2 = np.asarray(l)
            if l2.ndim == 1:
                l2 = l2[:, None]
            s2 = np.asarray(score_timeline_auto(tp, f, cfg)).reshape(l2.shape)
            pred = spot_events_multi(s2, args.peak_window, args.peak_threshold)
            gt = [np.nonzero(l2[:, c] > 0.5)[0] for c in range(l2.shape[1])]
            sc = [s2[ev, c] if len(ev) else np.zeros((0,))
                  for c, ev in enumerate(pred)]
            maps.append(multiclass_average_map(pred, sc, gt)["average_map"])
        return float(np.mean(maps))

    opt = init_spotting_opt(tparams)
    best = {"val": float("inf"), "params": tparams, "epoch": -1}
    for epoch in range(args.epochs):
        losses = []
        if batched:
            for bf, bl in groups:
                tparams, opt, loss = step(tparams, opt, bf, bl)
                losses.append(float(loss))
        else:
            for _, feats, labels in pairs:
                tparams, opt, loss = step(tparams, opt, feats, labels)
                losses.append(float(loss))
        if val_pairs:
            vloss = val_loss_of(tparams)
            print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
                  f"val-loss {vloss:.4f} val-mAP {val_map_of(tparams):.4f}")
            if vloss < best["val"]:
                best = {"val": vloss, "params": tparams, "epoch": epoch}
            elif (getattr(args, "early_stop", 0)
                  and epoch - best["epoch"] >= args.early_stop):
                print(f"Early stop: no val-loss improvement in "
                      f"{args.early_stop} epochs (best epoch {best['epoch']}).")
                break
        else:
            print(f"epoch {epoch}: loss {np.mean(losses):.4f}")

    if val_pairs:
        # held-out selection: save the best-val head, not the last one
        tparams = best["params"]
        print(f"best val-loss {best['val']:.4f} at epoch {best['epoch']}")
    out_fp = args.out or os.path.join(args.workdir, "models", "spotting_head.npz")
    save_spotting_checkpoint(out_fp, tparams, classes=classes)
    print(f"Saved temporal head: {out_fp}")
    print("Operation completed")
    return 0


def cmd_serve(args) -> int:
    """Launch the long-lived HTTP service (serve.py): /summarize, /healthz,
    and — with ``--spot`` — /spot.  The trunk checkpoint loads ONCE
    (npz/orbax auto-detected like infer/spot); jit caches stay warm across
    requests; ``--batch`` adds cross-request dynamic batching.
    """
    import jax

    from cvml_goalnet_tpu.serve import DynamicBatcher, Spotter, Summarizer, serve_http
    from cvml_goalnet_tpu.train.checkpoint import CheckpointMismatchError
    from cvml_goalnet_tpu.train.state import create_train_state

    cfg = _apply_temporal_overrides(_load_cfg(args), args)
    paths = _artifact_paths(args.workdir, cfg.model.audio_included)
    state = create_train_state(jax.random.PRNGKey(cfg.train.seed), cfg)
    try:
        state = _load_trunk(paths, state, args, tags=("opt", "ckp"))
    except FileNotFoundError:
        print("W: no trained importance checkpoint; serving a random-init trunk")
    except CheckpointMismatchError as e:
        print(f"E: {e}", file=sys.stderr)
        return 2

    def trunk_reloader():
        # POST /reload → re-run the SAME npz/orbax auto-detecting load the
        # server booted with (never a request-supplied path).  Also makes a
        # random-init boot upgradeable: once a training job writes the first
        # opt_*, /reload picks it up.
        template = create_train_state(jax.random.PRNGKey(cfg.train.seed), cfg)
        return _load_trunk(paths, template, args, tags=("opt", "ckp"))

    mesh = None
    if getattr(args, "dp", 0):
        from cvml_goalnet_tpu.parallel.serving import serving_mesh

        try:
            mesh = serving_mesh(None if args.dp == -1 else args.dp)
        except ValueError as e:
            print(f"E: {e}", file=sys.stderr)
            return 2
    summarizer = Summarizer(cfg, state=state, reloader=trunk_reloader, mesh=mesh)
    batcher = DynamicBatcher(summarizer) if args.batch else None
    spotter = None
    if args.spot:
        classes = args.classes.split(",") if getattr(args, "classes", None) else None
        if not args.temporal_checkpoint:
            print("W: /spot will use a random-init temporal head "
                  "(pass --temporal-checkpoint)")
        try:
            spotter = Spotter(
                cfg, state=state,
                temporal_checkpoint=args.temporal_checkpoint, classes=classes,
                reloader=trunk_reloader, mesh=mesh,
            )
        except (ValueError, OSError, zipfile.BadZipFile) as e:
            # OSError covers a missing/unreadable --temporal-checkpoint path,
            # BadZipFile a corrupt npz — config errors, not tracebacks
            print(f"E: {e}", file=sys.stderr)
            return 2

    if args.warmup:
        summarizer.warmup()
        if batcher is not None:
            batcher.warmup()
        if spotter is not None:
            spotter.warmup()

    try:
        server = serve_http(summarizer, args.host, args.port,
                            media_root=args.media_root, batcher=batcher,
                            spotter=spotter)
    except ValueError as e:  # non-loopback host without media_root
        print(f"E: {e}", file=sys.stderr)
        return 2
    print(f"serving on http://{args.host}:{server.server_address[1]}"
          f" (spot={'on' if spotter else 'off'},"
          f" batch={'on' if batcher else 'off'},"
          f" dp={mesh.size if mesh is not None else 'off'})", flush=True)
    if args.max_requests:
        # handle_request() returns right after DISPATCHING to a handler
        # thread; ThreadingHTTPServer marks handlers daemon, and daemon
        # threads are excluded from the server's join-on-close registry —
        # the process would exit mid-response on the final request.  Non-
        # daemon handlers are tracked, so server_close() joins them and the
        # last response is written before we return.
        server.daemon_threads = False
        try:
            for _ in range(args.max_requests):
                server.handle_request()
        finally:
            # nested so a server_close() failure cannot leak the batcher
            # worker (advisor r4, low)
            try:
                server.server_close()
            finally:
                if batcher is not None:
                    batcher.close()
    else:  # pragma: no cover - interactive mode
        try:
            server.serve_forever()
        finally:
            if batcher is not None:
                batcher.close()
    return 0


def cmd_import_torch(args) -> int:
    """Import a reference-format PyTorch checkpoint as our npz checkpoint.

    Makes the inbound migration path (``compat.torch_import``) a first-class
    CLI journey: ``goalnet import-torch opt_model.pt`` writes
    ``models/importance*/{opt,ckp}_state.npz`` so ``infer``/``spot``/``serve``
    find the weights with no further flags.  The reference writes these
    files with ``torch.save(model.state_dict())`` (``main.py:263,282``).
    """
    from cvml_goalnet_tpu.compat import import_reference_state_dict
    from cvml_goalnet_tpu.train.checkpoint import save_checkpoint
    from cvml_goalnet_tpu.train.optim import adam_init
    from cvml_goalnet_tpu.train.state import TrainState

    try:
        import torch
    except ImportError:
        print("E: import-torch needs torch installed to read .pt files",
              file=sys.stderr)
        return 2

    cfg = _load_cfg(args)
    paths = _artifact_paths(args.workdir, cfg.model.audio_included)
    sd = torch.load(args.pt_file, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    try:
        params, model_state = import_reference_state_dict(
            sd, cfg.model, cfg.preprocess, cfg.audio)
    except (ValueError, KeyError) as e:
        print(f"E: {e}", file=sys.stderr)
        return 2
    state = TrainState(params=params, model_state=model_state,
                       opt_state=adam_init(params), epoch=0)
    for tag in (args.tag,) if args.tag else ("opt", "ckp"):
        save_checkpoint(paths["ckp_dir"], state, cfg, tag=tag)
    print(f"Imported {args.pt_file} -> {paths['ckp_dir']}")
    print("Operation completed")
    return 0


def cmd_export_torch(args) -> int:
    """Export our trained checkpoint as a reference-format PyTorch ``.pt``.

    The outbound migration path (``compat.export_reference_state_dict``):
    the produced file loads into the reference's own
    ``AVM.load_state_dict`` (``main.py:65-66,326``) — locked live in
    ``tests/test_reference_ab.py::TestExportToLiveReference``.
    """
    import jax

    from cvml_goalnet_tpu.compat import export_reference_state_dict
    from cvml_goalnet_tpu.train.checkpoint import CheckpointMismatchError
    from cvml_goalnet_tpu.train.state import create_train_state

    try:
        import torch
    except ImportError:
        print("E: export-torch needs torch installed to write .pt files",
              file=sys.stderr)
        return 2

    cfg = _load_cfg(args)
    paths = _artifact_paths(args.workdir, cfg.model.audio_included)
    state = create_train_state(jax.random.PRNGKey(cfg.train.seed), cfg)
    tags = (args.tag,) if args.tag else ("opt", "ckp")
    try:
        state = _load_trunk(paths, state, args, tags=tags)
    except (FileNotFoundError, CheckpointMismatchError) as e:
        print(f"E: {e}", file=sys.stderr)
        return 2
    try:
        sd = export_reference_state_dict(
            state.params, state.model_state, cfg.model, cfg.preprocess, cfg.audio)
    except ValueError as e:  # e.g. MoE fusion head
        print(f"E: {e}", file=sys.stderr)
        return 2
    os.makedirs(os.path.dirname(os.path.abspath(args.out_pt)), exist_ok=True)
    torch.save({k: torch.as_tensor(v) for k, v in sd.items()}, args.out_pt)
    print(f"Exported {paths['ckp_dir']} -> {args.out_pt}")
    print("Operation completed")
    return 0


def cmd_eval(args) -> int:
    """Evaluate a trained checkpoint on a dataset — no training.

    The reference can only evaluate inside ``--train``'s initial pass
    (``main.py:82-146``); this verb is the standalone journey: build the
    same train/val split, load the opt (or rolling) checkpoint with the
    npz/orbax auto-detection infer uses, and print eval-mode loss/F-scores
    per split.  Fails hard rather than scoring a random trunk.
    """
    import jax

    from cvml_goalnet_tpu.data.dataset import build_datasets
    from cvml_goalnet_tpu.train.checkpoint import CheckpointMismatchError
    from cvml_goalnet_tpu.train.loop import evaluate_dataset
    from cvml_goalnet_tpu.train.state import create_train_state

    cfg = _load_cfg(args)
    data = _resolve_data(args)
    paths = _artifact_paths(args.workdir, cfg.model.audio_included)

    train_ds, val_ds = build_datasets(
        data["videos"], cfg, data["annotation_fp"], data["mat_fp"], data["h5_fp"],
        data["info_fp"], audio_included=cfg.model.audio_included,
    )
    state = create_train_state(jax.random.PRNGKey(cfg.train.seed), cfg)
    try:
        state = _load_trunk(paths, state, args)
    except FileNotFoundError as e:
        print(f"E: {e}", file=sys.stderr)
        return 2
    except CheckpointMismatchError as e:
        print(f"E: {e}\nE: pass the matching --config/--no-audio/"
              "--commentary combination", file=sys.stderr)
        return 2

    for name, ds in (("train", train_ds), ("val", val_ds)):
        res = evaluate_dataset(state, ds, cfg)
        if res is None:
            print(f"[eval] {name:5s} - (empty split)")
        else:
            print(f"[eval] {name:5s} - loss: {res[0]:.4f} - "
                  f"F-avg: {res[1]:.4f} - F-max: {res[2]:.4f}")
    print("Operation completed")
    return 0



def cmd_baseline(args) -> int:
    from cvml_goalnet_tpu.baseline import run_random_baseline

    cfg = _load_cfg(args)
    data = _resolve_data(args)
    report = run_random_baseline(
        cfg, data["videos"], data["annotation_fp"], data["mat_fp"], data["h5_fp"],
        n_samples=args.samples,
    )
    for k, v in report.items():
        print(f"{k}: {v:.4f}")
    return 0


def main(argv=None) -> int:
    from cvml_goalnet_tpu.utils import apply_platform_override

    apply_platform_override()
    parser = argparse.ArgumentParser(prog="goalnet", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="train the importance model")
    _add_data_args(p)
    p.add_argument("--no-audio", action="store_true")
    p.add_argument("--commentary", action="store_true",
                   help="enable the text branch (reads <video>.commentary.jsonl sidecars)")
    p.add_argument("--checkpoint", action="store_true", help="resume from rolling ckp")
    p.add_argument("--checkpoint-backend", choices=["npz", "orbax"], default="npz",
                   help="npz (portable default) or orbax (sharded-aware "
                        "save/restore for multi-chip jobs)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--dp", action="store_true", help="mesh data-parallel training")
    p.add_argument("--global-batch", type=int, default=None)
    p.add_argument("--moe-experts", type=int, default=None,
                   help="swap the first fusion hidden layer for a top-k "
                        "gated mixture of this many experts (models/moe.py)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("profile", help="per-stage wall-clock profile of the "
                                       "summarize pipeline on one video")
    _add_data_args(p)
    p.add_argument("video")
    p.add_argument("--no-audio", action="store_true")
    p.add_argument("--commentary", action="store_true",
                   help="enable the text branch (reads <video>.commentary.jsonl)")
    p.add_argument("--checkpoint-backend", choices=["npz", "orbax"], default=None,
                   help="pin the checkpoint layout (default: auto-detect)")
    p.add_argument("--moe-experts", type=int, default=None,
                   help="match a trunk trained with --moe-experts N")
    p.add_argument("--repeats", type=int, default=3,
                   help="timed passes; the first carries jit compiles and is "
                        "reported separately when repeats > 1")
    p.add_argument("--trace-dir", default=None,
                   help="capture a jax.profiler device trace here "
                        "(xprof/tensorboard)")
    p.set_defaults(fn=cmd_profile)

    p = sub.add_parser("eval", help="evaluate a trained checkpoint (no training)")
    _add_data_args(p)
    p.add_argument("--no-audio", action="store_true")
    p.add_argument("--commentary", action="store_true",
                   help="the checkpoint was trained with the text branch")
    p.add_argument("--checkpoint-backend", choices=["npz", "orbax"], default=None,
                   help="pin the checkpoint layout (default: auto-detect)")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("infer", help="summarize one video")
    _add_data_args(p)
    p.add_argument("video")
    p.add_argument("--no-audio", action="store_true")
    p.add_argument("--commentary", action="store_true",
                   help="enable the text branch (reads <video>.commentary.jsonl sidecars)")
    p.add_argument("--checkpoint-backend", choices=["npz", "orbax"], default=None,
                   help="pin the checkpoint layout (default: auto-detect)")
    p.add_argument("--moe-experts", type=int, default=None,
                   help="match a trunk trained with --moe-experts N")
    p.add_argument("--stream", action="store_true",
                   help="bounded-memory summarization: chunked decode → "
                        "streaming device scoring → knapsack → single-pass "
                        "masked export (visual-only trunks)")
    p.add_argument("--stream-chunk", type=int, default=256,
                   help="condensed frames per chunk in --stream mode")
    p.add_argument("--host-preprocess", action="store_true",
                   help="--stream: normalize+resize on the host and ship "
                        "small frames (the right trade on tunnel links)")
    p.add_argument("--transfer-dtype", choices=["float16", "uint8"],
                   default=None,
                   help="--stream + --host-preprocess: quantize the H2D "
                        "transfer (uint8 = 4x less traffic, drift <= 1/510)")
    p.add_argument("--follow", action="store_true",
                   help="--stream: VIDEO is a LIVE segment DIRECTORY still "
                        "being written (data/follow.py protocol) — scores "
                        "stream during the footage; the knapsack + export "
                        "run at the END sentinel")
    p.add_argument("--follow-timeout", type=float, default=60.0,
                   help="--follow: seconds without a new segment or "
                        "sentinel before failing loudly")
    p.add_argument("--follow-poll", type=float, default=0.25,
                   help="--follow: directory poll interval in seconds")
    p.add_argument("--follow-end", default="END",
                   help="--follow: end-of-stream sentinel filename")
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("spot", help="temporal event spotting over one video")
    _add_data_args(p)
    p.add_argument("video")
    p.add_argument("--no-audio", action="store_true")
    p.add_argument("--commentary", action="store_true",
                   help="3-modality trunk (trained with train --commentary); "
                        "reads <video>.commentary.jsonl sidecars")
    p.add_argument("--temporal-checkpoint", default=None)
    p.add_argument("--temporal-model", choices=["gru", "transformer", "hybrid"], default=None)
    p.add_argument("--attn-window", type=int, default=None,
                   help="transformer attention band radius in condensed frames "
                        "(sliding-window flash kernel; 0/default = full attention)")
    p.add_argument("--heads", type=int, default=None,
                   help="override temporal_num_heads (must match the trained head)")
    p.add_argument("--classes", default=None,
                   help="comma-separated event classes (goal,card,...) for "
                        "multi-class spotting; requires a head trained with "
                        "the same classes")
    p.add_argument("--peak-window", type=int, default=5)
    p.add_argument("--peak-threshold", type=float, default=0.0)
    p.add_argument("--stream", action="store_true",
                   help="LIVE bounded-latency spotting: decode in chunks and "
                        "emit each event as a jsonl line the moment it is "
                        "final (GRU or banded-transformer scorer)")
    p.add_argument("--stream-chunk", type=int, default=256,
                   help="condensed frames per decoded chunk in --stream mode")
    p.add_argument("--stream-halo", type=int, default=64,
                   help="right-context frames an emission waits for "
                        "(--stream; bounds the streamed-vs-offline drift for "
                        "the GRU; the banded transformer raises it to its "
                        "layers*window exactness floor)")
    p.add_argument("--follow", action="store_true",
                   help="--stream: VIDEO is a LIVE segment DIRECTORY still "
                        "being written (finalized lexicographic segments, "
                        ".part scratch names, END sentinel — data/follow.py);"
                        " audio trunks stream here via per-segment .wav "
                        "sidecars")
    p.add_argument("--follow-timeout", type=float, default=60.0,
                   help="--follow: seconds without a new segment or sentinel "
                        "before failing loudly")
    p.add_argument("--follow-poll", type=float, default=0.25,
                   help="--follow: directory poll interval in seconds")
    p.add_argument("--follow-end", default="END",
                   help="--follow: end-of-stream sentinel filename")
    p.add_argument("--eval-events", action="store_true",
                   help="evaluate vs <video>.events.json (tolerance P/R + average-mAP)")
    p.add_argument("--eval-tolerance", type=int, default=5,
                   help="matching tolerance in condensed frames")
    p.add_argument("--checkpoint-backend", choices=["npz", "orbax"], default=None,
                   help="pin the trunk checkpoint layout (default: auto-detect)")
    p.add_argument("--moe-experts", type=int, default=None,
                   help="match a trunk trained with --moe-experts N")
    p.set_defaults(fn=cmd_spot)

    p = sub.add_parser("spot-train", help="train the temporal spotting head on event labels")
    _add_data_args(p)
    p.add_argument("--no-audio", action="store_true")
    p.add_argument("--commentary", action="store_true",
                   help="3-modality trunk (trained with train --commentary); "
                        "reads <video>.commentary.jsonl sidecars")
    p.add_argument("--temporal-model", choices=["gru", "transformer", "hybrid"], default=None)
    p.add_argument("--attn-window", type=int, default=None,
                   help="transformer attention band radius in condensed frames")
    p.add_argument("--cp", action="store_true",
                   help="context-parallel training: shard each timeline over "
                        "all devices (transformer scorer only; ring attention, "
                        "or halo exchange with --attn-window)")
    p.add_argument("--dp-timelines", type=int, default=1, metavar="N",
                   help="with --cp: compose DP×CP — batch N timelines over a "
                        "'data' mesh axis while time shards over the remaining "
                        "'ctx' axis (N must divide the device count)")
    p.add_argument("--tp", type=int, default=1, metavar="N",
                   help="with --cp: split attention heads + MLP N-way over a "
                        "'model' mesh axis (Megatron column/row) on top of "
                        "DP×CP — the full 3-D DP×TP×CP layout; N must divide "
                        "the head count (--heads) and, with --dp-timelines, "
                        "the device count")
    p.add_argument("--pp", type=int, default=1, metavar="N",
                   help="pipeline-parallel training (GPipe): shard the "
                        "transformer's blocks one-stage-per-device over N "
                        "devices; N must divide temporal_num_layers; needs "
                        "equal-length timelines; exclusive with --cp")
    p.add_argument("--heads", type=int, default=None,
                   help="override temporal_num_heads for the transformer scorer")
    p.add_argument("--classes", default=None,
                   help="comma-separated event classes (goal,card,...) — "
                        "trains a multi-class head from labelled sidecars")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--pos-weight", type=float, default=10.0)
    p.add_argument("--val-videos", nargs="*", default=None,
                   help="held-out videos (with .events.json sidecars): "
                        "per-epoch val loss, best-val head selection; any "
                        "path also in --videos is removed from training")
    p.add_argument("--early-stop", type=int, default=0, metavar="N",
                   help="stop after N epochs without val-loss improvement "
                        "(needs --val-videos); 0 = off")
    p.add_argument("--peak-window", type=int, default=5,
                   help="val-mAP peak detection window (match the value "
                        "`goalnet spot` will deploy with)")
    p.add_argument("--peak-threshold", type=float, default=0.0,
                   help="val-mAP peak detection threshold on the logit scores")
    p.add_argument("--out", default=None, help="output npz for the temporal head")
    p.add_argument("--checkpoint-backend", choices=["npz", "orbax"], default=None,
                   help="pin the trunk checkpoint layout (default: auto-detect)")
    p.add_argument("--moe-experts", type=int, default=None,
                   help="match a trunk trained with --moe-experts N")
    p.set_defaults(fn=cmd_spot_train)

    p = sub.add_parser("serve", help="HTTP serving: /summarize, /healthz (+ /spot)")
    p.add_argument("--config", default=None, help="PipelineConfig JSON path")
    p.add_argument("--workdir", default=".", help="artifact root with models/")
    p.add_argument("--no-audio", action="store_true")
    p.add_argument("--commentary", action="store_true")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8765, help="0 = OS-assigned")
    p.add_argument("--media-root", default=None,
                   help="confine requested video paths to this directory "
                        "(REQUIRED for non-loopback --host)")
    p.add_argument("--batch", action="store_true",
                   help="cross-request dynamic batching (serve.DynamicBatcher)")
    p.add_argument("--dp", type=int, default=0, metavar="N",
                   help="shard /summarize scoring AND the /spot timeline "
                        "encode data-parallel over N local devices (-1 = "
                        "all); composes with --batch")
    p.add_argument("--spot", action="store_true",
                   help="also serve POST /spot (event spotting)")
    p.add_argument("--temporal-checkpoint", default=None,
                   help="spot-train head npz for /spot")
    p.add_argument("--temporal-model", choices=["gru", "transformer", "hybrid"], default=None)
    p.add_argument("--attn-window", type=int, default=None)
    p.add_argument("--classes", default=None,
                   help="comma-separated event classes for /spot")
    p.add_argument("--checkpoint-backend", choices=["npz", "orbax"], default=None,
                   help="pin the trunk checkpoint layout (default: auto-detect)")
    p.add_argument("--warmup", action="store_true",
                   help="compile production shapes before accepting requests")
    p.add_argument("--max-requests", type=int, default=0,
                   help="serve N requests then exit (0 = forever)")
    p.add_argument("--moe-experts", type=int, default=None,
                   help="match a trunk trained with --moe-experts N")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("import-torch",
                       help="import a reference-format .pt as our checkpoint")
    p.add_argument("pt_file")
    p.add_argument("--config", default=None, help="PipelineConfig JSON path")
    p.add_argument("--workdir", default=".", help="artifact root (models/)")
    p.add_argument("--no-audio", action="store_true",
                   help="the .pt is a no-audio (VM) checkpoint")
    p.add_argument("--tag", choices=["opt", "ckp"], default=None,
                   help="write only this tag (default: both)")
    p.set_defaults(fn=cmd_import_torch)

    p = sub.add_parser("export-torch",
                       help="export our checkpoint as a reference-format .pt")
    p.add_argument("out_pt")
    p.add_argument("--config", default=None, help="PipelineConfig JSON path")
    p.add_argument("--workdir", default=".", help="artifact root (models/)")
    p.add_argument("--no-audio", action="store_true")
    p.add_argument("--tag", choices=["opt", "ckp"], default=None,
                   help="export this tag (default: opt, falling back to ckp)")
    p.add_argument("--checkpoint-backend", choices=["npz", "orbax"], default=None,
                   help="pin the checkpoint layout (default: auto-detect)")
    p.set_defaults(fn=cmd_export_torch)

    p = sub.add_parser("baseline", help="random-init chance baseline")
    _add_data_args(p)
    p.add_argument("--no-audio", action="store_true")
    p.add_argument("--samples", type=int, default=10)
    p.set_defaults(fn=cmd_baseline)

    args = parser.parse_args(argv)
    try:
        return args.fn(args)
    except FileNotFoundError as e:
        print(f"E: file not found: {e.filename or e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(main())
