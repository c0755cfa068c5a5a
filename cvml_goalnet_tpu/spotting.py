"""Temporal event spotting over long timelines (new capability).

The reference scores frames independently (report §1: "exactly one frame at a
time") and has no temporal model.  BASELINE.json's north star adds
"temporal goal-event spotting and highlight selection … a scan-based XLA pass
so a full 90-minute match is scored in one device program".  This module is
that layer:

* :func:`encode_timeline` — run the AVM trunk (visual ‖ audio encoders,
  no fusion head) over all frames → (T, D) per-frame features;
* :func:`score_timeline` — bidirectional-GRU ``lax.scan`` pass → (T,) event
  scores, one device program for the whole timeline;
* :func:`score_timeline_chunked` — the long-context answer: the timeline is
  split into overlapping chunks scored in parallel (vmap over the chunk axis,
  shardable over the mesh ``"data"`` axis); halos absorb boundary effects and
  are discarded.  The reference has no sequence parallelism to mirror
  (SURVEY.md §2.3) — chunk+halo is the scan-native equivalent;
* :func:`spot_events` — static-shape peak detection → event timestamps
  (host-side ``nonzero``, by design);
* :func:`summarize_match` — spotting scores → knapsack highlight selection,
  reusing the same ``summarize`` contract as the frame-importance path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.config import KnapsackConfig, PipelineConfig
from cvml_goalnet_tpu.models.audio import audio_encoder_apply
from cvml_goalnet_tpu.models.temporal import detect_peaks, temporal_scorer_apply
from cvml_goalnet_tpu.pipeline import SummaryResult, summarize


def trunk_fn(cfg_model):
    """The raw (unjitted) timeline-encode function for ``cfg_model``:
    ``trunk(params, state, visual, audio, text) -> (T, D) features``.

    Exposed separately from :func:`_jitted_trunk` so alternative compilation
    wrappers share ONE definition of the trunk math — the DP-serving path
    (``parallel.serving.make_dp_encode``) jits this same function with GSPMD
    frame-axis shardings; duplicating it there would let the two programs
    drift."""
    # dispatch the visual backbone the way avm_apply does (_visual_init) —
    # hardcoding visual_encoder_apply crashed every spotting entry point for
    # vis_backbone="resnet" checkpoints (round-3 review); every family has
    # an int8 path since round 4, so quant flows to all of them
    from cvml_goalnet_tpu.models.avm import _visual_init

    _, vis_apply = _visual_init(cfg_model)
    vis_kw = {"quant": cfg_model.quantized_inference}  # int8 MXU (ops/quant.py)

    def trunk(params, state, visual, audio, text):
        feats, _ = vis_apply(
            params["visual"], state["visual"], visual,
            train=False, rng=jax.random.PRNGKey(0), dropout_rate=0.0,
            **vis_kw,
        )
        if cfg_model.audio_included and audio is not None:
            a = audio_encoder_apply(params["audio"], audio)
            feats = jnp.concatenate([a, feats], axis=-1)
        if cfg_model.text_included:
            # concat order mirrors avm_apply: [audio ‖ visual ‖ text]
            from cvml_goalnet_tpu.models.text import text_encoder_apply

            t = text_encoder_apply(params["text"], text, cfg=cfg_model)
            feats = jnp.concatenate([feats, t], axis=-1)
        return feats

    return trunk


@lru_cache(maxsize=8)
def _jitted_trunk(cfg_model):
    return jax.jit(trunk_fn(cfg_model), static_argnames=())


def encode_timeline(params, state, visual, audio, cfg: PipelineConfig,
                    text=None) -> jax.Array:
    """(T, h, w, C) frames (+ audio, + commentary tokens) → (T, D) fused
    per-frame features.

    ``text``: (T, text_max_len) token ids, REQUIRED when
    ``cfg.model.text_included`` — a 3-modality trunk's fusion input width
    includes the text features, so silently substituting zeros would score
    with garbage in those dimensions.
    """
    if cfg.model.text_included and text is None:
        raise ValueError(
            "cfg.model.text_included=True but encode_timeline got no text "
            "tokens — pass the commentary tokens (VideoItem.text / "
            "data.text.tokenize) or use a trunk trained without --commentary"
        )
    if not cfg.model.text_included:
        text = None
    return _jitted_trunk(cfg.model)(params, state, visual, audio, text)


def score_timeline(temporal_params, features, hidden: int) -> jax.Array:
    """(T, D) features → (T,) event scores in one scan pass."""
    return temporal_scorer_apply(temporal_params, features, hidden)


def head_out_dim(temporal_params) -> int:
    """Output arity (class count) of a temporal head, any scorer family —
    the hybrid nests its scoring head under ``"transformer"``."""
    p = temporal_params.get("transformer", temporal_params)
    return int(p["head"]["w"].shape[-1])


def temporal_head_init_auto(key, in_dim: int, mc, n_classes: int = 1):
    """Init the temporal head for ``mc.temporal_model`` ∈ {"gru",
    "transformer", "hybrid"} — the ONE construction rule every entry point
    (CLI spot/spot-train, serve.Spotter) shares, so a checkpoint trained by
    one loads structurally into all of them."""
    if mc.temporal_model == "transformer":
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_init,
        )

        return temporal_transformer_init(
            key, in_dim, model_dim=mc.temporal_hidden,
            num_layers=mc.temporal_num_layers, num_heads=mc.temporal_num_heads,
            max_len=mc.temporal_max_len, n_classes=n_classes,
            pos_encoding=mc.temporal_pos_encoding,
        )
    if mc.temporal_model == "hybrid":
        from cvml_goalnet_tpu.models.temporal_hybrid import temporal_hybrid_init

        return temporal_hybrid_init(
            key, in_dim, mc.temporal_hidden, model_dim=mc.temporal_hidden,
            num_layers=mc.temporal_num_layers, num_heads=mc.temporal_num_heads,
            max_len=mc.temporal_max_len, n_classes=n_classes,
            pos_encoding=mc.temporal_pos_encoding,
        )
    if mc.temporal_model != "gru":
        raise ValueError(
            f"unknown temporal_model {mc.temporal_model!r} — expected 'gru', "
            "'transformer', or 'hybrid'")
    from cvml_goalnet_tpu.models.temporal import temporal_scorer_init

    return temporal_scorer_init(key, in_dim, mc.temporal_hidden,
                                n_classes=n_classes)


def score_timeline_auto(temporal_params, features, cfg: PipelineConfig) -> jax.Array:
    """Dispatch on ``ModelConfig.temporal_model``: GRU scan, transformer, or
    the GRU-augmented hybrid (``models/temporal_hybrid``).

    The attention paths use the flash-attention Pallas kernel on TPU and
    the XLA reference attention elsewhere.  GRU timelines longer than
    ``temporal_chunk_threshold`` run chunked+halo (the measured 14×-faster
    public path, tolerance ≤2e-2 at interior chunk borders vs the monolithic
    scan — docs/BENCHMARKS.md); set the threshold to 0 for always-exact
    monolithic scoring.  The hybrid always scores monolithically here (its
    scan + banded attention are one fused program; chunked hybrid scoring is
    the sharded/streaming path's job, with the GRU's decay class).
    """
    mc = cfg.model
    use_flash = jax.default_backend() not in ("cpu",)
    if mc.temporal_model == "transformer":
        from cvml_goalnet_tpu.models.temporal_attention import temporal_transformer_apply

        return temporal_transformer_apply(
            temporal_params, features, mc.temporal_num_heads, use_flash,
            window=mc.temporal_window,
        )
    if mc.temporal_model == "hybrid":
        from cvml_goalnet_tpu.models.temporal_hybrid import temporal_hybrid_apply

        return temporal_hybrid_apply(
            temporal_params, features, mc.temporal_hidden,
            mc.temporal_num_heads, use_flash, False, mc.temporal_window,
        )
    t = features.shape[0]
    if mc.temporal_chunk_threshold and t > mc.temporal_chunk_threshold:
        return score_timeline_chunked(
            temporal_params, features, mc.temporal_hidden,
            mc.temporal_chunk, mc.temporal_halo,
        )
    return temporal_scorer_apply(temporal_params, features, mc.temporal_hidden)


@partial(jax.jit, static_argnums=(2, 3, 4))
def score_timeline_chunked(
    temporal_params,
    features: jax.Array,
    hidden: int,
    chunk: int = 512,
    overlap: int = 64,
) -> jax.Array:
    """Chunked+halo scoring: parallel over chunks, shardable over the mesh.

    Each chunk of ``chunk`` frames is scored with up to ``overlap`` frames of
    REAL context on both sides (windows are clamped into the timeline, never
    zero-padded, so the first/last chunks agree exactly with the monolithic
    scan at the timeline boundaries); halo scores are discarded.  Interior
    chunk borders agree up to GRU state decay across the halo.
    """
    t, d = features.shape
    window = chunk + 2 * overlap
    if t <= window:
        return temporal_scorer_apply(temporal_params, features, hidden)

    # single-class heads emit (T,); multi-class (goal/card/…) emit (T, C) —
    # the head's output arity is static from its params
    n_out = int(temporal_params["head"]["w"].shape[-1])
    n_chunks = -(-t // chunk)
    chunk_starts = jnp.arange(n_chunks) * chunk
    win_starts = jnp.clip(chunk_starts - overlap, 0, t - window)
    keep_offsets = chunk_starts - win_starts

    def one(win_start, keep_off):
        sl = jax.lax.dynamic_slice(features, (win_start, 0), (window, d))
        s = temporal_scorer_apply(temporal_params, sl, hidden)
        s = s[:, None] if s.ndim == 1 else s
        # static-size keep-slice; the final chunk's tail garbage is trimmed below
        s_ext = jnp.concatenate([s, jnp.zeros((chunk, n_out), s.dtype)])
        return jax.lax.dynamic_slice(s_ext, (keep_off, 0), (chunk, n_out))

    scores = jax.vmap(one)(win_starts, keep_offsets).reshape(-1, n_out)[:t]
    return scores[:, 0] if n_out == 1 else scores


def score_timeline_sharded(
    temporal_params,
    features: jax.Array,          # (T, D)
    mesh,
    cfg: PipelineConfig,
    axis: str = "data",
) -> jax.Array:
    """Context-parallel timeline scoring over a device mesh.

    The timeline shards over the mesh ``axis``; transformer blocks run inside
    one ``shard_map`` with ring attention (exact — equal to the monolithic
    scorer ≤1e-4), GRU and hybrid timelines use the chunked+halo formulation
    with chunks laid out along the mesh axis (halo-decay accuracy class at
    interior chunk borders — the hybrid's GRU scan starts from zero state at
    each window edge, exactly like the plain GRU's chunked path).  This is
    the reachable entry point for SP/CP: ``__graft_entry__.dryrun_multichip``
    exercises it on every run.
    """
    mc = cfg.model
    if mc.temporal_model == "transformer":
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_sharded_apply,
        )

        # flash ring hops on real accelerators: O(T_local·d) per device
        # instead of the XLA block's O(T_local²) score matrix; with a band
        # (temporal_window > 0) the ring collapses to one halo hop per
        # neighbor (parallel/halo_attention)
        use_flash = jax.default_backend() not in ("cpu",)
        return temporal_transformer_sharded_apply(
            temporal_params, features, mesh, mc.temporal_num_heads, axis,
            use_flash=use_flash, window=mc.temporal_window,
        )
    # GRU/hybrid: chunk+halo windows EXPLICITLY sharded over the mesh axis
    # via shard_map — each device scores its own slice of the chunk list
    # against the replicated features.  (A replicated jit with no constraints
    # let GSPMD run every chunk on every device: correct results, zero
    # speedup — round-3 review.)
    t, d = features.shape
    window = mc.temporal_chunk + 2 * mc.temporal_halo
    n_out = head_out_dim(temporal_params)
    if t <= window:
        return score_timeline_auto(temporal_params, features, cfg)
    fn = _sharded_chunk_fn(
        mesh, axis, mc.temporal_hidden, mc.temporal_chunk, mc.temporal_halo,
        t, n_out, mc.temporal_model, mc.temporal_num_heads, mc.temporal_window,
    )
    scores = fn(temporal_params, features)
    return scores[:, 0] if n_out == 1 else scores


@lru_cache(maxsize=8)
def _sharded_chunk_fn(mesh, axis: str, hidden: int, chunk: int,
                      overlap: int, t: int, n_out: int,
                      scorer: str = "gru", num_heads: int = 1,
                      attn_window: int = 0):
    """Build + cache the shard_map'd chunked window scorer for one (mesh, T).

    ``scorer``: "gru" (scan) or "hybrid" (GRU-augmented banded transformer —
    each window scores with ``temporal_hybrid_apply``; rotary positions are
    relative so window placement needs no offset, and learned positions use
    the same window-local indexing as the single-device chunked oracle).

    Chunk starts pad to a multiple of the mesh axis so every device owns an
    equal slice; pad chunks produce garbage rows past ``t`` that the final
    trim discards (same clamped-window math as ``score_timeline_chunked``,
    which stays the single-device oracle the parity test pins against).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    window = chunk + 2 * overlap
    n_dev = mesh.shape[axis]
    n_chunks = -(-t // chunk)
    n_pad = -(-n_chunks // n_dev) * n_dev
    starts = np.arange(n_pad) * chunk
    win_starts = jnp.asarray(np.clip(starts - overlap, 0, t - window))
    keep_offsets = jnp.asarray(
        np.clip(starts - np.clip(starts - overlap, 0, t - window), 0, window + chunk))

    if scorer == "hybrid":
        from cvml_goalnet_tpu.models.temporal_hybrid import temporal_hybrid_apply

        use_flash = jax.default_backend() not in ("cpu",)

        def score_one(params, sl):
            return temporal_hybrid_apply(
                params, sl, hidden, num_heads, use_flash, False, attn_window)
    else:
        def score_one(params, sl):
            return temporal_scorer_apply(params, sl, hidden)

    def one(params, features, win_start, keep_off):
        sl = jax.lax.dynamic_slice(features, (win_start, 0), (window, features.shape[1]))
        s = score_one(params, sl)
        s = s[:, None] if s.ndim == 1 else s
        s_ext = jnp.concatenate([s, jnp.zeros((chunk, n_out), s.dtype)])
        return jax.lax.dynamic_slice(s_ext, (keep_off, 0), (chunk, n_out))

    def body(params, features, ws_l, ko_l):
        return jax.vmap(lambda w, k: one(params, features, w, k))(ws_l, ko_l)

    smapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=P(axis, None, None),
        check_rep=False,
    )

    def fn(params, features):
        return smapped(params, features, win_starts, keep_offsets
                       ).reshape(-1, n_out)[:t]

    return jax.jit(fn)


def load_event_labels(
    path: str,
    n_condensed: int,
    skip_frames: int,
    classes: list[str] | tuple[str, ...] | None = None,
) -> np.ndarray:
    """Parse an event sidecar (``<video>.events.json``) → per-frame labels.

    Format: a JSON list of raw frame indices (or of ``{"frame": i}`` /
    ``{"frame": i, "label": "goal"}`` objects, SoccerNet-style).  Each event
    marks the condensed frame containing it (``raw // skip_frames``); events
    beyond the condensed timeline are ignored.  This is the supervision for
    ``goalnet spot-train``.

    With ``classes=None`` → (T,) binary labels (every event counts).
    With ``classes=["goal", "card", ...]`` → (T, C) multi-class labels;
    entries whose ``label`` is missing or not in ``classes`` are dropped.
    """
    import json

    with open(path) as f:
        raw = json.load(f)
    if classes is None:
        labels = np.zeros((n_condensed,), np.float32)
    else:
        labels = np.zeros((n_condensed, len(classes)), np.float32)
        index = {name: i for i, name in enumerate(classes)}
    for e in raw:
        frame = int(e["frame"]) if isinstance(e, dict) else int(e)
        idx = frame // skip_frames
        if not 0 <= idx < n_condensed:
            continue
        if classes is None:
            labels[idx] = 1.0
        else:
            name = e.get("label") if isinstance(e, dict) else None
            if name in index:
                labels[idx, index[name]] = 1.0
    if classes is not None and len(raw) > 0 and labels.sum() == 0:
        import warnings

        warnings.warn(
            f"{path}: {len(raw)} events but NONE matched classes {list(classes)} "
            "(plain frame indices carry no label; use {\"frame\": i, "
            "\"label\": name} entries) — training on these labels would "
            "supervise all-negative",
            stacklevel=2,
        )
    return labels


def scores_to_importance(scores: np.ndarray) -> np.ndarray:
    """Affinely map temporal scores to the [1, 5] importance scale so the
    knapsack stage is shared verbatim with the frame-importance path."""
    scores = np.asarray(scores)
    lo, hi = scores.min(), scores.max()
    return 1.0 + 4.0 * (scores - lo) / max(hi - lo, 1e-7)


def spot_events(scores, window: int = 5, threshold: float = 0.0) -> np.ndarray:
    """Event timestamps (frame indices) from temporal scores."""
    mask = detect_peaks(jnp.asarray(scores), window, threshold)
    return np.nonzero(np.asarray(mask))[0]


def spot_events_multi(scores, window: int = 5, threshold: float = 0.0) -> list[np.ndarray]:
    """(T, C) multi-class scores → per-class event frame-index arrays.

    A (T,) input (one-output-channel head — e.g. ``--classes goal``) is
    treated as C=1."""
    from cvml_goalnet_tpu.models.temporal import detect_peaks_multi

    scores = jnp.asarray(scores)
    if scores.ndim == 1:
        scores = scores[:, None]
    mask = np.asarray(detect_peaks_multi(scores, window, threshold))
    return [np.nonzero(mask[:, c])[0] for c in range(mask.shape[1])]


@dataclass
class MatchSummary:
    events: np.ndarray                # spotted event frame indices
    scores: np.ndarray                # (T,) temporal event scores
    summary: SummaryResult            # knapsack highlight selection


def summarize_match(
    params,
    state,
    temporal_params,
    visual,
    audio,
    clip_intervals,
    cfg: PipelineConfig,
    skip_frames: int | None = None,
    full_n_frames: int | None = None,
    peak_window: int = 5,
    peak_threshold: float = 0.0,
    kcfg: KnapsackConfig | None = None,
    text=None,
) -> MatchSummary:
    """Full spotting pipeline: frames → features → scan scores → highlights.

    Scores are affinely mapped to the [1, 5] importance scale so the knapsack
    stage is shared verbatim with the frame-importance path.
    """
    skip = cfg.preprocess.skip_frames if skip_frames is None else skip_frames
    full_n = len(visual) * skip if full_n_frames is None else full_n_frames
    feats = encode_timeline(params, state, visual, audio, cfg, text=text)
    scores = np.asarray(score_timeline_auto(temporal_params, feats, cfg))
    if scores.ndim != 1:
        raise ValueError(
            "summarize_match expects a single-class temporal head; for "
            "multi-class heads use spot_events_multi + pipeline.summarize "
            "(what `goalnet spot --classes` does)"
        )
    events = spot_events(scores, peak_window, peak_threshold)

    importances = scores_to_importance(scores)
    res = summarize(
        importances, clip_intervals, skip, full_n, kcfg or cfg.knapsack
    )
    return MatchSummary(events=events, scores=scores, summary=res)


@dataclass
class SpotStreamUpdate:
    """One emission from :func:`spot_stream`.

    ``scores``: the newly emitted (k,) or (k, C) condensed-frame scores
    (concatenation over all updates = the full streamed timeline).
    ``events``: event frame indices (global, condensed) that became STABLE
    with this emission — a frame is stable once its full ±peak_window
    neighborhood has been emitted, so every event is final when reported.
    Single-class heads report an array; multi-class a {class_idx: array} dict
    keyed by head channel.
    """

    scores: np.ndarray
    events: "np.ndarray | dict[int, np.ndarray]"


def _stable_new_events(scores: np.ndarray, stable_upto: int, prev_stable: int,
                       window: int, threshold: float):
    """Host peak scan over [prev_stable, stable_upto) of the emitted prefix.

    NumPy (not the jitted ``detect_peaks``): the prefix length grows every
    chunk, and a jit per length would recompile on each emission.  Semantics
    are identical (±window local max AND > threshold).
    """
    lo, hi = prev_stable, stable_upto
    if hi <= lo:
        return np.empty((0,), np.int64)
    out = []
    for i in range(lo, hi):
        a, b = max(0, i - window), min(len(scores), i + window + 1)
        s = scores[i]
        if s > threshold and s >= scores[a:b].max():
            out.append(i)
    return np.asarray(out, np.int64)


def spot_stream(
    params,
    state,
    temporal_params,
    frame_chunks,
    cfg: PipelineConfig,
    *,
    halo: int = 64,
    peak_window: int = 5,
    peak_threshold: float = 0.0,
    audio_chunks=None,
    text_chunks=None,
):
    """Online event spotting over a LIVE stream of frame chunks.

    Bounded-latency spotting for footage still being produced (the offline
    verbs need the whole timeline first): each yielded
    :class:`SpotStreamUpdate` carries scores/events that are FINAL —
    emission of chunk *i*'s scores waits for ``halo`` frames of right
    context (the GRU's backward scan), and an event is reported only once
    its full ±``peak_window`` neighborhood is emitted.  Worst-case decision
    latency = two chunks + ``halo`` + ``peak_window`` condensed frames (the
    first chunk defers until the second arrives; steady state is one chunk
    + ``halo`` + ``peak_window``).

    Scorer dispatch (``cfg.model.temporal_model``):

    * **GRU** — scores [left-halo ‖ chunk ‖ right-halo] windows of REAL
      frames (the same clamped-window construction as
      :func:`score_timeline_chunked`); streamed scores match the monolithic
      offline scan up to GRU state decay across the halo.
    * **banded transformer** (``temporal_window > 0``) — the band gives the
      scorer a FINITE receptive field of ``num_layers · window`` frames, so
      streaming with that halo is EXACT: the streamed scores equal the
      offline monolithic banded scorer (not just up to decay).  ``halo`` is
      raised to that floor if smaller (larger only delays emission; it never
      changes scores).  Learned/rotary positions stay GLOBAL via the
      scorer's ``pos_offset``.  Chunks smaller than the halo simply
      accumulate: an update is yielded whenever ≥1 frame's full receptive
      field is resident (at most one update per input chunk).  Full
      attention (``temporal_window == 0``) has an unbounded receptive field
      — no finite halo can make streamed scores final — and is rejected.

    In both modes the emitted events match ``detect_peaks`` on the streamed
    scores EXACTLY.  Steady state compiles one trunk program per distinct
    chunk shape (fixed-size chunks + one short final chunk = two) and a
    handful of scorer shapes (warmup windows while the left context grows,
    one steady window, final flush).

    **Emission contract** (tested for chunk<halo, chunk>halo, and
    single-chunk streams — ``tests/test_spotting.py::TestSpotStream``):

    * The FIRST chunk never emits on arrival — the stream might end right
      after it, and deferring keeps the single-chunk path monolithic.  A
      stream that turns out to be one chunk therefore yields EXACTLY ONE
      update whose scores equal the offline monolithic scorer's to float
      tolerance (both scorer families).
    * From the second chunk on, an update is emitted whenever more than
      ``halo`` frames are buffered — at most one update per input chunk
      (chunks smaller than the halo accumulate silently).
    * End of stream: one final update flushes any still-buffered frames
      (scored with the retained ``halo`` frames of left context — GRU and
      hybrid accuracy on this tail is halo-decay-bounded, banded-transformer
      exact).  If nothing is buffered (possible when ``halo=0``) but
      frames within ``peak_window`` of the end have unreported events, a
      final update with EMPTY scores delivers them — every stream with
      ≥1 emitted frame ends with a final update.
    * ``halo=0`` is allowed: each emission is scored without retained left
      context (GRU chunks become independent; the banded transformer
      re-derives its exactness floor so 0 never truncates its receptive
      field).  Memory stays bounded by chunk+halo in all modes.

    ``audio_chunks`` / ``text_chunks``: per-chunk modality blocks on the
    SAME boundaries as ``frame_chunks`` (required when the trunk includes
    the modality).
    """
    is_transformer = cfg.model.temporal_model == "transformer"
    is_hybrid = cfg.model.temporal_model == "hybrid"
    if (is_transformer or is_hybrid) and cfg.model.temporal_window <= 0:
        raise ValueError(
            f"spot_stream with the {cfg.model.temporal_model} scorer needs a "
            "banded window (cfg.model.temporal_window > 0): full attention "
            "has an unbounded receptive field, so no finite halo can make "
            "streamed scores final — train/score with a band (spot-train "
            "--attn-window) or spot offline"
        )
    if cfg.model.audio_included and audio_chunks is None:
        # the trunk would otherwise encode WITHOUT the audio dims and the
        # scorer head would fail (or worse, score) on the wrong feature width
        raise ValueError(
            "cfg.model.audio_included=True but spot_stream got no "
            "audio_chunks — yield (k, B, n_mfcc) blocks on the frame-chunk "
            "boundaries, or stream with a trunk trained --no-audio")
    if cfg.model.text_included and text_chunks is None:
        raise ValueError(
            "cfg.model.text_included=True but spot_stream got no "
            "text_chunks — yield (k, text_max_len) token chunks on the "
            "frame-chunk boundaries, or stream with a trunk trained "
            "without --commentary")
    hidden = cfg.model.temporal_hidden
    n_out = head_out_dim(temporal_params)

    audio_iter = iter(audio_chunks) if audio_chunks is not None else None
    text_iter = iter(text_chunks) if text_chunks is not None else None

    def _next_aligned(it, name, k):
        # same loud contract as streaming.score_video_stream: exhaustion
        # would otherwise surface as a PEP-479 RuntimeError and a mismatched
        # boundary as an opaque concat shape error deep inside jit
        try:
            a = next(it)
        except StopIteration:
            raise ValueError(
                f"{name} exhausted before frame_chunks — the stream must "
                "yield one chunk per frame chunk") from None
        if len(a) != k:
            raise ValueError(
                f"{name} chunk has {len(a)} rows but the frame chunk has "
                f"{k} — chunk the modalities on the same boundaries as "
                "frame_chunks")
        return jnp.asarray(a)

    def encode(chunk, k):
        audio = text = None
        if audio_iter is not None:
            audio = _next_aligned(audio_iter, "audio_chunks", k)
        if text_iter is not None:
            text = _next_aligned(text_iter, "text_chunks", k)
        feats = encode_timeline(
            params, state, jnp.asarray(chunk), audio, cfg, text=text)
        return np.asarray(feats)[:k]

    emitted = np.empty((0, n_out), np.float32)
    prev_stable = 0

    def drain(new_scores, final: bool):
        """Append an emission, report newly stable events, yield an update."""
        nonlocal emitted, prev_stable
        emitted = np.concatenate([emitted, new_scores.astype(np.float32)])
        stable_upto = len(emitted) if final else max(0, len(emitted) - peak_window)
        per_class = {
            c: _stable_new_events(emitted[:, c], stable_upto, prev_stable,
                                  peak_window, peak_threshold)
            for c in range(n_out)
        }
        prev_stable = stable_upto
        events = per_class[0] if n_out == 1 else per_class
        sc = new_scores[:, 0] if n_out == 1 else new_scores
        return SpotStreamUpdate(scores=sc, events=events)

    if is_transformer:
        from cvml_goalnet_tpu.models.temporal_attention import (
            temporal_transformer_apply,
        )

        W = cfg.model.temporal_window
        # exactness floor: score at i depends on inputs in i ± num_layers·W
        halo = max(halo, len(temporal_params["layers"]) * W)
        use_flash = jax.default_backend() not in ("cpu",)

        def score_window(feats_np, global_start: int):
            s = np.asarray(temporal_transformer_apply(
                temporal_params, jnp.asarray(feats_np),
                cfg.model.temporal_num_heads, use_flash, False, W,
                global_start))
            return s[:, None] if s.ndim == 1 else s
    elif is_hybrid:
        from cvml_goalnet_tpu.models.temporal_hybrid import temporal_hybrid_apply

        W = cfg.model.temporal_window
        # the attention part keeps its banded receptive field; the GRU scan
        # starting from zero state at the window edge makes streamed scores
        # halo-DECAY accurate (the GRU class), not banded-exact
        halo = max(halo, len(temporal_params["transformer"]["layers"]) * W)
        use_flash = jax.default_backend() not in ("cpu",)

        def score_window(feats_np, global_start: int):
            s = np.asarray(temporal_hybrid_apply(
                temporal_params, jnp.asarray(feats_np), hidden,
                cfg.model.temporal_num_heads, use_flash, False, W,
                global_start))
            return s[:, None] if s.ndim == 1 else s
    else:
        def score_window(feats_np, global_start: int):
            # the GRU is position-free: global_start is irrelevant
            s = np.asarray(temporal_scorer_apply(
                temporal_params, jnp.asarray(feats_np), hidden))
            return s[:, None] if s.ndim == 1 else s

    # One buffered emission loop for both scorers: from the second chunk on,
    # frames are emitted as soon as `halo` frames of right context are
    # resident, however the incoming chunks are sized (chunks smaller than
    # the halo accumulate; a chunk larger than the halo emits most of itself
    # on arrival).  The FIRST chunk always defers — see the emission
    # contract in the docstring (single-chunk streams stay monolithic+exact).
    left = None          # the ≤halo emitted frames preceding `buf`
    buf = None           # encoded features not yet emitted
    emitted_n = 0        # global count of emitted (final) frames
    first = True
    for chunk in frame_chunks:
        feats = encode(chunk, len(chunk))
        buf = feats if buf is None else np.concatenate([buf, feats])
        if left is None:
            left = feats[:0]
        if first:
            first = False
            continue
        emit_n = len(buf) - halo
        if emit_n > 0:
            window = np.concatenate([left, buf])
            s = score_window(window, emitted_n - len(left))
            s = s[len(left):len(left) + emit_n]
            tail = np.concatenate([left, buf[:emit_n]])
            # tail[-0:] would be the WHOLE array — halo=0 keeps no context
            left = tail[len(tail) - halo:] if halo else tail[:0]
            emitted_n += emit_n
            buf = buf[emit_n:]
            yield drain(s, final=False)
    if buf is not None and len(buf):
        window = np.concatenate([left, buf])
        s = score_window(window, emitted_n - len(left))[len(left):]
        yield drain(s, final=True)
    elif emitted_n and prev_stable < len(emitted):
        # halo=0 can leave the buffer empty at end of stream with events
        # inside the trailing peak_window still unreported — deliver them
        yield drain(np.empty((0, n_out), np.float32), final=True)
