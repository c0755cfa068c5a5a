"""Public pipeline entry points: ``extract_features`` → ``fuse`` → ``summarize``.

These are the three public surfaces BASELINE.json demands output parity on,
covering the reference call paths:

* ``extract_features`` ≙ reference preprocessing
  (``extract_condensed_frame_tensor`` ``utils.py:274-292`` +
  ``extract_audio_features`` ``utils.py:313-349``) — raw frames/waveform in,
  model-ready tensors out, all per-frame math on device.
* ``fuse`` ≙ reference ``AVM.forward`` (``utils.py:260-272``) — modality
  features in, per-frame importance scores in [1, 5] out, jitted.
* ``summarize`` ≙ reference ``postprocess`` (``utils.py:606-643``) —
  importance scores in, knapsack keyshot mask/summary out.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.config import KnapsackConfig, PipelineConfig
from cvml_goalnet_tpu.models.avm import avm_apply
from cvml_goalnet_tpu.ops.audio import extract_audio_features
from cvml_goalnet_tpu.ops.clips import clip_stats
from cvml_goalnet_tpu.ops.expand import expand_scores
from cvml_goalnet_tpu.ops.knapsack import knapsack_select
from cvml_goalnet_tpu.ops.preprocess import preprocess_frames


# ------------------------------------------------------------ extract_features


def extract_features(
    frames: np.ndarray,
    waveform: np.ndarray | None,
    cfg: PipelineConfig,
    commentary: list[str] | None = None,
) -> dict:
    """Raw decimated frames (N, H, W, C) + waveform (+ commentary) → tensors.

    Returns ``{"visual": (N, h, w, C) float32, "audio": (N, B, n_mfcc) | None,
    "text": (N, T) int32 | None}``.  Visual math matches reference
    ``utils.py:283-292`` (min-max normalize then resize); audio matches
    ``utils.py:313-349`` (per-slot MFCC + cubic interp); ``commentary`` is a
    per-frame list of strings for the text branch (new capability,
    BASELINE.json config 4).
    """
    visual = np.asarray(preprocess_frames(jnp.asarray(frames), cfg.preprocess.frame_size, cfg.preprocess.eps))
    audio = None
    if waveform is not None:
        audio = extract_audio_features(waveform, len(frames), cfg.audio)
    text = None
    if commentary is not None:
        from cvml_goalnet_tpu.data.text import tokenize

        assert len(commentary) == len(frames), "one commentary string per frame"
        text = tokenize(commentary, cfg.model.text_vocab_size, cfg.model.text_max_len)
    return {"visual": visual, "audio": audio, "text": text}


# ------------------------------------------------------------------------ fuse


@lru_cache(maxsize=8)
def _jitted_fuse(cfg_model):
    from cvml_goalnet_tpu.utils import tree_cast

    dtype = jnp.bfloat16 if cfg_model.dtype == "bfloat16" else jnp.float32

    def cast(tree):
        return tree_cast(tree, dtype)

    def fwd(params, state, visual, audio, text):
        out, _ = avm_apply(
            cast(params), cast(state),
            visual.astype(dtype),
            None if audio is None else audio.astype(dtype),
            text,
            cfg=cfg_model, train=False,
        )
        return out[:, 0].astype(jnp.float32)

    return jax.jit(fwd)


def fuse(params, state, features: dict, cfg: PipelineConfig, text=None) -> np.ndarray:
    """Modality features → (N,) per-frame importance scores in [lo, hi].

    Jitted eval-mode forward of the AVM model (reference ``utils.py:260-272``);
    late-fuses audio ‖ visual (‖ text when ``cfg.model.text_included``).
    """
    if len(features["visual"]) == 0:
        # empty batch: a zero-length stream tail / empty request must yield
        # an empty score vector, not a ZeroDivisionError mid-trace
        return np.zeros((0,), np.float32)
    fn = _jitted_fuse(cfg.model)
    visual = jnp.asarray(features["visual"])
    audio = None
    if cfg.model.audio_included:
        if features.get("audio") is None:
            raise ValueError(
                "cfg.model.audio_included=True but features['audio'] is None — "
                "pass a waveform to extract_features, or substitute silent-"
                "audio features (zeros of (N, bin_length, n_mfcc)) as "
                "serve.Summarizer does"
            )
        audio = jnp.asarray(features["audio"])
    if text is None and cfg.model.text_included:
        if features.get("text") is None:
            raise ValueError(
                "cfg.model.text_included=True but features['text'] is None — "
                "pass commentary to extract_features (the model's text branch "
                "cannot run on a missing modality)"
            )
        text = jnp.asarray(features["text"])
    return np.asarray(fn(params, state, visual, audio, text))


def fuse_many(params, state, features_list: list[dict], cfg: PipelineConfig) -> list[np.ndarray]:
    """Batched multi-match inference (BASELINE.json config 2).

    The model is per-frame, so many videos batch by concatenating their frame
    axes into ONE device program invocation; scores are split back per video.
    """
    if not features_list:
        return []

    def stack(key):
        vals = [f.get(key) for f in features_list]
        missing = [i for i, v in enumerate(vals) if v is None]
        if missing:
            # same contract as fuse(): an enabled modality must be present
            # for EVERY video — np.concatenate over a None would otherwise
            # throw an opaque dtype error (round-3 review)
            raise ValueError(
                f"cfg.model.{key}_included=True but features_list"
                f"[{missing[0]}]['{key}'] is None — every batched video "
                f"needs the {key} modality (substitute silence/empty "
                "commentary explicitly if intended)"
            )
        return np.concatenate(vals)

    visual = np.concatenate([f["visual"] for f in features_list])
    audio = stack("audio") if cfg.model.audio_included else None
    text = stack("text") if cfg.model.text_included else None
    scores = fuse(params, state, {"visual": visual, "audio": audio, "text": text}, cfg)
    sizes = [len(f["visual"]) for f in features_list]
    out, off = [], 0
    for n in sizes:
        out.append(scores[off : off + n])
        off += n
    return out


# -------------------------------------------------------------------- summarize


@dataclass
class SummaryResult:
    frame_mask: np.ndarray            # (full_n_frames,) uint8 inclusion mask
    selected_clips: list[int]         # knapsack-chosen clip indices
    clip_intervals: np.ndarray        # the selected [start, end] intervals
    summary_frames: np.ndarray | None  # concatenated raw frames (if provided)


def summarize(
    importances,
    clip_intervals: np.ndarray,
    skip_frames: int,
    full_n_frames: int,
    kcfg: KnapsackConfig = KnapsackConfig(),
    full_frames: np.ndarray | None = None,
    knapsack_engine: str = "auto",
) -> SummaryResult:
    """Importance scores → keyshot summary (reference ``postprocess``, ``utils.py:606-643``).

    Pipeline: round scores → expand to raw frame rate → per-clip
    importance/length via prefix sums → 0/1 knapsack at a
    ``summary_ratio``·full_n_frames budget → frame mask (+ optional frames).

    Differences vs the reference, by design (SURVEY.md §7.1):
    * clip intervals are passed in (the reference re-parsed the h5/mat pair on
      every call — ``utils.py:615-625``; caching lives in the data layer);
    * the frames/mask end off-by-one is config-controlled
      (``kcfg.inclusive_mask``, default reference-compatible).
    """
    imp = np.asarray(importances)
    if imp.ndim == 2:
        assert imp.shape[1] == 1, "importances must be (N,) or (N, 1)"
        imp = imp[:, 0]

    if knapsack_engine == "native-full":
        # the ENTIRE postprocess in one C++ call (runtime/postprocess.cc) —
        # semantics identical to the staged path below (parity-tested)
        from cvml_goalnet_tpu.runtime import summarize_native

        res = summarize_native(
            imp, clip_intervals, skip_frames, full_n_frames,
            kcfg.summary_ratio, kcfg.inclusive_mask,
        )
        if res is not None:
            selected, mask = res
            iv = np.asarray(clip_intervals)
            chosen = iv[selected] if selected else np.zeros((0, 2), iv.dtype)
            summary_frames = None
            if full_frames is not None and len(chosen):
                summary_frames = np.concatenate(
                    [full_frames[int(a): int(b)] for a, b in chosen], axis=0
                )
            return SummaryResult(
                frame_mask=mask, selected_clips=selected,
                clip_intervals=chosen, summary_frames=summary_frames,
            )
        knapsack_engine = "auto"  # library unavailable → staged path

    imp = np.round(imp).astype(np.int8)  # round-half-even, like torch.round → int8

    expanded = expand_scores(jnp.asarray(imp, jnp.int32), skip_frames, full_n_frames)
    intervals = jnp.asarray(np.asarray(clip_intervals, np.int64))
    clip_imps, clip_lens = clip_stats(intervals, expanded)
    clip_imps = np.asarray(clip_imps)
    clip_lens = np.asarray(clip_lens)

    capacity = int(kcfg.summary_ratio * full_n_frames)
    selected = knapsack_select(
        clip_imps, clip_lens, capacity, kcfg.scale_factor, engine=knapsack_engine
    )

    iv = np.asarray(clip_intervals)
    chosen = iv[selected] if selected else np.zeros((0, 2), iv.dtype)

    mask = np.zeros((full_n_frames,), dtype=np.uint8)
    for a, b in chosen:
        end = int(b) + (1 if kcfg.inclusive_mask else 0)
        mask[int(a) : min(end, full_n_frames)] = 1

    summary_frames = None
    if full_frames is not None and len(chosen):
        summary_frames = np.concatenate(
            [full_frames[int(a) : int(b)] for a, b in chosen], axis=0
        )

    return SummaryResult(
        frame_mask=mask,
        selected_clips=list(selected),
        clip_intervals=chosen,
        summary_frames=summary_frames,
    )
