"""Serving layer: a long-lived Summarizer + a stdlib HTTP endpoint.

Production-facing surface missing upstream (the reference re-built the model
and re-parsed ground truth per invocation — ``main.py:300-348``).  Here:

* :class:`Summarizer` loads the checkpoint and compiles the device program
  ONCE, then serves many videos (file path or in-memory frames) with warm
  jit caches — the p50 path is decode + one device dispatch + knapsack.
* :func:`serve_http` exposes it as a minimal JSON-over-HTTP service
  (stdlib ``http.server``; zero extra dependencies):
  ``POST /summarize {"video": "/path.mp4"}`` →
  ``{"mask_frames": ..., "clips": [[a, b], ...], "scores": [...]}``
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass

import numpy as np
import jax

from cvml_goalnet_tpu.config import PipelineConfig
from cvml_goalnet_tpu.data.annotations import AnnotationStore
from cvml_goalnet_tpu.pipeline import extract_features, fuse, summarize
from cvml_goalnet_tpu.train.checkpoint import load_checkpoint
from cvml_goalnet_tpu.train.state import create_train_state


@dataclass
class SummarizeResponse:
    video_id: str
    scores: np.ndarray
    frame_mask: np.ndarray
    clips: np.ndarray


class Summarizer:
    """Checkpoint loaded once; thread-safe scoring of many videos."""

    def __init__(
        self,
        cfg: PipelineConfig,
        checkpoint_dir: str | None = None,
        checkpoint_tag: str = "opt",
        store: AnnotationStore | None = None,
    ):
        self.cfg = cfg
        self.store = store
        state = create_train_state(jax.random.PRNGKey(cfg.train.seed), cfg)
        if checkpoint_dir is not None:
            state = load_checkpoint(checkpoint_dir, state, tag=checkpoint_tag)
        self.state = state
        self._lock = threading.Lock()

    def warmup(self, shapes: tuple[tuple[int, int, int], ...] = ((8, 64, 64),)) -> None:
        """Compile the scoring program for each production ``(N, H, W)`` shape.

        jit caches key on input shapes, so any request shape NOT warmed here
        recompiles on the request path (minutes through a remote-compile
        tunnel) — pass the real production shape set, e.g.
        ``((256, 180, 320), (97, 180, 320))`` for 256-frame chunks plus the
        tail shape.
        """
        rng = np.random.default_rng(0)
        for n_frames, h, w in shapes:
            frames = rng.integers(0, 255, (n_frames, h, w, 3), dtype=np.uint8)
            self.summarize_frames("warmup", frames, np.array([[0, n_frames]]), n_frames)

    def summarize_frames(
        self,
        video_id: str,
        frames: np.ndarray,
        clip_intervals: np.ndarray | None = None,
        full_n_frames: int | None = None,
        waveform: np.ndarray | None = None,
    ) -> SummarizeResponse:
        cfg = self.cfg
        full_n = full_n_frames or len(frames) * cfg.preprocess.skip_frames
        if clip_intervals is None:
            if self.store is not None:
                clip_intervals = np.asarray(self.store.change_points(video_id))
            else:
                # uniform segmentation fallback: ~2-second clips, but never
                # wider than the knapsack budget (short videos would
                # otherwise have no feasible clip at all)
                budget = max(1, int(cfg.knapsack.summary_ratio * full_n))
                step = max(1, min(2 * 30, budget))
                starts = np.arange(0, full_n, step)
                clip_intervals = np.stack([starts, np.minimum(starts + step, full_n)], 1)
        feats = extract_features(frames, waveform, cfg)
        if cfg.model.audio_included and feats["audio"] is None:
            # serving robustness: no audio track → silent-audio features
            from cvml_goalnet_tpu.models.audio import audio_feature_channels

            feats["audio"] = np.zeros(
                (len(frames), cfg.audio.bin_length, audio_feature_channels(cfg.audio)),
                np.float32,
            )
        with self._lock:
            scores = fuse(self.state.params, self.state.model_state, feats, cfg)
        res = summarize(
            scores, clip_intervals, cfg.preprocess.skip_frames, full_n, cfg.knapsack
        )
        return SummarizeResponse(
            video_id=video_id,
            scores=scores,
            frame_mask=res.frame_mask,
            clips=np.asarray(res.clip_intervals),
        )

    def summarize_path(self, video_fp: str) -> SummarizeResponse:
        import os

        from cvml_goalnet_tpu.data.dataset import _load_frames

        video_id = os.path.basename(video_fp).rsplit(".", 1)[0]
        frames, full_n = _load_frames(video_fp, self.cfg.preprocess.skip_frames)
        waveform = None
        if self.cfg.model.audio_included:
            wav_fp = video_fp.rsplit(".", 1)[0] + ".wav"
            if os.path.exists(wav_fp):
                from cvml_goalnet_tpu.data.audio_io import load_waveform

                waveform, _ = load_waveform(wav_fp, self.cfg.audio.sample_rate)
        return self.summarize_frames(video_id, frames, None, full_n, waveform)


def serve_http(
    summarizer: Summarizer,
    host: str = "127.0.0.1",
    port: int = 8765,
    media_root: str | None = None,
):
    """Blocking JSON-over-HTTP server; returns the server object when
    started with ``threading=True`` via :func:`start_http_background`.

    ``media_root`` confines requested video paths to one directory: requests
    are resolved against it and rejected if they escape (symlinks included).
    REQUIRED for any non-loopback ``host`` — without it the endpoint would
    probe/read arbitrary host paths on behalf of remote callers.
    """
    import os
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    if media_root is None and host not in ("127.0.0.1", "localhost", "::1"):
        raise ValueError(
            f"serve_http(host={host!r}) binds a non-loopback interface; "
            "pass media_root to confine which files requests may read"
        )
    root = os.path.realpath(media_root) if media_root is not None else None

    def resolve(requested: str) -> str:
        if root is None:
            return requested
        p = os.path.realpath(os.path.join(root, requested.lstrip("/")))
        if p != root and not p.startswith(root + os.sep):
            raise PermissionError(f"path escapes media root: {requested!r}")
        return p

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/summarize":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                resp = summarizer.summarize_path(resolve(req["video"]))
                self._reply(200, {
                    "video_id": resp.video_id,
                    "mask_frames": int(resp.frame_mask.sum()),
                    "clips": resp.clips.tolist(),
                    "scores": np.round(resp.scores, 4).tolist(),
                })
            except PermissionError as e:
                self._reply(403, {"error": str(e)})
            except FileNotFoundError as e:
                self._reply(404, {"error": f"video not found: {e}"})
            except Exception as e:  # surface as 500 with message
                self._reply(500, {"error": repr(e)})

    return ThreadingHTTPServer((host, port), Handler)


def start_http_background(summarizer: Summarizer, host="127.0.0.1", port=8765, media_root=None):
    server = serve_http(summarizer, host, port, media_root)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
