"""Scan-based temporal scorer / event spotting head (new capability).

The reference scores each frame independently with zero temporal context
(report §1; ``utils.py:260-272`` — SURVEY.md §5 "Long-context — ABSENT").
BASELINE.json config 5 asks for a scan-based spotting pass so a full 90-minute
timeline is scored in ONE device program.

Design: a bidirectional GRU over per-frame fused features under
``lax.scan`` (XLA keeps the recurrence on-chip; the matmuls batch onto the
MXU), followed by a linear head producing per-frame event scores, plus a
static-shape local-peak detector for timestamp extraction.  The time axis can
be sharded across the mesh by splitting the timeline into overlapping chunks —
see ``parallel/sharding.py`` (no attention exists to ring — SURVEY.md §2.3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.models import layers as L


def _gru_init(key, in_dim: int, hidden: int):
    k1, k2 = jax.random.split(key)
    return {
        # gates: update z, reset r, candidate h — fused into one matmul each.
        "wx": L.linear_init(k1, in_dim, 3 * hidden),
        "wh": L.linear_init(k2, hidden, 3 * hidden),
    }


def _gru_scan(params, xs, hidden: int, reverse: bool = False):
    """xs: (T, D) → (T, H) hidden states via lax.scan."""

    def step(h, x):
        gx = L.linear_apply(params["wx"], x)
        gh = L.linear_apply(params["wh"], h)
        zx, rx, nx = jnp.split(gx, 3, axis=-1)
        zh, rh, nh = jnp.split(gh, 3, axis=-1)
        z = jax.nn.sigmoid(zx + zh)
        r = jax.nn.sigmoid(rx + rh)
        n = jnp.tanh(nx + r * nh)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((hidden,), xs.dtype)
    _, hs = jax.lax.scan(step, h0, xs, reverse=reverse)
    return hs


def temporal_scorer_init(key, in_dim: int, hidden: int, n_classes: int = 1):
    """``n_classes > 1`` → a multi-class spotting head (goal/card/sub-style):
    one score channel per event class, (T, C) outputs."""
    kf, kb, kh = jax.random.split(key, 3)
    return {
        "fwd": _gru_init(kf, in_dim, hidden),
        "bwd": _gru_init(kb, in_dim, hidden),
        "head": L.linear_init(kh, 2 * hidden, n_classes),
    }


@partial(jax.jit, static_argnums=(2,))
def temporal_scorer_apply(params, features, hidden: int):
    """features: (T, D) fused features → (T,) event scores — or (T, C) when
    the head was initialized with ``n_classes > 1`` (shape is static from the
    head params)."""
    hs_f = _gru_scan(params["fwd"], features, hidden)
    hs_b = _gru_scan(params["bwd"], features, hidden, reverse=True)
    hs = jnp.concatenate([hs_f, hs_b], axis=-1)
    out = L.linear_apply(params["head"], hs)
    return out[:, 0] if out.shape[-1] == 1 else out


@partial(jax.jit, static_argnums=(1,))
def detect_peaks_multi(scores, window: int = 5, threshold: float = 0.0):
    """(T, C) multi-class scores → (T, C) boolean event masks (per class)."""
    return jax.vmap(
        lambda s: detect_peaks(s, window, threshold), in_axes=1, out_axes=1
    )(scores)


@partial(jax.jit, static_argnums=(1,))
def detect_peaks(scores, window: int = 5, threshold: float = 0.0):
    """Static-shape local-max detector → boolean event mask over the timeline.

    A frame is an event iff it is the maximum of its ±window neighborhood and
    exceeds ``threshold``.  Timestamp indices are recovered on the host with
    ``np.nonzero`` (dynamic-size output stays off-device by design).
    """
    t = scores.shape[0]
    neighborhood = jax.lax.reduce_window(
        scores,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(2 * window + 1,),
        window_strides=(1,),
        padding=((window, window),),
    )
    assert neighborhood.shape[0] == t
    return (scores >= neighborhood) & (scores > threshold)
