"""Per-clip importance/length statistics from temporal-segmentation intervals.

Capability parity with reference ``get_clip_information`` (``utils.py:445-464``):
given clip intervals ``[start, end)`` (the reference slices
``importances[start:end]`` — exclusive end) and a per-raw-frame importance
vector, produce each clip's summed importance and frame count.

The reference loops over clips in Python; here both quantities come from one
exclusive-prefix-sum + two gathers, so the op is O(N + K), vectorized, and
jit-compatible with static shapes.  Python-slice clamping semantics
(``end > N`` → clamp to N) are preserved via index clamps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def clip_stats(intervals: jax.Array, importances: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Compute (clip_importances, clip_lengths) for intervals of shape (K, 2).

    ``intervals[:, 0]`` is the clip start, ``intervals[:, 1]`` the exclusive
    end, both indexing the raw-frame importance vector of shape (N,).
    """
    n = importances.shape[0]
    prefix = jnp.concatenate([jnp.zeros((1,), importances.dtype), jnp.cumsum(importances)])
    start = jnp.clip(intervals[:, 0], 0, n)
    end = jnp.clip(intervals[:, 1], 0, n)
    end = jnp.maximum(end, start)  # empty slice when end < start, like Python
    clip_importances = prefix[end] - prefix[start]
    clip_lengths = (end - start).astype(jnp.int32)
    return clip_importances, clip_lengths


def clip_stats_host(intervals: np.ndarray, importances: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """NumPy mirror of :func:`clip_stats` (loop formulation, for parity tests).

    Clamps exactly like the device op: a NEGATIVE start (invalid change
    point) clamps to 0 on both engines — raw Python slicing would silently
    WRAP from the tail instead, so the two would disagree on malformed
    inputs (round-3 review).  Valid change points are non-negative, so this
    never diverges from the reference on real data (``utils.py:445-464``).
    """
    importances = np.asarray(importances)
    n = len(importances)
    imps, lens = [], []
    for a, b in np.asarray(intervals):
        a = min(max(int(a), 0), n)
        b = max(min(max(int(b), 0), n), a)
        sl = importances[a:b]
        imps.append(sl.sum())
        lens.append(len(sl))
    return np.asarray(imps), np.asarray(lens, dtype=np.int32)
