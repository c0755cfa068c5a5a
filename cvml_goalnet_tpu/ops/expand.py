"""Importance-score expansion from condensed (decimated) to raw frame rate.

Capability parity with reference ``expand_array`` (``utils.py:396-410``): each
condensed score is replicated ``skip_frames`` times, the result truncated to
the raw length or padded with the last value.

The reference builds a Python list in a loop; here expansion is a single
clamped gather — ``expanded[i] = scores[min(i // skip, n - 1)]`` — which is
exactly equivalent (replication ≡ integer division; pad-with-last ≡ index
clamp) and runs on-device under jit with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


@partial(jax.jit, static_argnums=(1, 2))
def expand_scores(scores: jax.Array, skip_frames: int, full_n_frames: int) -> jax.Array:
    """Expand (n,) condensed scores to (full_n_frames,) raw-rate scores.

    Equivalent to reference ``expand_array(arr, expansion_rate, length)``
    (``utils.py:396-410``), including its short-circuit when ``n == length``
    (which that code path implies via exact replication).
    """
    scores = scores.reshape(-1)
    n = scores.shape[0]
    if n == full_n_frames:
        # Reference short-circuit (utils.py:398-399): already at raw rate.
        return scores
    idx = jnp.minimum(jnp.arange(full_n_frames) // skip_frames, n - 1)
    return scores[idx]


def expand_scores_host(scores: np.ndarray, skip_frames: int, full_n_frames: int) -> np.ndarray:
    """NumPy reference used for parity tests (same gather formulation)."""
    scores = np.asarray(scores).reshape(-1)
    if scores.shape[0] == full_n_frames:
        # Reference short-circuit (utils.py:398-399): identical array back.
        return scores.copy()
    idx = np.minimum(np.arange(full_n_frames) // skip_frames, scores.shape[0] - 1)
    return scores[idx]
