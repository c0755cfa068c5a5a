"""Summary-mask F-score against per-annotator ground-truth masks.

Capability parity with reference ``get_fscore`` (``utils.py:552-580``): for a
binary predicted mask S of shape (N,) and U annotator masks G of shape (U, N),
compute per-user precision = |S∧G|/|S|, recall = |S∧G|/|G|, F1, and return
(mean over users, max over users), with the reference's 0-fallbacks for empty
masks.

The reference loops over users in Python; here it is one batched logical-and +
reductions — a single XLA program, also usable under vmap across videos.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def fscore_against_users(pred_mask: jax.Array, user_masks: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Return (avg_fscore, max_fscore) over users.

    ``pred_mask``: (N,) binary; ``user_masks``: (U, N) binary.
    """
    S = pred_mask.astype(jnp.float32)
    G = user_masks.astype(jnp.float32)
    overlap = jnp.sum(S[None, :] * G, axis=1)
    s_sum = jnp.sum(S)
    g_sum = jnp.sum(G, axis=1)
    precision = jnp.where(s_sum > 0, overlap / jnp.maximum(s_sum, 1.0), 0.0)
    recall = jnp.where(g_sum > 0, overlap / jnp.maximum(g_sum, 1.0), 0.0)
    denom = precision + recall
    f1 = jnp.where(denom > 0, 2.0 * precision * recall / jnp.maximum(denom, 1e-30), 0.0)
    return jnp.mean(f1), jnp.max(f1)


def fscore_against_users_host(pred_mask: np.ndarray, user_masks: np.ndarray) -> tuple[float, float]:
    """NumPy mirror (loop formulation like the reference) for parity tests."""
    S = np.asarray(pred_mask)
    fs = []
    for G in np.asarray(user_masks):
        overlap = np.logical_and(S, G).sum()
        p = overlap / S.sum() if S.sum() != 0 else 0.0
        r = overlap / G.sum() if G.sum() != 0 else 0.0
        fs.append(2 * p * r / (p + r) if (p + r) != 0 else 0.0)
    return float(np.mean(fs)), float(np.max(fs))
