"""Hybrid GRU+banded-transformer temporal scorer.

Motivated by the round-4 quality CI (`benchmarks/results/
spot_quality_ci_*_r4.json`): on held-out mAP the GRU and the banded
transformer are a statistical tie, but they fail DIFFERENTLY — the GRU's
fixed-size recurrent state smooths over noise yet cannot carry a
640-frame-old precursor cue reliably (distractor leak 0.53), while the
band attends to the cue directly (leak 0.43) but lacks the GRU's global
integration.  The hybrid composes the two mechanisms: a bidirectional GRU
scan produces per-frame recurrent summaries, which are CONCATENATED onto
the raw features before the banded transformer — attention then sees both
the local evidence and each frame's global recurrent context.

Strict reuse of the two existing scorers (``models/temporal.py`` scan,
``models/temporal_attention.py`` blocks): the hybrid params are
``{"gru": {fwd, bwd}, "transformer": <temporal_transformer_init pytree>}``
with the transformer's input dim widened to ``D + 2·hidden``.  Every
transformer mode composes unchanged (rotary/learned positions, full or
banded flash kernels, multi-class heads).

Streaming accuracy class (``spotting.spot_stream``): GRU-like — the scan
makes scores depend on the full left context, so chunked scoring is
halo-decay-bounded, not banded-exact.

Reference anchor: the capability this extends is per-frame scoring with
zero temporal context (``utils.py:260-272``; report §7 lists temporal
modeling as future work).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.models.temporal import _gru_init, _gru_scan
from cvml_goalnet_tpu.models.temporal_attention import (
    temporal_transformer_apply,
    temporal_transformer_init,
)


def temporal_hybrid_init(
    key,
    in_dim: int,
    hidden: int,
    model_dim: int = 128,
    num_layers: int = 2,
    num_heads: int = 1,
    max_len: int = 8192,
    n_classes: int = 1,
    pos_encoding: str = "learned",
):
    """Params for the hybrid scorer: a headless bidirectional GRU encoder
    plus a transformer over the ``in_dim + 2·hidden`` augmented features."""
    kf, kb, kt = jax.random.split(key, 3)
    return {
        "gru": {
            "fwd": _gru_init(kf, in_dim, hidden),
            "bwd": _gru_init(kb, in_dim, hidden),
        },
        "transformer": temporal_transformer_init(
            kt, in_dim + 2 * hidden, model_dim, num_layers, num_heads,
            max_len, n_classes, pos_encoding,
        ),
    }


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def temporal_hybrid_apply(
    params,
    features,
    hidden: int,
    num_heads: int = 1,
    use_flash: bool = False,
    flash_interpret: bool = False,
    window: int = 0,
    pos_offset=0,
):
    """features: (T, D) → (T,) scores (or (T, C) for multi-class heads).

    Bidirectional GRU hidden states augment the features; the transformer
    (full or ``window``-banded, flash or XLA) scores the augmented timeline.
    ``pos_offset`` (traced scalar): the global timeline index of
    ``features[0]`` — keeps the transformer component's positions aligned
    with the offline program when ``spotting.spot_stream`` scores windows.
    """
    hs_f = _gru_scan(params["gru"]["fwd"], features, hidden)
    hs_b = _gru_scan(params["gru"]["bwd"], features, hidden, reverse=True)
    aug = jnp.concatenate([features, hs_f, hs_b], axis=-1)
    return temporal_transformer_apply(
        params["transformer"], aug, num_heads, use_flash, flash_interpret,
        window, pos_offset,
    )
