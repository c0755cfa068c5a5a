"""The full frame-importance model (audio-visual(-text) fusion).

Capability parity with reference ``AVM`` (``utils.py:229-272``): visual
features (512-d) optionally concatenated with audio features (128-d) — and,
new here, text features — run through a 5-layer MLP
(512→512→256→128→1, ReLU + dropout 0.2 after each hidden layer), ending in
``sigmoid`` rescaled to ``4·σ+1 ∈ [1, 5]`` (``utils.py:270``).

The commented-out Softmax classifier variant in the reference
(``utils.py:257``; the paper's CAVM/CVM ablations) is exposed here as a
first-class ``classifier=True`` mode producing 5-way logits.

Pure functions: ``avm_init`` → (params, state); ``avm_apply`` →
(scores, new_state).  ``state`` carries batchnorm running stats.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.config import AudioConfig, ModelConfig, PreprocessConfig
from cvml_goalnet_tpu.models import layers as L
from cvml_goalnet_tpu.models.audio import audio_encoder_apply, audio_encoder_init
from cvml_goalnet_tpu.models.text import text_encoder_apply, text_encoder_init
from cvml_goalnet_tpu.models.visual import visual_encoder_apply, visual_encoder_init

N_CLASSES = 5  # classifier-mode output arity (importance grades 1..5)

def fusion_input_dim(cfg: ModelConfig) -> int:
    dim = cfg.vis_feature_dim
    if cfg.audio_included:
        dim += cfg.aud_feature_dim
    if cfg.text_included:
        dim += cfg.text_feature_dim
    return dim


def _visual_init(cfg: ModelConfig):
    if cfg.vis_backbone == "resnet":
        from cvml_goalnet_tpu.models.resnet import resnet_encoder_apply, resnet_encoder_init

        return resnet_encoder_init, resnet_encoder_apply
    if cfg.vis_backbone == "vit":
        from cvml_goalnet_tpu.models.vit import vit_encoder_apply, vit_encoder_init

        # close over the static geometry so every call site keeps the
        # backbone-agnostic apply(params, state, x, train=, rng=,
        # dropout_rate=) contract the other backbones use
        def apply(params, state, x, **kw):
            return vit_encoder_apply(
                params, state, x,
                num_heads=cfg.vit_num_heads, patch=cfg.vit_patch_size, **kw)

        return vit_encoder_init, apply
    if cfg.vis_backbone != "reference":
        # a typo'd name would otherwise silently build the reference conv
        # stack — same shapes, wrong architecture, no signal
        raise ValueError(
            f"unknown vis_backbone {cfg.vis_backbone!r} "
            "(reference | resnet | vit)"
        )
    return visual_encoder_init, visual_encoder_apply


def avm_init(key, cfg: ModelConfig, pre: PreprocessConfig, aud: AudioConfig, classifier: bool = False):
    kv, ka, kt, kf = jax.random.split(key, 4)
    params, state = {}, {}
    vis_init, _ = _visual_init(cfg)
    params["visual"], state["visual"] = vis_init(kv, cfg, pre)
    if cfg.audio_included:
        params["audio"] = audio_encoder_init(ka, cfg, aud)
    if cfg.text_included:
        params["text"] = text_encoder_init(kt, cfg)

    dims = (fusion_input_dim(cfg),) + cfg.fusion_hidden + (N_CLASSES if classifier else 1,)
    fkeys = jax.random.split(kf, len(dims) - 1)
    params["fusion"] = [
        L.linear_init(fk, din, dout) for fk, din, dout in zip(fkeys, dims[:-1], dims[1:])
    ]
    if cfg.fusion_moe_experts > 0:
        # MoE variant: the first hidden fusion layer becomes a top-k gated
        # mixture of linear experts (models/moe.py; EP sharding in
        # parallel/ep.py).  Dense (experts=0) stays the reference-parity path.
        from cvml_goalnet_tpu.models.moe import moe_init

        params["fusion"][0] = moe_init(fkeys[0], dims[0], dims[1], cfg.fusion_moe_experts)
    return params, state


def avm_apply(
    params,
    state,
    visual,                      # (N, H, W, C) preprocessed frames, NHWC
    audio=None,                  # (N, B, n_mfcc) MFCCs or None
    text=None,                   # (N, T) token ids or None
    *,
    cfg: ModelConfig,
    train: bool = False,
    rng=None,
    classifier: bool = False,
    return_moe_probs: bool = False,
    valid=None,
):
    """Forward pass → ((N, 1) importance scores in [lo, hi], new_state).

    In ``classifier`` mode returns (N, 5) logits instead (CAVM/CVM variant).
    ``return_moe_probs=True`` (requires ``cfg.fusion_moe_experts > 0``)
    appends the MoE gate's (N, E) combine weights to the return tuple so the
    training loop can add the load-balance auxiliary loss without a second
    gate pass.  ``valid`` (N,) marks real frames in a zero-padded batch:
    train-mode batchnorm statistics then count only real frames, matching
    the reference's unpadded short-batch semantics (``main.py:177-196``
    processes the final short sub-batch as-is).
    """
    if rng is None:
        if train and cfg.dropout_rate > 0:
            # a defaulted key would draw the SAME dropout mask every step —
            # the model silently trains as a fixed sparse subnetwork
            # (round-3 review).  With dropout_rate == 0 no randomness is
            # consumed, so train-mode forwards without a key are legitimate
            # — the live-A/B eval path (eval_train_mode_compat=True pairs
            # train-mode batchnorm with zeroed dropout for determinism,
            # TrainConfig docstring) relies on that.
            raise ValueError(
                "avm_apply(train=True) with dropout_rate > 0 requires an rng key")
        rng = jax.random.PRNGKey(0)
    k_vis, *k_drop = jax.random.split(rng, 1 + len(cfg.fusion_hidden))

    _, vis_apply = _visual_init(cfg)
    vis_kw = {}
    if not train and cfg.quantized_inference:
        # int8 MXU path: dominant convs (reference), bn-folded block convs
        # (resnet), or all block GEMMs (vit) — every family has one (r4)
        vis_kw["quant"] = True
    if train and valid is not None:
        vis_kw["mask"] = valid
    feats, new_state = vis_apply(
        params["visual"], state["visual"], visual,
        train=train, rng=k_vis, dropout_rate=cfg.dropout_rate, **vis_kw,
    )
    parts = [feats]
    if cfg.audio_included:
        # Reference concat order is [audio ‖ visual] (utils.py:266).
        parts.insert(0, audio_encoder_apply(params["audio"], audio))
    if cfg.text_included:
        parts.append(text_encoder_apply(params["text"], text, cfg=cfg))
    x = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]

    n_hidden = len(cfg.fusion_hidden)
    moe_probs = None
    for i, lp in enumerate(params["fusion"]):
        if i == 0 and cfg.fusion_moe_experts > 0:
            from cvml_goalnet_tpu.models.moe import moe_apply, moe_gate_probs

            moe_probs = moe_gate_probs(lp, x, cfg.fusion_moe_top_k)
            x = moe_apply(lp, x, cfg.fusion_moe_top_k, probs=moe_probs)
        else:
            x = L.linear_apply(lp, x)
        if i < n_hidden:
            x = jax.nn.relu(x)
            x = L.dropout(x, cfg.dropout_rate, train, k_drop[i])
    if classifier:
        out = x  # (N, 5) logits; argmax+1 recovers the grade (main.py:97)
    else:
        out = (cfg.out_hi - cfg.out_lo) * jax.nn.sigmoid(x) + cfg.out_lo
    new_full_state = {**state, "visual": new_state}
    if return_moe_probs:
        if moe_probs is None:
            raise ValueError("return_moe_probs requires fusion_moe_experts > 0")
        return out, new_full_state, moe_probs
    return out, new_full_state
