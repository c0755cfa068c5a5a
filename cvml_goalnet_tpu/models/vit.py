"""ViT-style visual backbone — the third visual model family.

The reference ships exactly one visual topology (``VisBl``,
``utils.py:145-195``); this framework treats the visual branch as a model
family behind ``ModelConfig.vis_backbone`` ("reference" | "resnet" | "vit").
The ViT is the MXU-native member: every FLOP is a matmul (patch embedding,
QKV projections, MLPs), there are no windowed reductions or batch statistics,
and the token count is tiny (frame_size/patch)², so the whole encoder
compiles to a handful of fused GEMMs per block.

Design notes (TPU-first):

* Patchify is ONE reshape+transpose+reshape — no gather, no conv: XLA lowers
  it to a copy that fuses into the patch-embedding GEMM's operand load.
* Positions are a learned (n_tokens, d) table.  n_tokens is a static config
  property (25 for 40×40/8), so there is no aliasing concern — unlike the
  temporal scorer's mod-max_len tiling this table is always exactly indexed.
* Pre-LN blocks reuse the shared ``layers.multihead_attention`` primitive
  (same pytree schema as the text encoder: wq/wk/wv/wo + mlp_in/mlp_out),
  so TP placement rules and future kernel swaps cover both encoders.
* No batchnorm: ``state`` is an empty dict, threaded unchanged, which keeps
  the init/apply contract identical to the other backbones (and makes the
  masked-padding question moot — LayerNorm has no cross-sample statistics,
  so zero-padded rows cannot contaminate real frames).
* Mean-pool over tokens → linear head → ReLU → dropout, matching the other
  backbones' (N, vis_feature_dim) activation convention so the fusion MLP
  and the spotting trunks are backbone-agnostic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.config import ModelConfig, PreprocessConfig
from cvml_goalnet_tpu.models import layers as L


def vit_grid(cfg: ModelConfig, pre: PreprocessConfig) -> tuple[int, int, int]:
    """→ (grid_h, grid_w, n_tokens); validates the patch geometry."""
    p = cfg.vit_patch_size
    h, w = pre.frame_size
    if p <= 0 or h % p or w % p:
        raise ValueError(
            f"vit_patch_size ({p}) must evenly divide frame_size "
            f"({pre.frame_size}) — got a ragged patch grid"
        )
    return h // p, w // p, (h // p) * (w // p)


def _block_init(key, d: int):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    return {
        "ln1": L.layernorm_init(d),
        "wq": L.linear_init(k1, d, d),
        "wk": L.linear_init(k2, d, d),
        "wv": L.linear_init(k3, d, d),
        "wo": L.linear_init(k4, d, d),
        "ln2": L.layernorm_init(d),
        "mlp_in": L.linear_init(k5, d, 4 * d),
        "mlp_out": L.linear_init(k6, 4 * d, d),
    }


def vit_encoder_init(key, cfg: ModelConfig, pre: PreprocessConfig):
    """→ (params, state).  ``state`` is empty (no batch statistics)."""
    d = cfg.vit_embed_dim
    if d % cfg.vit_num_heads:
        raise ValueError(
            f"vit_embed_dim ({d}) must be divisible by vit_num_heads "
            f"({cfg.vit_num_heads})"
        )
    _, _, n_tokens = vit_grid(cfg, pre)
    keys = jax.random.split(key, 3 + cfg.vit_depth)
    params = {
        "patch": L.linear_init(
            keys[0], cfg.vit_patch_size * cfg.vit_patch_size * pre.channels, d
        ),
        # learned positions: exact-indexed (static n_tokens — no tiling)
        "pos": jax.random.normal(keys[1], (n_tokens, d)) * 0.02,
        "head": L.linear_init(keys[2], d, cfg.vis_feature_dim),
        "ln_out": L.layernorm_init(d),
        "blocks": [_block_init(k, d) for k in keys[3:]],
    }
    return params, {}


def _patchify(x, patch: int):
    """(N, H, W, C) → (N, (H/p)·(W/p), p·p·C) — one reshape chain, gather-free."""
    n, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    x = x.reshape(n, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, gh * gw, patch * patch * c)


def vit_encoder_apply(params, state, x, *, train: bool, rng, dropout_rate: float,
                      num_heads: int, patch: int, quant: bool = False,
                      mask=None):
    """x: (N, S, S, C) preprocessed frames → ((N, vis_feature_dim), state).

    ``num_heads``/``patch`` are static config properties — ``avm._visual_init``
    closes over them so every call site keeps the backbone-agnostic
    ``apply(params, state, x, train=, rng=, dropout_rate=)`` contract.
    ``mask`` is accepted for backbone-API parity and ignored: LayerNorm has
    no cross-sample statistics, so padded rows cannot skew real frames (the
    batchnorm-masking contract in ``layers.batchnorm_apply`` exists for the
    conv backbones' running stats — there is nothing analogous here).

    ``quant=True`` (eval only) routes every block GEMM — the QKV/output
    projections and both MLP linears, which are all of a ViT's FLOPs —
    through the int8 MXU path (``ops/quant.quantized_linear``); the tiny
    patch embedding and feature head stay float.
    """
    del mask
    lin = L.linear_apply
    if quant and not train:
        from cvml_goalnet_tpu.ops.quant import quantized_linear as lin
    h = L.linear_apply(params["patch"], _patchify(x, patch))
    h = h + params["pos"].astype(h.dtype)
    for blk in params["blocks"]:
        a = L.layernorm_apply(blk["ln1"], h)
        h = h + L.multihead_attention(blk, a, num_heads, linear_fn=lin)
        m = L.layernorm_apply(blk["ln2"], h)
        h = h + lin(blk["mlp_out"], jax.nn.gelu(lin(blk["mlp_in"], m)))
    h = L.layernorm_apply(params["ln_out"], h)
    pooled = jnp.mean(h, axis=1)
    feats = jax.nn.relu(L.linear_apply(params["head"], pooled))
    return L.dropout(feats, dropout_rate, train, rng), state
