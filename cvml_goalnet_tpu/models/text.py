"""Text/commentary branch — transformer encoder (new capability).

The reference has no text modality; BASELINE.json config 4 adds a
"transformer text encoder fused into the AV head, three-modality late
fusion".  This is a compact pre-LN transformer encoder over token ids with
learned embeddings + sinusoidal positions, masked mean-pooling to a fixed
``text_feature_dim`` vector that the fusion head concatenates alongside the
audio/visual features.

Everything is static-shape (fixed ``text_max_len`` with an attention mask) so
it compiles once and runs under jit/vmap/shard_map like the rest of the model.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.config import ModelConfig
from cvml_goalnet_tpu.models import layers as L


def _sinusoidal_positions(length: int, dim: int) -> np.ndarray:
    pos = np.arange(length)[:, None]
    i = np.arange(dim // 2)[None, :]
    angle = pos / np.power(10000.0, 2 * i / dim)
    out = np.zeros((length, dim), dtype=np.float32)
    out[:, 0::2] = np.sin(angle)
    out[:, 1::2] = np.cos(angle)
    return out


def text_encoder_init(key, cfg: ModelConfig):
    d = cfg.text_embed_dim
    if d % 2 or d % cfg.text_num_heads:
        # fail where the config is attributable — an odd dim crashes the
        # sinusoidal table's strided fill and an indivisible head count
        # crashes the attention reshape, both mid-trace far from the cause
        raise ValueError(
            f"text_embed_dim ({d}) must be even and divisible by "
            f"text_num_heads ({cfg.text_num_heads})"
        )
    keys = jax.random.split(key, 2 + cfg.text_num_layers)
    params = {
        "embed": jax.random.normal(keys[0], (cfg.text_vocab_size, d)) * 0.02,
        "head": L.linear_init(keys[1], d, cfg.text_feature_dim),
        "layers": [],
    }
    for lk in keys[2:]:
        k1, k2, k3, k4, k5, k6 = jax.random.split(lk, 6)
        params["layers"].append(
            {
                "ln1": L.layernorm_init(d),
                "wq": L.linear_init(k1, d, d),
                "wk": L.linear_init(k2, d, d),
                "wv": L.linear_init(k3, d, d),
                "wo": L.linear_init(k4, d, d),
                "ln2": L.layernorm_init(d),
                "mlp_in": L.linear_init(k5, d, 4 * d),
                "mlp_out": L.linear_init(k6, 4 * d, d),
            }
        )
    return params


def _attention(layer, x, mask, num_heads: int):
    # shared primitive (models/layers.py) — also serves the ViT backbone
    return L.multihead_attention(layer, x, num_heads, mask=mask)


def text_encoder_apply(params, token_ids, *, cfg: ModelConfig):
    """token_ids: (N, T) int32 (0 = pad) → (N, text_feature_dim)."""
    mask = token_ids > 0
    x = params["embed"][token_ids]
    # cast the f32 table to the activation dtype: bf16 + f32 promotes to f32
    # and every downstream layer follows x.dtype, so an uncast add silently
    # ran the whole text branch AND (via the concat) the fusion MLP in f32
    # under bf16 inference (round-3 review)
    x = x + jnp.asarray(
        _sinusoidal_positions(token_ids.shape[1], x.shape[-1])).astype(x.dtype)
    for layer in params["layers"]:
        h = L.layernorm_apply(layer["ln1"], x)
        x = x + _attention(layer, h, mask, cfg.text_num_heads)
        h = L.layernorm_apply(layer["ln2"], x)
        x = x + L.linear_apply(layer["mlp_out"], jax.nn.gelu(L.linear_apply(layer["mlp_in"], h)))
    denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1)
    pooled = jnp.sum(x * mask[:, :, None], axis=1) / denom
    return jax.nn.relu(L.linear_apply(params["head"], pooled))
