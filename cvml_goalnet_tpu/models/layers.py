"""Functional NN primitives with explicit parameter pytrees.

Replaces the reference's reliance on PyTorch ``nn.Lazy*`` modules
(``utils.py:145-258``) — every shape is pinned at init time (SURVEY.md §7.3
"Lazy-layer shape inference").  Layouts are TPU-native: NHWC for 2-D convs,
NWC for 1-D convs, so XLA tiles channel dims onto the MXU/VPU lanes.

Initialization matches PyTorch defaults (Kaiming-uniform with ``a=√5`` for
conv/linear weights, ``±1/√fan_in`` uniform bias) so training dynamics are
comparable with the reference's.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def conv_out_size(size: int, kernel: int, stride: int, padding: int) -> int:
    return (size + 2 * padding - kernel) // stride + 1


# ---------------------------------------------------------------- init helpers

def _kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    # PyTorch kaiming_uniform_(a=sqrt(5)) → bound = sqrt(6 / ((1 + a^2) * fan_in))
    bound = math.sqrt(6.0 / (6.0 * fan_in))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _bias_uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# -------------------------------------------------------------------- linear

def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    return {
        "w": _kaiming_uniform(kw, (in_dim, out_dim), in_dim, dtype),
        "b": _bias_uniform(kb, (out_dim,), in_dim, dtype),
    }


def linear_apply(params, x):
    # Weights follow the activation dtype (bf16 dots still accumulate in f32
    # inside the MXU; keeping primal/cotangent dtypes aligned keeps the VJP
    # conv/dot transposes well-typed under mixed precision).
    return jnp.dot(x, params["w"].astype(x.dtype)) + params["b"].astype(x.dtype)


# -------------------------------------------------------------------- conv2d

def conv2d_init(key, in_ch: int, out_ch: int, kernel: int, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel * kernel
    return {
        "w": _kaiming_uniform(kw, (kernel, kernel, in_ch, out_ch), fan_in, dtype),  # HWIO
        "b": _bias_uniform(kb, (out_ch,), fan_in, dtype),
    }


def conv2d_apply(params, x, stride: int = 1, padding: int = 0):
    # x: NHWC, w: HWIO (weights follow activation dtype — see linear_apply)
    y = jax.lax.conv_general_dilated(
        x,
        params["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + params["b"].astype(x.dtype)


# -------------------------------------------------------------------- conv1d

def conv1d_init(key, in_ch: int, out_ch: int, kernel: int, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel
    return {
        "w": _kaiming_uniform(kw, (kernel, in_ch, out_ch), fan_in, dtype),  # WIO
        "b": _bias_uniform(kb, (out_ch,), fan_in, dtype),
    }


def conv1d_apply(params, x, stride: int = 1, padding: int = 0):
    # x: NWC, w: WIO (weights follow activation dtype — see linear_apply)
    y = jax.lax.conv_general_dilated(
        x,
        params["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=((padding, padding),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + params["b"].astype(x.dtype)


# ------------------------------------------------------------------- pooling

def maxpool2d(x, kernel: int = 3, stride: int = 1, padding: int = 0):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


# ----------------------------------------------------------------- batchnorm

def batchnorm_init(num_features: int, dtype=jnp.float32):
    params = {"scale": jnp.ones((num_features,), dtype), "bias": jnp.zeros((num_features,), dtype)}
    state = {"mean": jnp.zeros((num_features,), dtype), "var": jnp.ones((num_features,), dtype)}
    return params, state


def batchnorm_apply(params, state, x, train: bool, momentum: float = 0.1, eps: float = 1e-5,
                    mask=None):
    """BatchNorm over all axes but the last (channel) — NHWC/NWC friendly.

    PyTorch semantics (reference ``nn.LazyBatchNorm2d``, ``utils.py:154``):
    train mode normalizes by biased batch stats and updates running stats with
    the UNBIASED batch variance; eval mode normalizes by running stats.

    ``mask`` (N,) marks VALID leading-batch entries: train-mode statistics
    count only valid frames, so a sub-batch zero-padded to a fixed scan shape
    normalizes its real frames with exactly the statistics the reference
    computes on the unpadded short batch (padding would otherwise skew
    mean/var AND the running stats every later eval uses).  Padded rows still
    get normalized outputs (callers mask their loss).
    """
    axes = tuple(range(x.ndim - 1))
    if train:
        if mask is None:
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            count = x.size // x.shape[-1]
            unbiased = var * count / max(count - 1, 1)
        else:
            m = mask.reshape(mask.shape[:1] + (1,) * (x.ndim - 1)).astype(x.dtype)
            per_frame = x.size // x.shape[-1] // x.shape[0]
            count = jnp.sum(mask.astype(jnp.float32)) * per_frame  # traced
            mean = jnp.sum(x * m, axis=axes) / count.astype(x.dtype)
            var = jnp.sum(m * jnp.square(x - mean), axis=axes) / count.astype(x.dtype)
            unbiased = var * (count / jnp.maximum(count - 1.0, 1.0)).astype(x.dtype)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * inv * params["scale"] + params["bias"]
    return y, new_state


# ------------------------------------------------------------------- dropout

def dropout(x, rate: float, train: bool, rng):
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------- layernorm

def layernorm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layernorm_apply(params, x, eps: float = 1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]


# -------------------------------------------------- multi-head self-attention

def multihead_attention(layer, x, num_heads: int, mask=None, linear_fn=None):
    """Batched multi-head self-attention over (N, T, D) token sequences.

    ``layer`` holds ``wq/wk/wv/wo`` linear pytrees (``linear_init(d, d)``).
    ``mask`` (N, T) marks valid KEY positions (None = all visible).
    ``linear_fn`` swaps the projection GEMMs (same ``(params, x)`` signature
    as :func:`linear_apply` — e.g. ``ops/quant.quantized_linear`` for
    eval-time int8).  Shared
    by the token-scale encoders (text branch, ViT patches) — the T≈135k
    timeline scorer uses the flash/ring kernels instead
    (``ops/pallas/flash_attention.py``), which stream KV tiles; at T ≤ a few
    hundred tokens the materialized (T, T) logits here are cheap and XLA
    fuses the softmax chain.
    """
    n, t, d = x.shape
    hd = d // num_heads
    lin = linear_apply if linear_fn is None else linear_fn

    def split(h):
        return h.reshape(n, t, num_heads, hd).transpose(0, 2, 1, 3)

    q = split(lin(layer["wq"], x))
    k = split(lin(layer["wk"], x))
    v = split(lin(layer["wv"], x))
    logits = jnp.einsum("nhqd,nhkd->nhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, -1e30)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("nhqk,nhkd->nhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(n, t, d)
    return lin(layer["wo"], out)


# ------------------------------------------------------------ misc utilities

def count_params(tree) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree)))
