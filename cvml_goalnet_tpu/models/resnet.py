"""ResNet-style visual backbone (BASELINE.json config 1: "ResNet-18-class").

An alternative to the reference-topology conv stack (``models/visual.py``),
selected via ``ModelConfig.vis_backbone = "resnet"``.  NHWC basic-block
ResNet: stem → stages of two 3×3 conv blocks with identity/projection
shortcuts → global average pool → feature head.  Channel widths come from
``ModelConfig.vis_channels`` so the small test config stays cheap; the
default (64, 128, 256, 512) matches ResNet-18's four stages at depth 2.

The stem follows ResNet-18's two canonical variants, picked by frame size at
init and carried by the checkpoint (the stem kernel's spatial shape):

* frames ≥ 32 px: the ImageNet stem — 7×7 stride-2 conv + 3×3 stride-2
  maxpool, a 4× spatial reduction BEFORE stage 0.  Running stage 0 at full
  resolution (the round-1..3 layout) put ~16× more pixels through the
  widest stage than ResNet-18 actually does — it was the one family below
  the 50×-real-time production floor purely on that mislayout.
* frames < 32 px: the CIFAR stem — 3×3 stride-1 conv, no pool (ResNet's own
  small-input convention; tiny test frames keep spatial room, and existing
  small-config numerics are unchanged).

Pure init/apply with explicit shapes, batchnorm state threaded like the rest
of the model zoo.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.config import ModelConfig, PreprocessConfig
from cvml_goalnet_tpu.models import layers as L


def _block_init(key, cin, cout, stride):
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "conv1": L.conv2d_init(k1, cin, cout, 3),
        "conv2": L.conv2d_init(k2, cout, cout, 3),
    }
    bn1_p, bn1_s = L.batchnorm_init(cout)
    bn2_p, bn2_s = L.batchnorm_init(cout)
    params["bn1"], params["bn2"] = bn1_p, bn2_p
    state = {"bn1": bn1_s, "bn2": bn2_s}
    if stride != 1 or cin != cout:
        params["proj"] = L.conv2d_init(k3, cin, cout, 1)
        bnp_p, bnp_s = L.batchnorm_init(cout)
        params["bn_proj"] = bnp_p
        state["bn_proj"] = bnp_s
    return params, state


def _block_apply(params, state, x, stride, train, mask=None):
    new_state = {}
    y = L.conv2d_apply(params["conv1"], x, stride=stride, padding=1)
    y, new_state["bn1"] = L.batchnorm_apply(params["bn1"], state["bn1"], y, train, mask=mask)
    y = jax.nn.relu(y)
    y = L.conv2d_apply(params["conv2"], y, stride=1, padding=1)
    y, new_state["bn2"] = L.batchnorm_apply(params["bn2"], state["bn2"], y, train, mask=mask)
    if "proj" in params:
        x = L.conv2d_apply(params["proj"], x, stride=stride, padding=0)
        x, new_state["bn_proj"] = L.batchnorm_apply(
            params["bn_proj"], state["bn_proj"], x, train, mask=mask)
    return jax.nn.relu(x + y), new_state


def resnet_encoder_init(key, cfg: ModelConfig, pre: PreprocessConfig):
    chans = cfg.vis_channels
    keys = jax.random.split(key, 2 + 2 * len(chans))
    params, state = {}, {}
    stem_k = 7 if min(pre.frame_size) >= 32 else 3
    params["stem"] = L.conv2d_init(keys[0], pre.channels, chans[0], stem_k)
    bn_p, bn_s = L.batchnorm_init(chans[0])
    params["bn_stem"], state["bn_stem"] = bn_p, bn_s

    cin = chans[0]
    ki = 1
    for si, cout in enumerate(chans):
        for bi in range(2):  # depth-2 stages, ResNet-18 style
            stride = 2 if (bi == 0 and si > 0) else 1
            p, s = _block_init(keys[ki], cin, cout, stride)
            params[f"s{si}b{bi}"], state[f"s{si}b{bi}"] = p, s
            cin = cout
            ki += 1
    params["head"] = L.linear_init(keys[-1], chans[-1], cfg.vis_feature_dim)
    return params, state


def _stem_apply(params, state, x, train, mask=None):
    """Stem conv (+pool) in the variant carried by the checkpoint (kernel
    spatial size: 7 = ImageNet stem with stride-2 conv + stride-2 maxpool,
    3 = CIFAR stem, stride 1, no pool) → (x, new bn_stem state)."""
    imagenet = params["stem"]["w"].shape[0] == 7
    x = L.conv2d_apply(params["stem"], x,
                       stride=2 if imagenet else 1,
                       padding=3 if imagenet else 1)
    x, bn_state = L.batchnorm_apply(
        params["bn_stem"], state["bn_stem"], x, train, mask=mask)
    x = jax.nn.relu(x)
    if imagenet:
        x = L.maxpool2d(x, kernel=3, stride=2, padding=1)
    return x, bn_state


def _bn_fold(conv, bn_p, bn_s, eps: float = 1e-5):
    """Fold an OUTPUT-side eval batchnorm into the producing conv: with the
    bn as per-channel ``y = s·x + t`` (same affine as ``visual._bn_affine``),
    ``bn(conv(x; w, b)) = conv(x; w·s, b·s + t)`` exactly (the bn consumes
    the conv's own output channels — no padding subtlety, unlike the
    reference stack's input-side fold in ``models/visual.py``)."""
    scale = bn_p["scale"].astype(jnp.float32)
    inv = jax.lax.rsqrt(bn_s["var"].astype(jnp.float32) + eps)
    s = scale * inv
    t = bn_p["bias"].astype(jnp.float32) - bn_s["mean"].astype(jnp.float32) * s
    w = conv["w"].astype(jnp.float32) * s[None, None, None, :]
    b = conv["b"].astype(jnp.float32) * s + t
    return w, b


def _block_apply_quant(params, state, x, stride):
    """Eval-only int8 block: bn-folded 3×3 convs on the int8 MXU.

    The two 3×3 convs carry ~94% of a block's FLOPs (vs the 1×1 projection)
    — they run int8×int8→int32 with per-channel dequant
    (``ops/quant.quantized_conv2d``); the projection shortcut and the
    residual add stay in the float dtype for accuracy of the skip path.
    """
    from cvml_goalnet_tpu.ops.quant import quantized_conv2d

    w1, b1 = _bn_fold(params["conv1"], params["bn1"], state["bn1"])
    y = quantized_conv2d(x, w1, stride=stride, padding=1) + b1.astype(x.dtype)
    y = jax.nn.relu(y)
    w2, b2 = _bn_fold(params["conv2"], params["bn2"], state["bn2"])
    y = quantized_conv2d(y, w2, stride=1, padding=1) + b2.astype(x.dtype)
    if "proj" in params:
        wp, bp = _bn_fold(params["proj"], params["bn_proj"], state["bn_proj"])
        x = L.conv2d_apply(
            {"w": wp.astype(x.dtype), "b": bp.astype(x.dtype)}, x,
            stride=stride, padding=0)
    return jax.nn.relu(x + y)


def resnet_encoder_apply(params, state, x, *, train: bool, rng, dropout_rate: float,
                         quant: bool = False, mask=None):
    """x: (N, H, W, C) → (N, vis_feature_dim).

    ``quant=True`` (eval only) folds each batchnorm into its producing conv
    and routes every block's 3×3 convs through the int8 MXU path — the
    resnet analogue of the reference stack's quantized inference (config 1's
    named family was the one below the 50× floor in float,
    docs/BENCHMARKS.md backbone table)."""
    if quant and not train:
        # stem bn applied unfolded (cin=3 conv is shape-limited — int8 gains
        # nothing there, and the unfused bn is one cheap elementwise pass)
        x, _ = _stem_apply(params, state, x, False)
        si = 0
        while f"s{si}b0" in params:
            for bi in range(2):
                stride = 2 if (bi == 0 and si > 0) else 1
                x = _block_apply_quant(
                    params[f"s{si}b{bi}"], state[f"s{si}b{bi}"], x, stride)
            si += 1
        x = jnp.mean(x, axis=(1, 2))
        x = jax.nn.relu(L.linear_apply(params["head"], x))
        return x, state

    new_state = {}
    x, new_state["bn_stem"] = _stem_apply(params, state, x, train, mask=mask)
    si = 0
    while f"s{si}b0" in params:
        for bi in range(2):
            stride = 2 if (bi == 0 and si > 0) else 1
            x, new_state[f"s{si}b{bi}"] = _block_apply(
                params[f"s{si}b{bi}"], state[f"s{si}b{bi}"], x, stride, train,
                mask=mask,
            )
        si += 1
    x = jnp.mean(x, axis=(1, 2))  # global average pool
    x = jax.nn.relu(L.linear_apply(params["head"], x))
    return L.dropout(x, dropout_rate, train, rng), new_state
