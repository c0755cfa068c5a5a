"""Visual branch encoder.

Capability parity with reference ``VisBl`` (``utils.py:145-195``): three
conv→ReLU→maxpool(3, stride 1)→batchnorm stages with channels (64, 256, 512)
— conv1 uses kernel 3 / stride 3 / padding 3, convs 2–3 kernel 3 / stride 1 /
padding 1 — followed by flatten → linear(512) → ReLU → dropout(0.2).

For 40×40 input the spatial trace is 40→15→13→13→11→11→9, so the flatten dim
is 512·9·9 = 41472 (the shape the reference's Lazy modules inferred at first
forward; here it is computed explicitly from the config at init).

TPU-first differences from the reference: NHWC layout, explicit shapes, and
batchnorm placed AFTER the pool exactly as upstream so numerics line up.
"""

from __future__ import annotations

import jax

from cvml_goalnet_tpu.config import ModelConfig, PreprocessConfig
from cvml_goalnet_tpu.models import layers as L

# (kernel, stride, padding) per conv stage — reference utils.py:151-163.
_STAGE_GEOM = ((3, 3, 3), (3, 1, 1), (3, 1, 1))
_POOL = (3, 1)  # kernel, stride — reference utils.py:153


def visual_spatial_trace(hw: tuple[int, int], n_stages: int) -> list[tuple[int, int]]:
    """Spatial sizes after each conv+pool stage (explicit Lazy-shape replacement)."""
    h, w = hw
    sizes = []
    for k, s, p in _STAGE_GEOM[:n_stages]:
        h = L.conv_out_size(h, k, s, p)
        w = L.conv_out_size(w, k, s, p)
        h = L.conv_out_size(h, _POOL[0], _POOL[1], 0)
        w = L.conv_out_size(w, _POOL[0], _POOL[1], 0)
        sizes.append((h, w))
    return sizes


def visual_encoder_init(key, cfg: ModelConfig, pre: PreprocessConfig):
    chans = (pre.channels,) + cfg.vis_channels
    keys = jax.random.split(key, len(cfg.vis_channels) + 1)
    params, state = {}, {}
    for i, (cin, cout) in enumerate(zip(chans[:-1], chans[1:])):
        k, _, _ = _STAGE_GEOM[i]
        params[f"conv{i}"] = L.conv2d_init(keys[i], cin, cout, k)
        bn_p, bn_s = L.batchnorm_init(cout)
        params[f"bn{i}"] = bn_p
        state[f"bn{i}"] = bn_s
    h, w = visual_spatial_trace(pre.frame_size, len(cfg.vis_channels))[-1]
    flat = cfg.vis_channels[-1] * h * w
    params["head"] = L.linear_init(keys[-1], flat, cfg.vis_feature_dim)
    return params, state


def visual_encoder_apply(params, state, x, *, train: bool, rng, dropout_rate: float,
                         quant: bool = False, mask=None):
    """x: (N, H, W, C) normalized frames → (N, vis_feature_dim).

    Eval mode folds each batchnorm (affine per channel, ``y = s·x + t``) into
    the CONSUMING conv/linear weights — valid for any gamma sign because the
    consumer is linear in its input — eliminating three full-size elementwise
    passes (and their HBM round-trips) from the inference hot path.  The fold
    arithmetic runs in f32 on the (tiny) weights; results are numerically the
    same regrouped sums (tested vs the unfolded path).

    ``quant=True`` (eval only) routes the MXU-bound stages (conv1/conv2 —
    88% of model FLOPs) through the int8 MXU path (``ops/quant.py``): folded
    weights get per-channel int8 scales, activations a dynamic per-tensor
    scale.  conv0 (shape-limited) and the HBM-bound head stay float.
    """
    if not train:
        return _visual_encoder_apply_folded(params, state, x, quant=quant), state

    new_state = {}
    for i in range(len(_STAGE_GEOM)):
        name = f"conv{i}"
        if name not in params:
            break
        _, s, p = _STAGE_GEOM[i]
        x = L.conv2d_apply(params[name], x, stride=s, padding=p)
        x = jax.nn.relu(x)
        x = L.maxpool2d(x, *_POOL)
        x, new_state[f"bn{i}"] = L.batchnorm_apply(
            params[f"bn{i}"], state[f"bn{i}"], x, train, mask=mask)
    x = x.reshape(x.shape[0], -1)
    x = jax.nn.relu(L.linear_apply(params["head"], x))
    x = L.dropout(x, dropout_rate, train, rng)
    return x, new_state


def _bn_affine(bn_params, bn_state, eps: float = 1e-5):
    """Eval batchnorm as per-channel (s, t): y = s·x + t (f32)."""
    import jax.numpy as jnp

    scale = bn_params["scale"].astype(jnp.float32)
    inv = jax.lax.rsqrt(bn_state["var"].astype(jnp.float32) + eps)
    s = scale * inv
    t = bn_params["bias"].astype(jnp.float32) - bn_state["mean"].astype(jnp.float32) * s
    return s, t


def _visual_encoder_apply_folded(params, state, x, quant: bool = False):
    import jax.numpy as jnp

    n_stages = sum(1 for i in range(len(_STAGE_GEOM)) if f"conv{i}" in params)
    s_prev = t_prev = None
    for i in range(n_stages):
        _, st, pad = _STAGE_GEOM[i]
        w = params[f"conv{i}"]["w"].astype(jnp.float32)
        b = params[f"conv{i}"]["b"].astype(jnp.float32)
        if s_prev is not None:  # absorb bn_{i-1}: conv(s·z + t) = conv(s·z) + corr
            # The additive part must respect zero padding (border outputs see
            # fewer t-taps), so compute it exactly as a batch-1 conv over a
            # t-filled map — broadcast-added like a spatial bias (negligible
            # cost: 1/N of the stage's conv work).
            t_map = jnp.broadcast_to(
                t_prev.astype(x.dtype), (1, x.shape[1], x.shape[2], w.shape[2])
            )
            corr = L.conv2d_apply(
                {"w": w.astype(x.dtype), "b": b.astype(x.dtype)}, t_map,
                stride=st, padding=pad,
            )
            w = w * s_prev[None, None, :, None]
            if quant:
                # int8 MXU path for the FLOPs-dominant stages (conv1/conv2)
                from cvml_goalnet_tpu.ops.quant import quantized_conv2d

                x = quantized_conv2d(x, w, stride=st, padding=pad) + corr
            else:
                folded = {"w": w.astype(x.dtype), "b": jnp.zeros_like(b, x.dtype)}
                x = L.conv2d_apply(folded, x, stride=st, padding=pad) + corr
        else:
            folded = {"w": w.astype(x.dtype), "b": b.astype(x.dtype)}
            x = L.conv2d_apply(folded, x, stride=st, padding=pad)
        x = jax.nn.relu(x)
        x = L.maxpool2d(x, *_POOL)
        s_prev, t_prev = _bn_affine(params[f"bn{i}"], state[f"bn{i}"])
    # absorb the last bn into the head linear (flatten is channel-last)
    hw = x.shape[1] * x.shape[2]
    s_flat = jnp.tile(s_prev, hw)
    t_flat = jnp.tile(t_prev, hw)
    w = params["head"]["w"].astype(jnp.float32)
    w_folded = (w * s_flat[:, None]).astype(x.dtype)
    b_folded = (params["head"]["b"].astype(jnp.float32) + t_flat @ w).astype(x.dtype)
    # The flatten+GEMM (K=H·W·C, N=feature_dim) tiles poorly on the MXU
    # (~25–36% of bf16 peak); the SAME contraction expressed as an H×W VALID
    # convolution hits 65% — XLA's conv tiler K-splits spatially where its
    # GEMM tiler cannot (measured: 9.88→5.47 ms at B=16384,
    # benchmarks/head_explore.py; docs/BENCHMARKS.md).  Row-major flatten of
    # NHWC means w.reshape(H, W, C, out) IS the HWIO kernel — bit-identical
    # results (max_err 0.0 at bf16 on TPU).
    w_hwio = w_folded.reshape(x.shape[1], x.shape[2], x.shape[3], -1)
    y = jax.lax.conv_general_dilated(
        x, w_hwio, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # explicit flat dim (not -1): reshape(-1) infers by dividing the element
    # count, which ZeroDivisionErrors on an empty batch (B=0 serving edge)
    return jax.nn.relu(
        y.reshape(x.shape[0], y.shape[1] * y.shape[2] * y.shape[3]) + b_folded)
