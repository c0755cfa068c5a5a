"""Int8 quantization for the inference hot path (v5e MXU int8 ≈ 2× bf16 peak).

Measured on v5e-1 (chained timing): the dominant visual conv (conv2 — 75% of
model FLOPs, 91% of bf16 peak) runs 1.54× faster as an int8×int8→int32 conv;
its im2col GEMM 1.59×.  The HBM-bound flatten→linear and the tiny conv0 gain
nothing, so quantization targets only the MXU-bound stages (conv1/conv2),
keeping everything else in the configured float dtype.

Scheme: symmetric, per-output-channel weight scales (weights are folded with
the consuming batchnorm first — ``models/visual.py``), dynamic symmetric
per-tensor activation scale (activations are post-ReLU, well-conditioned).
Dequantization is a single per-channel f32 multiply fused into the conv's
epilogue by XLA.  The reference has no quantization (PyTorch f32 end to end,
SURVEY.md §6 hardware: RTX 4060M).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weights_per_channel(w: jax.Array, axis: int = -1):
    """Symmetric int8 per-channel quantization → (w_q int8, scales f32).

    ``scales`` keeps ``w``'s rank with size 1 everywhere except ``axis`` so it
    broadcasts against the conv/GEMM output's channel dimension.
    """
    axis = axis % w.ndim
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis)
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes, keepdims=True)
    s = jnp.maximum(s / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_act_per_tensor(x: jax.Array):
    """Dynamic symmetric int8 per-tensor quantization → (x_q int8, scale f32)."""
    s = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def conv2d_int8(x_q: jax.Array, w_q: jax.Array, stride: int, padding: int) -> jax.Array:
    """int8 NHWC × int8 HWIO → int32 NHWC conv (MXU int8 path)."""
    dn = jax.lax.conv_dimension_numbers(x_q.shape, w_q.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x_q, w_q, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=dn, preferred_element_type=jnp.int32,
    )


def quantized_conv2d(x: jax.Array, w_f32: jax.Array, stride: int, padding: int,
                     out_dtype=None) -> jax.Array:
    """Float-in/float-out conv routed through the int8 MXU.

    ``w_f32``: (H, W, I, O) float weights (typically batchnorm-folded).
    Output = dequantized int32 accumulators: ``conv(x_q, w_q) · s_x · s_w``.
    """
    w_q, s_w = quantize_weights_per_channel(w_f32, axis=3)   # (1,1,1,O)
    x_q, s_x = quantize_act_per_tensor(x)
    y = conv2d_int8(x_q, w_q, stride, padding).astype(jnp.float32)
    y = y * (s_x * s_w.reshape(1, 1, 1, -1))
    return y.astype(x.dtype if out_dtype is None else out_dtype)


def linear_int8(x_q: jax.Array, w_q: jax.Array) -> jax.Array:
    """int8 (..., K) × int8 (K, N) → int32 (..., N) GEMM (MXU int8 path)."""
    return jax.lax.dot_general(
        x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def quantized_linear(params, x: jax.Array, out_dtype=None) -> jax.Array:
    """Float-in/float-out linear routed through the int8 MXU.

    Drop-in for ``layers.linear_apply(params, x)`` (same argument order) so
    the GEMM-dominant backbones (ViT blocks) can swap it in for eval-time
    int8.  Per-output-channel weight scales, dynamic per-tensor activation
    scale, f32 dequant + bias fused into the GEMM epilogue by XLA.
    """
    w_q, s_w = quantize_weights_per_channel(params["w"], axis=1)   # (1, N)
    x_q, s_x = quantize_act_per_tensor(x)
    y = linear_int8(x_q, w_q).astype(jnp.float32)
    y = y * (s_x * s_w.reshape(-1)) + params["b"].astype(jnp.float32)
    return y.astype(x.dtype if out_dtype is None else out_dtype)


# --------------------------------------------------------------- host mirrors
# NumPy mirrors of every device op above (repo convention: each device op
# has a host mirror + parity test), so the int8 rounding/scale semantics can
# be cross-checked off-device.


def quantize_weights_per_channel_host(w, axis: int = -1):
    import numpy as np

    w = np.asarray(w, np.float32)
    axis = axis % w.ndim
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis)
    s = np.max(np.abs(w), axis=reduce_axes, keepdims=True)
    s = np.maximum(s / 127.0, 1e-12)
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return q, s


def quantize_act_per_tensor_host(x):
    import numpy as np

    x = np.asarray(x, np.float32)
    s = max(float(np.max(np.abs(x))) / 127.0, 1e-12)
    q = np.clip(np.round(x / s), -127, 127).astype(np.int8)
    return q, np.float32(s)


def conv2d_int8_host(x_q, w_q, stride: int, padding: int):
    """Exact int32 mirror of :func:`conv2d_int8` via padded im2col matmul."""
    import numpy as np

    x = np.asarray(x_q, np.int32)
    w = np.asarray(w_q, np.int32)          # (kh, kw, I, O)
    n, h, wd, c = x.shape
    kh, kw, _, o = w.shape
    xp = np.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    oh = (h + 2 * padding - kh) // stride + 1
    ow = (wd + 2 * padding - kw) // stride + 1
    cols = np.empty((n, oh, ow, kh * kw * c), np.int32)
    for i in range(kh):
        for j in range(kw):
            patch = xp[:, i:i + oh * stride:stride, j:j + ow * stride:stride, :]
            cols[..., (i * kw + j) * c:(i * kw + j + 1) * c] = patch
    out = cols.reshape(n * oh * ow, kh * kw * c) @ w.reshape(kh * kw * c, o)
    return out.reshape(n, oh, ow, o)


def quantized_conv2d_host(x, w_f32, stride: int, padding: int):
    import numpy as np

    w_q, s_w = quantize_weights_per_channel_host(np.asarray(w_f32), axis=3)
    x_q, s_x = quantize_act_per_tensor_host(x)
    y = conv2d_int8_host(x_q, w_q, stride, padding).astype(np.float32)
    return y * (s_x * s_w.reshape(1, 1, 1, -1))


def quantized_linear_host(params, x):
    import numpy as np

    w_q, s_w = quantize_weights_per_channel_host(np.asarray(params["w"]), axis=1)
    x_q, s_x = quantize_act_per_tensor_host(x)
    y = (np.asarray(x_q, np.int32) @ np.asarray(w_q, np.int32)).astype(np.float32)
    return y * (s_x * s_w.reshape(-1)) + np.asarray(params["b"], np.float32)
