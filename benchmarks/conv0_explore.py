"""Exploration: alternative formulations of conv0 (k3, stride 3, pad 3).

After the head reformulation (head_explore.py), conv0 is the least efficient
stage left: 1.57 ms at B=2048 (0.5% of bf16 MXU peak, ~15× its ~85 MB HBM
floor) because K=27, N=64 wastes almost the whole 128×128 MXU tile.  The
stride-3 kernel-3 geometry means windows do NOT overlap — conv0 is exactly a
space-to-depth reshape followed by a (27 → 64) contraction — so several
reformulations compute the SAME function (reference geometry
`utils.py:151-152`; ours `models/visual.py::_STAGE_GEOM`):

* ``s2d_gemm``      — pad to 45×45, reshape to (B·225, 27), one GEMM;
* ``s2d_gemm_k32``  — same with K zero-padded to 32 (sublane-aligned loads);
* ``s2d_conv1x1``   — space-to-depth then a 1×1 conv (conv tiler, K=27);
* ``s2d_gemm_n128`` — K=32 AND N zero-padded to 128 (full MXU tile width);
* ``wide_gemm``     — pack a full output ROW per GEMM row: (B·15, 45·3=135)
  × block-diagonal is wrong for overlap, but stride 3 has none, so instead
  reshape each output row's 15 disjoint windows to the SAME GEMM as s2d —
  kept only as a layout variant with H-major vs W-major flatten.

Each variant is verified against ``lax.conv_general_dilated`` before timing.
One JSON line per (variant, batch).  Run on TPU:
``python benchmarks/conv0_explore.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from cvml_goalnet_tpu.utils import apply_platform_override

apply_platform_override()

import jax
import jax.numpy as jnp

BF16_PEAK_TFLOPS = 197.0


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed_chained(fn, x, iters: int = 20) -> float:
    @jax.jit
    def run(x):
        def body(c, _):
            out = fn(x + c.astype(x.dtype))
            return jnp.mean(out).astype(jnp.float32) * 1e-12, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    run(x).block_until_ready()
    t0 = time.perf_counter()
    run(x).block_until_ready()
    t1 = time.perf_counter()
    run(x).block_until_ready()
    dt = (time.perf_counter() - t1 + (t1 - t0)) / 2
    return dt / iters


def _s2d(x):
    """(B, 40, 40, 3) → (B, 15, 15, 27) non-overlapping stride-3 windows.

    conv0 pads 3 on every side; output position (i, j) reads padded rows
    3i..3i+2 — i ≤ 14 needs padded rows ≤ 44, so (3, 2) padding to 45
    suffices and windows tile the 45×45 plane exactly.
    """
    b = x.shape[0]
    xp = jnp.pad(x, ((0, 0), (3, 2), (3, 2), (0, 0)))
    xw = xp.reshape(b, 15, 3, 15, 3, x.shape[3])
    return xw.transpose(0, 1, 3, 2, 4, 5).reshape(b, 15, 15, 3 * 3 * x.shape[3])


def main() -> None:
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 64)).astype(np.float32) * 0.1
                    ).astype(jnp.bfloat16)           # HWIO
    b = jnp.asarray(rng.standard_normal((64,)).astype(np.float32) * 0.1
                    ).astype(jnp.bfloat16)
    w27 = w.reshape(27, 64)                           # (kh, kw, cin) row-major

    # Every variant ends in the production ReLU (conv0 feeds relu+pool in
    # the real stack).  The nonlinearity also defeats scan-level algebraic
    # simplification of the chained timing loop: a purely linear body lets
    # the compiler collapse mean(f(x + c)) across iterations — the first run
    # of this script measured a physically impossible 0.005 ms for a linear
    # variant at B=16384 (1262% of peak) before this guard.
    def conv_ref(x):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(3, 3), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.relu(y + b)

    def s2d_gemm(x):
        xs = _s2d(x)
        y = jax.nn.relu(jnp.dot(xs.reshape(-1, 27), w27) + b)
        return y.reshape(x.shape[0], 15, 15, 64)

    w32 = jnp.pad(w27, ((0, 5), (0, 0)))

    def s2d_gemm_k32(x):
        xs = jnp.pad(_s2d(x), ((0, 0), (0, 0), (0, 0), (0, 5)))
        y = jax.nn.relu(jnp.dot(xs.reshape(-1, 32), w32) + b)
        return y.reshape(x.shape[0], 15, 15, 64)

    w_1x1 = w27.reshape(1, 1, 27, 64)

    def s2d_conv1x1(x):
        xs = _s2d(x)
        y = jax.lax.conv_general_dilated(
            xs, w_1x1, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.relu(y + b)

    w128 = jnp.pad(w27, ((0, 5), (0, 64)))

    def s2d_gemm_n128(x):
        xs = jnp.pad(_s2d(x), ((0, 0), (0, 0), (0, 0), (0, 5)))
        y = jax.nn.relu(jnp.dot(xs.reshape(-1, 32), w128)[:, :64] + b)
        return y.reshape(x.shape[0], 15, 15, 64)

    variants = [("conv_ref", conv_ref), ("s2d_gemm", s2d_gemm),
                ("s2d_gemm_k32", s2d_gemm_k32), ("s2d_conv1x1", s2d_conv1x1),
                ("s2d_gemm_n128", s2d_gemm_n128)]

    batches = tuple(
        int(s) for s in os.environ.get("GOALNET_BENCH_BATCHES", "2048,16384").split(",")
    )
    for batch in batches:
        x = jnp.asarray(rng.random((batch, 40, 40, 3)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        ref = np.asarray(jax.jit(conv_ref)(x).astype(jnp.float32))
        fl = 2 * batch * 15 * 15 * 27 * 64
        for name, fn in variants:
            got = np.asarray(jax.jit(fn)(x).astype(jnp.float32))
            err = float(np.max(np.abs(got - ref)))
            if err > 0.05:
                emit(metric="conv0_explore", variant=name, batch=batch,
                     REJECTED_max_err=err)
                continue
            t = timed_chained(fn, x)
            emit(metric="conv0_explore", variant=name, batch=batch,
                 ms=round(t * 1e3, 3), max_err=round(err, 5),
                 tflops=round(fl / t / 1e12, 2),
                 pct_bf16_peak=round(100 * fl / t / 1e12 / BF16_PEAK_TFLOPS, 2))


if __name__ == "__main__":
    main()
