"""Exploration: alternative formulations of the flatten→linear head.

The head (reshape (B, 9, 9, 512) → (B, 41472) then GEMM with (41472, 512);
reference `utils.py:178-186`'s Flatten + LazyLinear) measures ~25% of bf16
MXU peak as a plain GEMM (docs/BENCHMARKS.md int8-roofline section) — the
K=41472 contraction with N=512 tiles poorly.  Candidate reformulations that
compute the SAME function:

* ``conv9x9``  — a 9×9 VALID convolution with 512→512 channels: the im2col
  of that conv IS the flatten, so XLA's conv tiler (spatial K-splitting)
  gets a chance to beat its GEMM tiler.
* ``split_k``  — einsum ``bks,ksn->bn`` over x (B, 81, 512) and w
  (81, 512, 512): 81 K=512 GEMMs with an accumulation tree, trading one
  monolithic K for MXU-native K tiles.
* ``pallas``   — hand-tiled K-streaming matmul (ops/pallas/matmul.py):
  grid over (M/256, K/4608), f32 VMEM accumulator, bias+ReLU fused in the
  epilogue of the last K step.

Each variant is verified against the GEMM baseline before timing (atol
suited to bf16).  One JSON line per (variant, batch).  Run on TPU:
``python benchmarks/head_explore.py``.
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

BF16_PEAK_TFLOPS = 197.0  # v5e per chip


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed_chained(fn, x, iters: int = 20) -> float:
    """Seconds per call, data-dependent chaining inside one dispatch."""

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


def main() -> None:
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((41472, 512)).astype(np.float32) * 0.01
                    ).astype(jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((512,)).astype(np.float32) * 0.01
                    ).astype(jnp.bfloat16)
    # flatten order: (9, 9, 512) row-major == x.reshape(B, -1) of NHWC input
    w_conv = w.reshape(9, 9, 512, 512)          # HWIO
    w_split = w.reshape(81, 512, 512)

    def head_gemm(x4):                           # (B, 9, 9, 512)
        x = x4.reshape(x4.shape[0], -1)
        return jax.nn.relu(jnp.dot(x, w) + b)

    def head_conv(x4):
        y = jax.lax.conv_general_dilated(
            x4, w_conv, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y.reshape(x4.shape[0], 512) + b)

    def head_split_k(x4):
        xk = x4.reshape(x4.shape[0], 81, 512)
        y = jnp.einsum("bks,ksn->bn", xk, w_split,
                       preferred_element_type=jnp.float32)
        return jax.nn.relu(y.astype(x4.dtype) + b)

    variants = [("gemm_bf16", head_gemm), ("conv9x9", head_conv),
                ("split_k", head_split_k)]

    try:
        from cvml_goalnet_tpu.ops.pallas.matmul import head_matmul_pallas

        def head_pl(x4):
            x = x4.reshape(x4.shape[0], -1)
            return head_matmul_pallas(x, w, b)

        variants.append(("pallas", head_pl))
    except ImportError:
        emit(metric="head_explore", variant="pallas", skipped="no kernel yet")

    batches = tuple(
        int(s) for s in os.environ.get("GOALNET_BENCH_BATCHES", "2048,16384").split(",")
    )
    for batch in batches:
        x4 = jnp.asarray(rng.random((batch, 9, 9, 512)).astype(np.float32)
                         ).astype(jnp.bfloat16)
        ref = np.asarray(jax.jit(head_gemm)(x4).astype(jnp.float32))
        fl = 2 * batch * 41472 * 512
        for name, fn in variants:
            got = np.asarray(jax.jit(fn)(x4).astype(jnp.float32))
            err = float(np.max(np.abs(got - ref)))
            if err > 0.35:  # bf16 K=41472 accumulation-order tolerance
                emit(metric="head_explore", variant=name, batch=batch,
                     REJECTED_max_err=err)
                continue
            t = timed_chained(fn, x4)
            emit(metric="head_explore", variant=name, batch=batch,
                 ms=round(t * 1e3, 3), max_err=round(err, 4),
                 tflops=round(fl / t / 1e12, 1),
                 pct_bf16_peak=round(100 * fl / t / 1e12 / BF16_PEAK_TFLOPS, 1))


if __name__ == "__main__":
    main()
