"""Per-stage roofline analysis of the visual conv stack (VERDICT item 2).

BASELINE.md target: "frame-feature throughput within 10% of roofline".
Round-1 measured the whole visual stack at 57% of bf16 MXU peak and argued
the gap away; this script MEASURES where the time goes, stage by stage, so
the ceiling claim is derived, not assumed:

* prefix timing: jit programs P_k that run the first k stages of the stack;
  each is iterated inside one ``lax.scan`` with a data-dependent carry (so
  iterations serialize) — per-stage time = (T(P_k) − T(P_{k−1})) / iters,
  immune to the ~1 ms per-dispatch tunnel overhead;
* for each conv, the analytic FLOPs and the im2col GEMM shape (M, K, N),
  plus a PURE-GEMM measurement of that exact shape — the realistic MXU
  ceiling for that stage on this chip (captures K/N padding to 128 and MXU
  scheduling, which the naive "peak TFLOP/s" figure ignores);
* pool/BN stages: VPU/HBM-bound by construction; their time is the price of
  the reference architecture's elementwise stages.

One JSON line per stage + a summary line.  Run on TPU:
``python benchmarks/roofline_bench.py`` (GOALNET_BENCH_BATCH overrides 2048).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from cvml_goalnet_tpu.utils import apply_platform_override

apply_platform_override()

import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.config import PipelineConfig
from cvml_goalnet_tpu.models import layers as L
from cvml_goalnet_tpu.train.state import create_train_state

BF16_PEAK_TFLOPS = 197.0  # v5e per chip
INT8_PEAK_TOPS = 394.0    # v5e int8 MXU peak (2× bf16)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed_chained(fn, x, iters: int = 20) -> float:
    """Seconds per call — verified in-program scan chain.

    Round-3 revision: the original local loop ended on ``block_until_ready``,
    which was later PROVEN not to reliably wait through the axon tunnel
    (docs/BENCHMARKS.md "Verified-execution timing"); the shared helper
    closes the window on a host readback, verifies the iteration count from
    the carry, and differences two scan lengths.
    """
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _timing import timed_scan_verified

    return timed_scan_verified(fn, x, iters=iters)


def main() -> None:
    batch = int(os.environ.get("GOALNET_BENCH_BATCH", 2048))
    cfg = PipelineConfig()
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    p = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        state.params["visual"],
    )
    s = state.model_state["visual"]

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((batch, 40, 40, 3)).astype(np.float32)).astype(jnp.bfloat16)

    # ---- stage definitions (eval mode) --------------------------------
    geom = ((3, 3, 3), (3, 1, 1), (3, 1, 1))

    def stage_conv(i, x):
        _, st, pad = geom[i]
        return L.conv2d_apply(p[f"conv{i}"], x, stride=st, padding=pad)

    def stage_postconv(i, x):
        x = jax.nn.relu(x)
        x = L.maxpool2d(x, 3, 1)
        x, _ = L.batchnorm_apply(p[f"bn{i}"], s[f"bn{i}"], x, train=False)
        return x

    def stage_head(x):
        x = x.reshape(x.shape[0], -1)
        return jax.nn.relu(L.linear_apply(p["head"], x))

    stages = []
    for i in range(3):
        stages.append((f"conv{i}", partial(stage_conv, i)))
        stages.append((f"relu_pool_bn{i}", partial(stage_postconv, i)))
    stages.append(("flatten_linear", stage_head))

    # analytic FLOPs per frame and im2col GEMM shapes
    spatial = {"conv0": (15, 3, 64), "conv1": (13, 64, 256), "conv2": (11, 256, 512)}
    flops = {}
    gemm_shapes = {}
    for name, (hw, cin, cout) in spatial.items():
        m, k, n = hw * hw, cin * 9, cout
        flops[name] = 2 * m * k * n
        gemm_shapes[name] = (batch * m, k, n)
    flops["flatten_linear"] = 2 * 41472 * 512
    gemm_shapes["flatten_linear"] = (batch, 41472, 512)

    # ---- prefix timing -------------------------------------------------
    def prefix_fn(k):
        def f(x):
            for _, fn in stages[:k]:
                x = fn(x)
            return x
        return f

    times = [0.0]
    for k in range(1, len(stages) + 1):
        times.append(timed_chained(prefix_fn(k), x0))

    total_flop = sum(flops.values()) * batch
    full_t = times[-1]
    emit(metric="visual_stack_total", batch=batch, ms=round(full_t * 1e3, 3),
         tflops=round(total_flop / full_t / 1e12, 1),
         pct_bf16_peak=round(100 * total_flop / full_t / 1e12 / BF16_PEAK_TFLOPS, 1))

    # the PRODUCTION eval path (batchnorms folded into the consuming conv /
    # linear weights — models/visual.py) for comparison with the per-stage sum
    from cvml_goalnet_tpu.models.visual import visual_encoder_apply

    def folded(x):
        out, _ = visual_encoder_apply(
            p, s, x, train=False, rng=jax.random.PRNGKey(0), dropout_rate=0.0
        )
        return out

    t_folded = timed_chained(folded, x0)
    emit(metric="visual_stack_folded_bn", batch=batch, ms=round(t_folded * 1e3, 3),
         tflops=round(total_flop / t_folded / 1e12, 1),
         pct_bf16_peak=round(100 * total_flop / t_folded / 1e12 / BF16_PEAK_TFLOPS, 1))

    for k, (name, _) in enumerate(stages, start=1):
        dt = times[k] - times[k - 1]
        row = {"metric": "visual_stage", "stage": name, "ms": round(dt * 1e3, 3)}
        if name in flops:
            fl = flops[name] * batch
            row["tflops"] = round(fl / max(dt, 1e-9) / 1e12, 1)
            row["pct_bf16_peak"] = round(100 * fl / max(dt, 1e-9) / 1e12 / BF16_PEAK_TFLOPS, 1)
            row["gemm_mkn"] = gemm_shapes[name]
        emit(**row)

    # ---- pure-GEMM ceilings for the conv shapes ------------------------
    for name, (m, k, n) in gemm_shapes.items():
        a = jnp.asarray(rng.random((m, k)).astype(np.float32)).astype(jnp.bfloat16)
        b = jnp.asarray(rng.random((k, n)).astype(np.float32)).astype(jnp.bfloat16)

        # scalar-carry chaining serializes the 20 GEMMs inside one dispatch;
        # perturb the SMALL operand (k, n) so chaining doesn't add an (m, k)
        # HBM rewrite per iteration
        @jax.jit
        def run(a):
            def body(c, _):
                out = jax.lax.dot(a, b + c, preferred_element_type=jnp.bfloat16)
                return jnp.mean(out).astype(jnp.bfloat16) * jnp.bfloat16(1e-8), None

            c, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=20)
            return c

        run(a).block_until_ready()
        t0 = time.perf_counter()
        run(a).block_until_ready()
        dt = (time.perf_counter() - t0) / 20
        fl = 2 * m * k * n
        emit(metric="pure_gemm_ceiling", for_stage=name, mkn=(m, k, n),
             ms=round(dt * 1e3, 3), tflops=round(fl / dt / 1e12, 1),
             pct_bf16_peak=round(100 * fl / dt / 1e12 / BF16_PEAK_TFLOPS, 1))

    # ---- int8 rows (round-3, VERDICT r2 item 3) ------------------------
    # (a) pure int8 GEMM ceilings of the same im2col shapes — the int8
    #     shape-aware ceiling the quantized production path is judged against
    for name, (m, k, n) in gemm_shapes.items():
        aq = jnp.asarray(rng.integers(-127, 128, (m, k), dtype=np.int8))
        bq = jnp.asarray(rng.integers(-127, 128, (k, n), dtype=np.int8))

        @jax.jit
        def run_q(aq):
            def body(c, _):
                out = jax.lax.dot(aq, bq + c, preferred_element_type=jnp.int32)
                return (jnp.max(out) % 3).astype(jnp.int8), None

            c, _ = jax.lax.scan(body, jnp.int8(0), None, length=20)
            return c

        run_q(aq).block_until_ready()
        t0 = time.perf_counter()
        run_q(aq).block_until_ready()
        dt = (time.perf_counter() - t0) / 20
        fl = 2 * m * k * n
        emit(metric="pure_gemm_ceiling_int8", for_stage=name, mkn=(m, k, n),
             ms=round(dt * 1e3, 3), tops=round(fl / dt / 1e12, 1),
             pct_int8_peak=round(100 * fl / dt / 1e12 / INT8_PEAK_TOPS, 1))

    # (b) the PRODUCTION int8 path (folded BN + int8 conv1/conv2 — what the
    #     headline bench runs) vs the bf16 folded stack measured above
    def folded_q(x):
        out, _ = visual_encoder_apply(
            p, s, x, train=False, rng=jax.random.PRNGKey(0), dropout_rate=0.0,
            quant=True,
        )
        return out

    t_fq = timed_chained(folded_q, x0)
    emit(metric="visual_stack_folded_int8", batch=batch, ms=round(t_fq * 1e3, 3),
         speedup_vs_bf16=round(t_folded / t_fq, 2))

    # (c) flatten→linear head variants: the stage is HBM-bound (37.7% of
    #     bf16 peak, ~212 MB traffic at B=2048) so int8 WEIGHTS (85→21 MB)
    #     and int8 weights+activations are candidate wins
    from cvml_goalnet_tpu.ops.quant import (
        quantize_act_per_tensor,
        quantize_weights_per_channel,
    )

    hw_head = p["head"]["w"]                       # (41472, 512) bf16
    hb = p["head"]["b"]
    wq_head, sw_head = quantize_weights_per_channel(
        hw_head.astype(jnp.float32), axis=1)
    wq_head = jax.device_put(wq_head)
    sw_row = jax.device_put(sw_head.reshape(1, -1))
    xh = jnp.asarray(
        rng.random((batch, 41472)).astype(np.float32)).astype(jnp.bfloat16)

    def head_bf16(x):
        return jax.nn.relu(jnp.dot(x, hw_head) + hb)

    def head_w8(x):
        # weight-only int8: convert(int8→bf16) fuses into the GEMM operand
        # load when XLA cooperates; measures whether weight traffic shrinks
        y = jnp.dot(x, wq_head.astype(jnp.bfloat16)) * sw_row.astype(jnp.bfloat16)
        return jax.nn.relu(y + hb)

    def head_w8a8(x):
        xq, sx = quantize_act_per_tensor(x)
        y = jax.lax.dot(xq, wq_head, preferred_element_type=jnp.int32)
        return jax.nn.relu(
            y.astype(jnp.float32) * (sx * sw_row) + hb.astype(jnp.float32)
        ).astype(x.dtype)

    fl_head = 2 * batch * 41472 * 512
    for name, fn in (("bf16", head_bf16), ("int8_weights", head_w8),
                     ("int8_w_and_act", head_w8a8)):
        t = timed_chained(fn, xh)
        emit(metric="head_variant", variant=name, ms=round(t * 1e3, 3),
             tflops=round(fl_head / t / 1e12, 1),
             pct_bf16_peak=round(100 * fl_head / t / 1e12 / BF16_PEAK_TFLOPS, 1))


if __name__ == "__main__":
    main()
