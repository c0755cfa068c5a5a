"""Shared TPU timing helper: in-program scan chaining with verified results.

**The root failure mode, isolated empirically through the axon tunnel:**
``block_until_ready`` does not reliably wait for device execution — a
single dispatch of a ~1.2 s scan of train steps "blocked" in 0.000 s with
genuinely distinct inputs, and a later host readback of its loss produced
the correct value (the work happened, just not inside the "blocked"
window).  Every earlier anomaly reduces to this one cause:

* cheap programs under the async identical-dispatch loop (bench.py's
  methodology) read physically impossible times — 0.035 ms for a
  2.8 GB-input preprocess (~80 TB/s), 0.027 ms for the banded flash kernel
  (40× flat peak) — because the final block returns early and nothing
  else paces the loop;
* the HEAVY full bench program reads correctly under the same loop
  (51.6 ms/iter vs 53.8 verified) because the client's bounded in-flight
  execution queue applies BACKPRESSURE: once the queue fills, each
  dispatch waits for a real execution to retire, so per-iter ≈ true
  device time.  Backpressure, not the block, is what makes bench.py's
  number honest — and it only engages when executions are slower than
  dispatch;
* cross-DISPATCH dependent chains (each call consuming the previous
  call's output) measure real work when ended with a readback but add
  ~470 ms/call of tunnel turnaround for dependent dispatches (523 ms/iter
  cross-chained vs 53.8 in-program for the same body).

**What this helper does — and why each piece is necessary:**

1. ONE dispatch: a ``lax.scan`` of K body iterations inside a single jit —
   no per-iteration dispatch or dependent-dispatch turnaround;
2. the timed window closes on a HOST READBACK (``float(...)``) of the
   carry, the only operation observed to truly wait for execution;
3. the carry accumulates a FULL reduction of every iteration's output and
   its final value is asserted equal to ``acc0 + K × sum(single_run)`` —
   the backend cannot produce the right value without doing the work
   K times, so a lying clock OR a skipped execution fails loudly;
4. the first input is perturbed in-scan by a carry-derived identity
   (XOR 0 for ints, ×1.0 for floats) so no algebraic invariance can hoist
   the body out of the loop (an additive perturbation collapses against
   the shift-invariant min-max normalize — measured);
5. every warmup/repeat seeds a DISTINCT integer-valued initial carry
   (exactly representable — a ``×(1+1e-9)`` perturbation rounds back to
   the identical f32 bits and defeats the purpose), so no two dispatches
   are byte-identical;
6. per-iteration time comes from differencing two scan lengths, each the
   minimum of 5 repeats — cancels dispatch latency and pins both lengths
   to the same turnaround floor (single-draw variance exceeded the signal
   for sub-ms programs: a negative differenced time was observed).

Validation on the full bench program (B=16384, bf16+int8): async loop
51.6 ms/iter, verified scan chain 53.8 ms/iter including the perturbation's
~7 ms of extra HBM traffic — the two agree, anchoring both methodologies.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _perturb(x, tick):
    """Data-dependent identity: XOR 0 for ints, ×1 for floats."""
    if jnp.issubdtype(x.dtype, jnp.floating):
        return x * (1.0 + tick).astype(x.dtype)
    return jax.lax.bitwise_xor(x, tick.astype(x.dtype))


def timed_scan_verified(fn, *args, iters: int = 20, base_iters: int = 5) -> float:
    """Mean seconds/call of ``fn(*args)``, serial-execution-verified.

    ``fn``'s first argument is perturbed by a carry-derived identity; the
    carry accumulates a full reduction of the first float output leaf, the
    timed window closes on a host readback of the carry, and the final
    carry is asserted equal to ``acc0 + K × (single run)`` — a failed
    assertion means the backend did NOT execute the body K times and the
    measurement would have been garbage.
    """

    def leaf_of(out):
        for l in jax.tree_util.tree_leaves(out):
            if jnp.issubdtype(l.dtype, jnp.floating):
                return l
        raise TypeError("timed_scan_verified needs a floating output leaf")

    @partial(jax.jit, static_argnums=(2,))
    def scan_k(a, acc0, k):
        def body(acc, _):
            tick = (acc != acc).astype(jnp.float32)  # always 0.0, unprovable
            out = fn(_perturb(a[0], tick), *a[1:])
            # |·| before the reduction: a signed sum over a big mixed-sign
            # bf16 output is cancellation-dominated, and the scan-fused
            # compilation can legitimately differ from the standalone one by
            # more than any sane tolerance (observed 1.8%); the abs-sum is
            # rounding-stable while still requiring EVERY element
            return acc + jnp.sum(jnp.abs(leaf_of(out)).astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, acc0, None, length=k)
        return acc

    single = float(jnp.sum(jnp.abs(leaf_of(jax.jit(fn)(*args))).astype(jnp.float32)))
    times = {}
    seq = 0.0
    for k in (base_iters, iters):
        float(scan_k(args, jnp.float32(seq), k))  # compile + real completion
        seq += 1.0
        best = float("inf")
        for _ in range(5):
            acc0 = seq
            seq += 1.0
            t0 = time.perf_counter()
            acc = float(scan_k(args, jnp.float32(acc0), k))  # readback closes the window
            best = min(best, time.perf_counter() - t0)
            # a skipped iteration shifts the carry by single/k ≥ 5–20%;
            # 2e-2 passes benign cross-compilation bf16 rounding
            if not np.isclose(acc - acc0, single * k,
                              rtol=2e-2, atol=1e-6 * abs(single) * k + 1e-12):
                raise RuntimeError(
                    f"verification failed at k={k}: carry {acc}−{acc0} != "
                    f"{k}×single {single * k} — the backend did not execute the chain"
                )
        times[k] = best
    return (times[iters] - times[base_iters]) / (iters - base_iters)


# Backwards-compatible name used by the bench scripts.
timed_chained = timed_scan_verified
