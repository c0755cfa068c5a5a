"""Shared TPU timing helper: in-program scan chaining with verified results.

Through the axon remote-execute tunnel, three naive timing methods fail:

* **Async identical dispatches** (bench.py's loop — N dispatches, one block)
  read physically impossible times for CHEAP programs: 0.035 ms for a
  2.8 GB-input preprocess (~80 TB/s) and 0.027 ms for the banded flash
  kernel (40× the chip's flat peak).  Repeated identical executions are
  elided or overlapped in the remote path.  (For the HEAVY full bench
  program the async loop is honest — verified below.)
* **Cross-dispatch token chains** (each call consumes a scalar produced by
  the previous call) serialize the device work but pay a large
  dependent-dispatch penalty through the tunnel: the full bench program
  measured 523 ms/iter cross-chained vs 53.8 ms/iter in-program — ~470 ms
  of client/tunnel overhead per dependent dispatch, not compute.
* **In-program scan chains with an additive perturbation** collapsed for
  the min-max-normalize preprocess (the stage is shift-invariant, so the
  perturbation is algebraically dead).

What works — and is unfakeable — is all three fixes at once:

1. ONE dispatch: a ``lax.scan`` of K body iterations inside a single jit
   (no per-iteration dispatch or tunnel cost);
2. a structurally opaque perturbation of the first input derived from the
   carry — integer inputs XOR a data-dependent 0 (``acc[0] != acc[0]``),
   float inputs multiply by a data-dependent 1 — which XLA cannot fold and
   no algebraic invariance can absorb;
3. a carry that REDUCES the full output every iteration (``acc + sum(out)``)
   whose final value is checked against ``K × sum(single_run)`` — the
   runtime cannot produce the right answer without doing the work K times.

Per-iteration time comes from differencing two scan lengths
(``(t(K) − t(K0)) / (K − K0)``), which cancels dispatch latency, the
(identical) compile-constant folding, and the one-time carry setup.

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
    carry accumulates a full reduction of the first float output leaf, and
    the final carry is asserted equal to ``K × (single run)`` — a failed
    assertion means the runtime did NOT execute the body K times and the
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
            return acc + jnp.sum(leaf_of(out).astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, acc0, None, length=k)
        return acc

    single = float(jnp.sum(leaf_of(jax.jit(fn)(*args)).astype(jnp.float32)))
    times = {}
    seq = 0.0
    for k in (base_iters, iters):
        scan_k(args, jnp.float32(seq), k).block_until_ready()  # compile
        seq += 1.0
        # Each measurement is ONE dispatch, so its wall time carries one
        # draw of tunnel round-trip latency whose variance can exceed the
        # 20×iter difference for sub-ms programs (observed: a negative
        # differenced time).  Repeating the compiled scan and keeping the
        # MINIMUM pins both k's to the same RTT floor, which the
        # difference then cancels.  Every repeat starts from a DIFFERENT
        # initial carry: the remote-execute path memoizes byte-identical
        # (executable, inputs) calls — observed returning a 1.2 s scan of
        # train steps in 0.000 s with the correct value, which min-of-N
        # would happily keep — and a distinct acc0 makes each dispatch
        # unmemoizable while the expected final carry stays checkable.
        best = float("inf")
        for _ in range(5):
            acc0 = seq
            seq += 1.0
            t0 = time.perf_counter()
            acc = float(scan_k(args, jnp.float32(acc0), k))
            best = min(best, time.perf_counter() - t0)
            if not np.isclose(acc - acc0, single * k,
                              rtol=5e-3, atol=1e-6 * abs(single) * k + 1e-12):
                raise RuntimeError(
                    f"verification failed at k={k}: carry {acc}−{acc0} != "
                    f"{k}×single {single * k} — the runtime did not execute the chain"
                )
        times[k] = best
    return (times[iters] - times[base_iters]) / (iters - base_iters)


# Backwards-compatible name used by the bench scripts.
timed_chained = timed_scan_verified
