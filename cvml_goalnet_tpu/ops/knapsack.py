"""0/1 knapsack keyshot selection.

Capability parity with reference ``knapsack`` (``utils.py:466-510``): select
clip indices maximizing summed importance subject to a total-length budget,
with weights and capacity scaled by an integer ``scale_factor`` and a
greedy-from-the-end traceback over the DP table.

The reference builds the (n+1)×(W+1) table with a doubly nested Python loop —
the hot host loop flagged in SURVEY.md §3.1.  Here there are three engines:

* :func:`knapsack_table_host`   — NumPy, row-vectorized: each item row is one
  shifted ``maximum`` over the capacity axis.  O(n·W) work but W-wide SIMD.
* :func:`knapsack_table_device` — the same recurrence as a ``lax.scan`` over
  items on TPU; each scan step is a masked shift+max over the capacity axis
  (VPU-friendly, static shapes).  Returns the stacked table for traceback.
* the optional C++ engine in ``runtime/`` (see ``cvml_goalnet_tpu.runtime``),
  used automatically when its shared library has been built.

Traceback is data-dependent and O(n), so it stays on the host — the pragmatic
device-DP/host-traceback split called out in SURVEY.md §7.3.  Its selection
rule replicates the reference exactly (``utils.py:494-510``): walk items from
the end; skip item i when ``K[i][w] == K[i-1][w]``; otherwise take it and
reduce the remaining value/capacity; stop when the remaining value hits 0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _scaled(weights, capacity, scale_factor):
    w = np.asarray([int(x * scale_factor) for x in np.asarray(weights).tolist()], dtype=np.int64)
    return w, int(capacity * scale_factor)


def knapsack_table_host(values: np.ndarray, weights: np.ndarray, capacity: int) -> np.ndarray:
    """DP table K of shape (n+1, capacity+1); weights/capacity already integer."""
    values = np.asarray(values)
    weights = np.asarray(weights, dtype=np.int64)
    n = len(values)
    table = np.zeros((n + 1, capacity + 1), dtype=values.dtype if values.dtype.kind == "f" else np.int64)
    row = table[0]
    for i in range(n):
        wi, vi = int(weights[i]), values[i]
        new = row.copy()
        if wi <= capacity:
            take = row[: capacity + 1 - wi] + vi
            new[wi:] = np.maximum(row[wi:], take)
        table[i + 1] = new
        row = new
    return table


@partial(jax.jit, static_argnums=(2,))
def knapsack_table_device(values: jax.Array, weights: jax.Array, capacity: int) -> jax.Array:
    """DP table via ``lax.scan`` over items, on device.

    ``capacity`` is static (it is derived from the raw frame count, which is a
    static shape upstream).  Each step computes
    ``row' = max(row, shift(row, w_i) + v_i)`` with the shift realized as a
    masked gather so the step stays O(W) vector work with no dynamic shapes.

    Integer ``values`` run the DP in int32 — exact, so the host traceback's
    ``==`` comparisons against the table are reliable at any magnitude below
    2³¹ (asserted by the caller).  Float values use f32, which is only exact
    for sums below 2²⁴; :func:`knapsack_select` routes float inputs to the
    host f64 engine instead.
    """
    weights = weights.astype(jnp.int32)
    wgrid = jnp.arange(capacity + 1, dtype=jnp.int32)
    if jnp.issubdtype(values.dtype, jnp.integer):
        values = values.astype(jnp.int32)
        neg = jnp.iinfo(jnp.int32).min // 2
    else:
        values = values.astype(jnp.float32)
        neg = -jnp.inf

    def step(row, item):
        v, w = item
        src = jnp.clip(wgrid - w, 0, capacity)
        take = jnp.where(wgrid >= w, row[src] + v, neg)
        new = jnp.maximum(row, take)
        return new, new

    row0 = jnp.zeros((capacity + 1,), values.dtype)
    _, rows = jax.lax.scan(step, row0, (values, weights))
    return jnp.concatenate([row0[None], rows], axis=0)


@partial(jax.jit, static_argnums=(2,))
def knapsack_select_device(values: jax.Array, weights: jax.Array, capacity: int) -> jax.Array:
    """Fully on-device select for INTEGER values: DP + traceback, → (n,) bool mask.

    The round-3 device engine stopped at the DP table and shipped the whole
    (n+1)×(W+1) int32 table to the host for traceback — ~36 MB for a 90-min
    match, which through a tunnel-attached TPU costs more than the DP itself.
    Here the reference traceback (``utils.py:494-510``) runs on device as a
    reverse ``lax.scan`` over items with carry ``(res, w)``: item i is taken
    iff still active (``res > 0``, ``w ≥ 0``) and ``K[i-1][w] != res`` —
    exact in int32 — and only the (n,) selection mask crosses back to host.
    """
    weights = weights.astype(jnp.int32)
    values = values.astype(jnp.int32)
    table = knapsack_table_device(values, weights, capacity)   # (n+1, W+1)
    n = values.shape[0]

    def step(carry, i):
        res, w = carry
        cont = (res > 0) & (w >= 0)
        prev = table[i - 1, jnp.clip(w, 0, capacity)]
        take = cont & (prev != res)
        res = jnp.where(take, res - values[i - 1], res)
        w = jnp.where(take, w - weights[i - 1], w)
        return (res, w), take

    (_, _), takes = jax.lax.scan(
        step,
        (table[n, capacity], jnp.asarray(capacity, jnp.int32)),
        jnp.arange(n, 0, -1, dtype=jnp.int32),
    )
    return takes[::-1]


# Measured on the real chip (benchmarks/knapsack_bench.py, v5e through the
# axon tunnel): e2e device-select latency is ~6.8 ns/cell + ~40 ms fixed
# (dispatch + compile-cache hit + mask transfer) vs ~11 ns/cell for the C++
# solver and ~15 ns/cell for NumPy — so past the fixed-cost amortization
# point the VPU row sweep beats BOTH host engines (measured 1.7×/2.1× over
# native/host at 1.1e8 cells, 1.68×/2.2× at 2.4e8, with ~50× tighter IQR).
# Analytic breakeven vs native ≈ 1e7 cells; 3e7 is a conservative margin —
# the 90-min match shape (9.1e6) stays on the native engine where it is
# (marginally) fastest.  See the engine table in docs/BENCHMARKS.md.
DEVICE_CROSSOVER_CELLS = 30_000_000


def _traceback(table: np.ndarray, values: np.ndarray, weights: np.ndarray, capacity: int) -> list[int]:
    """Reference-exact traceback (``utils.py:494-510``)."""
    n = len(values)
    res = table[n][capacity]
    w = capacity
    selected: list[int] = []
    for i in range(n, 0, -1):
        if res <= 0:
            break
        if w < 0:
            # only reachable for non-integral float values whose fp
            # subtraction breaks the exact-equality test below; numpy would
            # otherwise silently read a WRONG cell via negative indexing
            break
        if res == table[i - 1][w]:
            continue
        selected.append(i - 1)
        res = res - values[i - 1]
        w = w - int(weights[i - 1])
    selected.reverse()
    return selected


def knapsack_select(
    values,
    weights,
    capacity,
    scale_factor: int = 5,
    engine: str = "auto",
) -> list[int]:
    """Select clip indices under a length budget.

    Mirrors the reference entry ``knapsack(values, weights, capacity,
    scale_factor=5)`` (``utils.py:466-510``) — same scaling, same DP, same
    traceback — with a choice of DP engine:

    * ``"host"``   — NumPy vectorized rows
    * ``"device"`` — fully on-device ``lax.scan`` DP + traceback
      (:func:`knapsack_select_device`); integer values only — float values
      fall back to the host f64 engine (an f32 device table vs the f64
      traceback is not exact, ADVICE round 1)
    * ``"native"`` — C++ solver from ``runtime/`` (if built)
    * ``"auto"``   — the device engine when an accelerator backend is up,
      the values are integral, and the DP table exceeds
      :data:`DEVICE_CROSSOVER_CELLS` (past which the VPU row sweep beats
      BOTH host engines — measured, see the constant's comment); else
      native if built; else host
    """
    values = np.asarray(values, dtype=np.float64)
    w_arr = np.asarray(weights, dtype=np.float64)
    if w_arr.size and np.all(w_arr == np.floor(w_arr)) and capacity == int(capacity):
        # All-integer weights (the frame-count case): scaling weights and
        # capacity by the same factor leaves the feasible set, DP argmax, and
        # traceback decisions identical, so skip it — the DP table shrinks by
        # scale_factor× (90-min match: capacity 101,250 → 20,250 columns).
        scale_factor = 1
    int_weights, int_capacity = _scaled(weights, capacity, scale_factor)
    if len(values) == 0 or int_capacity <= 0:
        return []

    integral = bool(np.all(values == np.floor(values)))
    if engine == "auto":
        from cvml_goalnet_tpu.runtime import native_knapsack_available

        if (
            integral
            and len(values) * (int_capacity + 1) >= DEVICE_CROSSOVER_CELLS
            and jax.default_backend() != "cpu"
        ):
            engine = "device"
        elif native_knapsack_available():
            engine = "native"
        else:
            engine = "host"

    if engine == "native":
        from cvml_goalnet_tpu.runtime import knapsack_native

        return knapsack_native(values, int_weights, int_capacity)
    if engine == "device" and integral:
        # Integer importances (the pipeline path rounds to int8): the DP and
        # the traceback both run on device in exact int32; only the (n,)
        # selection mask comes back.
        iv = values.astype(np.int64)
        assert np.abs(iv).sum() < 2**31, "device knapsack int32 overflow"
        mask = np.asarray(knapsack_select_device(
            jnp.asarray(iv.astype(np.int32)), jnp.asarray(int_weights), int_capacity))
        return np.nonzero(mask)[0].tolist()
    table = knapsack_table_host(values, int_weights, int_capacity)
    return _traceback(table, values, int_weights, int_capacity)
