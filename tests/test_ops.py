"""Unit tests for the core device ops: expand, clips, fscore, knapsack.

Test strategy per SURVEY.md §4: the reference ships no tests, so each op is
validated against (a) an independent loop-formulated host mirror and (b)
brute-force ground truth on small instances.
"""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from cvml_goalnet_tpu.ops.clips import clip_stats, clip_stats_host
from cvml_goalnet_tpu.ops.expand import expand_scores, expand_scores_host
from cvml_goalnet_tpu.ops.fscore import fscore_against_users, fscore_against_users_host
from cvml_goalnet_tpu.ops.knapsack import (
    knapsack_select,
    knapsack_table_device,
    knapsack_table_host,
    _traceback,
)


def _expand_reference_loop(arr, rate, length):
    """Direct transcription of the reference algorithm (utils.py:396-410)."""
    arr = list(arr)
    if len(arr) == length:
        return np.asarray(arr)
    out = []
    for el in arr:
        out += [el] * rate
    if len(out) >= length:
        out = out[:length]
    else:
        out += [out[-1]] * (length - len(out))
    return np.asarray(out)


class TestExpand:
    @pytest.mark.parametrize(
        "n,skip,full", [(10, 30, 300), (10, 30, 295), (10, 30, 330), (4, 3, 20), (7, 5, 7)]
    )
    def test_matches_reference_semantics(self, n, skip, full, rng):
        scores = rng.integers(1, 6, n).astype(np.float32)
        want = _expand_reference_loop(scores, skip, full)
        np.testing.assert_array_equal(np.asarray(expand_scores(jnp.asarray(scores), skip, full)), want)
        np.testing.assert_array_equal(expand_scores_host(scores, skip, full), want)

    def test_identity_short_circuit(self, rng):
        scores = rng.standard_normal(50).astype(np.float32)
        out = expand_scores(jnp.asarray(scores), 30, 50)
        np.testing.assert_array_equal(np.asarray(out), scores)


class TestClips:
    def test_matches_host_loop(self, rng):
        imp = rng.integers(0, 6, 500).astype(np.float32)
        starts = np.sort(rng.choice(500, 20, replace=False))
        ends = np.concatenate([starts[1:], [520]])  # last end beyond N → clamps
        intervals = np.stack([starts, ends], 1)
        di, dl = clip_stats(jnp.asarray(intervals), jnp.asarray(imp))
        hi, hl = clip_stats_host(intervals, imp)
        np.testing.assert_allclose(np.asarray(di), hi, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(dl), hl)


class TestFscore:
    def test_device_matches_host(self, rng):
        pred = (rng.random(300) < 0.2).astype(np.uint8)
        users = (rng.random((20, 300)) < 0.15).astype(np.uint8)
        da, dm = fscore_against_users(jnp.asarray(pred), jnp.asarray(users))
        ha, hm = fscore_against_users_host(pred, users)
        assert np.isclose(float(da), ha, atol=1e-6)
        assert np.isclose(float(dm), hm, atol=1e-6)

    def test_perfect_and_empty(self):
        pred = np.array([1, 1, 0, 0], np.uint8)
        users = np.stack([pred, np.zeros(4, np.uint8)])
        avg, mx = fscore_against_users_host(pred, users)
        assert mx == 1.0 and avg == 0.5
        # empty prediction → all zeros, no NaN
        avg, mx = fscore_against_users_host(np.zeros(4, np.uint8), users)
        assert avg == 0.0 and mx == 0.0
        da, dm = fscore_against_users(jnp.zeros(4), jnp.asarray(users))
        assert float(da) == 0.0 and float(dm) == 0.0


def _brute_force_best(values, weights, capacity):
    best = 0.0
    n = len(values)
    for r in range(n + 1):
        for combo in itertools.combinations(range(n), r):
            w = sum(weights[i] for i in combo)
            if w <= capacity:
                best = max(best, sum(values[i] for i in combo))
    return best


class TestKnapsack:
    def test_host_vs_device_tables(self, rng):
        values = rng.integers(1, 50, 12).astype(np.float64)
        weights = rng.integers(1, 15, 12).astype(np.int64)
        cap = 40
        th = knapsack_table_host(values, weights, cap)
        td = np.asarray(knapsack_table_device(jnp.asarray(values), jnp.asarray(weights), cap))
        np.testing.assert_allclose(th, td, rtol=1e-6)

    @pytest.mark.parametrize("seed", range(5))
    def test_optimal_value_vs_brute_force(self, seed):
        rng = np.random.default_rng(seed)
        n = 9
        values = rng.integers(1, 30, n).astype(float).tolist()
        weights = rng.integers(1, 8, n).astype(int).tolist()
        cap = int(rng.integers(5, 20))
        sel = knapsack_select(values, weights, cap, scale_factor=1, engine="host")
        got = sum(values[i] for i in sel)
        assert sum(weights[i] for i in sel) <= cap
        assert got == _brute_force_best(values, weights, cap)

    def test_engines_agree(self, rng):
        values = rng.integers(1, 100, 25).astype(float)
        weights = (rng.integers(1, 40, 25) / 4).astype(float)  # fractional → ×5 scaling
        cap = 60
        host = knapsack_select(values, weights, cap, engine="host")
        device = knapsack_select(values, weights, cap, engine="device")
        assert host == device
        from cvml_goalnet_tpu.runtime import native_knapsack_available

        if native_knapsack_available():
            native = knapsack_select(values, weights, cap, engine="native")
            assert host == native

    def test_scale_factor_semantics(self):
        # weights ×5 and capacity ×5, as reference utils.py:477-479.
        sel = knapsack_select([10.0, 10.0], [1.2, 1.4], 2.0, scale_factor=5, engine="host")
        # scaled: weights 6, 7; capacity 10 → only one item fits.
        assert len(sel) == 1

    def test_traceback_reference_rule(self):
        # Crafted tie: equal items → the DP row for item 1 inherits item 0's
        # value, so traceback skips item 1 and takes item 0 — the reference's
        # skip-when-inherited rule (utils.py:499-505).
        values = np.array([5.0, 5.0])
        weights = np.array([3, 3], np.int64)
        table = knapsack_table_host(values, weights, 3)
        sel = _traceback(table, values, weights, 3)
        assert sel == [0]
        from cvml_goalnet_tpu.runtime import knapsack_native, native_knapsack_available

        if native_knapsack_available():
            assert knapsack_native(values, weights, 3) == [0]

    def test_empty_and_zero_capacity(self):
        assert knapsack_select([], [], 10, engine="host") == []
        assert knapsack_select([1.0], [1.0], 0, engine="host") == []


class TestKnapsackDeviceExactness:
    """Round-2 hardening: the device engine must never diverge from host
    (ADVICE round 1: f32 table vs f64 traceback equality)."""

    def test_float_values_route_to_exact_engine(self):
        rng = np.random.default_rng(7)
        values = rng.random(30) * 100          # fractional importances
        weights = rng.integers(1, 20, 30).astype(float)
        host = knapsack_select(values, weights, 80, engine="host")
        device = knapsack_select(values, weights, 80, engine="device")
        assert host == device

    def test_large_integer_values_exact(self):
        # Sums beyond the f32 integer-exactness bound (2^24) — would break a
        # f32 device table; the int32 device DP stays exact.
        values = [float(2**23 + i) for i in range(8)]
        weights = [1.0] * 8
        host = knapsack_select(values, weights, 5, engine="host")
        device = knapsack_select(values, weights, 5, engine="device")
        assert host == device
        assert len(host) == 5

    def test_int_table_dtype(self):
        import jax.numpy as jnp
        t = knapsack_table_device(jnp.arange(4, dtype=jnp.int32), jnp.ones(4, jnp.int32), 3)
        assert t.dtype == jnp.int32

    @pytest.mark.parametrize("seed", range(8))
    def test_device_traceback_matches_host(self, seed):
        # round 4: the device engine's traceback moved on-device (reverse
        # lax.scan) — it must reproduce the reference's skip-when-inherited
        # rule EXACTLY, including tie-heavy value sets where many rows
        # inherit (the skip branch) and early-exhaustion (res hits 0)
        rng = np.random.default_rng(seed)
        n = int(rng.integers(5, 40))
        values = rng.integers(0, 6, n).astype(float)   # small range → many ties
        weights = rng.integers(1, 9, n).astype(float)
        cap = int(rng.integers(1, 50))
        host = knapsack_select(values, weights, cap, engine="host")
        device = knapsack_select(values, weights, cap, engine="device")
        assert host == device

    def test_auto_uses_device_past_crossover(self, monkeypatch):
        # auto = device (accelerator + integral + table past the measured
        # crossover, where the VPU sweep beats BOTH host engines) > native
        # > host — so device must be picked even with the native build up
        import cvml_goalnet_tpu.ops.knapsack as K
        import cvml_goalnet_tpu.runtime as rt

        monkeypatch.setattr(rt, "native_knapsack_available", lambda: True)
        monkeypatch.setattr(K.jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(K, "DEVICE_CROSSOVER_CELLS", 10)
        called = {}
        real = K.knapsack_select_device

        def spy(v, w, c):
            called["hit"] = True
            return real(v, w, c)

        monkeypatch.setattr(K, "knapsack_select_device", spy)
        sel = K.knapsack_select([3.0, 4.0, 5.0], [2.0, 3.0, 4.0], 5, engine="auto")
        assert called.get("hit") and sel == K.knapsack_select(
            [3.0, 4.0, 5.0], [2.0, 3.0, 4.0], 5, engine="host")
        # float values must NOT route to the int32 device path even past the
        # crossover — exactness first (ADVICE round 1)
        called.clear()
        monkeypatch.setattr(rt, "native_knapsack_available", lambda: False)
        K.knapsack_select([3.5, 4.25], [2.0, 3.0], 5, engine="auto")
        assert "hit" not in called
