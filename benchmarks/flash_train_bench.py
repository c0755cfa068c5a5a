"""Flash-attention TRAINING benchmark: full-rate transformer spotting on TPU.

VERDICT round 1 item 1: the tiled Pallas backward must train at full-rate
T=135k where the XLA backward needs a ~72 GB score-matrix residual.  This
script, on real TPU hardware:

1. checks compiled fwd+bwd gradient parity vs :func:`attention_reference`
   at T=2048 (where the XLA reference is still feasible);
2. runs REAL optimizer steps of the transformer spotting head through the
   tiled kernels at T=32k and T=135k (full-rate 90-min match) and reports
   chained-timing ms/step;
3. prints one JSON line per measurement.

Run: ``python benchmarks/flash_train_bench.py`` (GOALNET_BENCH_T caps the
largest T for smoke runs).
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

from cvml_goalnet_tpu.models.temporal_attention import temporal_transformer_init
from cvml_goalnet_tpu.ops.pallas.flash_attention import (
    attention_reference,
    flash_attention_trainable,
)
from cvml_goalnet_tpu.train.spotting import init_spotting_opt, make_spotting_train_step


INTERP = jax.default_backend() == "cpu"   # smoke runs: interpret-mode kernels


def emit(**kw):
    print(json.dumps(kw), flush=True)


def grad_parity(t: int = 2048, d: int = 128) -> None:
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((1, t, d)).astype(np.float32))
               for _ in range(3))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_trainable(q, k, v, None, INTERP) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    g1 = jax.jit(jax.grad(loss_flash, (0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(loss_ref, (0, 1, 2)))(q, k, v)
    diffs = {}
    for name, a, b in zip(("dq", "dk", "dv"), g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        diffs[name] = float(np.abs(a - b).max())
    emit(metric="flash_bwd_grad_parity", t=t, **diffs,
         ok=all(x < 1e-3 for x in diffs.values()))


def train_steps(t: int, iters: int = 10, model_dim: int = 128,
                window: int = 0) -> None:
    rng = np.random.default_rng(1)
    dim = 64
    feats = jnp.asarray(rng.standard_normal((t, dim)).astype(np.float32) * 0.1)
    labels = jnp.asarray((rng.random(t) < 0.01).astype(np.float32))
    params = temporal_transformer_init(
        jax.random.PRNGKey(0), dim, model_dim=model_dim, num_layers=2,
        num_heads=1, max_len=8192,
    )
    opt = init_spotting_opt(params)
    step = make_spotting_train_step(
        0, lr=1e-3, scorer="transformer", num_heads=1, use_flash=True,
        flash_interpret=INTERP, window=window,
    )
    t0 = time.perf_counter()
    params, opt, loss = step(params, opt, feats, labels)
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0

    # chained steps (each consumes the previous params) for honest timing
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt, loss = step(params, opt, feats, labels)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    emit(metric="flash_transformer_train_step", t=t, window=window,
         ms_per_step=round(dt * 1e3, 2),
         compile_s=round(compile_s, 1), loss=float(loss),
         finite=bool(np.isfinite(float(loss))))


def main() -> None:
    emit(backend=jax.default_backend(), devices=len(jax.devices()))
    grad_parity()
    cap = int(os.environ.get("GOALNET_BENCH_T", 135_000))
    for t in (32_768, 135_000):
        if t <= cap:
            train_steps(t, iters=5 if t > 100_000 else 10)
    # sliding-window training at full rate: O(T·W·d) fwd+bwd
    if 135_000 <= cap:
        train_steps(135_000, iters=5, window=1024)


if __name__ == "__main__":
    main()
