"""Speed-of-light derivation for the banded flash-attention kernel.

The per-frame path has a shape-aware roofline (roofline_bench.py); this
closes the same loop for the TEMPORAL path's hot kernel — the sliding-window
flash attention that scores a full-rate 90-min match (T=135k, W=1024,
d=128: `timeline_bench.py` measures 13.4–13.6 ms for the whole 2-layer
scorer).

Ceiling construction: the banded kernel's MXU work at block size B is, per
query block, q·kᵀ against the 3-block covering band (B + 2W ≤ 3B extended
keys) plus the p·v combine — exactly two batched GEMMs of shape
(T/B) × [(B, d) @ (d, 3B)] and (T/B) × [(B, 3B) @ (3B, d)].  Those GEMMs,
measured as bare XLA ops on the same data, are the kernel's same-shape MXU
ceiling: everything the kernel adds (online softmax, running max/sum, lse
bookkeeping, band masking) rides the VPU between the two GEMMs.  The ratio
kernel/ceiling is the honest "speed of light" fraction; the VPU residual is
quantified by differencing.

Run on TPU: ``python benchmarks/flash_roofline_bench.py``
(GOALNET_BENCH_T / GOALNET_BENCH_WINDOW override T=135168 / W=1024).
"""

from __future__ import annotations

import functools
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

from cvml_goalnet_tpu.ops.pallas.flash_attention import flash_attention_local


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(fn, *args, iters: int = 45) -> float:
    """Verified in-program scan chain (see ``benchmarks/_timing.py``).

    The plain async loop read 0.027 ms for the bf16 banded kernel through
    the axon tunnel — 7,852 TFLOP/s, 40× the v5e's flat peak, physically
    impossible (timeline_bench measures the same op at ~5.2 ms); repeated
    identical executions are elided/overlapped in the remote path.  The
    scan chain forces serial execution and verifies the iteration count.
    """
    from _timing import timed_scan_verified

    return timed_scan_verified(fn, *args, iters=iters)


def main() -> None:
    on_cpu = jax.default_backend() == "cpu"
    t = int(os.environ.get("GOALNET_BENCH_T", 4096 if on_cpu else 135168))
    w = int(os.environ.get("GOALNET_BENCH_WINDOW", 256 if on_cpu else 1024))
    d, h, block = 128, 1, max(w, 1024 if not on_cpu else w)
    nb = t // block
    assert t % block == 0

    rng = np.random.default_rng(0)
    # flat peak: v5e bf16 datasheet 197 TF/s; no comparable f32 datasheet
    # figure (XLA runs f32 matmuls through bf16 passes), so f32 reports only
    # the GEMM-ceiling ratio
    for dtype, peak_tfs in ((jnp.bfloat16, 197.0), (jnp.float32, None)):
        q, k, v = (
            jnp.asarray(rng.standard_normal((h, t, d)).astype(np.float32)).astype(dtype)
            for _ in range(3)
        )
        # 1) the production kernel (CPU smoke: short interpret-mode chains)
        it = 8 if on_cpu else 45
        kern = functools.partial(flash_attention_local, window=w, interpret=on_cpu)
        ms_kernel = timed(lambda q, k, v: kern(q, k, v), q, k, v, iters=it) * 1e3

        # 2) same-shape batched-GEMM ceiling: per query block, the covering
        # extended-key band is 3 blocks wide (B + 2W with W ≤ B) — build the
        # (nb, 3B, d) banded keys by stacking shifted views, then run the
        # two bare GEMMs the kernel's MXU work consists of
        kp = jnp.pad(k[0], ((block, block), (0, 0)))
        vp = jnp.pad(v[0], ((block, block), (0, 0)))
        idx = (np.arange(nb)[:, None] * block
               + np.arange(3 * block)[None, :])            # (nb, 3B) into padded T
        kb, vb = kp[idx], vp[idx]                          # (nb, 3B, d)
        qb = q[0].reshape(nb, block, d)

        def gemms(qb, kb, vb):
            s = jnp.einsum("btd,bsd->bts", qb, kb)         # (nb, B, 3B)
            return jnp.einsum("bts,bsd->btd", s, vb)       # consumes s: no DCE

        ms_gemms = timed(gemms, qb, kb, vb, iters=it) * 1e3

        flops = 2 * 2 * nb * block * (3 * block) * d      # both GEMMs
        row = dict(metric="flash_banded_roofline", dtype=str(dtype.__name__),
                   t=t, window=w, block=block, d=d,
                   kernel_ms=round(ms_kernel, 3),
                   gemm_ceiling_ms=round(ms_gemms, 3),
                   pct_of_gemm_ceiling=round(100 * ms_gemms / ms_kernel, 1),
                   kernel_tflops=round(flops / ms_kernel / 1e9, 1),
                   gemm_tflops=round(flops / ms_gemms / 1e9, 1),
                   vpu_residual_ms=round(ms_kernel - ms_gemms, 3))
        if peak_tfs is not None:  # flat-peak % only where the datasheet
            row["pct_flat_peak"] = round(
                100 * flops / ms_kernel / 1e9 / peak_tfs, 1)
        emit(**row)


if __name__ == "__main__":
    main()
