"""Pallas kernel: K-streamed tiled matmul for the flatten→linear head.

The visual head (reference ``utils.py:178-186``: Flatten + LazyLinear→512 +
ReLU; our ``models/visual.py``) is a (B, 41472) × (41472, 512) GEMM — a huge
contraction dimension feeding a narrow N.  As a monolithic XLA GEMM it
measures ~25% of bf16 MXU peak (docs/BENCHMARKS.md, int8-roofline section).
This kernel hand-tiles it:

* grid ``(M/bm, K/bk)`` with ``("parallel", "arbitrary")`` semantics — the K
  walk is sequential per M tile, so a single f32 VMEM accumulator carries
  partial sums across K steps (zeroed at k==0 via ``pl.when``);
* each step streams one (bm, bk) activation tile and one (bk, 512) weight
  tile through VMEM and issues one MXU contraction with f32 accumulation;
* bias add + ReLU fuse into the epilogue of the last K step, so the output
  tile is written exactly once.

Inference-path only (the training step keeps the XLA GEMM where autodiff
applies).  Exactness vs the XLA chain is tested in interpret mode on CPU and
compiled on TPU (tests/test_pallas_matmul.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, n_k: int, relu: bool):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _epilogue():
        y = acc_ref[:] + b_ref[:].astype(jnp.float32)
        if relu:
            y = jnp.maximum(y, 0.0)
        o_ref[:] = y.astype(o_ref.dtype)


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def head_matmul_pallas(
    x: jax.Array,            # (B, K)
    w: jax.Array,            # (K, N)
    b: jax.Array,            # (N,)
    relu: bool = True,
    block_m: int = 512,
    block_k: int = 2304,
    interpret: bool = False,
) -> jax.Array:
    """ReLU(x @ w + b) with a K-streamed Pallas matmul; output dtype = x.dtype.

    ``block_k`` must divide K and ``block_m`` sets the activation tile; the
    batch pads up to a ``block_m`` multiple (zero rows, sliced off after).
    VMEM per step at the defaults: x 2.4 MB + w 2.4 MB (double-buffered) +
    acc 1 MB — comfortably inside the 16 MB budget.
    """
    m, kdim = x.shape
    kw, n = w.shape
    if kdim != kw:
        raise ValueError(f"contraction mismatch: x K={kdim}, w K={kw}")
    if kdim % block_k:
        raise ValueError(f"block_k {block_k} must divide K {kdim}")
    pad = (-m) % block_m
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, kdim), x.dtype)])
    rows = x.shape[0]
    n_k = kdim // block_k

    out = pl.pallas_call(
        partial(_kernel, n_k=n_k, relu=relu),
        grid=(rows // block_m, n_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, n), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, n), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w, b.reshape(1, -1))
    return out[:m]
