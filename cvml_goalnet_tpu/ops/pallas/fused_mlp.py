"""Pallas kernel: the 5-layer fusion MLP fused into one VMEM-resident program.

The fusion head (reference ``AVM.fusion``, ``utils.py:242-258``; our
``models/avm.py``) is a chain of small matmuls — 640→512→512→256→128→1 — whose
weights total ≈0.66M params (~2.6 MB f32): they fit in VMEM alongside a block
of activations.  The kernel tiles the batch dimension and runs the whole
chain per tile, so hidden activations never touch HBM and the five matmuls
execute back-to-back on the MXU with no kernel-launch or fusion-boundary
overhead.

Inference-mode only (no dropout); training uses the XLA path where autodiff
applies.  Tested for exact agreement with the XLA fusion chain.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, *refs, n_layers: int, out_lo: float, out_hi: float):
    ws = refs[:n_layers]
    bs = refs[n_layers : 2 * n_layers]
    out_ref = refs[2 * n_layers]
    x = x_ref[:]
    for i in range(n_layers):
        x = jnp.dot(x, ws[i][:], preferred_element_type=jnp.float32) + bs[i][:]
        if i < n_layers - 1:
            x = jnp.maximum(x, 0.0)
    out_ref[:] = (out_hi - out_lo) * jax.nn.sigmoid(x) + out_lo


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def fused_fusion_mlp(
    x: jax.Array,
    fusion_params: tuple,
    out_lo: float = 1.0,
    out_hi: float = 5.0,
    block_rows: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """x: (N, D) fused features; fusion_params: tuple of {"w","b"} per layer.

    Returns (N, 1) importance scores in [out_lo, out_hi] — identical to the
    eval-mode fusion chain in ``models/avm.py``.
    """
    n, d = x.shape
    n_layers = len(fusion_params)
    pad = (-n) % block_rows
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, d), x.dtype)])
    rows = x.shape[0]

    ws = [p["w"] for p in fusion_params]
    bs = [p["b"].reshape(1, -1) for p in fusion_params]

    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in ws
    ]
    b_specs = [
        pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for b in bs
    ]
    out = pl.pallas_call(
        partial(_kernel, n_layers=n_layers, out_lo=out_lo, out_hi=out_hi),
        grid=(rows // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *w_specs,
            *b_specs,
        ],
        out_specs=pl.BlockSpec((block_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        interpret=interpret,
    )(x, *ws, *bs)
    return out[:n]
