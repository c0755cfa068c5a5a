"""Pallas TPU kernels for the hot device paths.

XLA already fuses most of this pipeline well; these kernels exist where
explicit VMEM staging wins:

* :mod:`fused_preprocess` — per-frame min-max normalize + matmul bilinear
  resize in ONE VMEM pass (no normalized full-res intermediate in HBM).
* :mod:`fused_mlp` — the 5-layer fusion MLP with every hidden activation kept
  in VMEM (weights are small enough to pin on-chip).

Each kernel has an XLA reference implementation it is tested against
(interpret mode on CPU, compiled on TPU).
"""

from cvml_goalnet_tpu.ops.pallas.fused_preprocess import fused_preprocess_frames
from cvml_goalnet_tpu.ops.pallas.fused_mlp import fused_fusion_mlp

__all__ = ["fused_preprocess_frames", "fused_fusion_mlp"]
