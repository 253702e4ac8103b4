"""Pallas TPU kernels + their pure-JAX correctness oracles.

Mirrors the role of the reference's native extension packages
(ED/backbone/ops/src: MSDeformAttn CUDA; ops_dcnv3/src: DCNv3 CUDA), rebuilt as
TPU kernels:

  flash_attention   fused attention for the SAM encoder's 4096-token global
                    layers with decomposed rel-pos bias folded into the tiles
  bilinear_gather   the shared grid-sample primitive (RVSA grid_sample,
                    MSDeformAttn, DCNv3 are all bilinear gather + weighted sum)
  msda              multi-scale deformable attention built on bilinear_gather
  dcnv3             deformable conv v3 built on bilinear_gather

Every kernel has a pure-JAX twin in `refs.py` (the analogue of the reference's
`ms_deform_attn_core_pytorch` / `dcnv3_core_pytorch` oracles) used for
correctness tests and as the CPU fallback.
"""

from samrs_tpu.kernels.flash_attention import flash_attention_relpos  # noqa: F401
