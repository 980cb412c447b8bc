"""Pallas TPU kernels for the hot fused ops."""

from dynmm_tpu.kernels.se import fused_se, se_reference

__all__ = ["fused_se", "se_reference"]
