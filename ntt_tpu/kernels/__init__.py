"""Pallas TPU kernels — VMEM-resident fused transforms."""

from .vmem_ntt import ntt_along_axis_pallas  # noqa: F401
