"""Pallas TPU kernels for the hot geometry ops."""

from .chamfer_kernel import nndistance_pallas, nndistance_score_pallas

__all__ = ["nndistance_pallas", "nndistance_score_pallas"]
