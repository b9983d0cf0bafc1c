"""Compute kernels: SpMV (per target x mode) and fused BLAS-1."""

from .blas1 import calc_p, calc_xr, dot
from .spmv import ERRCODES, SpmvStats, make_spmv, spmv_dense_oracle

__all__ = ["calc_p", "calc_xr", "dot", "ERRCODES", "SpmvStats", "make_spmv",
           "spmv_dense_oracle"]
