"""Pallas TPU SpMV kernel (placeholder — XLA fallback until the row-tiled
kernel lands; see kernels/ roadmap in README)."""

from __future__ import annotations


def spmv(a, x):
    from ..ops import matvec

    return matvec.spmv(a, x, backend="xla")
