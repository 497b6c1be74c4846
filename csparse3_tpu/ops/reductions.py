"""Reductions and structural cleanups.

Reference: csc_diagonal (src/CSparse3/csc_numba.py:600-616), csr_diagonal
(src/sparsetools/csr.h:35), csr_sum_duplicates (csr.h:1030),
csr_eliminate_zeros (csr.h:1073)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..types import CSC
from . import construct
from .arithmetic import eliminate_zeros  # re-export  # noqa: F401

__all__ = ["diagonal", "sum", "sum_duplicates", "eliminate_zeros"]


def diagonal(a: CSC):
    """Main diagonal as a dense vector (reference: csc_diagonal)."""
    k = a.nnz
    cols = construct.expand_indptr(a.indptr, k)
    rows = a.indices[:k]
    d = min(a.m, a.n)
    on_diag = rows == cols
    seg = jnp.where(on_diag, rows, d)  # off-diagonal entries -> dropped bucket
    out = jax.ops.segment_sum(
        jnp.where(on_diag, a.data[:k], 0), seg, num_segments=d + 1
    )
    return out[:d]


def sum(a: CSC, axis=None):
    k = a.nnz
    data = a.data[:k]
    if axis is None:
        return jnp.sum(data)
    if axis == 0:  # column sums -> (n,)
        cols = construct.expand_indptr(a.indptr, k)
        return jax.ops.segment_sum(data, cols, num_segments=a.n)
    if axis == 1:  # row sums -> (m,)
        return jax.ops.segment_sum(data, a.indices[:k], num_segments=a.m)
    raise ValueError(f"bad axis {axis}")


def sum_duplicates(a: CSC) -> CSC:
    return construct.canonicalize(a, sum_duplicates=True)
