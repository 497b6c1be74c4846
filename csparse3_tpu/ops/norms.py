"""Matrix norms (reference: csc_norm 1-norm, src/CSparse3/csc_numba.py:723-739)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..types import CSC
from . import construct

__all__ = ["norm"]


def norm(a: CSC, ord=1):
    """ord=1 (max abs column sum, the reference's csc_norm), inf (max abs
    row sum), or 'fro'."""
    k = a.nnz
    absdata = jnp.abs(a.data[:k])
    if ord == 1:
        cols = construct.expand_indptr(a.indptr, k)
        colsums = jax.ops.segment_sum(absdata, cols, num_segments=a.n)
        return jnp.max(colsums) if a.n else jnp.zeros((), absdata.dtype)
    if ord in (jnp.inf, float("inf"), "inf"):
        rowsums = jax.ops.segment_sum(absdata, a.indices[:k], num_segments=a.m)
        return jnp.max(rowsums) if a.m else jnp.zeros((), absdata.dtype)
    if ord in ("fro", "f", 2):
        return jnp.sqrt(jnp.sum(absdata * absdata))
    raise ValueError(f"unsupported norm ord={ord!r}")
