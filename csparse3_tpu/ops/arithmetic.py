"""Elementwise sparse arithmetic.

The reference implements binary ops as a sequential 2-pointer merge over
sorted index streams (csr_binop_csr_canonical, src/sparsetools/csr.h:783-889,
dispatched from CscMat.__add__/__sub__ at src/CSparse3/csc.py:301-346; the
in-package alternative is the scatter-based csc_add_ff at
src/CSparse3/csc_numba.py:183-219).

On TPU a merge is a sort: the union pattern is ``sort(concat(keys_a,
keys_b))`` + duplicate collapse, and value lookup on a pattern is a
vectorized ``searchsorted``.  Both are single XLA ops that vectorize over
the whole nnz stream instead of walking columns one entry at a time.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import get_config
from ..types import CSC
from . import construct

__all__ = [
    "add",
    "sub",
    "axpby",
    "scale",
    "elmul",
    "eldiv",
    "maximum",
    "minimum",
    "compare",
    "equal",
    "eliminate_zeros",
]


def _check_shapes(a: CSC, b: CSC):
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")


def _key_dtype(m: int, n: int):
    """Fused (col*m + row) key dtype; int64 only when int32 would overflow."""
    if m * n < 2**31 - 1:
        return jnp.int32
    if not jax.config.jax_enable_x64:
        raise ValueError(
            f"matrix {m}x{n} needs int64 merge keys; enable jax_enable_x64 "
            "(mirrors the nnz overflow guard at reference csr.h:591-596)"
        )
    return jnp.int64


def _keys(a: CSC):
    """Per-entry fused sort key: col * m + row (sorted ascending when
    the matrix is canonical CSC)."""
    kd = _key_dtype(a.m, a.n)
    k = a.nnz
    cols = construct.expand_indptr(a.indptr, k).astype(kd)
    return cols * a.m + a.indices[:k].astype(kd)


def axpby(alpha, a: CSC, beta, b: CSC) -> CSC:
    """alpha*A + beta*B with exact union pattern
    (reference: csc_add_ff semantics, csc_numba.py:183-219)."""
    _check_shapes(a, b)
    ka, kb = a.nnz, b.nnz
    rows = jnp.concatenate([a.indices[:ka], b.indices[:kb]])
    cols = jnp.concatenate(
        [construct.expand_indptr(a.indptr, ka), construct.expand_indptr(b.indptr, kb)]
    )
    dtype = jnp.result_type(a.data.dtype, b.data.dtype)
    vals = jnp.concatenate(
        [jnp.asarray(alpha, dtype) * a.data[:ka], jnp.asarray(beta, dtype) * b.data[:kb]]
    )
    return construct.from_triplets(rows, cols, vals, a.shape)


def add(a: CSC, b: CSC) -> CSC:
    return axpby(1, a, 1, b)


def sub(a: CSC, b: CSC) -> CSC:
    return axpby(1, a, -1, b)


def scale(a: CSC, alpha) -> CSC:
    return CSC(
        a.m, a.n, a.indptr, a.indices, a.data * alpha,
        nnz=a.nnz, canonical=a.canonical,
    )


def _lookup(keys_sorted, data, query_keys):
    """Value of each query key in a sorted (keys, data) stream, 0 if absent."""
    pos = jnp.searchsorted(keys_sorted, query_keys)
    pos_c = jnp.clip(pos, 0, max(keys_sorted.shape[0] - 1, 0))
    if keys_sorted.shape[0] == 0:
        hit = jnp.zeros(query_keys.shape, dtype=bool)
        vals = jnp.zeros(query_keys.shape, dtype=data.dtype)
    else:
        hit = keys_sorted[pos_c] == query_keys
        vals = data[pos_c]
    return jnp.where(hit, vals, jnp.zeros((), dtype=data.dtype)), hit


def _union_binop(a: CSC, b: CSC, op: Callable, drop_zeros: bool) -> CSC:
    """Generic union-pattern binop (reference: csr_binop_csr, csr.h:891)."""
    _check_shapes(a, b)
    a = a if a.canonical else construct.canonicalize(a)
    b = b if b.canonical else construct.canonicalize(b)
    keys_a, keys_b = _keys(a), _keys(b)
    union = jnp.sort(jnp.concatenate([keys_a, keys_b]))
    if union.shape[0]:
        new = jnp.concatenate([jnp.ones((1,), bool), union[1:] != union[:-1]])
        gid = jnp.cumsum(new) - 1
        k = int(gid[-1]) + 1
        ukeys = jnp.zeros_like(union).at[gid].set(union)[:k]
    else:
        ukeys = union
    va, _ = _lookup(keys_a, a.data[: a.nnz], ukeys)
    vb, _ = _lookup(keys_b, b.data[: b.nnz], ukeys)
    vals = op(va, vb)
    rows = (ukeys % a.m).astype(get_config().index_dtype)
    cols = (ukeys // a.m).astype(get_config().index_dtype)
    out = construct.from_triplets(rows, cols, vals, a.shape)
    return eliminate_zeros(out) if drop_zeros else out


def _intersect_binop(a: CSC, b: CSC, op: Callable) -> CSC:
    """Intersection-pattern binop (elmul/eldiv,
    reference: csr_elmul_csr / csr_eldiv_csr, csr.h:957-974)."""
    _check_shapes(a, b)
    a = a if a.canonical else construct.canonicalize(a)
    b = b if b.canonical else construct.canonicalize(b)
    keys_a, keys_b = _keys(a), _keys(b)
    va, hit = _lookup(keys_a, a.data[: a.nnz], keys_b)
    vals = op(va, b.data[: b.nnz])
    keep = np.flatnonzero(np.asarray(hit))
    rows = b.indices[: b.nnz][keep]
    cols = construct.expand_indptr(b.indptr, b.nnz)[keep]
    return construct.from_triplets(rows, cols, vals[keep], a.shape)


def elmul(a: CSC, b: CSC) -> CSC:
    return _intersect_binop(a, b, jnp.multiply)


def eldiv(a: CSC, b: CSC) -> CSC:
    return _intersect_binop(a, b, jnp.divide)


def maximum(a: CSC, b: CSC) -> CSC:
    return _union_binop(a, b, jnp.maximum, drop_zeros=False)


def minimum(a: CSC, b: CSC) -> CSC:
    return _union_binop(a, b, jnp.minimum, drop_zeros=False)


_CMP = {
    "ne": lambda x, y: (x != y),
    "lt": lambda x, y: (x < y),
    "gt": lambda x, y: (x > y),
    "le": lambda x, y: (x <= y),
    "ge": lambda x, y: (x >= y),
}


def compare(a: CSC, b: CSC, op: str) -> CSC:
    """Sparse comparison with nonzero-result pattern
    (reference: csr_ne_csr .. csr_ge_csr, csr.h:912-956).  Note le/ge/eq over
    the implicit-zero region is dense by definition; like scipy we only
    materialize results on the union pattern."""
    if op not in _CMP:
        raise ValueError(f"unknown comparison {op!r}")
    f = _CMP[op]
    return _union_binop(
        a, b, lambda x, y: f(x, y).astype(get_config().value_dtype), drop_zeros=True
    )


def equal(a: CSC, b: CSC) -> bool:
    """Exact structural + value equality (reference: CscMat.__eq__,
    csc.py:432-457 — prints which field differs and returns bool)."""
    if a.shape != b.shape:
        print(f"shapes differ: {a.shape} vs {b.shape}")
        return False
    a = a if a.canonical else construct.canonicalize(a)
    b = b if b.canonical else construct.canonicalize(b)
    if a.nnz != b.nnz:
        print(f"nnz differ: {a.nnz} vs {b.nnz}")
        return False
    ipa, ixa, da = a.np_arrays()
    ipb, ixb, db = b.np_arrays()
    if not np.array_equal(ipa, ipb):
        print("indptr differ")
        return False
    if not np.array_equal(ixa, ixb):
        print("indices differ")
        return False
    if not np.array_equal(da, db):
        print("data differ")
        return False
    return True


def eliminate_zeros(a: CSC) -> CSC:
    """Drop explicit zeros (reference: csr_eliminate_zeros, csr.h:1073)."""
    ip, rows, vals = a.np_arrays()
    keep = np.flatnonzero(vals != 0)
    cols = np.repeat(np.arange(a.n), np.diff(ip))
    return construct.from_triplets(rows[keep], cols[keep], vals[keep], a.shape)
