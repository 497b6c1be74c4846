"""SpGEMM: C = A @ B, two-phase (symbolic + numeric).

Reference algorithm: Gustavson CSC with a dense scatter workspace and a
linked-list accumulator — csc_multiply_ff (src/CSparse3/csc_numba.py:222-306,
with the sqrt(m)*anz+bnz capacity heuristic at :253 and doubling realloc at
:261-278) and the scipy pair csr_matmat_pass1/pass2
(src/sparsetools/csr.h:562-601 symbolic mask loop, :609-670 numeric
linked-list loop).

Per-row linked lists do not vectorize; the TPU formulation is
**expand–sort–compress (ESC)**:

  expand   every entry B[k,j] replicates column A[:,k) scaled by B[k,j]
           -> a stream of (row, col, val) partial products (pure gathers)
  sort     stable sort the stream by (col, row)         (one XLA sort)
  compress segment-sum duplicates                        (one segment op)

The *symbolic* phase is exact and cheap: the intermediate-product count is
sum over B-entries of nnz(A[:, rowof(B-entry)]), and the output nnz falls
out of the duplicate-collapse — no heuristic capacity, no realloc.  The
(perm, gid) plan from the symbolic phase is reusable: ``SpGEMMPlan`` lets
repeated numeric multiplies with fixed patterns run entirely under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import get_config
from ..types import CSC
from . import construct

__all__ = ["spgemm", "spgemm_symbolic", "SpGEMMPlan", "gram"]


def _expanded_streams(a: CSC, b: CSC):
    """Expansion phase: per intermediate product t, indices into A's and B's
    entry arrays.  Returns (a_pos, b_pos, out_cols) of length total."""
    kb = b.nnz
    b_rows = b.indices[:kb]
    b_cols = construct.expand_indptr(b.indptr, kb)
    # products contributed by each B entry = nnz of that A column
    counts = (a.indptr[b_rows + 1] - a.indptr[b_rows]).astype(jnp.int64 if jax.config.jax_enable_x64 else jnp.int32)
    offsets = jnp.concatenate([jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)])
    total = int(offsets[-1]) if kb else 0
    if total == 0:
        return None, None, None, 0
    t = jnp.arange(total, dtype=offsets.dtype)
    e = (jnp.searchsorted(offsets, t, side="right") - 1).astype(b_rows.dtype)
    local = (t - offsets[e]).astype(b_rows.dtype)
    a_pos = a.indptr[b_rows[e]] + local
    return a_pos, e, b_cols[e], total


def spgemm(a: CSC, b: CSC) -> CSC:
    """C = A @ B (reference: CscMat.dot, csc.py:483-500 — the correct
    general-dims path; CscMat.__mul__'s square-only dim quirk at
    csc.py:354-370 is intentionally NOT replicated, see SURVEY §7)."""
    if a.n != b.m:
        raise ValueError(f"dim mismatch for A@B: {a.shape} @ {b.shape}")
    a = a if a.canonical else construct.canonicalize(a)
    b = b if b.canonical else construct.canonicalize(b)
    a_pos, b_pos, out_cols, total = _expanded_streams(a, b)
    dtype = jnp.result_type(a.data.dtype, b.data.dtype)
    if total == 0:
        idx = get_config().index_dtype
        return CSC(
            a.m, b.n,
            jnp.zeros((b.n + 1,), idx), jnp.zeros((0,), idx), jnp.zeros((0,), dtype),
        )
    rows = a.indices[a_pos]
    vals = a.data[a_pos] * b.data[b_pos]
    return construct.from_triplets(rows, out_cols, vals, (a.m, b.n))


def gram(a: CSC) -> CSC:
    """A @ A.T — the GridCal connectivity product
    (reference flow: test3_lil_matrix.py A = C * C.t())."""
    return spgemm(a, construct.transpose(a))


class SpGEMMPlan:
    """Reusable structural plan for C = A @ B with fixed patterns.

    ``numeric(a_vals, b_vals)`` is pure jax (jittable, differentiable):
    gather -> multiply -> permute -> segment_sum.
    """

    def __init__(self, a_pos, b_pos, perm, gid, out_nnz, out_csc_template):
        self.a_pos = a_pos
        self.b_pos = b_pos
        self.perm = perm
        self.gid = gid
        self.out_nnz = out_nnz
        self.template = out_csc_template  # CSC with correct structure, data zeros

    def numeric(self, a_vals, b_vals) -> CSC:
        prod = a_vals[self.a_pos] * b_vals[self.b_pos]
        data = jax.ops.segment_sum(
            prod[self.perm], self.gid, num_segments=self.out_nnz
        )
        t = self.template
        return CSC(t.m, t.n, t.indptr, t.indices, data, nnz=t.nnz, canonical=True)


def spgemm_symbolic(a: CSC, b: CSC) -> SpGEMMPlan:
    """Symbolic phase: compute the output pattern and the (perm, gid)
    compress plan (reference: csc_matmat_pass1 semantics, csr.h:562-601,
    exact rather than capacity-heuristic)."""
    if a.n != b.m:
        raise ValueError(f"dim mismatch for A@B: {a.shape} @ {b.shape}")
    a_pos, b_pos, out_cols, total = _expanded_streams(a, b)
    cfg = get_config()
    dtype = jnp.result_type(a.data.dtype, b.data.dtype)
    if total == 0:
        empty = CSC(
            a.m, b.n,
            jnp.zeros((b.n + 1,), cfg.index_dtype),
            jnp.zeros((0,), cfg.index_dtype),
            jnp.zeros((0,), dtype),
        )
        z = jnp.zeros((0,), cfg.index_dtype)
        return SpGEMMPlan(z, z, z, z, 0, empty)
    rows = a.indices[a_pos]
    # stable double argsort by (col, row)
    p1 = jnp.argsort(rows, stable=True)
    p2 = jnp.argsort(out_cols[p1], stable=True)
    perm = p1[p2]
    r_s, c_s = rows[perm], out_cols[perm]
    new = jnp.concatenate(
        [jnp.ones((1,), bool), (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])]
    )
    gid = jnp.cumsum(new) - 1
    out_nnz = int(gid[-1]) + 1
    u_rows = jnp.zeros_like(r_s).at[gid].set(r_s)[:out_nnz]
    u_cols = jnp.zeros_like(c_s).at[gid].set(c_s)[:out_nnz]
    indptr = construct.compress_indptr(u_cols, b.n)
    template = CSC(a.m, b.n, indptr, u_rows, jnp.zeros((out_nnz,), dtype))
    return SpGEMMPlan(a_pos, b_pos, perm, gid, out_nnz, template)
