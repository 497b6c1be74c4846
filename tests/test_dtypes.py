"""Dtype breadth: int64 indices end-to-end, int/bool value support
(reference: sparsetools.cxx:44 instantiates I in {int32,int64} and T over
bool/int/float/complex; complex_ops.h / bool_ops.h shims)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import csparse3_tpu as cst
from csparse3_tpu import config


@pytest.fixture
def int64_indices():
    config.update(index_dtype=np.int64)
    yield
    config.update(index_dtype=np.int32)


def test_int64_index_end_to_end(int64_indices):
    """index_dtype=int64 through build -> arithmetic -> spmv -> LU solve.

    (A true >=2^31-nnz case cannot allocate here; this exercises the
    full int64 index path the config declares — the overflow regime's
    dtype plumbing, reference csr.h:591-596 overflow guard.)"""
    from csparse3_tpu.linalg import splu
    from csparse3_tpu.models.grids import synthetic_grid

    n = 400
    g = synthetic_grid(n, seed=0)
    bp = 1.0 / g.x
    rows = np.concatenate([g.f, g.t, g.f, g.t]).astype(np.int64)
    cols = np.concatenate([g.f, g.t, g.t, g.f]).astype(np.int64)
    vals = np.concatenate([bp, bp, -bp, -bp])
    A = cst.add(cst.from_triplets(rows, cols, vals, (n, n)),
                cst.diags(np.full(n, 3.0)))
    ip, ix, _ = A.np_arrays()
    assert ip.dtype == np.int64 and ix.dtype == np.int64
    # arithmetic keeps int64 structure
    S = cst.add(A, A)
    assert S.np_arrays()[0].dtype == np.int64
    # spmv
    x = np.random.RandomState(1).rand(n)
    y = np.asarray(cst.SpMVPlan(A)(jnp.asarray(x)))
    ref = A.to_scipy() @ x
    np.testing.assert_allclose(y, ref, rtol=1e-6, atol=1e-8)
    # LU factor + solve
    lu = splu(A, ordering="rcm", tol=0.0)
    xs = np.asarray(lu.solve(np.random.RandomState(2).rand(n)))
    xr = spla.spsolve(A.to_scipy().tocsc(),
                      np.random.RandomState(2).rand(n))
    np.testing.assert_allclose(xs, xr, rtol=1e-6, atol=1e-8)


def _int_pair(seed):
    rng = np.random.RandomState(seed)
    a = (sp.random(25, 25, density=0.2, format="csc", random_state=rng)
         * 10).astype(np.int32)
    b = (sp.random(25, 25, density=0.2, format="csc", random_state=rng)
         * 7).astype(np.int32)
    return a, b, cst.CSC.from_scipy(a), cst.CSC.from_scipy(b)


def test_int_add_elmul_max():
    a_sp, b_sp, a, b = _int_pair(3)
    s = cst.add(a, b)
    assert np.issubdtype(s.dtype, np.integer)
    np.testing.assert_array_equal(np.asarray(s.todense()),
                                  (a_sp + b_sp).toarray())
    m = cst.elmul(a, b)
    np.testing.assert_array_equal(np.asarray(m.todense()),
                                  a_sp.multiply(b_sp).toarray())
    mx = cst.maximum(a, b)
    np.testing.assert_array_equal(np.asarray(mx.todense()),
                                  a_sp.maximum(b_sp).toarray())


def test_int_compare_returns_bool():
    a_sp, b_sp, a, b = _int_pair(4)
    lt = cst.compare(a, b, "lt")
    assert lt.dtype == np.bool_
    ref = (a_sp < b_sp).toarray()
    np.testing.assert_array_equal(np.asarray(lt.todense()), ref)


def _bool_pair(seed):
    rng = np.random.RandomState(seed)
    d = sp.random(30, 30, density=0.2, format="csc", random_state=rng)
    a = (d > 0.5).tocsc()
    b = (d.T > 0.3).tocsc()
    return a, b, cst.CSC.from_scipy(a), cst.CSC.from_scipy(b)


def test_bool_elmul_and_dense():
    a_sp, b_sp, a, b = _bool_pair(5)
    m = cst.elmul(a, b)
    assert m.dtype == np.bool_
    np.testing.assert_array_equal(np.asarray(m.todense()),
                                  a_sp.multiply(b_sp).toarray())


def test_bool_maximum_is_or():
    a_sp, b_sp, a, b = _bool_pair(6)
    mx = cst.maximum(a, b)
    ref = a_sp.maximum(b_sp).toarray()
    np.testing.assert_array_equal(np.asarray(mx.todense()), ref)


def test_bool_transpose_spgemm():
    a_sp, _, a, _ = _bool_pair(7)
    t = a.t()
    np.testing.assert_array_equal(np.asarray(t.todense()),
                                  a_sp.T.toarray())
    # pattern product in int space (bool matmul promotes, scipy-style)
    g = cst.spgemm(a.astype(np.int32), a.astype(np.int32).t())
    ref = (a_sp.astype(np.int32) @ a_sp.astype(np.int32).T).toarray()
    np.testing.assert_array_equal(np.asarray(g.todense()), ref)
