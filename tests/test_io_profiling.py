"""Persistence + profiling utilities."""

import numpy as np
import scipy.sparse as sp

import csparse3_tpu as cst
from csparse3_tpu.utils import io as cio
from csparse3_tpu.utils.profiling import Timer, compare_with_scipy, timeit

from conftest import rand_sp


def test_npz_roundtrip_csc(tmp_path):
    a = rand_sp(40, 30, 0.1, seed=1)
    A = cst.CSC.from_scipy(a)
    p = tmp_path / "a.npz"
    cio.save_npz(p, A)
    B = cio.load_npz(p)
    np.testing.assert_allclose(np.asarray(B.todense()), a.toarray())


def test_npz_scipy_interop(tmp_path):
    # scipy reads ours
    a = rand_sp(25, 25, 0.2, seed=2)
    A = cst.CSC.from_scipy(a)
    p = tmp_path / "ours.npz"
    cio.save_npz(p, A)
    s = sp.load_npz(p)
    np.testing.assert_allclose(s.toarray(), a.toarray())
    # we read scipy's
    p2 = tmp_path / "theirs.npz"
    sp.save_npz(p2, a.tocsr())
    B = cio.load_npz(p2)
    np.testing.assert_allclose(np.asarray(B.todense()), a.toarray())


def test_lu_roundtrip(tmp_path):
    a = rand_sp(30, 30, 0.15, seed=3) + sp.eye(30) * 5
    A = cst.CSC.from_scipy(a.tocsc())
    lu = cst.linalg.splu(A)
    p = tmp_path / "lu.npz"
    cio.save_lu(p, lu)
    lu2 = cio.load_lu(p)
    b = np.random.RandomState(4).rand(30)
    np.testing.assert_allclose(
        np.asarray(lu.solve(b)), np.asarray(lu2.solve(b)), rtol=1e-14
    )


def test_timer_and_compare():
    t = Timer()
    with t.section("x"):
        pass
    assert "x" in t.summary()
    a = cst.CSC.from_scipy(rand_sp(200, 200, 0.05, seed=5))
    r = compare_with_scipy(a, "spmv", iters=2)
    assert r["ours_s"] > 0 and r["scipy_s"] > 0
    r2 = compare_with_scipy(a, "spgemm")
    assert r2["ours_s"] > 0


def test_timeit_sync():
    import jax.numpy as jnp

    x = jnp.ones(16)
    assert timeit(lambda v: v + 1, x, iters=2, warmup=1) >= 0
