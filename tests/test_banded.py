"""Block-bidiagonal banded solves (linalg/banded.py) vs scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import csparse3_tpu as cst
from csparse3_tpu.linalg import BandedSolvePlan, bandwidth, splu


def _grid_system(n, seed, shift=3.0):
    from csparse3_tpu.models.grids import synthetic_grid

    g = synthetic_grid(n, seed=seed)
    bp = 1.0 / g.x
    rows = np.concatenate([g.f, g.t, g.f, g.t])
    cols = np.concatenate([g.f, g.t, g.t, g.f])
    vals = np.concatenate([bp, bp, -bp, -bp])
    B = cst.from_triplets(rows, cols, vals, (n, n))
    return cst.add(B, cst.diags(np.full(n, shift)))


def test_banded_solve_matches_scipy():
    A = _grid_system(600, seed=2)
    lu = splu(A, ordering="rcm", tol=0.0)
    plan = lu.banded_solve_plan()
    b = np.random.RandomState(0).rand(600)
    x = np.asarray(plan(jnp.asarray(b)))
    xref = spla.spsolve(A.to_scipy().tocsc(), b)
    np.testing.assert_allclose(x, xref, rtol=1e-8, atol=1e-10)


def test_banded_multi_rhs_jit():
    A = _grid_system(400, seed=3)
    lu = splu(A, ordering="rcm", tol=0.0)
    plan = lu.banded_solve_plan()
    B = np.random.RandomState(1).rand(400, 33)
    X = np.asarray(jax.jit(lambda p, b: p(b))(plan, jnp.asarray(B)))
    Xref = spla.spsolve(A.to_scipy().tocsc(), B)
    np.testing.assert_allclose(X, Xref, rtol=1e-8, atol=1e-10)


def test_matches_level_scheduled_plan():
    A = _grid_system(300, seed=4)
    lu = splu(A, ordering="rcm", tol=0.0)
    b = np.random.RandomState(2).rand(300)
    x_band = np.asarray(lu.banded_solve_plan()(jnp.asarray(b)))
    x_lvl = np.asarray(lu.solve_plan()(jnp.asarray(b)))
    np.testing.assert_allclose(x_band, x_lvl, rtol=1e-10, atol=1e-12)


def test_bandwidth_guard():
    # AMD ordering scatters the band -> plan with tiny block must refuse
    A = _grid_system(300, seed=5)
    lu = splu(A, ordering="amd")
    bw = max(bandwidth(lu._h.Lp, lu._h.Li), bandwidth(lu._h.Up, lu._h.Ui))
    with pytest.raises(ValueError, match="block size"):
        BandedSolvePlan(lu._h, s=max(8, (bw // 2) // 8 * 8))


def test_complex_banded():
    from csparse3_tpu.models.grids import synthetic_grid, ybus

    g = synthetic_grid(300, seed=6)
    Y, _, _ = ybus(g)
    ys = (Y.to_scipy() + sp.eye(300) * (0.5 + 0.5j)).tocsc()
    A = cst.CSC.from_scipy(ys)
    lu = splu(A, ordering="rcm", tol=0.0)
    plan = lu.banded_solve_plan()
    b = np.random.RandomState(3).rand(300) + 0j
    x = np.asarray(plan(jnp.asarray(b)))
    np.testing.assert_allclose(ys @ x, b, rtol=1e-8, atol=1e-9)
