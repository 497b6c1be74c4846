"""Device numeric refactorization (linalg/refactor.py) vs scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import csparse3_tpu as cst

from conftest import rand_sp


def _case(n, seed, cx=True):
    from csparse3_tpu.models.grids import synthetic_grid, ybus

    g = synthetic_grid(n, seed=seed)
    Y, _, _ = ybus(g)
    shift = (0.4 + 0.4j) if cx else 2.0
    ys = Y.to_scipy() + sp.eye(n) * shift
    if not cx:
        ys = abs(ys).real + sp.eye(n)
    return ys.tocsc()


def test_same_values_reproduce():
    ys = _case(120, 0)
    A = cst.CSC.from_scipy(ys)
    lu = cst.linalg.splu(A, ordering="amd")
    rp = lu.refactor_plan(A)
    b = np.random.RandomState(1).rand(120) + 0j
    x = np.asarray(rp.refactor(A.np_arrays()[2])(jnp.asarray(b)))
    np.testing.assert_allclose(x, spla.spsolve(ys, b), rtol=1e-10, atol=1e-12)


def test_new_values_same_pattern():
    ys = _case(150, 1)
    A = cst.CSC.from_scipy(ys)
    lu = cst.linalg.splu(A, ordering="amd")
    rp = lu.refactor_plan(A)
    ip, ix, dt = A.np_arrays()
    rng = np.random.RandomState(2)
    dt2 = dt * (1 + 0.5 * rng.rand(len(dt))) + 0.1j * rng.rand(len(dt))
    ys2 = sp.csc_matrix((dt2, ix, ip), shape=ys.shape)
    b = rng.rand(150) + 0j
    x = np.asarray(rp.refactor(jnp.asarray(dt2))(jnp.asarray(b)))
    np.testing.assert_allclose(x, spla.spsolve(ys2, b), rtol=1e-9, atol=1e-11)


def test_jit_and_multi_rhs():
    ys = _case(80, 3)
    A = cst.CSC.from_scipy(ys)
    lu = cst.linalg.splu(A, ordering="amd")
    rp = lu.refactor_plan(A)
    ip, ix, dt = A.np_arrays()
    dt2 = dt * 1.7
    B = np.random.RandomState(4).rand(80, 9) + 0j

    @jax.jit
    def solve(plan, data, rhs):
        return plan.refactor(data)(rhs)

    X = np.asarray(solve(rp, jnp.asarray(dt2), jnp.asarray(B)))
    Xref = spla.spsolve(sp.csc_matrix((dt2, ix, ip), shape=ys.shape), B)
    np.testing.assert_allclose(X, np.asarray(Xref.todense() if sp.issparse(Xref) else Xref),
                               rtol=1e-9, atol=1e-11)


def test_vmap_batched_refactor():
    ys = _case(60, 5)
    A = cst.CSC.from_scipy(ys)
    lu = cst.linalg.splu(A, ordering="amd")
    rp = lu.refactor_plan(A)
    ip, ix, dt = A.np_arrays()
    rng = np.random.RandomState(6)
    scales = 1 + rng.rand(4)
    datas = jnp.asarray(np.stack([dt * s for s in scales]))
    b = jnp.asarray(rng.rand(60) + 0j)

    xs = jax.vmap(lambda d: rp.refactor(d)(b))(datas)
    for i, s in enumerate(scales):
        xref = spla.spsolve(sp.csc_matrix((dt * s, ix, ip), shape=ys.shape),
                            np.asarray(b))
        np.testing.assert_allclose(np.asarray(xs[i]), xref, rtol=1e-9, atol=1e-11)


def test_real_unsymmetric():
    rng = np.random.RandomState(7)
    a = rand_sp(100, 100, 0.05, seed=7) + sp.eye(100) * 8
    a = a.tolil()
    a[3, 60] = 0.5
    a[90, 2] = -0.7
    a = a.tocsc()
    A = cst.CSC.from_scipy(a)
    lu = cst.linalg.splu(A, ordering="amd")
    rp = lu.refactor_plan(A)
    ip, ix, dt = A.np_arrays()
    dt2 = dt * (1 + 0.2 * rng.rand(len(dt)))
    b = rng.rand(100)
    x = np.asarray(rp.refactor(jnp.asarray(dt2))(jnp.asarray(b)))
    np.testing.assert_allclose(
        x, spla.spsolve(sp.csc_matrix((dt2, ix, ip), shape=(100, 100)), b),
        rtol=1e-8, atol=1e-10,
    )
