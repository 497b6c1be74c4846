"""SpMV / SpMM vs scipy (reference: test1_operations.py C*x, A*X cases)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import csparse3_tpu as cst

from conftest import rand_sp


@pytest.mark.parametrize("shape,density,seed", [
    ((100, 100), 0.01, 0),
    ((80, 50), 0.1, 1),
    ((50, 80), 0.05, 2),
])
def test_spmv(shape, density, seed):
    a_sp = rand_sp(*shape, density, seed=seed)
    a = cst.CSC.from_scipy(a_sp)
    rng = np.random.RandomState(seed)
    x = rng.randn(shape[1])
    np.testing.assert_allclose(np.asarray(cst.spmv(a, x)), a_sp @ x, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a * x), a_sp @ x, rtol=1e-12)
    # numpy debug backend agrees
    np.testing.assert_allclose(
        np.asarray(cst.spmv(a, x, backend="numpy")), a_sp @ x, rtol=1e-12
    )


def test_spmm():
    a_sp = rand_sp(60, 40, 0.08, seed=3)
    a = cst.CSC.from_scipy(a_sp)
    X = np.random.RandomState(3).randn(40, 5)
    np.testing.assert_allclose(np.asarray(cst.spmm(a, X)), a_sp @ X, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a * X), a_sp @ X, rtol=1e-12)


def test_spmv_plan_jit():
    a_sp = rand_sp(64, 64, 0.1, seed=4)
    a = cst.CSC.from_scipy(a_sp)
    plan = cst.SpMVPlan(a)
    x = np.random.RandomState(4).randn(64)

    @jax.jit
    def two_step(plan, x):
        return plan(plan(x))

    np.testing.assert_allclose(np.asarray(two_step(plan, x)), a_sp @ (a_sp @ x),
                               rtol=1e-11)


def test_spmv_grad():
    """SpMV is differentiable in values and x (new capability vs reference)."""
    a_sp = rand_sp(20, 20, 0.2, seed=5)
    a = cst.CSC.from_scipy(a_sp)
    plan = cst.SpMVPlan(a)
    x = np.random.RandomState(5).randn(20)

    def loss(vals, x):
        p = cst.SpMVPlan.__new__(cst.SpMVPlan)
        p.m, p.n, p.rows, p.cols, p.vals = plan.m, plan.n, plan.rows, plan.cols, vals
        return jnp.sum(p(x) ** 2)

    g = jax.grad(loss, argnums=1)(plan.vals, jnp.asarray(x))
    ref_g = 2 * a_sp.T @ (a_sp @ x)
    np.testing.assert_allclose(np.asarray(g), ref_g, rtol=1e-10)


@pytest.mark.parametrize("block", [(2, 2), (4, 8)])
def test_bsr_spmm(block):
    a_sp = rand_sp(50, 34, 0.1, seed=6)
    a = cst.CSC.from_scipy(a_sp)
    b = a.to_bsr(block=block)
    X = np.random.RandomState(6).randn(34, 7)
    np.testing.assert_allclose(np.asarray(cst.bsr_spmm(b, X)), a_sp @ X, rtol=1e-11)
    x = np.random.RandomState(7).randn(34)
    np.testing.assert_allclose(np.asarray(cst.bsr_spmm(b, x)), a_sp @ x, rtol=1e-11)
