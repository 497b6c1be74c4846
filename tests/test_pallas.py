"""Pallas kernels (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

import csparse3_tpu as cst
from csparse3_tpu.kernels import bsr_spmm_pallas

from conftest import rand_sp


def test_bsr_spmm_pallas_matches_scipy():
    a = rand_sp(300, 260, 0.03, seed=0)
    B = cst.CSC.from_scipy(a).to_bsr(block=(8, 128))
    X = np.random.RandomState(1).rand(260, 200)
    Y = bsr_spmm_pallas(B, jnp.asarray(X), tk=128)
    np.testing.assert_allclose(np.asarray(Y), a @ X, rtol=1e-12, atol=1e-13)


def test_bsr_spmm_pallas_vector_and_ragged_k():
    a = rand_sp(100, 90, 0.05, seed=2)
    B = cst.CSC.from_scipy(a).to_bsr(block=(8, 128))
    x = np.random.RandomState(3).rand(90)
    y = bsr_spmm_pallas(B, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), a @ x, rtol=1e-12, atol=1e-13)
    X = np.random.RandomState(4).rand(90, 37)  # k not a tile multiple
    Y = bsr_spmm_pallas(B, jnp.asarray(X), tk=128)
    np.testing.assert_allclose(np.asarray(Y), a @ X, rtol=1e-12, atol=1e-13)


def test_bsr_spmm_pallas_empty_block_rows():
    # rows 100..300 empty -> empty block rows must come out zero
    rows = np.arange(100)
    cols = np.arange(100)
    A = cst.from_triplets(rows, cols, np.ones(100), (300, 300))
    B = A.to_bsr(block=(8, 128))
    X = np.random.RandomState(5).rand(300, 8)
    Y = bsr_spmm_pallas(B, jnp.asarray(X))
    ref = A.to_scipy() @ X
    np.testing.assert_allclose(np.asarray(Y), ref, rtol=1e-12, atol=1e-13)


def test_pallas_backend_dispatch():
    a = rand_sp(120, 120, 0.05, seed=6)
    A = cst.CSC.from_scipy(a)
    X = np.random.RandomState(7).rand(120, 9)
    Y = cst.spmm(A, jnp.asarray(X), backend="pallas")
    np.testing.assert_allclose(np.asarray(Y), a @ X, rtol=1e-12, atol=1e-13)
