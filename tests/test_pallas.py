"""Pallas kernels (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

import csparse3_tpu as cst
from csparse3_tpu.kernels import bsr_spmm_pallas

from conftest import rand_sp

# x64 CPU: exact-f64 oracles; real chip (CSPARSE3_TPU_TEST_PLATFORM=tpu,
# x64 off): f32 MXU precision
_RTOL = 1e-12 if jax.config.jax_enable_x64 else 2e-2
_ATOL = 1e-13 if jax.config.jax_enable_x64 else 1e-2


def test_bsr_spmm_pallas_matches_scipy():
    a = rand_sp(300, 260, 0.03, seed=0)
    B = cst.CSC.from_scipy(a).to_bsr(block=(8, 128))
    X = np.random.RandomState(1).rand(260, 200)
    Y = bsr_spmm_pallas(B, jnp.asarray(X), tk=128)
    np.testing.assert_allclose(np.asarray(Y), a @ X, rtol=_RTOL, atol=_ATOL)


def test_bsr_spmm_pallas_vector_and_ragged_k():
    a = rand_sp(100, 90, 0.05, seed=2)
    B = cst.CSC.from_scipy(a).to_bsr(block=(8, 128))
    x = np.random.RandomState(3).rand(90)
    y = bsr_spmm_pallas(B, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), a @ x, rtol=_RTOL, atol=_ATOL)
    X = np.random.RandomState(4).rand(90, 37)  # k not a tile multiple
    Y = bsr_spmm_pallas(B, jnp.asarray(X), tk=128)
    np.testing.assert_allclose(np.asarray(Y), a @ X, rtol=_RTOL, atol=_ATOL)


def test_bsr_spmm_pallas_empty_block_rows():
    # rows 100..300 empty -> empty block rows must come out zero
    rows = np.arange(100)
    cols = np.arange(100)
    A = cst.from_triplets(rows, cols, np.ones(100), (300, 300))
    B = A.to_bsr(block=(8, 128))
    X = np.random.RandomState(5).rand(300, 8)
    Y = bsr_spmm_pallas(B, jnp.asarray(X))
    ref = A.to_scipy() @ X
    np.testing.assert_allclose(np.asarray(Y), ref, rtol=_RTOL, atol=_ATOL)


def test_pallas_backend_dispatch():
    a = rand_sp(120, 120, 0.05, seed=6)
    A = cst.CSC.from_scipy(a)
    X = np.random.RandomState(7).rand(120, 9)
    Y = cst.spmm(A, jnp.asarray(X), backend="pallas")
    np.testing.assert_allclose(np.asarray(Y), a @ X, rtol=_RTOL, atol=_ATOL)


# ---------------------------------------------------------------------------
# Pallas band (DIA-slab) SpMV
# ---------------------------------------------------------------------------

from csparse3_tpu.kernels.dia_pallas import PallasDIA, SplitPallasDIA  # noqa: E402
from csparse3_tpu.types import CSC  # noqa: E402


def _banded_case(n, seed):
    from csparse3_tpu.linalg.ordering import rcm
    from csparse3_tpu.models.grids import synthetic_grid, ybus

    g = synthetic_grid(n, seed=seed)
    Y, _, _ = ybus(g)
    p = rcm(Y)
    return Y[p, p]


def test_pallas_dia_matches_scipy():
    Yp = _banded_case(731, seed=0)  # odd size: not a tile multiple
    ip, rows, vals = Yp.np_arrays()
    re = CSC(Yp.m, Yp.n, ip, rows, np.ascontiguousarray(vals.real),
             canonical=Yp.canonical)
    plan = PallasDIA(re, tile=256, dchunk=32)
    rng = np.random.RandomState(1)
    X = rng.rand(731, 3).astype(np.float32)
    got = np.asarray(plan(X))
    ref = Yp.to_scipy().real @ X
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    # single-vector path
    x = rng.rand(731).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(plan(x)), Yp.to_scipy().real @ x, rtol=2e-4, atol=2e-4)


def test_split_pallas_dia_matches_scipy_complex():
    Yp = _banded_case(520, seed=2)
    plan = SplitPallasDIA(Yp, tile=128, dchunk=16)
    rng = np.random.RandomState(3)
    xr = rng.rand(520).astype(np.float32)
    xi = rng.rand(520).astype(np.float32)
    yr, yi = plan(xr, xi)
    z = Yp.to_scipy() @ (xr + 1j * xi)
    np.testing.assert_allclose(np.asarray(yr), z.real, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(yi), z.imag, rtol=2e-4, atol=2e-4)


def test_pallas_dia_pytree_jit_argument():
    import functools

    Yp = _banded_case(300, seed=4)
    ip, rows, vals = Yp.np_arrays()
    re = CSC(Yp.m, Yp.n, ip, rows, np.ascontiguousarray(vals.real),
             canonical=Yp.canonical)
    plan = PallasDIA(re, tile=128, dchunk=16)

    @jax.jit
    def apply(p, x):
        return p(x)

    x = np.random.RandomState(5).rand(300).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(apply(plan, x)), Yp.to_scipy().real @ x,
        rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# hybrid band + points plan
# ---------------------------------------------------------------------------

from csparse3_tpu.kernels.bandpoints import (  # noqa: E402
    OffsetsPlan, SplitBandPoints)


def test_offsets_plan_matches_scipy():
    from csparse3_tpu.models.grids import synthetic_grid, ybus

    n = 400
    g = synthetic_grid(n, seed=1)
    Y, _, _ = ybus(g)
    ip, rows, vals = Y.np_arrays()
    cols = np.repeat(np.arange(n), np.diff(ip))
    vr = np.ascontiguousarray(vals.real).astype(np.float32)
    offs = sorted(set((cols - rows).tolist()))
    plan = OffsetsPlan.from_entries(n, n, rows.astype(np.int64),
                                    cols.astype(np.int64), vr, offs)
    x = np.random.RandomState(2).rand(n, 3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(plan(x)), Y.to_scipy().real @ x, rtol=2e-4, atol=2e-4)


def test_split_bandpoints_matches_scipy_complex():
    from csparse3_tpu.models.grids import synthetic_grid, ybus

    n = 1037  # not a tile multiple
    g = synthetic_grid(n, seed=3)
    Y, _, _ = ybus(g)
    plan = SplitBandPoints(Y, tile=128)
    rng = np.random.RandomState(4)
    xr = rng.rand(n).astype(np.float32)
    xi = rng.rand(n).astype(np.float32)
    yr, yi = plan(xr, xi)
    z = Y.to_scipy() @ (xr + 1j * xi)
    np.testing.assert_allclose(np.asarray(yr), z.real, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(yi), z.imag, rtol=2e-4, atol=2e-4)


def test_split_bandpoints_real_matrix_and_jit():
    import csparse3_tpu as cst

    rng = np.random.RandomState(5)
    n = 300
    # tridiagonal core + a few scattered far entries
    rows = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n),
                           rng.randint(0, n, 40)])
    cols = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1),
                           rng.randint(0, n, 40)])
    vals = rng.rand(len(rows))
    A = cst.from_triplets(rows, cols, vals, (n, n))
    plan = SplitBandPoints(A, tile=128)
    xr = rng.rand(n).astype(np.float32)
    xi = rng.rand(n).astype(np.float32)
    yr, yi = jax.jit(lambda p, a, b: p(a, b))(plan, xr, xi)
    As = A.to_scipy()
    np.testing.assert_allclose(np.asarray(yr), As @ xr, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(yi), As @ xi, rtol=2e-4, atol=2e-4)


def test_split_bandpoints_pure_banded():
    """No scattered points at all: fused kernel runs slabs-only with a
    dead entry table."""
    import csparse3_tpu as cst

    n = 500
    rows = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    vals = np.random.RandomState(6).rand(len(rows))
    A = cst.from_triplets(rows, cols, vals, (n, n))
    plan = SplitBandPoints(A, tile=128)
    assert plan.core_ndiag == 3
    xr = np.random.RandomState(7).rand(n).astype(np.float32)
    xi = np.random.RandomState(8).rand(n).astype(np.float32)
    yr, yi = plan(xr, xi)
    As = A.to_scipy()
    np.testing.assert_allclose(np.asarray(yr), As @ xr, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(yi), As @ xi, rtol=2e-4, atol=2e-4)


def test_split_bandpoints_offset_groups():
    """group_span > 0: group 0 fused with the core, later groups via the
    points-only kernel."""
    from csparse3_tpu.models.grids import synthetic_grid, ybus

    n = 900
    g = synthetic_grid(n, seed=9)
    Y, _, _ = ybus(g)
    plan = SplitBandPoints(Y, tile=128, group_span=40)
    assert plan.n_groups >= 2
    rng = np.random.RandomState(10)
    xr = rng.rand(n).astype(np.float32)
    xi = rng.rand(n).astype(np.float32)
    yr, yi = plan(xr, xi)
    z = Y.to_scipy() @ (xr + 1j * xi)
    np.testing.assert_allclose(np.asarray(yr), z.real, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(yi), z.imag, rtol=2e-4, atol=2e-4)


def test_split_bandpoints_supertile_modes():
    """Both supertile variants (VMEM-resident x and pre-gathered window
    blocks) match the default path and scipy."""
    from csparse3_tpu.models.grids import synthetic_grid, ybus

    n = 2100
    g = synthetic_grid(n, seed=11)
    Y, _, _ = ybus(g)
    rng = np.random.RandomState(12)
    xr = rng.rand(n).astype(np.float32)
    xi = rng.rand(n).astype(np.float32)
    z = Y.to_scipy() @ (xr + 1j * xi)
    for mode in ("resident", "windows"):
        plan = SplitBandPoints(Y, tile=128, supertile=mode)
        assert plan.supertile == mode
        yr, yi = plan(xr, xi)
        np.testing.assert_allclose(np.asarray(yr), z.real,
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(yi), z.imag,
                                   rtol=2e-4, atol=2e-4)


def test_auto_supertile_selection():
    """Footprint-driven mode choice: resident when x fits VMEM, windows
    when only the entry tables fit, per-tile streaming kernel when the
    tables themselves outgrow the budget."""
    from csparse3_tpu.kernels.bandpoints import _auto_supertile

    assert _auto_supertile(200_000, 256, 784, 168, None) == "resident"
    # x past the budget, tables small -> windows
    assert _auto_supertile(5_000_000, 256, 784, 168, None) == "windows"
    # tables alone past 8 MiB -> stream everything (per-tile kernel)
    assert _auto_supertile(5_000_000, 256, 20_000, 128, None) is False
    # offset groups use their own kernels
    assert _auto_supertile(1000, 256, 8, 8, 40) is False


def test_diag_jacobi_reference():
    """DiagJacobi.apply_local is exactly diag(A)^{-1} b per shard."""
    import csparse3_tpu as cst
    from csparse3_tpu.parallel import DiagJacobi
    from csparse3_tpu.parallel.partition import partition_rows

    n = 64
    rng = np.random.RandomState(5)
    dv = 2.0 + rng.rand(n)
    A = cst.diags(dv)
    part = partition_rows(A, 4)
    prec = DiagJacobi.build(A, part)
    d = np.asarray(prec.dinv)
    assert d.shape[0] == 4
    np.testing.assert_allclose(d.reshape(-1)[:n], 1.0 / dv, rtol=1e-6)


def test_split_bandpoints_fast_precision():
    """precision='fast' (2-part one-hot dots, ~16 mantissa bits) stays
    within iterative-solver tolerance while 'exact' stays f32-tight."""
    from csparse3_tpu.models.grids import synthetic_grid, ybus

    n = 1500
    g = synthetic_grid(n, seed=13)
    Y, _, _ = ybus(g)
    rng = np.random.RandomState(14)
    xr = rng.rand(n).astype(np.float32)
    xi = rng.rand(n).astype(np.float32)
    z = Y.to_scipy() @ (xr + 1j * xi)
    scale = np.abs(z.real).max()
    for prec, tol in (("exact", 2e-6), ("fast", 1e-4)):
        p = SplitBandPoints(Y, tile=128, precision=prec)
        yr, yi = p(xr, xi)
        rel = max(np.abs(np.asarray(yr) - z.real).max(),
                  np.abs(np.asarray(yi) - z.imag).max()) / scale
        assert rel < tol, (prec, rel)
