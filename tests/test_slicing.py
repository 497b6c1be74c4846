"""All 8 slicing cases vs scipy on the golden 6x3 matrix
(reference: test2_slicing.py — which only prints; here they assert)."""

import numpy as np
import pytest

import csparse3_tpu as cst

from conftest import rand_sp


@pytest.fixture
def pair(golden63):
    return cst.CSC.from_scipy(golden63), golden63


def dense(x):
    return np.asarray(x.todense())


def test_scalar(pair):
    a, ref = pair
    assert float(a[1, 0]) == ref[1, 0]
    assert float(a[0, 2]) == 0.0
    assert float(a[-1, -1]) == ref[5, 2]


def test_row(pair):
    a, ref = pair
    np.testing.assert_array_equal(dense(a[1, :]), ref[1, :].toarray())


def test_col(pair):
    a, ref = pair
    np.testing.assert_array_equal(dense(a[:, 2]), ref[:, 2].toarray())


def test_full_copy(pair):
    a, ref = pair
    np.testing.assert_array_equal(dense(a[:, :]), ref.toarray())


def test_row_lists(pair):
    a, ref = pair
    la, lb = [1, 2, 3], [1, 2]
    np.testing.assert_array_equal(
        dense(a[1, lb]), ref[1, :][:, lb].toarray()
    )
    np.testing.assert_array_equal(
        dense(a[la, 2]), ref[la, :][:, 2].toarray()
    )
    np.testing.assert_array_equal(dense(a[:, lb]), ref[:, lb].toarray())
    np.testing.assert_array_equal(dense(a[la, :]), ref[la, :].toarray())
    np.testing.assert_array_equal(
        dense(a[la, lb]), ref[la, :][:, lb].toarray()
    )


def test_slices(pair):
    a, ref = pair
    np.testing.assert_array_equal(dense(a[1:5, 0:2]), ref[1:5, 0:2].toarray())
    np.testing.assert_array_equal(dense(a[1:5, :]), ref[1:5, :].toarray())
    np.testing.assert_array_equal(dense(a[:, 1:3]), ref[:, 1:3].toarray())
    np.testing.assert_array_equal(dense(a[::2, :]), ref[::2, :].toarray())


def test_permutation_and_repeats():
    a_sp = rand_sp(20, 15, 0.2, seed=11)
    a = cst.CSC.from_scipy(a_sp)
    rows = np.array([5, 3, 3, 19, 0])
    cols = np.array([14, 0, 7])
    np.testing.assert_allclose(
        dense(a[rows, cols]), a_sp.toarray()[np.ix_(rows, cols)], rtol=1e-13
    )


def test_setitem_forbidden(pair):
    a, _ = pair
    with pytest.raises(TypeError):
        a[0, 0] = 1.0
