"""Three-phase short-circuit analysis vs dense-inverse oracle."""

import numpy as np
import pytest

from csparse3_tpu.models.grids import PQ, SLACK, Grid, ieee14, ybus
from csparse3_tpu.models.shortcircuit import (
    SCResult,
    short_circuit,
    zbus_columns,
)


def _dense_oracle(g, buses, zf=0.0, vpre=None):
    Y, Yf, _ = ybus(g)
    Yd = np.asarray(Y.todense())
    Z = np.linalg.inv(Yd)
    n = g.n_bus
    vpre = np.ones(n, dtype=complex) if vpre is None else vpre
    ifault = vpre[buses] / (Z[buses, buses] + zf)
    vpost = vpre[None, :] - Z[:, buses].T * ifault[:, None]
    iflow = vpost @ np.asarray(Yf.todense()).T
    return ifault, vpost, iflow


def test_ieee14_all_bus_faults():
    g = ieee14()
    res = short_circuit(g)
    assert isinstance(res, SCResult) and res.ok.all()
    ifault, vpost, iflow = _dense_oracle(g, res.buses)
    np.testing.assert_allclose(res.ifault, ifault, rtol=1e-9)
    np.testing.assert_allclose(res.vpost, vpost, atol=1e-9)
    np.testing.assert_allclose(res.iflow, iflow, atol=1e-9)
    # the faulted bus is at (nearly) zero voltage for a bolted fault
    assert np.abs(res.vpost[np.arange(len(res.buses)), res.buses]).max() < 1e-9


def test_fault_impedance_and_vpre():
    g = ieee14()
    rng = np.random.RandomState(0)
    vpre = 1.0 + 0.05 * rng.randn(g.n_bus) + 1j * 0.02 * rng.randn(g.n_bus)
    zf = 0.01 + 0.05j
    buses = np.array([2, 7, 13])
    res = short_circuit(g, buses=buses, zf=zf, vpre=vpre)
    ifault, vpost, iflow = _dense_oracle(g, buses, zf=zf, vpre=vpre)
    np.testing.assert_allclose(res.ifault, ifault, rtol=1e-9)
    np.testing.assert_allclose(res.vpost, vpost, atol=1e-9)


def test_zbus_columns_chunking():
    g = ieee14()
    Y, _, _ = ybus(g)
    Z = np.linalg.inv(np.asarray(Y.todense()))
    buses = np.arange(g.n_bus)
    cols = zbus_columns(Y, buses, chunk=5)
    np.testing.assert_allclose(cols, Z[:, buses], atol=1e-9)


def test_isolated_bus_flagged():
    # 3 buses, one branch 0-1, bus 2 fully isolated (Ybus row/col 2 = 0)
    g = Grid(
        n_bus=3,
        f=np.array([0]), t=np.array([1]),
        r=np.array([0.01]), x=np.array([0.1]),
        b=np.array([0.0]), tap=np.array([1.0]),
        bus_type=np.array([SLACK, PQ, PQ]),
        pd=np.zeros(3), qd=np.zeros(3), pg=np.zeros(3),
        vm0=np.ones(3), gs=np.zeros(3), bs=np.zeros(3),
    )
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = short_circuit(g)
    assert not res.ok[2]
    assert np.isnan(res.ifault[2])
    # the healthy component still solves: bus 0/1 faults may be judged
    # through the singular factor — only require the flagged one correct


def test_bad_bus_raises():
    g = ieee14()
    Y, _, _ = ybus(g)
    with pytest.raises(IndexError):
        zbus_columns(Y, np.array([g.n_bus]))
