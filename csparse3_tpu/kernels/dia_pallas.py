"""Pallas TPU kernel for banded (DIA-slab) SpMV.

The XLA formulation (``ops.matvec.DIAPlan``) is a ``lax.scan`` over
diagonal chunks whose per-step work is a handful of dynamic-slice
windows — robust, but each shifted window materializes through HBM and
the scan step count pays dispatch latency.  This kernel instead streams
the slab array tile-by-tile through VMEM (double-buffered by the Pallas
pipeline) and performs every shifted multiply-accumulate on VMEM-resident
data, so HBM traffic is exactly one pass over the slabs plus one read of
x and one write of y — the speed-of-light for this format.

Layout: vectors are carried as (B, m) — batch on sublanes, rows on
lanes — so the per-diagonal shifted window is a dynamic LANE slice of a
(B, 3T) VMEM window, which Mosaic lowers to cheap vector shifts.

Reference kernels this replaces: scipy-lineage ``dia_matvec``
(/root/reference/src/sparsetools/dia.h:30-58); the slab layout is this
package's own row-aligned dense-offset-range form (ops/matvec.DIAPlan).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dia_spmv_pallas", "PallasDIA", "SplitPallasDIA"]


def _pallas_band_call(D_pad, m_pad, nb, nd, T, Dc, B, omin, P, xp_len,
                      interpret):
    """Build the pallas_call for given static geometry."""

    def kernel(s_ref, x0_ref, x1_ref, x2_ref, o_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        off = (i * T + omin + P + j * Dc) % T
        w = jnp.concatenate([x0_ref[:], x1_ref[:], x2_ref[:]], axis=1)
        # one dynamic lane-roll cancels the base offset; every diagonal's
        # window is then a STATIC slice (Mosaic has no dynamic-start lane
        # loads, but static offsets and dynamic rolls it handles natively).
        # roll is circular, but with Dc <= T the highest lane read is
        # Dc-1+T <= 2T < 3T-off, safely below the wrap point.
        # positive-equivalent shift: compiled Mosaic roll mishandles
        # negative dynamic shifts (observed wrong results on v5e)
        wb = pltpu.roll(w, 3 * T - off, axis=1)
        acc = jnp.zeros((o_ref.shape[0], T), jnp.float32)
        for d in range(Dc):
            sd = s_ref[d, :]
            acc = acc + sd[None, :] * wb[:, d:d + T]

        @pl.when(j == 0)
        def _init():
            o_ref[:] = acc

        @pl.when(j > 0)
        def _acc():
            o_ref[:] = o_ref[:] + acc

    def xmap(shift):
        return lambda i, j: (0, (i * T + omin + P + j * Dc) // T + shift)

    return pl.pallas_call(
        kernel,
        grid=(nb, nd),
        in_specs=[
            pl.BlockSpec((Dc, T), lambda i, j: (j, i)),
            pl.BlockSpec((B, T), xmap(0)),
            pl.BlockSpec((B, T), xmap(1)),
            pl.BlockSpec((B, T), xmap(2)),
        ],
        out_specs=pl.BlockSpec((B, T), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((B, m_pad), jnp.float32),
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("omin", "tile", "dchunk", "interpret"),
)
def dia_spmv_pallas(slabs, xbm, *, omin: int, tile: int = 512,
                    dchunk: int = 64, interpret: bool = False):
    """y(B, m) = band(slabs, omin) @ x for x given as (B, m) float32.

    ``slabs``: (D, m) row-aligned dense-offset-range diagonals —
    ``y[i] += slabs[d, i] * x[i + omin + d]``.
    """
    D, m = slabs.shape
    B = xbm.shape[0]
    T = tile
    Dc = min(dchunk, max(8, D))
    nb = -(-m // T)
    m_pad = nb * T
    nd = -(-D // Dc)
    D_pad = nd * Dc
    slabs_p = jnp.pad(slabs.astype(jnp.float32),
                      ((0, D_pad - D), (0, m_pad - m)))
    P = max(0, -omin)
    # last window start: (nb-1)T + omin + P + (nd-1)Dc ; block p+2 must exist
    gmax = (nb - 1) * T + omin + P + (nd - 1) * Dc
    # window blocks p..p+2 must exist AND xp must contain x at offset P
    # (dynamic_update_slice clamps out-of-range starts, silently corrupting
    # placement otherwise)
    xp_len = max((gmax // T + 3) * T,
                 -(-(P + xbm.shape[1]) // T) * T)
    xp = jnp.zeros((B, xp_len), jnp.float32)
    xp = jax.lax.dynamic_update_slice(xp, xbm.astype(jnp.float32), (0, P))
    call = _pallas_band_call(D_pad, m_pad, nb, nd, T, Dc, B, omin, P,
                             xp_len, interpret)
    y = call(slabs_p, xp, xp, xp)
    return y[:, :m]


def _default_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


class PallasDIA:
    """DIAPlan twin backed by the Pallas band kernel.

    Same host-side construction (densified diagonal range) as
    ``ops.matvec.DIAPlan``; ``__call__`` takes (n,) or (n, B).
    """

    def __init__(self, a, tile: int = 512, dchunk: int = 64):
        from ..ops.matvec import DIAPlan

        base = DIAPlan(a)
        self.m, self.n, self.omin = base.m, base.n, base.omin
        self.slabs = base.slabs  # (D, m) jnp
        self.tile = tile
        self.dchunk = dchunk

    @property
    def ndiag(self) -> int:
        return int(self.slabs.shape[0])

    def __call__(self, x):
        x = jnp.asarray(x)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[:, None]
        y = dia_spmv_pallas(
            self.slabs, x.T, omin=self.omin, tile=self.tile,
            dchunk=self.dchunk, interpret=_default_interpret(),
        ).T
        return y[:, 0] if squeeze else y


jax.tree_util.register_pytree_node(
    PallasDIA,
    lambda p: ((p.slabs,), (p.m, p.n, p.omin, p.tile, p.dchunk)),
    lambda aux, ch: _pallasdia_unflatten(aux, ch),
)


def _pallasdia_unflatten(aux, ch):
    obj = object.__new__(PallasDIA)
    obj.m, obj.n, obj.omin, obj.tile, obj.dchunk = aux
    (obj.slabs,) = ch
    return obj


class SplitPallasDIA:
    """Split-complex banded SpMV on the Pallas band kernel.

    ``__call__(xr, xi) -> (yr, yi)``; each real slab set is streamed once
    for the stacked (2, m) input.
    """

    def __init__(self, a, tile: int = 512, dchunk: int = 64):
        from ..types import CSC

        ip, rows, vals = a.np_arrays()
        self.iscomplex = np.iscomplexobj(vals)
        re = CSC(a.m, a.n, ip, rows, np.ascontiguousarray(vals.real),
                 canonical=a.canonical)
        self.re = PallasDIA(re, tile=tile, dchunk=dchunk)
        if self.iscomplex:
            im = CSC(a.m, a.n, ip, rows, np.ascontiguousarray(vals.imag),
                     canonical=a.canonical)
            self.im = PallasDIA(im, tile=tile, dchunk=dchunk)
        else:
            self.im = None

    def __call__(self, xr, xi):
        x2 = jnp.stack([jnp.asarray(xr), jnp.asarray(xi)], axis=1)
        r2 = self.re(x2)
        if self.im is None:
            return r2[:, 0], r2[:, 1]
        i2 = self.im(x2)
        return r2[:, 0] - i2[:, 1], r2[:, 1] + i2[:, 0]


jax.tree_util.register_pytree_node(
    SplitPallasDIA,
    lambda p: ((p.re, p.im), (p.iscomplex,)),
    lambda aux, ch: _splitpallasdia_unflatten(aux, ch),
)


def _splitpallasdia_unflatten(aux, ch):
    obj = object.__new__(SplitPallasDIA)
    obj.iscomplex = aux[0]
    obj.re, obj.im = ch
    return obj
