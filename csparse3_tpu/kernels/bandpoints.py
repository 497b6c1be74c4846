"""Hybrid band + scattered-points SpMV — the TPU answer to wide sparse bands.

Grid admittance matrices ordered naturally (or by RCM) have two kinds of
structure (models/grids.synthetic_grid; real transmission Ybus matrices
look the same):

* a handful of HEAVY diagonals — the lattice/backbone offsets
  {0, +-1, +-side} carrying ~85% of nnz at near-full occupancy;
* a sparse WASH of long-line/chord entries spread thinly over the whole
  +-2*side band (occupancy per diagonal << 1%).

A dense-offset-range DIA plan (ops.matvec.DIAPlan) stores the wash at
band density — ~200x redundancy at 200k buses, which caps SpMV at
HBM-bandwidth/200.  This module splits the matrix:

* ``OffsetsPlan`` — the heavy diagonals as slabs with STATIC shifts
  (python-int offsets, unrolled; no scan, no dynamic slicing);
* ``points_spmv_pallas`` — everything else as packed per-row-tile entry
  lists processed by a Pallas kernel: the per-tile x window lives in
  VMEM, "gather" is a one-hot matmul on the MXU built in-kernel from
  int32 indices (TPUs have no vector-gather unit; a 128-wide one-hot
  contraction is the hardware-native substitute), and the write-back is
  a second one-hot matmul over the tile's rows.

``SplitBandPoints`` composes both for split-complex matvecs; one x
window + one pair of one-hot matrices serve the real AND imaginary slab
sets and both output components.

Reference kernels replaced: csc_matvec / dia_matvec
(/root/reference/src/sparsetools/csc.h:28-45, dia.h:30-58).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = ["OffsetsPlan", "SplitBandPoints", "points_spmv_pallas",
           "split_offsets"]


# ---------------------------------------------------------------------------
# heavy-diagonal core: static-shift slabs
# ---------------------------------------------------------------------------

class OffsetsPlan:
    """SpMV over an explicit list of diagonals with static shifts.

    slabs[k, i] = A[i, i + offs[k]]; offsets are compile-time constants,
    so every shifted window is a static slice — no scan, no gather.
    ``__call__`` takes (n,) or (n, B).
    """

    def __init__(self, m, n, offs, slabs):
        self.m, self.n = m, n
        self.offs = tuple(int(o) for o in offs)
        self.slabs = slabs  # (len(offs), m) jnp or numpy

    @classmethod
    def from_entries(cls, m, n, rows, cols, vals, offs):
        offs = sorted(int(o) for o in offs)
        omap = {o: k for k, o in enumerate(offs)}
        ra = np.zeros((len(offs), m), dtype=np.float32)
        d = cols - rows
        for o, k in omap.items():
            sel = d == o
            ra[k, rows[sel]] = vals[sel]
        return cls(m, n, offs, jnp.asarray(ra))

    def __call__(self, x):
        x = jnp.asarray(x, jnp.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[:, None]
        B = x.shape[1]
        if not self.offs:
            y = jnp.zeros((self.m, B), jnp.float32)
            return y[:, 0] if squeeze else y
        P = max(0, -min(self.offs))
        Q = max(0, max(self.offs) + self.m - self.n)
        xp = jnp.concatenate([
            jnp.zeros((P, B), x.dtype), x, jnp.zeros((Q, B), x.dtype)])
        y = jnp.zeros((self.m, B), jnp.float32)
        for k, o in enumerate(self.offs):
            win = jax.lax.slice_in_dim(xp, P + o, P + o + self.m, axis=0)
            y = y + self.slabs[k][:, None] * win
        return y[:, 0] if squeeze else y


jax.tree_util.register_pytree_node(
    OffsetsPlan,
    lambda p: ((p.slabs,), (p.m, p.n, p.offs)),
    lambda aux, ch: _offsets_unflatten(aux, ch),
)


def _offsets_unflatten(aux, ch):
    obj = object.__new__(OffsetsPlan)
    obj.m, obj.n, obj.offs = aux
    (obj.slabs,) = ch
    return obj


# ---------------------------------------------------------------------------
# scattered points: packed per-row-tile entries + one-hot MXU kernel
# ---------------------------------------------------------------------------

def _pack_points(m, rows, cols, valr, vali, T):
    """Pack entries into per-row-tile arrays, one row per tile: (nt, E).

    ``widx`` is the WINDOW-relative column of each entry for its tile;
    ``wrow`` the tile-relative row (T = dead padding slot).
    """
    nt = -(-m // T)
    t = rows // T
    if len(rows):
        d = cols - rows
        omin_p, omax_p = int(d.min()), int(d.max())
    else:
        omin_p = omax_p = 0
    P = max(0, -omin_p)
    spread = omax_p - omin_p
    KW = -(-(spread + T) // T) + 1
    base = ((t * T + omin_p + P) // T) * T  # window origin (padded coords)
    wc = cols + P - base
    counts = np.bincount(t, minlength=nt)
    E = max(8, int(counts.max()) if counts.size else 8)
    E = -(-E // 8) * 8
    widx = np.zeros((nt, E), dtype=np.int32)
    wrow = np.full((nt, E), T, dtype=np.int32)  # T = dead row
    vr = np.zeros((nt, E), dtype=np.float32)
    vi = np.zeros((nt, E), dtype=np.float32)
    order = np.argsort(t, kind="stable")
    offs = np.concatenate([[0], np.cumsum(counts)])
    slot = np.arange(len(rows)) - offs[t[order]]
    widx[t[order], slot] = wc[order].astype(np.int32)
    wrow[t[order], slot] = (rows[order] - t[order] * T).astype(np.int32)
    vr[t[order], slot] = valr[order].astype(np.float32)
    if vali is not None:
        vi[t[order], slot] = vali[order].astype(np.float32)
    return widx, wrow, vr, vi, omin_p, P, KW, nt


def _points_call(E, T, KW, nt, m_pad, omin_p, P, interpret):
    W = KW * T

    def kernel(widx_ref, wrow_ref, vr_ref, vi_ref, *refs):
        xrefs, o_ref = refs[:-1], refs[-1]
        t = pl.program_id(0)
        w = jnp.concatenate([r[:] for r in xrefs], axis=1)  # (2, W)
        # entry tables are fully VMEM-resident (constant index_map loads
        # them once); the tile's row comes out with a dynamic SUBLANE
        # slice, the one supported dynamic access
        widx = widx_ref[pl.ds(t, 1), :]  # (1, E) int32
        wrow = wrow_ref[pl.ds(t, 1), :]
        vr = vr_ref[pl.ds(t, 1), :]  # (1, E) f32
        vi = vi_ref[pl.ds(t, 1), :]
        # transposed one-hots: entries on LANES, so no transposes anywhere
        csub = jax.lax.broadcasted_iota(jnp.int32, (W, E), 0)
        ohT = (csub == widx).astype(jnp.float32)  # (W, E)
        # HIGHEST: the v5e MXU truncates f32 operands to bf16 by default,
        # costing ~2^-9 relative error on the gathered x values
        G = jnp.dot(w, ohT, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (2, E)
        p_yr = vr * G[0:1, :] - vi * G[1:2, :]  # (1, E)
        p_yi = vr * G[1:2, :] + vi * G[0:1, :]
        P2 = jnp.concatenate([p_yr, p_yi], axis=0)  # (2, E)
        rsub = jax.lax.broadcasted_iota(jnp.int32, (T, E), 0)
        rowohT = (rsub == wrow).astype(jnp.float32)  # (T, E); dead rows 0
        # (T, E) x (2, E) contracted on E -> (T, 2)
        o_ref[:] = jax.lax.dot_general(
            rowohT, P2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def xmap(shift):
        return lambda t: (0, (t * T + omin_p + P) // T + shift)

    full = lambda t: (0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((nt, E), full),
        pl.BlockSpec((nt, E), full),
        pl.BlockSpec((nt, E), full),
        pl.BlockSpec((nt, E), full),
    ] + [pl.BlockSpec((2, T), xmap(s)) for s in range(KW)]
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, 2), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, 2), jnp.float32),
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=(
    "T", "KW", "omin_p", "P", "m", "interpret"))
def points_spmv_pallas(widx, wrow, vr, vi, x2, *, T, KW, omin_p, P, m,
                       interpret=False):
    """(yr, yi) contribution of packed point entries.

    x2: (2, n) stacked (xr, xi) float32.  Returns (2, m).
    """
    nt, E = widx.shape
    m_pad = nt * T
    # padded x so every tile's KW aligned window blocks exist
    last_base = ((nt - 1) * T + omin_p + P) // T * T
    xp_len = max(last_base + KW * T,
                 -(-(P + x2.shape[1]) // T) * T)
    xp = jnp.zeros((2, xp_len), jnp.float32)
    xp = jax.lax.dynamic_update_slice(
        xp, x2.astype(jnp.float32), (0, P))
    call = _points_call(E, T, KW, nt, m_pad, omin_p, P, interpret)
    xargs = [xp] * KW
    y = call(widx, wrow, vr, vi, *xargs)  # (m_pad, 2)
    return y[:m].T


def split_offsets(rows, cols, n, frac: float = 0.02):
    """Heavy offsets: those carrying at least ``frac * n`` entries."""
    d = cols - rows
    offs, counts = np.unique(d, return_counts=True)
    return set(int(o) for o in offs[counts >= max(1, int(frac * n))])


def _default_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


class SplitBandPoints:
    """Split-complex SpMV = heavy-diagonal slabs + one-hot point kernel.

    ``__call__(xr, xi) -> (yr, yi)``.  Built from a complex (or real)
    square CSC; ordering is the caller's business (natural order is
    already optimal for lattice-backbone grids).

    Scattered entries can be partitioned into OFFSET GROUPS spanning
    ``group_span`` diagonals each (own kernel call, gather window
    ``group_span + tile`` instead of ``spread + tile``).  Only worth it
    when points-per-tile >= 128 * n_groups: the entry axis pads to 128
    lanes per kernel, so thin groups cost MORE (measured 2x slower at 1M
    grid density with 6 groups).  Default: one group.
    """

    def __init__(self, a, frac: float = 0.02, tile: int = 256,
                 group_span: int | None = None):
        ip, ix, vals = a.np_arrays()
        m, n = a.m, a.n
        rows = ix.astype(np.int64)
        cols = np.repeat(np.arange(n, dtype=np.int64), np.diff(ip))
        self.iscomplex = np.iscomplexobj(vals)
        vr = np.ascontiguousarray(vals.real).astype(np.float32)
        vi = (np.ascontiguousarray(vals.imag).astype(np.float32)
              if self.iscomplex else None)
        heavy = split_offsets(rows, cols, n, frac)
        d = cols - rows
        core = np.isin(d, list(heavy)) if heavy else np.zeros(len(d), bool)
        pts = ~core
        self.m, self.n = m, n
        self.core_r = OffsetsPlan.from_entries(
            m, n, rows[core], cols[core], vr[core], heavy)
        self.core_i = (OffsetsPlan.from_entries(
            m, n, rows[core], cols[core], vi[core], heavy)
            if self.iscomplex else None)
        self.tile = tile
        self.group_span = group_span
        # partition point entries into offset groups
        pr, pc = rows[pts], cols[pts]
        pvr = vr[pts]
        pvi = vi[pts] if vi is not None else None
        dd = pc - pr
        self.point_data = []   # jnp arrays per group
        self.point_meta = []   # static (T, KW, omin_p, P) per group
        if len(dd):
            if group_span is None:
                gid = np.zeros(len(dd), dtype=np.int64)
            else:
                gid = (dd - int(dd.min())) // group_span
            for g in np.unique(gid):
                sel = gid == g
                widx, wrow, gvr, gvi, omin_p, P, KW, _nt = _pack_points(
                    m, pr[sel], pc[sel], pvr[sel],
                    pvi[sel] if pvi is not None else None, tile)
                self.point_data.append(
                    (jnp.asarray(widx), jnp.asarray(wrow),
                     jnp.asarray(gvr), jnp.asarray(gvi)))
                self.point_meta.append((tile, KW, omin_p, P))

    @property
    def core_ndiag(self):
        return len(self.core_r.offs)

    @property
    def n_groups(self):
        return len(self.point_data)

    def __call__(self, xr, xi):
        xr = jnp.asarray(xr, jnp.float32)
        xi = jnp.asarray(xi, jnp.float32)
        x2 = jnp.stack([xr, xi], axis=1)  # (n, 2)
        r2 = self.core_r(x2)
        if self.core_i is not None:
            i2 = self.core_i(x2)
            yr = r2[:, 0] - i2[:, 1]
            yi = r2[:, 1] + i2[:, 0]
        else:
            yr, yi = r2[:, 0], r2[:, 1]
        if self.point_data:
            x2r = jnp.stack([xr, xi], axis=0)
            interp = _default_interpret()
            for (widx, wrow, gvr, gvi), (T, KW, omin_p, P) in zip(
                    self.point_data, self.point_meta):
                yp = points_spmv_pallas(
                    widx, wrow, gvr, gvi, x2r,
                    T=T, KW=KW, omin_p=omin_p, P=P, m=self.m,
                    interpret=interp)
                yr = yr + yp[0]
                yi = yi + yp[1]
        return yr, yi


jax.tree_util.register_pytree_node(
    SplitBandPoints,
    lambda p: ((p.core_r, p.core_i, p.point_data),
               (p.m, p.n, p.iscomplex, p.tile, p.group_span,
                tuple(p.point_meta))),
    lambda aux, ch: _sbp_unflatten(aux, ch),
)


def _sbp_unflatten(aux, ch):
    obj = object.__new__(SplitBandPoints)
    (obj.m, obj.n, obj.iscomplex, obj.tile, obj.group_span, meta) = aux
    obj.point_meta = list(meta)
    (obj.core_r, obj.core_i, obj.point_data) = ch
    return obj
