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

* heavy diagonals as slabs with STATIC shifts (python-int offsets,
  unrolled; no scan, no gather) — ``OffsetsPlan`` standalone, or fused
  into the kernel below;
* everything else as packed per-row-tile entry lists processed by a
  Pallas kernel: the per-tile x window lives in VMEM, "gather" is a
  FACTORED one-hot contraction on the MXU built in-kernel from int32
  indices (widx = q*T + r: a (T, E) within-block one-hot contracted
  against all KW window blocks at once + a (KW, E) block-select mask —
  ~KW x less VPU work than the direct (KW*T, E) one-hot; TPUs have no
  vector-gather unit, so a one-hot matmul is the hardware-native
  substitute), and the write-back is a second one-hot matmul over the
  tile's rows.

``SplitBandPoints`` runs BOTH parts in ONE fused kernel
(``band_points_spmv_pallas``) per matvec: composing a separate XLA slab
pass with a per-iteration pallas call measured ~10x the sum of the parts
on the dev runtime, and the points window already covers every heavy
offset, whose within-window start is a static lane offset.  Everything
stays in the (component, vector) row layout — batch on sublanes, vector
on lanes — because a (m, 2)-layout output uses 2 of 128 lanes per vreg
(measured 15x slowdown).

Reference kernels replaced: csc_matvec / dia_matvec
(/root/reference/src/sparsetools/csc.h:28-45, dia.h:30-58).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["OffsetsPlan", "SplitBandPoints", "points_spmv_pallas",
           "band_points_spmv_pallas", "split_offsets"]


# ---------------------------------------------------------------------------
# heavy-diagonal core: static-shift slabs
# ---------------------------------------------------------------------------

def _dot_onehot(A, Boh, dn=None, parts=3):
    """Dot of DATA against a 0/1 one-hot operand in ``parts``
    single-pass MXU products.

    The v5e MXU natively multiplies bf16; 'HIGHEST' emulates f32 x f32
    with SIX bf16 passes.  A one-hot operand is bf16-EXACT, so only the
    data side needs splitting: A = a1 + a2 (+ a3) with each part
    bf16-representable (8+8(+8) of f32's 24 mantissa bits).  parts=3
    reproduces the HIGHEST result exactly at half the passes (measured:
    403 -> 246 us per 200k matvec for the supertile kernel, relerr
    unchanged at 2.2e-7); parts=2 keeps ~16 mantissa bits (~1e-5
    relative) at a third of the passes — the 'fast' plan mode for
    iterative-solver contexts."""
    a1 = A.astype(jnp.bfloat16).astype(jnp.float32)
    r = A - a1
    a2 = r.astype(jnp.bfloat16).astype(jnp.float32)

    def d(x):
        if dn is None:
            return jnp.dot(x, Boh, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)
        return jax.lax.dot_general(
            x, Boh, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)

    out = d(a1) + d(a2)
    if parts >= 3:
        out = out + d(r - a2)
    return out


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

    def rows(self, x2):
        """Row-layout variant: x2 (B, n) -> (B, m).  Keeping the batch on
        SUBLANES and the vector on LANES end-to-end avoids the (n, B) <->
        (B, n) relayouts that dominate small-B split-complex matvecs."""
        x2 = jnp.asarray(x2, jnp.float32)
        B = x2.shape[0]
        if not self.offs:
            return jnp.zeros((B, self.m), jnp.float32)
        P = max(0, -min(self.offs))
        Q = max(0, max(self.offs) + self.m - self.n)
        xp = jnp.concatenate([
            jnp.zeros((B, P), x2.dtype), x2, jnp.zeros((B, Q), x2.dtype)],
            axis=1)
        y = jnp.zeros((B, self.m), jnp.float32)
        for k, o in enumerate(self.offs):
            win = jax.lax.slice_in_dim(xp, P + o, P + o + self.m, axis=1)
            y = y + self.slabs[k][None, :] * win
        return y


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

def _pack_points(m, rows, cols, valr, vali, T, off_range=None):
    """Pack entries into per-row-tile arrays, one row per tile: (nt, E).

    ``widx`` is the WINDOW-relative column of each entry for its tile;
    ``wrow`` the tile-relative row (T = dead padding slot).  ``off_range``
    widens the window to also cover the given (lo, hi) diagonal offsets
    (used by the fused kernel so the core slabs can read their windows).
    """
    nt = -(-m // T)
    t = rows // T
    if len(rows):
        d = cols - rows
        omin_p, omax_p = int(d.min()), int(d.max())
    else:
        omin_p = omax_p = 0
    if off_range is not None:
        omin_p = min(omin_p, int(off_range[0]))
        omax_p = max(omax_p, int(off_range[1]))
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


def _points_call(E, T, KW, nt, m_pad, omin_p, P, interpret,
                 parts=3):
    def kernel(widx_ref, wrow_ref, vr_ref, vi_ref, *refs):
        xrefs, o_ref = refs[:-1], refs[-1]
        t = pl.program_id(0)
        # entry tables are fully VMEM-resident (constant index_map loads
        # them once); the tile's row comes out with a dynamic SUBLANE
        # slice, the one supported dynamic access
        widx = widx_ref[pl.ds(t, 1), :]  # (1, E) int32
        wrow = wrow_ref[pl.ds(t, 1), :]
        vr = vr_ref[pl.ds(t, 1), :]  # (1, E) f32
        vi = vi_ref[pl.ds(t, 1), :]
        # FACTORED one-hot gather: widx = q*T + r.  A direct (W, E)
        # one-hot costs W*E = KW*T*E comparisons on the VPU; factoring
        # into a (T, E) within-block one-hot (contracted on the MXU
        # against ALL KW blocks at once) plus a (KW, E) block-select
        # mask costs (T + KW)*E — ~KW x less VPU work, same MXU flops.
        q = widx // T  # (1, E) block id
        r = widx - q * T  # (1, E) within-block position
        # transposed one-hots: entries on LANES, so no transposes anywhere
        rsub = jax.lax.broadcasted_iota(jnp.int32, (T, E), 0)
        M1 = (rsub == r).astype(jnp.float32)  # (T, E)
        # stack re rows of every window block, then im rows: (2*KW, T)
        # (a VMEM-resident blocked x + dynamic sublane slice would avoid
        # these per-step window DMAs, but Mosaic requires dynamic sublane
        # starts provably 8-aligned and t + c0 is not)
        R = jnp.concatenate(
            [x[0:1, :] for x in xrefs] + [x[1:2, :] for x in xrefs], axis=0)
        # exact selection at half the HIGHEST passes: see _dot_onehot
        Pg = _dot_onehot(R, M1, parts=parts)  # (2*KW, E)
        ksub = jax.lax.broadcasted_iota(jnp.int32, (KW, E), 0)
        mask = (ksub == q).astype(jnp.float32)  # (KW, E)
        Gr = jnp.sum(mask * Pg[:KW, :], axis=0, keepdims=True)  # (1, E)
        Gi = jnp.sum(mask * Pg[KW:, :], axis=0, keepdims=True)
        p_yr = vr * Gr - vi * Gi  # (1, E)
        p_yi = vr * Gi + vi * Gr
        P2 = jnp.concatenate([p_yr, p_yi], axis=0)  # (2, E)
        rowohT = (rsub == wrow).astype(jnp.float32)  # (T, E); dead rows 0
        # (2, E) x (T, E) contracted on E -> (2, T): output stays in the
        # (components, rows) layout so no host-side transpose is needed
        o_ref[:] = _dot_onehot(P2, rowohT, (((1,), (1,)), ((), ())),
                               parts=parts)

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
        out_specs=pl.BlockSpec((2, T), lambda t: (0, t)),
        out_shape=jax.ShapeDtypeStruct((2, m_pad), jnp.float32),
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=(
    "T", "KW", "omin_p", "P", "m", "parts", "interpret"))
def points_spmv_pallas(widx, wrow, vr, vi, x2, *, T, KW, omin_p, P, m,
                       parts=3, interpret=False):
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
    call = _points_call(E, T, KW, nt, m_pad, omin_p, P, interpret,
                        parts=parts)
    xargs = [xp] * KW
    y = call(widx, wrow, vr, vi, *xargs)  # (2, m_pad)
    return y[:, :m]


def _fused_call(E, T, KW, nt, m_pad, omin_p, P, offs, D, interpret,
                parts=3):
    """One kernel = heavy-diagonal slabs + one-hot point gather.

    Composing the slab contraction (plain XLA) with a per-iteration
    pallas call costs ~10x the sum of the parts on this runtime (measured:
    40us core + 80us points -> 490us composed at 200k), so the core
    diagonals move INTO the kernel: each tile's window already covers
    every heavy offset, and the within-window start of offset ``o`` is
    the STATIC lane offset  P + o - ((omin_p + P)//T)*T.
    """
    c0T = ((omin_p + P) // T) * T

    def kernel(widx_ref, wrow_ref, vr_ref, vi_ref, s2_ref, *refs):
        xrefs, o_ref = refs[:-1], refs[-1]
        t = pl.program_id(0)
        widx = widx_ref[pl.ds(t, 1), :]  # (1, E) int32
        wrow = wrow_ref[pl.ds(t, 1), :]
        vr = vr_ref[pl.ds(t, 1), :]  # (1, E) f32
        vi = vi_ref[pl.ds(t, 1), :]
        q = widx // T
        r = widx - q * T
        rsub = jax.lax.broadcasted_iota(jnp.int32, (T, E), 0)
        M1 = (rsub == r).astype(jnp.float32)  # (T, E)
        R = jnp.concatenate(
            [x[0:1, :] for x in xrefs] + [x[1:2, :] for x in xrefs], axis=0)
        Pg = _dot_onehot(R, M1, parts=parts)  # (2*KW, E)
        ksub = jax.lax.broadcasted_iota(jnp.int32, (KW, E), 0)
        mask = (ksub == q).astype(jnp.float32)  # (KW, E)
        Gr = jnp.sum(mask * Pg[:KW, :], axis=0, keepdims=True)
        Gi = jnp.sum(mask * Pg[KW:, :], axis=0, keepdims=True)
        p_yr = vr * Gr - vi * Gi
        p_yi = vr * Gi + vi * Gr
        P2 = jnp.concatenate([p_yr, p_yi], axis=0)  # (2, E)
        rowohT = (rsub == wrow).astype(jnp.float32)
        y = _dot_onehot(P2, rowohT, (((1,), (1,)), ((), ())),
                        parts=parts)  # (2, T)
        # heavy-diagonal slabs: static lane slices of the window.  The
        # slab block is (1, 2*D, T) — re rows then im rows, contiguous in
        # HBM per tile (one DMA descriptor instead of 2*D strided rows)
        w = jnp.concatenate([x[:] for x in xrefs], axis=1)  # (2, W)
        s2 = s2_ref[0]  # (2*D, T)
        yr, yi = y[0:1, :], y[1:2, :]
        W = KW * T
        for kd, o in enumerate(offs):
            s = P + int(o) - c0T
            # positive-normalized roll + aligned front slice: unaligned
            # static lane slices lower poorly; rolls are native
            xw = pltpu.roll(w, W - s, axis=1)[:, :T] if s else w[:, :T]
            ar = s2[kd:kd + 1, :]  # (1, T)
            ai = s2[D + kd:D + kd + 1, :]
            yr = yr + ar * xw[0:1, :] - ai * xw[1:2, :]
            yi = yi + ar * xw[1:2, :] + ai * xw[0:1, :]
        o_ref[:] = jnp.concatenate([yr, yi], axis=0)

    def xmap(shift):
        return lambda t: (0, (t * T + omin_p + P) // T + shift)

    full = lambda t: (0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((nt, E), full),
        pl.BlockSpec((nt, E), full),
        pl.BlockSpec((nt, E), full),
        pl.BlockSpec((nt, E), full),
        pl.BlockSpec((1, 2 * D, T), lambda t: (t, 0, 0)),
    ] + [pl.BlockSpec((2, T), xmap(s)) for s in range(KW)]
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, T), lambda t: (0, t)),
        out_shape=jax.ShapeDtypeStruct((2, m_pad), jnp.float32),
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=(
    "T", "KW", "omin_p", "P", "m", "offs", "parts", "interpret"))
def band_points_spmv_pallas(widx, wrow, vr, vi, s2, x2, *, T, KW,
                            omin_p, P, m, offs, parts=3,
                            interpret=False):
    """Full split-complex SpMV: heavy-diagonal slabs + packed points in
    ONE pallas call.  s2: (nt, 2*D, T) per-tile slab blocks (re rows then
    im rows).  x2: (2, n) stacked (xr, xi).  Returns (2, m)."""
    nt, E = widx.shape
    m_pad = nt * T
    last_base = ((nt - 1) * T + omin_p + P) // T * T
    xp_len = max(last_base + KW * T,
                 -(-(P + x2.shape[1]) // T) * T)
    xp = jnp.zeros((2, xp_len), jnp.float32)
    xp = jax.lax.dynamic_update_slice(
        xp, x2.astype(jnp.float32), (0, P))
    D = s2.shape[1] // 2
    call = _fused_call(E, T, KW, nt, m_pad, omin_p, P, offs, D,
                       interpret, parts=parts)
    y = call(widx, wrow, vr, vi, s2, *([xp] * KW))  # (2, m_pad)
    return y[:, :m]


_ST_G = 8   # tiles per supertile grid step (must be a multiple of 8)


def _supertile_call(E, T, KW, NG, extra, C0a, offs, D, interpret,
                    windows=False, parts=3):
    """Supertile-of-8 fused kernel with a VMEM-RESIDENT x.

    The per-grid-step floor of ``_fused_call`` is its KW strided window
    DMAs (ablation: ~0.3 ms of the 0.5 ms 200k matvec).  Here x lives in
    VMEM once (constant-index blocks are fetched a single time), each
    grid step covers EIGHT row tiles, and the step's window slice start
    ``8*g + C0a`` is divisible by 8 BY CONSTRUCTION (C0a is the window
    base rounded down to 8 blocks) — the provable alignment Mosaic
    demands for dynamic sublane starts.  Inside the step everything is
    static: subtile u's gather rows are ``u+extra .. u+extra+KW`` of the
    slice, and the heavy-diagonal windows are two static rows + a
    static positive roll.
    """
    # slice rows covering all G subtiles' windows (+1 spare so the
    # two-row diagonal window never slices past the end)
    G = _ST_G
    LW = extra + G + KW

    def kernel(widx_ref, wrow_ref, vr_ref, vi_ref, s2_ref, xre_ref,
               xim_ref, o_ref):
        g = pl.program_id(0)
        if windows:
            # per-step pre-gathered overlapping window block (1, LW, T):
            # works at any n (no VMEM residency), one DMA per step
            xsr = xre_ref[0]
            xsi = xim_ref[0]
        else:
            start = pl.multiple_of(G * g + C0a, 8)
            xsr = xre_ref[pl.ds(start, LW), :]   # (LW, T)
            xsi = xim_ref[pl.ds(start, LW), :]
        rsub = jax.lax.broadcasted_iota(jnp.int32, (T, E), 0)
        ksub = jax.lax.broadcasted_iota(jnp.int32, (KW, E), 0)
        outs = []
        for u in range(G):
            widx = widx_ref[pl.ds(G * g + u, 1), :]  # (1, E)
            wrow = wrow_ref[pl.ds(G * g + u, 1), :]
            vr = vr_ref[pl.ds(G * g + u, 1), :]
            vi = vi_ref[pl.ds(G * g + u, 1), :]
            q = widx // T
            r = widx - q * T
            M1 = (rsub == r).astype(jnp.float32)          # (T, E)
            R = jnp.concatenate(
                [xsr[u + extra: u + extra + KW, :],
                 xsi[u + extra: u + extra + KW, :]], axis=0)  # (2KW, T)
            Pg = _dot_onehot(R, M1, parts=parts)  # (2KW, E)
            mask = (ksub == q).astype(jnp.float32)
            Gr = jnp.sum(mask * Pg[:KW, :], axis=0, keepdims=True)
            Gi = jnp.sum(mask * Pg[KW:, :], axis=0, keepdims=True)
            p_yr = vr * Gr - vi * Gi
            p_yi = vr * Gi + vi * Gr
            P2 = jnp.concatenate([p_yr, p_yi], axis=0)    # (2, E)
            rowohT = (rsub == wrow).astype(jnp.float32)
            y = _dot_onehot(P2, rowohT, (((1,), (1,)), ((), ())),
                        parts=parts)  # (2, T)
            # heavy diagonals: subtile u, diagonal o reads the flat
            # positions u*T + P + o - C0a*T .. +T of the slice — two
            # STATIC rows with a STATIC lane shift
            s2 = s2_ref[0, u]  # (2*D, T)
            yr, yi = y[0:1, :], y[1:2, :]
            for kd, o in enumerate(offs):
                so = u * T + int(o) - C0a * T  # + P added by caller
                jA, rr = so // T, so % T
                ar = s2[kd:kd + 1, :]
                ai = s2[D + kd:D + kd + 1, :]
                if rr == 0:
                    xwr = xsr[jA:jA + 1, :]
                    xwi = xsi[jA:jA + 1, :]
                else:
                    # window = rowA[rr:] | rowB[:rr]: both rolled by the
                    # same amount, stitched with a lane select (Mosaic
                    # rejects lane-concat of rows at different sublane
                    # offsets)
                    lane = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
                    sel = lane < (T - rr)
                    ra_ = pltpu.roll(xsr[jA:jA + 1, :], T - rr, axis=1)
                    rb_ = pltpu.roll(xsr[jA + 1:jA + 2, :], T - rr, axis=1)
                    xwr = jnp.where(sel, ra_, rb_)
                    ia_ = pltpu.roll(xsi[jA:jA + 1, :], T - rr, axis=1)
                    ib_ = pltpu.roll(xsi[jA + 1:jA + 2, :], T - rr, axis=1)
                    xwi = jnp.where(sel, ia_, ib_)
                yr = yr + ar * xwr - ai * xwi
                yi = yi + ar * xwi + ai * xwr
            outs.append(jnp.concatenate([yr, yi], axis=0))  # (2, T)
        o_ref[:] = jnp.concatenate(outs, axis=1)  # (2, 8*T)

    NT = NG * G
    full = lambda g: (0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((NT, E), full),
        pl.BlockSpec((NT, E), full),
        pl.BlockSpec((NT, E), full),
        pl.BlockSpec((NT, E), full),
        pl.BlockSpec((1, G, 2 * D, T), lambda g: (g, 0, 0, 0)),
        None,  # placeholder, replaced below with resident x specs
        None,
    ]
    return kernel, in_specs, LW


@functools.partial(jax.jit, static_argnames=(
    "T", "KW", "omin_p", "P", "m", "offs", "windows", "parts",
    "interpret"))
def band_points_supertile_pallas(widx, wrow, vr, vi, s2, x2, *, T, KW,
                                 omin_p, P, m, offs, windows=False,
                                 parts=3, interpret=False):
    """Supertile-of-8, resident-x variant of ``band_points_spmv_pallas``.

    Same inputs/contract; ``s2`` here is (NG, 8, 2*D, T) slab blocks and
    the entry tables are padded to NG*8 tiles.  ``windows=True`` swaps
    the VMEM-resident x for per-step pre-gathered overlapping window
    blocks (one efficient block-row gather in XLA + one contiguous DMA
    per grid step) — same kernel body, no VMEM size limit, for n past
    the residency budget.
    """
    NT, E = widx.shape
    NG = NT // _ST_G
    m_pad = NT * T
    C0 = (omin_p + P) // T          # window base block of tile 0
    C0a = (C0 // 8) * 8             # rounded down -> slice starts align
    extra = C0 - C0a
    D = s2.shape[2] // 2
    kernel, in_specs, LW = _supertile_call(
        E, T, KW, NG, extra, C0a, tuple(int(o) + P for o in offs), D,
        interpret, windows=windows, parts=parts)
    # padded x blocks: (NBX, T) re and im, big enough for every slice
    NBX = max(_ST_G * (NG - 1) + C0a + LW, -(-(P + x2.shape[1]) // T))
    NBX = -(-NBX // 8) * 8
    xp = jnp.zeros((2, NBX * T), jnp.float32)
    xp = jax.lax.dynamic_update_slice(xp, x2.astype(jnp.float32), (0, P))
    xre = xp[0].reshape(NBX, T)
    xim = xp[1].reshape(NBX, T)
    full = lambda g: (0, 0)  # noqa: E731
    if windows:
        widx_b = (C0a + _ST_G * jnp.arange(NG)[:, None]
                  + jnp.arange(LW)[None, :])          # (NG, LW)
        xre = xre[widx_b]                             # (NG, LW, T)
        xim = xim[widx_b]
        in_specs[-2] = pl.BlockSpec((1, LW, T), lambda g: (g, 0, 0))
        in_specs[-1] = pl.BlockSpec((1, LW, T), lambda g: (g, 0, 0))
    else:
        in_specs[-2] = pl.BlockSpec((NBX, T), full)
        in_specs[-1] = pl.BlockSpec((NBX, T), full)
    y = pl.pallas_call(
        kernel,
        grid=(NG,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, _ST_G * T), lambda g: (0, g)),
        out_shape=jax.ShapeDtypeStruct((2, m_pad), jnp.float32),
        interpret=interpret,
    )(widx, wrow, vr, vi, s2, xre, xim)
    return y[:, :m]


def _auto_supertile(m, tile, nt0, E0, group_span):
    """Pick the supertile mode from the VMEM footprints.

    'resident' when x + the four (NT, E) entry tables fit the ~10 MiB
    budget; 'windows' when only the tables fit (x streams as
    pre-gathered window blocks); False (per-tile streaming kernel)
    when the tables themselves outgrow VMEM — both supertile modes
    keep them fully resident."""
    if group_span is not None:
        return False
    tables = 4 * nt0 * E0 * 4
    resident = (2 * (m + 4 * tile)) * 4 + tables
    if resident <= 10 * (1 << 20):
        return "resident"
    if tables <= 8 * (1 << 20):
        return "windows"
    return False


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
                 group_span: int | None = None,
                 supertile: bool | None = None,
                 precision: str = "exact"):
        if precision not in ("exact", "fast"):
            raise ValueError(f"precision must be 'exact' or 'fast', "
                             f"got {precision!r}")
        # 'exact': 3-part bf16 split of the one-hot dots reproduces the
        # f32 result bit-comparably; 'fast': 2 parts (~16 mantissa bits,
        # ~1e-5 relative) at two thirds of the MXU passes — for
        # iterative-solver contexts where the residual loop absorbs it
        self.dot_parts = 3 if precision == "exact" else 2
        if a.m != a.n:
            raise ValueError(f"SplitBandPoints needs a square matrix, "
                             f"got {a.shape}")
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
        self.tile = tile
        self.group_span = group_span
        nt = -(-m // tile)
        m_pad = nt * tile
        # heavy-diagonal slabs padded to m_pad (fed to the fused kernel
        # tile-by-tile); D >= 1 so the BlockSpec stays well-formed
        self.offs = tuple(sorted(int(o) for o in heavy))
        D = max(len(self.offs), 1)
        sr = np.zeros((D, m_pad), dtype=np.float32)
        si = np.zeros((D, m_pad), dtype=np.float32)
        omap = {o: k for k, o in enumerate(self.offs)}
        for o, k in omap.items():
            sel = core & (d == o)
            sr[k, rows[sel]] = vr[sel]
            if vi is not None:
                si[k, rows[sel]] = vi[sel]
        # per-tile layout (nt, 2*D, T): tile t's re+im slab rows contiguous
        s2 = np.concatenate([sr, si], axis=0)  # (2D, m_pad)
        self.slabs = jnp.asarray(np.ascontiguousarray(
            s2.reshape(2 * D, nt, tile).transpose(1, 0, 2)))
        # partition point entries into offset groups; group 0 carries the
        # core slabs (fused kernel), other groups are points-only
        pr, pc = rows[pts], cols[pts]
        pvr = vr[pts]
        pvi = vi[pts] if vi is not None else None
        dd = pc - pr
        self.point_data = []   # jnp arrays per group
        self.point_meta = []   # static (T, KW, omin_p, P) per group
        off_range = ((min(self.offs), max(self.offs)) if self.offs
                     else (0, 0))
        if group_span is None or not len(dd):
            gids = [np.ones(len(dd), dtype=bool)]
        else:
            gid = (dd - int(dd.min())) // group_span
            gids = [gid == g for g in np.unique(gid)]
        for gi_, sel in enumerate(gids):
            widx, wrow, gvr, gvi, omin_p, P, KW, _nt = _pack_points(
                m, pr[sel], pc[sel], pvr[sel],
                pvi[sel] if pvi is not None else None, tile,
                off_range=off_range if gi_ == 0 else None)
            self.point_data.append(
                (jnp.asarray(widx), jnp.asarray(wrow),
                 jnp.asarray(gvr), jnp.asarray(gvi)))
            self.point_meta.append((tile, KW, omin_p, P))
        # supertile mode (8 tiles per grid step; sustained wall-slope at
        # 200k: 246 us vs 330 us for the per-tile windowed kernel).
        # 'resident' keeps x in VMEM (fastest); past the x budget,
        # 'windows' pre-gathers overlapping window blocks in XLA (one
        # contiguous DMA per step).  BOTH supertile modes keep the four
        # (NT, E) entry tables fully VMEM-resident, so when the tables
        # themselves outgrow the budget only the per-tile kernel (whose
        # BlockSpecs stream everything) can run.
        if supertile is None:
            nt0, E0 = (np.asarray(self.point_data[0][0])).shape
            supertile = _auto_supertile(m, tile, nt0, E0, group_span)
        elif supertile is True:
            supertile = "resident"
        self.supertile = supertile
        if self.supertile:
            widx, wrow, gvr, gvi = [np.asarray(x)
                                    for x in self.point_data[0]]
            nt0, E0 = widx.shape
            NG = -(-nt0 // _ST_G)
            pad = NG * _ST_G - nt0
            if pad:
                widx = np.concatenate(
                    [widx, np.zeros((pad, E0), widx.dtype)])
                wrow = np.concatenate(
                    [wrow, np.full((pad, E0), tile, wrow.dtype)])
                gvr = np.concatenate([gvr, np.zeros((pad, E0), gvr.dtype)])
                gvi = np.concatenate([gvi, np.zeros((pad, E0), gvi.dtype)])
            self.point_data[0] = (jnp.asarray(widx), jnp.asarray(wrow),
                                  jnp.asarray(gvr), jnp.asarray(gvi))
            sl = np.asarray(self.slabs)
            if pad:
                sl = np.concatenate(
                    [sl, np.zeros((pad,) + sl.shape[1:], sl.dtype)])
            self.slabs = jnp.asarray(
                sl.reshape(NG, _ST_G, *sl.shape[1:]))

    @property
    def core_ndiag(self):
        return len(self.offs)

    @property
    def n_groups(self):
        return len(self.point_data)

    def __call__(self, xr, xi):
        xr = jnp.asarray(xr, jnp.float32)
        xi = jnp.asarray(xi, jnp.float32)
        # row layout (2, n) end-to-end: batch on sublanes, vector on lanes
        x2 = jnp.stack([xr, xi], axis=0)  # (2, n)
        interp = _default_interpret()
        # group 0: fused slabs + points kernel (always present)
        widx, wrow, gvr, gvi = self.point_data[0]
        T, KW, omin_p, P = self.point_meta[0]
        if self.supertile:
            y = band_points_supertile_pallas(
                widx, wrow, gvr, gvi, self.slabs, x2,
                T=T, KW=KW, omin_p=omin_p, P=P, m=self.m, offs=self.offs,
                windows=(self.supertile == "windows"),
                parts=self.dot_parts, interpret=interp)
        else:
            y = band_points_spmv_pallas(
                widx, wrow, gvr, gvi, self.slabs, x2,
                T=T, KW=KW, omin_p=omin_p, P=P, m=self.m, offs=self.offs,
                parts=self.dot_parts, interpret=interp)
        yr, yi = y[0], y[1]
        for (widx, wrow, gvr, gvi), (T, KW, omin_p, P) in zip(
                self.point_data[1:], self.point_meta[1:]):
            yp = points_spmv_pallas(
                widx, wrow, gvr, gvi, x2,
                T=T, KW=KW, omin_p=omin_p, P=P, m=self.m,
                parts=self.dot_parts, interpret=interp)
            yr = yr + yp[0]
            yi = yi + yp[1]
        return yr, yi


jax.tree_util.register_pytree_node(
    SplitBandPoints,
    lambda p: ((p.slabs, p.point_data),
               (p.m, p.n, p.iscomplex, p.tile, p.group_span, p.offs,
                tuple(p.point_meta), p.supertile, p.dot_parts)),
    lambda aux, ch: _sbp_unflatten(aux, ch),
)


def _sbp_unflatten(aux, ch):
    obj = object.__new__(SplitBandPoints)
    (obj.m, obj.n, obj.iscomplex, obj.tile, obj.group_span, obj.offs,
     meta, obj.supertile, obj.dot_parts) = aux
    obj.point_meta = list(meta)
    (obj.slabs, obj.point_data) = ch
    return obj
