"""Multifrontal device LU refactorization — extend-add on the MXU.

``SupernodalRefactor`` (linalg/supernodal.py) already re-executes the
factorization as dense panels, but it keeps the factor values in one
flat CSC-position vector and pays per-level arbitrary-index gathers and
scatter-adds to move panels in and out of it.  Measured on chip those
memory ops are the ENTIRE cost (a mem-only ablation runs at the same
speed as the full factorization) because arbitrary gathers on TPU run
near-scalar.

This module is the TPU-native fix: a MULTIFRONTAL schedule in which
every value lives in dense per-level front buffers and the only
arbitrary-index traffic left is

  * one scatter-add of the nnz(A) input values per refactorization, and
  * one flat gather at the very end to emit (Lx, Ux) in CSC positions.

Everything between is MXU work:

  per level (top-down assigned so every child sits EXACTLY one level
  below its parent):
    gather   children update blocks W_c by FRONT INDEX (contiguous
             (u, u) blocks — a leading-axis block gather, not per-entry)
    extend-  F += E_c @ W_c @ E_c^T with 0/1 expansion matrices E_c —
    add      the multifrontal extend-add as two batched MXU matmuls
             (the same one-hot-matmul trick as the point-SpMV kernel)
    factor   the (w, w) pivot block, no pivoting                  [VPU]
    solve    L21 = B U11^{-1},  U12 = L11^{-1} C          [triangular]
    update   W = F22 - L21 @ U12                            [MXU gemm]

Pivot order is FROZEN from the host factorization (KLU-style
refactorization semantics, same contract as ``RefactorPlan`` /
``SupernodalRefactor``): requires a no-row-exchange host factor of a
structurally symmetric pattern.  Relaxed amalgamation merges only
etree parent-child chains, which keeps the multifrontal containment
theorem (child off-block rows land inside the parent front) intact.
Reference lineage: the BSR register-blocking blueprint
(src/sparsetools/bsr.h:249-316) and the SuperLU breadcrumb
(src/research/scipy_wrappers.py:1-11).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .lu_host import HostLU
from .lu import SolvePlan
from .refactor import RefactorPlan
from .supernodal import _dense_lu_nopiv, _pattern_symmetric
from .trisolve import TriSolvePlan

__all__ = ["MultifrontalRefactor"]


@jax.tree_util.register_pytree_node_class
class MultifrontalRefactor:
    """values -> (Lx, Ux) (and a SolvePlan) on device via batched dense
    fronts with matmul extend-add.

    Build once from a no-row-exchange host factorization and the matrix
    it factored; ``factor_values(new_data)`` is jittable and vmap-able.
    ``relax`` caps the amalgamated supernode width (1 disables relaxed
    amalgamation and keeps fundamental supernodes only).
    """

    def __init__(self, host: HostLU, a_csc, relax: int = 16):
        n = host.n
        Lp = np.asarray(host.Lp, dtype=np.int64)
        Li = np.asarray(host.Li, dtype=np.int64)
        Up = np.asarray(host.Up, dtype=np.int64)
        Ui = np.asarray(host.Ui, dtype=np.int64)
        if not _pattern_symmetric(n, Lp, Li, Up, Ui):
            raise ValueError(
                "multifrontal refactorization needs a structurally "
                "symmetric factor pattern (no-row-exchange factorization "
                "of a structurally symmetric matrix); use RefactorPlan")
        lnz, unz = len(Li), len(Ui)
        colsL = np.repeat(np.arange(n, dtype=np.int64), np.diff(Lp))
        colsU = np.repeat(np.arange(n, dtype=np.int64), np.diff(Up))

        # ---- fundamental supernode partition ---------------------------
        cnt = np.diff(Lp)
        parent = np.full(n, n, dtype=np.int64)
        for j in range(n):
            if cnt[j] > 1:
                parent[j] = Li[Lp[j] + 1]  # first off-diagonal row
        fstarts = [0]
        for j in range(1, n):
            fundamental = (parent[j - 1] == j and cnt[j] == cnt[j - 1] - 1)
            if not fundamental:
                fstarts.append(j)
        fstarts.append(n)

        # ---- amalgamation restricted to etree parent-child chains ------
        # merge group [a, b) with the next fundamental snode ONLY when
        # parent(last col) is exactly the next column: the child's
        # off-block rows are then the parent's off-block rows plus the
        # absorbed columns, so the merged front still satisfies the
        # multifrontal containment theorem (its off rows land inside ITS
        # parent's front).
        def _graded_ok(w, z):
            return ((w <= 4 and z <= 0.85) or (w <= 8 and z <= 0.6)
                    or (w <= 16 and z <= 0.4) or z <= 0.25)

        starts = [0]
        srows = []
        if relax and relax > 1 and len(fstarts) > 2:
            cur_a, cur_b = fstarts[0], fstarts[1]
            cur_R = Li[Lp[cur_a]:Lp[cur_a + 1]]
            cur_ent = int(Lp[cur_b] - Lp[cur_a])
            for k in range(1, len(fstarts) - 1):
                a2, b2 = fstarts[k], fstarts[k + 1]
                R2 = Li[Lp[a2]:Lp[a2 + 1]]
                w_new = int(b2 - cur_a)
                chain = parent[cur_b - 1] == a2
                R_new = np.union1d(cur_R, R2)
                ent_new = cur_ent + int(Lp[b2] - Lp[a2])
                z = 1.0 - ent_new / max(len(R_new) * w_new, 1)
                if chain and w_new <= relax and _graded_ok(w_new, z):
                    cur_b, cur_R, cur_ent = b2, R_new, ent_new
                else:
                    starts.append(int(a2))
                    srows.append(cur_R)
                    cur_a, cur_b, cur_R = a2, b2, R2
                    cur_ent = int(Lp[b2] - Lp[a2])
            srows.append(cur_R)
            # keep the merged partition only when it actually cuts the
            # sequential level depth (chain-heavy patterns); on
            # dissection-style orderings merging buys nothing and the
            # wider padded fronts just cost flops
            def _depth(st, sr):
                m_ = len(st)
                sn = np.empty(n, dtype=np.int64)
                for i in range(m_):
                    sn[st[i]:(st[i + 1] if i + 1 < m_ else n)] = i
                h = np.ones(m_, dtype=np.int64)
                for i in range(m_):
                    w_ = (st[i + 1] if i + 1 < m_ else n) - st[i]
                    if len(sr[i]) > w_:
                        p_ = sn[sr[i][w_]]
                        h[p_] = max(h[p_], h[i] + 1)
                return int(h.max()) if m_ else 0

            f_srows = [Li[Lp[s]:Lp[s + 1]] for s in fstarts[:-1]]
            # 0.6: measured on the 3000-bus ND case a 26-vs-33 depth
            # cut (ratio 0.79) still LOSES to fundamental (110/s vs
            # 123/s — wider padded fronts cost more than 7 levels
            # save), while chain-like patterns merge at ratios ~0.25
            if _depth(starts, srows) > 0.6 * _depth(fstarts[:-1],
                                                    f_srows):
                starts, srows = fstarts[:-1] + [], f_srows
                starts = list(starts)
        else:
            starts = fstarts[:-1]
            srows = [Li[Lp[s]:Lp[s + 1]] for s in starts]
        if starts[-1] != n:
            starts.append(n)
        ns = len(starts) - 1
        snode_of = np.empty(n, dtype=np.int64)
        widths = np.empty(ns, dtype=np.int64)
        for s in range(ns):
            snode_of[starts[s]:starts[s + 1]] = s
            widths[s] = starts[s + 1] - starts[s]

        # snode etree: parent = snode of the first off-block row
        parent_s = np.full(ns, -1, dtype=np.int64)
        for s in range(ns):
            w = widths[s]
            if len(srows[s]) > w:
                parent_s[s] = snode_of[srows[s][w]]

        # ---- top-down leveling: child level == parent level - 1 --------
        # so every front's children were ALL produced at the previous
        # level and their W blocks come out of one tensor.  A front at
        # level 0 is necessarily childless (a child would need level -1).
        height = np.ones(ns, dtype=np.int64)
        for s in range(ns):                       # children first (s < p)
            p = parent_s[s]
            if p >= 0:
                height[p] = max(height[p], height[s] + 1)
        nlev = int(height.max()) if ns else 0
        lev = np.empty(ns, dtype=np.int64)
        for s in range(ns - 1, -1, -1):           # parents first
            p = parent_s[s]
            lev[s] = (height[s] - 1) if p < 0 else lev[p] - 1
        by_level = [np.flatnonzero(lev == L) for L in range(nlev)]
        slot_of = np.empty(ns, dtype=np.int64)
        for L in range(nlev):
            slot_of[by_level[L]] = np.arange(len(by_level[L]))

        # ---- A-value assembly map (one scatter per refactorization) ----
        # A entry (pr, pc) is assembled into the front of the snode that
        # owns min(pr, pc); the other index is inside that front's rows
        # (struct containment).
        pinv = np.empty(n, dtype=np.int64)
        pinv[np.asarray(host.perm_r)] = np.arange(n)
        qinv = np.empty(n, dtype=np.int64)
        qinv[np.asarray(host.perm_c)] = np.arange(n)
        ip, rows_a, _ = a_csc.np_arrays()
        acols = np.repeat(np.arange(n), np.diff(np.asarray(ip)))
        pr = pinv[np.asarray(rows_a, dtype=np.int64)]
        pc = qinv[acols]
        owner = snode_of[np.minimum(pr, pc)]

        # ---- per-level static structures --------------------------------
        # front layout at level L: axes 0..w-1 = snode columns, slots
        # w_max..w_max+u-1 = off-block rows (both axes of the square
        # front use the same slot rule)
        levels_static = []
        colmasks, child_idxs, Es, a_maps = [], [], [], []
        a_dst = np.empty(len(pr), dtype=np.int64)      # level-local flat
        exL_lvl = np.empty(lnz, dtype=np.int64)
        exL_off = np.empty(lnz, dtype=np.int64)
        exU_lvl = np.empty(unz, dtype=np.int64)
        exU_off = np.empty(unz, dtype=np.int64)
        # U entries grouped by the snode owning their ROW index (the
        # front that finalizes them)
        u_owner = snode_of[Ui]

        prev_umax = 1
        for L in range(nlev):
            sids = by_level[L]
            nb = len(sids)
            w_max = int(widths[sids].max())
            u_max = int(max(max(len(srows[s]) - widths[s]
                                for s in sids), 1))
            rmax = w_max + u_max
            childs = [np.flatnonzero(parent_s == s) for s in sids]
            maxc = int(max((len(c) for c in childs), default=0))
            colmask = np.zeros((nb, w_max), dtype=bool)
            child_idx = np.zeros((nb, max(maxc, 1)), dtype=np.int64)
            E = np.zeros((nb, max(maxc, 1), rmax, prev_umax),
                         dtype=np.float32)
            for b, s in enumerate(sids):
                w = int(widths[s])
                R = srows[s]
                colmask[b, :w] = True

                def _slot(i):
                    return np.where(i < w, i, w_max + (i - w))

                for ci, c in enumerate(childs[b]):
                    wc = int(widths[c])
                    offc = srows[c][wc:]          # child W rows/cols
                    child_idx[b, ci] = slot_of[c]
                    loc = np.searchsorted(R, offc)
                    if not np.array_equal(
                            R[np.minimum(loc, len(R) - 1)], offc):
                        raise AssertionError(
                            "multifrontal containment violated: child "
                            "off-block row missing from parent front")
                    E[b, ci, _slot(loc), np.arange(len(offc))] = 1.0
                # A assembly destinations owned by this front
                sel = np.flatnonzero(owner == s)
                if len(sel):
                    ri = _slot(np.searchsorted(R, pr[sel]))
                    ci2 = _slot(np.searchsorted(R, pc[sel]))
                    a_dst[sel] = b * rmax * rmax + ri * rmax + ci2
                # L extraction: column j1+jj lives in front column jj,
                # rows at the slots of struct(j1+jj)
                j1 = starts[s]
                for jj in range(w):
                    c = j1 + jj
                    rs = _slot(np.searchsorted(R, Li[Lp[c]:Lp[c + 1]]))
                    posl = np.arange(Lp[c], Lp[c + 1])
                    exL_lvl[posl] = L
                    exL_off[posl] = b * rmax * rmax + rs * rmax + jj
                # U extraction: U(r, c) with r in this snode's columns
                # sits at front (row slot of r < w, col slot of c)
                selu = np.flatnonzero(u_owner == s)
                if len(selu):
                    rs = Ui[selu] - j1            # row slot (< w)
                    cs = _slot(np.searchsorted(R, colsU[selu]))
                    exU_lvl[selu] = L
                    exU_off[selu] = b * rmax * rmax + rs * rmax + cs
            sel_L = np.flatnonzero(lev[owner] == L)
            a_maps.append((jnp.asarray(sel_L), jnp.asarray(a_dst[sel_L])))
            levels_static.append((nb, w_max, u_max, rmax, maxc))
            colmasks.append(jnp.asarray(colmask))
            child_idxs.append(jnp.asarray(child_idx))
            Es.append(jnp.asarray(E))
            prev_umax = u_max

        # flatten extraction into ONE gather over concatenated fronts
        base = np.zeros(nlev + 1, dtype=np.int64)
        for L in range(nlev):
            nb, _, _, rmax, _ = levels_static[L]
            base[L + 1] = base[L] + nb * rmax * rmax
        self._exL = jnp.asarray(base[exL_lvl] + exL_off)
        self._exU = jnp.asarray(base[exU_lvl] + exU_off)
        # L's stored diagonal is unit; the front diagonal holds U11's
        # pivots, so mask those positions to 1 after the gather
        self._l_diag = jnp.asarray(Li == colsL)

        self.n = n
        self.lnz, self.unz = lnz, unz
        self.dtype = host.Lx.dtype
        self.nsnodes = ns
        self.nlevels = nlev
        self.levels_static = tuple(levels_static)
        self._colmask = colmasks
        self._child_idx = child_idxs
        self._E = Es
        self._a_maps = a_maps
        self.perm_r = jnp.asarray(np.asarray(host.perm_r))
        self.perm_c = jnp.asarray(np.asarray(host.perm_c))
        # solve plumbing shared with RefactorPlan (slab retargeting)
        self._ltpl = TriSolvePlan(n, host.Lp, host.Li, host.Lx, lower=True)
        self._utpl = TriSolvePlan(n, host.Up, host.Ui, host.Ux,
                                  lower=False)
        self._l_slab = RefactorPlan._slab_map(n, host.Lp, host.Li,
                                              lower=True)
        self._u_slab = RefactorPlan._slab_map(n, host.Up, host.Ui,
                                              lower=False)
        self._l_offpos = jnp.asarray(np.flatnonzero(Li != colsL))
        self._u_offpos = jnp.asarray(np.flatnonzero(Ui != colsU) + lnz)
        self._u_diagpos = jnp.asarray(np.flatnonzero(Ui == colsU) + lnz)

    # ---- pytree ----------------------------------------------------------
    def tree_flatten(self):
        leaves = (self._colmask, self._child_idx, self._E, self._a_maps,
                  self._exL, self._exU, self._l_diag,
                  self.perm_r, self.perm_c, self._ltpl, self._utpl,
                  self._l_slab[0], self._l_slab[1],
                  self._u_slab[0], self._u_slab[1],
                  self._l_offpos, self._u_offpos, self._u_diagpos)
        aux = (self.n, self.lnz, self.unz, self.dtype, self.nsnodes,
               self.nlevels, self.levels_static,
               self._l_slab[2], self._u_slab[2])
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        (obj.n, obj.lnz, obj.unz, obj.dtype, obj.nsnodes, obj.nlevels,
         obj.levels_static, lmeta, umeta) = aux
        (obj._colmask, obj._child_idx, obj._E, obj._a_maps,
         obj._exL, obj._exU, obj._l_diag, obj.perm_r, obj.perm_c,
         obj._ltpl, obj._utpl, l0, l1, u0, u1,
         obj._l_offpos, obj._u_offpos, obj._u_diagpos) = leaves
        obj._l_slab = (l0, l1, lmeta)
        obj._u_slab = (u0, u1, umeta)
        return obj

    # ---- numeric factorization (jittable) --------------------------------
    def factor_values(self, new_data):
        """(Lx, Ux) for the original pattern with ``new_data`` values."""
        new_data = jnp.asarray(new_data)
        dtype = jnp.result_type(new_data.dtype, self.dtype)
        front_flats = []
        W_prev = None
        with jax.default_matmul_precision("highest"):
            for L in range(self.nlevels):
                nb, w_max, u_max, rmax, maxc = self.levels_static[L]
                colmask = self._colmask[L]
                sel, dst = self._a_maps[L]
                F = jnp.zeros((nb * rmax * rmax,), dtype=dtype)
                F = F.at[dst].add(new_data[sel])
                F = F.reshape(nb, rmax, rmax)
                if maxc and W_prev is not None:
                    E = self._E[L].astype(dtype)
                    CW = W_prev[self._child_idx[L]]  # (nb, maxc, up, up)
                    # extend-add as two batched MXU matmuls
                    T = jnp.einsum("bcij,bcjk->bcik", E, CW)
                    F = F + jnp.einsum("bcik,bclk->bil", T, E)
                # factor the pivot block (padded cols get unit diagonal)
                eye = jnp.eye(w_max, dtype=dtype)[None]
                D = F[:, :w_max, :w_max] + eye * (
                    ~colmask[:, None, :]
                    & (jnp.arange(w_max)[:, None]
                       == jnp.arange(w_max)[None, :])[None])
                M = _dense_lu_nopiv(D)
                U11 = jnp.triu(M)
                L11 = jnp.tril(M, -1) + eye
                B = F[:, w_max:, :w_max]
                C = F[:, :w_max, w_max:]
                L21 = jnp.swapaxes(
                    jax.scipy.linalg.solve_triangular(
                        U11, jnp.swapaxes(B, 1, 2), trans="T",
                        lower=False),
                    1, 2)
                U12 = jax.scipy.linalg.solve_triangular(
                    L11, C, lower=True, unit_diagonal=True)
                W_prev = F[:, w_max:, w_max:] - L21 @ U12
                # final front values: M in the pivot block, U12 right,
                # L21 below; the off/off region is never extracted
                top = jnp.concatenate([M, U12], axis=2)
                bot = jnp.concatenate([L21, W_prev], axis=2)
                front_flats.append(
                    jnp.concatenate([top, bot], axis=1).reshape(-1))
        flat = (jnp.concatenate(front_flats) if front_flats
                else jnp.zeros((0,), dtype))
        Lx = jnp.where(self._l_diag, jnp.ones((), dtype), flat[self._exL])
        Ux = flat[self._exU]
        return Lx, Ux

    def refactor(self, new_data, with_diag: bool = False):
        """SolvePlan with fresh numeric factors (same contract as
        RefactorPlan.refactor; the slab retargeting is shared)."""
        Lx, Ux = self.factor_values(new_data)
        X = jnp.concatenate([Lx, Ux])
        l_off = X[self._l_offpos]
        u_off = X[self._u_offpos]
        u_diag = X[self._u_diagpos]
        lplan = RefactorPlan._retarget(
            self, self._ltpl, self._l_slab, l_off,
            jnp.ones(self.n, dtype=X.dtype), self._l_slab[2])
        uplan = RefactorPlan._retarget(
            self, self._utpl, self._u_slab, u_off, 1.0 / u_diag,
            self._u_slab[2])
        plan = SolvePlan(lplan, uplan, self.perm_r, self.perm_c)
        return (plan, u_diag) if with_diag else plan
