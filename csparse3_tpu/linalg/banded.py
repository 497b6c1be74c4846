"""Banded (block-bidiagonal) triangular solves — the MXU solve path.

For RCM-ordered, diagonally-dominant systems factored WITHOUT row
exchanges (``splu(A, ordering='rcm', tol=0)``), L and U keep the
original bandwidth.  Chunk rows into blocks of size s >= bandwidth and
the factors become block *bidiagonal*:

    L x = b:   x_k = invL_kk @ (b_k - L_{k,k-1} @ x_{k-1})    (forward)
    U x = b:   x_k = invU_kk @ (b_k - U_{k,k+1} @ x_{k+1})    (backward)

Diagonal-block inverses are precomputed on host, so the device solve is
a ``lax.scan`` of two (s x s) @ (s x B) matmuls per block — pure MXU
work: no gathers, no scatters, no per-level scheduling.  n/s sequential
steps instead of the level count (e.g. 24 steps vs ~570 levels at
n=3000), and each step is dense enough to saturate the MXU for batched
RHS.

This is the TPU-native answer for the factor-once / solve-many
power-flow pattern when the matrix is (near-)banded — which RCM makes
true for transmission grids.  General (non-banded) factors keep using
the level-scheduled ``TriSolvePlan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BandedSolvePlan", "bandwidth"]


def bandwidth(Fp, Fi):
    """Max |row - col| over the CSC entries."""
    Fp = np.asarray(Fp)
    Fi = np.asarray(Fi)
    n = len(Fp) - 1
    cols = np.repeat(np.arange(n, dtype=np.int64), np.diff(Fp))
    if len(cols) == 0:
        return 0
    return int(np.abs(Fi.astype(np.int64) - cols).max())


def _dense_blocks(n, Fp, Fi, Fx, s, lower, dtype=None):
    """(nb, s, s) diagonal blocks and (nb, s, s) off-diagonal blocks of a
    banded triangular CSC, zero-padded to nb*s rows; the padded tail gets
    a unit diagonal."""
    nb = -(-n // s)
    N = nb * s
    if dtype is None:
        dtype = Fx.dtype
    diag = np.zeros((nb, s, s), dtype=dtype)
    off = np.zeros((nb, s, s), dtype=dtype)
    cols = np.repeat(np.arange(n, dtype=np.int64), np.diff(Fp))
    rows = np.asarray(Fi).astype(np.int64)
    vals = np.asarray(Fx)
    kb_r, kb_c = rows // s, cols // s
    same = kb_r == kb_c
    diag[kb_r[same], rows[same] % s, cols[same] % s] = vals[same]
    adj = (kb_r == kb_c + 1) if lower else (kb_r == kb_c - 1)
    tgt = kb_r[adj] if lower else kb_r[adj]
    off[tgt, rows[adj] % s, cols[adj] % s] = vals[adj]
    bad = ~(same | adj)
    if bad.any():
        raise ValueError(
            f"factor bandwidth exceeds block size {s}; "
            f"{int(bad.sum())} entries outside the block bidiagonal"
        )
    for i in range(n, N):
        diag[i // s, i % s, i % s] = 1.0
    return diag, off


@jax.tree_util.register_pytree_node_class
class BandedSolvePlan:
    """x = A^{-1} b via block-bidiagonal L/U sweeps on the MXU.

    Build from a no-row-exchange factorization (SparseLU with
    ordering='rcm', tol=0); raises if the factors aren't banded enough
    for the chosen block size.
    """

    def __init__(self, host, s: int | None = None, dtype=None):
        n = host.n
        bw = max(bandwidth(host.Lp, host.Li), bandwidth(host.Up, host.Ui))
        if s is None:
            s = max(8, -(-bw // 8) * 8)
        if s < bw:
            raise ValueError(f"block size {s} < factor bandwidth {bw}")
        if dtype is None:
            # match the device dtype: without x64 every leaf lands as f32
            # anyway, and building in f32 halves host memory, block
            # inversion flops, and upload bytes (s grows ~sqrt(n), so at
            # 100k nodes the plan is ~1.2 GB even in f32)
            import jax

            dtype = host.Lx.dtype if jax.config.jax_enable_x64 else (
                np.complex64 if np.iscomplexobj(host.Lx) else np.float32)
        Ld, Lo = _dense_blocks(n, host.Lp, host.Li, host.Lx, s, lower=True,
                               dtype=dtype)
        Ud, Uo = _dense_blocks(n, host.Up, host.Ui, host.Ux, s, lower=False,
                               dtype=dtype)
        self.n = n
        self.s = s
        self.linv = jnp.asarray(np.linalg.inv(Ld))
        self.lsub = jnp.asarray(Lo)
        self.uinv = jnp.asarray(np.linalg.inv(Ud))
        self.usup = jnp.asarray(Uo)
        self.perm_r = jnp.asarray(np.asarray(host.perm_r))
        self.perm_c = jnp.asarray(np.asarray(host.perm_c))

    def tree_flatten(self):
        return (
            (self.linv, self.lsub, self.uinv, self.usup,
             self.perm_r, self.perm_c),
            (self.n, self.s),
        )

    @classmethod
    def tree_unflatten(cls, aux, ch):
        obj = object.__new__(cls)
        obj.n, obj.s = aux
        (obj.linv, obj.lsub, obj.uinv, obj.usup,
         obj.perm_r, obj.perm_c) = ch
        return obj

    @property
    def nblocks(self) -> int:
        return int(self.linv.shape[0])

    def __call__(self, b):
        b = jnp.asarray(b)
        squeeze = b.ndim == 1
        if squeeze:
            b = b[:, None]
        n, s, nb = self.n, self.s, self.nblocks
        B = b.shape[1]
        dt = jnp.result_type(self.linv.dtype, b.dtype)
        bp = jnp.zeros((nb * s, B), dtype=dt).at[:n].set(b[self.perm_r])
        bb = bp.reshape(nb, s, B)

        def fwd(x_prev, blk):
            binv, sub, rhs = blk
            x_k = binv @ (rhs - sub @ x_prev)
            return x_k, x_k

        x0 = jnp.zeros((s, B), dtype=dt)
        _, y = jax.lax.scan(fwd, x0, (self.linv, self.lsub, bb))

        def bwd(x_next, blk):
            binv, sup, rhs = blk
            x_k = binv @ (rhs - sup @ x_next)
            return x_k, x_k

        _, z = jax.lax.scan(
            bwd, x0, (self.uinv, self.usup, y), reverse=True
        )
        zf = z.reshape(nb * s, B)[:n]
        x = jnp.zeros_like(zf)
        x = x.at[self.perm_c].set(zf)
        return x[:, 0] if squeeze else x
