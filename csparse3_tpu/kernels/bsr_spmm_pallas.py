"""Pallas TPU kernel: BSR x dense SpMM (the MXU hot path).

Reference counterpart: bsr_matmat/bsr_matvecs (src/sparsetools/bsr.h:249,
823) — per-block dense gemm.  TPU formulation: the grid walks the stored
nonzero blocks in block-row order; for each (nonzero block, RHS tile)
pair, the block's (R x C) panel and the matching (C x TK) slice of X are
staged into VMEM by BlockSpec index_maps driven by **scalar-prefetched**
block metadata (pltpu.PrefetchScalarGridSpec), so the "gather" happens as
indexed DMA — never as vector gathers, which TPUs lack.  Output tiles are
revisited across consecutive grid steps of the same block-row and
accumulated in VMEM; `@pl.when(first-block-of-row)` zero-initializes.

This is the Pallas pattern from the TPU guide (grid + BlockSpec +
scalar prefetch); X tiles ride HBM->VMEM pipelining managed by Pallas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import BSR

__all__ = ["bsr_spmm_pallas"]


def _kernel(brow_ref, bcol_ref, first_ref, a_ref, x_ref, o_ref):
    t = pl.program_id(1)  # block index (innermost so output revisits are
    # consecutive within a block-row)

    @pl.when(first_ref[t] == 1)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    o_ref[0] += jnp.dot(
        a_ref[0], x_ref[0], preferred_element_type=o_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("nb_out", "tk", "interpret"))
def _call(brows, bcols, first, data, Xb, nb_out, tk, interpret):
    nbk = data.shape[0]
    R, C = data.shape[1], data.shape[2]
    ktiles = Xb.shape[2] // tk
    out_dtype = jnp.result_type(data.dtype, Xb.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # brows, bcols, first
        grid=(ktiles, nbk),  # block index innermost: same-row output
        # tiles are revisited on consecutive iterations (accumulate in VMEM)
        in_specs=[
            pl.BlockSpec(
                (1, R, C),
                lambda j, t, brow, bcol, first: (t, 0, 0),
            ),
            pl.BlockSpec(
                (1, C, tk),
                lambda j, t, brow, bcol, first: (bcol[t], 0, j),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, R, tk),
            lambda j, t, brow, bcol, first: (brow[t], 0, j),
        ),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb_out, R, Xb.shape[2]), out_dtype),
        interpret=interpret,
    )(brows, bcols, first, data.astype(out_dtype), Xb.astype(out_dtype))


def bsr_spmm_pallas(a: BSR, X, tk: int = 128, interpret: bool | None = None):
    """Y = A @ X with A in BSR blocks, Pallas grid over (blocks, RHS tiles).

    X: (n, k).  Returns (m, k).  ``interpret`` forces interpreter mode
    (auto-on for non-TPU backends so tests run on CPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    X = jnp.asarray(X)
    squeeze = X.ndim == 1
    if squeeze:
        X = X[:, None]
    nbk = a.nnz_blocks
    mb, nb, R, C = a.mb, a.nb, a.R, a.C
    k = X.shape[1]
    kp = -(-k // tk) * tk
    Xp = jnp.zeros((nb * C, kp), dtype=X.dtype).at[: a.n, :k].set(X)
    Xb = Xp.reshape(nb, C, kp)

    ip = np.asarray(a.indptr)
    brows = np.repeat(np.arange(mb, dtype=np.int32), np.diff(ip)[:mb])
    first = np.zeros(nbk, dtype=np.int32)
    first[ip[:-1][np.diff(ip) > 0]] = 1
    Yb = _call(
        jnp.asarray(brows),
        a.indices[:nbk].astype(jnp.int32),
        jnp.asarray(first),
        a.data[:nbk],
        Xb,
        mb,
        tk,
        interpret,
    )
    # block rows with no stored blocks are never visited by the grid
    row_nonempty = jnp.asarray((np.diff(ip)[:mb] > 0))
    Yb = jnp.where(row_nonempty[:, None, None], Yb, 0)
    Y = Yb.reshape(mb * R, kp)[: a.m, :k]
    return Y[:, 0] if squeeze else Y
