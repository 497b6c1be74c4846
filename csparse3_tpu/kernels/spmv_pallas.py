"""Pallas-backend SpMV/SpMM dispatch.

TPUs have no vector-gather unit, so a Pallas SpMV over arbitrary CSC
structure would emulate gathers with one-hot matmuls — strictly worse
than XLA's fused gather+segment lowering.  The Pallas win is where the
work is dense: the BSR block kernel (bsr_spmm_pallas.py) whose "gather"
is scalar-prefetch-driven DMA of whole MXU tiles.  This module routes
the ``backend='pallas'`` config accordingly: matrices are packed to BSR
once (cached on the CSC object) and multiplied blockwise; single vectors
fall back to the XLA ELL/stream path where the MXU has nothing to chew.
"""

from __future__ import annotations

import jax.numpy as jnp

from .bsr_spmm_pallas import bsr_spmm_pallas


def spmv(a, x):
    from ..ops import matvec

    return matvec.spmv(a, x, backend="xla")


def spmm(a, X, block=None):
    bsr = getattr(a, "_bsr_cache", None)
    if bsr is None:
        bsr = a.to_bsr(block=block)
        try:
            a._bsr_cache = bsr
        except AttributeError:
            pass
    return bsr_spmm_pallas(bsr, jnp.asarray(X))
