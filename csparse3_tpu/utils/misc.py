"""Small host utilities.

Reference: src/CSparse3/utils.py — note its slice_to_range tests ``sl.start``
three times where it means ``sl.stop`` (utils.py:30-45, SURVEY §7 "Known
reference quirks"); this implementation matches the *intended* semantics.
"""

from __future__ import annotations

import numpy as np

__all__ = ["slice_to_range", "dense_to_str"]


def slice_to_range(sl: slice, dim: int) -> np.ndarray:
    """Resolve a slice against an axis length (intended behavior of
    reference utils.py:23-48, with the start/stop bug fixed)."""
    start, stop, step = sl.indices(dim)
    return np.arange(start, stop, step, dtype=np.int64)


def dense_to_str(mat) -> str:
    """Pretty-print a dense matrix, rendering exact zeros as '_'
    (reference: dense_to_str, utils.py:51-75)."""
    mat = np.asarray(mat)
    rows = []
    for r in mat:
        cells = ["_" if v == 0 else f"{v:g}" for v in r]
        rows.append("\t".join(cells))
    return "\n".join(rows) + "\n"
