"""Mutable builders: the construction layer.

Replaces the reference's two builders with one engine:

* ``LilMat`` (reference: src/CSparse3/lil.py:35-337) — list-of-dicts with a
  9-case get/set slicing matrix and last-write-wins semantics.
* ``CooMat`` (reference: src/CSparse3/coo.py:34-335) — triplet arrays with
  insert / insert_or_replace / try_get (partially broken in the reference,
  SURVEY §7 quirks; implemented here by intent).

``TripletBuilder`` keeps two stores: a vectorized triplet tail (fast bulk
``add`` path for Ybus assembly — append numpy chunks, never per-element
Python) and a dict override map for setitem semantics.  ``to_csc()`` is one
sort-based build on device.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .ops import construct
from .types import CSC
from .utils.misc import slice_to_range

__all__ = ["TripletBuilder", "LilMat", "CooMat"]


class TripletBuilder:
    def __init__(self, m: int, n: int, dtype=np.float64):
        self.m = int(m)
        self.n = int(n)
        self.dtype = np.dtype(dtype)
        self._chunks_r = []  # accumulated (summed) triplets
        self._chunks_c = []
        self._chunks_v = []
        self._set: Dict[Tuple[int, int], complex] = {}  # overrides (last write wins)

    @property
    def shape(self):
        return (self.m, self.n)

    # ---- bulk accumulate path (Ybus assembly) ----------------------------
    def add_triplets(self, rows, cols, vals):
        rows = np.asarray(rows, dtype=np.int64).ravel()
        cols = np.asarray(cols, dtype=np.int64).ravel()
        vals = np.broadcast_to(np.asarray(vals, dtype=self.dtype), rows.shape).ravel()
        if rows.size != cols.size:
            raise ValueError("rows/cols length mismatch")
        if rows.size and (rows.min() < 0 or rows.max() >= self.m
                          or cols.min() < 0 or cols.max() >= self.n):
            raise IndexError("triplet index out of bounds")
        self._chunks_r.append(rows)
        self._chunks_c.append(cols)
        self._chunks_v.append(vals)
        return self

    def add(self, i: int, j: int, v):
        """Accumulate A[i,j] += v (CooMat.insert intent, coo.py:241-313)."""
        return self.add_triplets([i], [j], [v])

    # ---- setitem path (LilMat semantics) ----------------------------------
    def _axis_indices(self, key, dim):
        if isinstance(key, (int, np.integer)):
            i = int(key)
            if i < 0:
                i += dim
            if not 0 <= i < dim:
                raise IndexError(f"index {key} out of range [0,{dim})")
            return np.asarray([i])
        if isinstance(key, slice):
            return slice_to_range(key, dim)
        arr = np.asarray(key)
        if arr.dtype == bool:
            arr = np.flatnonzero(arr)
        return arr.astype(np.int64)

    def __setitem__(self, key, value):
        """All LilMat setitem cases (reference lil.py:47-257): scalar,
        row/col vectors, 2-D windows, with scalar broadcast."""
        if not isinstance(key, tuple) or len(key) != 2:
            raise IndexError("use A[i, j] style indexing")
        ri = self._axis_indices(key[0], self.m)
        ci = self._axis_indices(key[1], self.n)
        val = np.asarray(value, dtype=self.dtype)
        if val.ndim == 1 and len(ri) == len(ci) and (
            isinstance(key[0], (list, np.ndarray)) and isinstance(key[1], (list, np.ndarray))
            and len(ri) == val.shape[0] and (len(ri) != 1 or len(ci) != 1)
        ):
            # paired vector assignment A[rows, cols] = vec (lil.py case 7)
            for r, c, v in zip(ri, ci, val):
                self._set[(int(r), int(c))] = v
            return
        grid = np.broadcast_to(val, (len(ri), len(ci)))
        for a, r in enumerate(ri):
            for b, c in enumerate(ci):
                self._set[(int(r), int(c))] = grid[a, b]

    def __getitem__(self, key):
        if not isinstance(key, tuple) or len(key) != 2:
            raise IndexError("use A[i, j] style indexing")
        if isinstance(key[0], (int, np.integer)) and isinstance(key[1], (int, np.integer)):
            return self.try_get(int(key[0]), int(key[1]))
        ri = self._axis_indices(key[0], self.m)
        ci = self._axis_indices(key[1], self.n)
        out = np.zeros((len(ri), len(ci)), dtype=self.dtype)
        acc = self._accumulated_dict()
        for a, r in enumerate(ri):
            for b, c in enumerate(ci):
                out[a, b] = acc.get((int(r), int(c)), 0)
        return out

    def try_get(self, i: int, j: int):
        """Reference CooMat.try_get intent (coo.py:249-251)."""
        return self._accumulated_dict().get((i, j), self.dtype.type(0))

    def insert_or_replace(self, i: int, j: int, v):
        self._set[(int(i), int(j))] = v
        return self

    def _accumulated_dict(self):
        acc: Dict[Tuple[int, int], complex] = {}
        for r, c, v in zip(self._chunks_r, self._chunks_c, self._chunks_v):
            for i, j, x in zip(r, c, v):
                acc[(int(i), int(j))] = acc.get((int(i), int(j)), 0) + x
        acc.update(self._set)
        return acc

    def get_nz(self) -> int:
        """Upper bound on distinct entries (reference lil.py:307-312)."""
        return len(self._accumulated_dict())

    def __len__(self):
        return self.get_nz()

    # ---- in-place merge (reference lil.py:266-290: dict values merge
    # additively over *effective* entries) ----------------------------------
    def _merge(self, other: "TripletBuilder", sign: int):
        if other.shape != self.shape:
            raise ValueError("shape mismatch in builder merge")
        merged = self._accumulated_dict()
        for k, v in other._accumulated_dict().items():
            merged[k] = merged.get(k, 0) + sign * v
        self._chunks_r, self._chunks_c, self._chunks_v = [], [], []
        self._set = merged
        return self

    def __iadd__(self, other: "TripletBuilder"):
        return self._merge(other, 1)

    def __isub__(self, other: "TripletBuilder"):
        return self._merge(other, -1)

    # ---- finalize ----------------------------------------------------------
    def triplets(self):
        rs = self._chunks_r + [np.asarray([k[0] for k in self._set], dtype=np.int64)]
        cs = self._chunks_c + [np.asarray([k[1] for k in self._set], dtype=np.int64)]
        vs = self._chunks_v + [np.asarray(list(self._set.values()), dtype=self.dtype)]
        if self._set:
            # overrides must replace accumulated values: subtract any
            # accumulated contribution at overridden coordinates first
            acc = {}
            for r, c, v in zip(self._chunks_r, self._chunks_c, self._chunks_v):
                for i, j, x in zip(r, c, v):
                    if (int(i), int(j)) in self._set:
                        acc[(int(i), int(j))] = acc.get((int(i), int(j)), 0) + x
            if acc:
                rs.append(np.asarray([k[0] for k in acc], dtype=np.int64))
                cs.append(np.asarray([k[1] for k in acc], dtype=np.int64))
                vs.append(-np.asarray(list(acc.values()), dtype=self.dtype))
        return (
            np.concatenate(rs) if rs else np.zeros(0, np.int64),
            np.concatenate(cs) if cs else np.zeros(0, np.int64),
            np.concatenate(vs) if vs else np.zeros(0, self.dtype),
        )

    def to_csc(self) -> CSC:
        r, c, v = self.triplets()
        return construct.from_triplets(r, c, v, self.shape)

    def to_coo(self):
        from .types import COO

        r, c, v = self.triplets()
        return COO(self.m, self.n, r, c, v)

    def to_dense(self):
        return np.asarray(self.to_csc().todense())


# Reference-compatible aliases
LilMat = TripletBuilder
CooMat = TripletBuilder
