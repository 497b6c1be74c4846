"""Fill-reducing orderings (host, numpy).

The reference has no factorization layer (SURVEY scope note); orderings are
new capability required by the LU north star.  Implemented here:

* ``rcm``      — reverse Cuthill-McKee (bandwidth reduction; good default for
                 power-grid Ybus matrices, which are near-planar),
* ``mindeg``   — greedy minimum-degree on the quotient graph (simple exact
                 variant, no supervariables; fine up to ~10^5 nodes),
* ``natural``  — identity.

All operate on the symmetrized pattern of a square CSC.
"""

from __future__ import annotations

import numpy as np

from ..types import CSC

__all__ = ["rcm", "mindeg", "amd", "nd", "natural", "get_ordering", "symmetrize_pattern"]


def symmetrize_pattern(a: CSC):
    """Adjacency (indptr, indices) of pattern(A + A^T), no self loops."""
    ip, ix, _ = a.np_arrays()
    n = a.n
    cols = np.repeat(np.arange(n), np.diff(ip))
    rows = ix
    src = np.concatenate([rows, cols])
    dst = np.concatenate([cols, rows])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    key = src.astype(np.int64) * n + dst
    key = np.unique(key)
    src = (key // n).astype(np.int64)
    dst = (key % n).astype(np.int64)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)
    return indptr, dst


def natural(a: CSC) -> np.ndarray:
    return np.arange(a.n, dtype=np.int64)


def rcm(a: CSC) -> np.ndarray:
    """Reverse Cuthill-McKee: BFS from a pseudo-peripheral node, neighbors
    visited in increasing-degree order, result reversed.  Uses the native
    C++ kernel when built (native/host_ext.cpp::rcm_order); the Python BFS
    below is the oracle/fallback."""
    if a.m != a.n:
        raise ValueError("ordering expects a square matrix")
    try:
        from ..native import host_ext

        ip, ix, _ = a.np_arrays()
        return host_ext.rcm(a.n, ip, ix)
    except ImportError:
        pass
    return _rcm_py(a)


def _rcm_py(a: CSC) -> np.ndarray:
    n = a.n
    indptr, adj = symmetrize_pattern(a)
    deg = np.diff(indptr)
    visited = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    pos = 0
    # iterate components
    comp_starts = np.argsort(deg, kind="stable")
    ptr = 0
    while pos < n:
        while visited[comp_starts[ptr]]:
            ptr += 1
        root = _pseudo_peripheral(comp_starts[ptr], indptr, adj, visited)
        # BFS
        head = pos
        order[pos] = root
        visited[root] = True
        pos += 1
        while head < pos:
            u = order[head]
            head += 1
            nbrs = adj[indptr[u] : indptr[u + 1]]
            nbrs = nbrs[~visited[nbrs]]
            if nbrs.size:
                nbrs = nbrs[np.argsort(deg[nbrs], kind="stable")]
                # nbrs can contain duplicates only if pattern had them; unique'd above
                order[pos : pos + nbrs.size] = nbrs
                visited[nbrs] = True
                pos += nbrs.size
    return order[::-1].copy()


def _pseudo_peripheral(start, indptr, adj, visited):
    """George-Liu pseudo-peripheral node finder (restricted to unvisited
    component of ``start``)."""
    u = int(start)
    last_ecc = -1
    for _ in range(16):
        # BFS levels from u
        level = {u: 0}
        frontier = [u]
        depth = 0
        while frontier:
            nxt = []
            for v in frontier:
                for w in adj[indptr[v] : indptr[v + 1]]:
                    w = int(w)
                    if not visited[w] and w not in level:
                        level[w] = depth + 1
                        nxt.append(w)
            if nxt:
                depth += 1
            frontier = nxt
        if depth <= last_ecc:
            return u
        last_ecc = depth
        # farthest node of minimum degree
        far = [v for v, l in level.items() if l == depth]
        degs = [indptr[v + 1] - indptr[v] for v in far]
        u = far[int(np.argmin(degs))]
    return u


def mindeg(a: CSC) -> np.ndarray:
    """Greedy minimum-degree: repeatedly eliminate the minimum-degree node,
    forming the clique of its neighbors (elimination-graph update with
    set adjacency)."""
    if a.m != a.n:
        raise ValueError("ordering expects a square matrix")
    n = a.n
    indptr, adj = symmetrize_pattern(a)
    nbrs = [set(adj[indptr[i] : indptr[i + 1]].tolist()) for i in range(n)]
    import heapq

    heap = [(len(nbrs[i]), i) for i in range(n)]
    heapq.heapify(heap)
    eliminated = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    k = 0
    while heap:
        d, u = heapq.heappop(heap)
        if eliminated[u] or d != len(nbrs[u]):
            continue  # stale heap entry
        order[k] = u
        k += 1
        eliminated[u] = True
        live = [v for v in nbrs[u] if not eliminated[v]]
        for v in live:
            s = nbrs[v]
            s.discard(u)
            s.update(w for w in live if w != v)
            heapq.heappush(heap, (len(s), v))
        nbrs[u] = set()
    return order


def amd(a: CSC) -> np.ndarray:
    """Approximate minimum degree: native quotient-graph AMD when the host
    extension is built (native/host_ext.cpp::amd_order), else the Python
    greedy mindeg."""
    try:
        from ..native import host_ext
    except ImportError:
        return mindeg(a)
    ip, ix, _ = a.np_arrays()
    return host_ext.amd(a.n, ip, ix)


def nd(a: CSC, leaf_size: int = 5000) -> np.ndarray:
    """Nested dissection (native only): BFS level-set separators with AMD
    leaves.  The fill-controlling ordering for large near-planar grids;
    falls back to amd when the host extension is not built."""
    try:
        from ..native import host_ext
    except ImportError:
        return amd(a)
    ip, ix, _ = a.np_arrays()
    return host_ext.nd(a.n, ip, ix, leaf_size)


_ORDERINGS = {
    "rcm": rcm, "mindeg": mindeg, "amd": amd, "nd": nd, "natural": natural,
}


def get_ordering(name, a: CSC) -> np.ndarray:
    if callable(name):
        return np.asarray(name(a), dtype=np.int64)
    if name is None:
        return natural(a)
    if isinstance(name, (list, np.ndarray)):
        return np.asarray(name, dtype=np.int64)
    try:
        return _ORDERINGS[name](a)
    except KeyError:
        raise ValueError(f"unknown ordering {name!r}; have {list(_ORDERINGS)}")
