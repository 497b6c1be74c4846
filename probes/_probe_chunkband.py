"""Probe: chunked re-banded RCM — offset clustering at 200k buses.

Global RCM -> contiguous chunks of size s -> per-chunk subgraph RCM ->
measure how entry offsets cluster, and the implied multi-band DIA storage
vs the single dense-range DIA.
"""
import sys

import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

sys.path.insert(0, "/root/repo")
import csparse3_tpu as cst  # noqa: E402  (hostmem fix)
from csparse3_tpu.linalg.ordering import rcm  # noqa: E402
from csparse3_tpu.models.grids import synthetic_grid, ybus  # noqa: E402


def cluster_ranges(offsets, gap=32):
    """Greedy clustering of sorted unique offsets into dense ranges."""
    u = np.unique(offsets)
    splits = np.flatnonzero(np.diff(u) > gap)
    starts = np.concatenate([[0], splits + 1])
    ends = np.concatenate([splits, [len(u) - 1]])
    return [(int(u[a]), int(u[b])) for a, b in zip(starts, ends)]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    g = synthetic_grid(n, seed=0)
    Y, _, _ = ybus(g)
    p = rcm(Y)
    Yp = Y[p, p]
    A = Yp.to_scipy().tocsr()
    print(f"n={n} nnz={A.nnz} global-RCM D={1 + 2 * max(abs((A.indices - np.repeat(np.arange(n), np.diff(A.indptr)))).max(), 0)}")

    nchunk = -(-n // s)
    perm = np.arange(n)
    for c in range(nchunk):
        lo, hi = c * s, min((c + 1) * s, n)
        sub = A[lo:hi, lo:hi]
        lp = reverse_cuthill_mckee(sub.tocsr(), symmetric_mode=True)
        perm[lo:hi] = lo + lp
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    # relabel entries
    B = A[perm][:, perm].tocoo()
    d = B.col - B.row
    total_dense = (int(d.max()) - int(d.min()) + 1)
    cl = cluster_ranges(d, gap=64)
    width = sum(b - a + 1 for a, b in cl)
    # occupancy per cluster
    print(f"chunk={s}: clusters={len(cl)} total_width={width} "
          f"vs global D above; storage {width * n / 1e6:.1f}M "
          f"vs dense-range {total_dense * n / 1e6:.1f}M")
    for a, b in cl[:12]:
        cnt = int(((d >= a) & (d <= b)).sum())
        print(f"  [{a:>8},{b:>8}] w={b - a + 1:>6} nnz={cnt}")


if __name__ == "__main__":
    main()
