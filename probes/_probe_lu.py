"""Probe: native LU vs scipy SuperLU on synthetic grids (CPU-only)."""
import sys
import time

import numpy as np
import scipy.sparse.linalg as spla

import csparse3_tpu as cst
from csparse3_tpu.linalg import splu
from csparse3_tpu.models.grids import synthetic_grid

n = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
ordering = sys.argv[2] if len(sys.argv) > 2 else "amd"
skip_scipy = len(sys.argv) > 3 and sys.argv[3] == "noscipy"
g = synthetic_grid(n, seed=1)
bp = 1.0 / g.x
rows = np.concatenate([g.f, g.t, g.f, g.t])
cols = np.concatenate([g.f, g.t, g.t, g.f])
vals = np.concatenate([bp, bp, -bp, -bp])
B = cst.from_triplets(rows, cols, vals, (n, n))
Breg = cst.add(B, cst.diags(np.full(n, 3.0)))
print(f"n={n} nnz={Breg.nnz}", flush=True)

for trial in range(2):
    t0 = time.perf_counter()
    lu = splu(Breg, ordering=ordering)
    t_us = time.perf_counter() - t0
    print(f"ours  splu({ordering}) trial{trial}: {t_us:.3f}s "
          f"fill={lu.lnz + lu.unz}", flush=True)

if not skip_scipy:
    Bs = Breg.to_scipy().tocsc()
    for trial in range(2):
        t0 = time.perf_counter()
        slu = spla.splu(Bs)
        t_sp = time.perf_counter() - t0
        print(f"scipy splu(COLAMD) trial{trial}: {t_sp:.3f}s "
              f"fill={slu.L.nnz + slu.U.nnz}", flush=True)
