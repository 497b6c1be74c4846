"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: SpMV throughput (nnz/s) on a 200k-bus synthetic-grid admittance
matrix (complex), the hot kernel of every power-flow iteration
(BASELINE.md configs; the reference records no numbers of its own, so
``vs_baseline`` is the speedup over scipy.sparse running the same op on
this machine's host CPU — the backend the reference actually dispatches
to, see SURVEY §1 L2b).

Extra sub-metrics (same JSON object, "extra" key):
* lu_factor_s / lu_solve_rhs_per_s — factor once + 1024-RHS batched
  level-scheduled solve on a pegase-scale (~3k bus) grid (config 3/4).
* spgemm_nnz_per_s — C = A·Aᵀ on the connectivity matrix (config 2).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _median_time(fn, iters=5, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst
    from csparse3_tpu.linalg import splu
    from csparse3_tpu.models.grids import synthetic_grid, ybus

    extra = {"device": str(jax.devices()[0]).split(":")[0]}

    # ---- headline: SpMV on 200k-bus Ybus -----------------------------------
    n = 200_000
    grid = synthetic_grid(n, seed=0)
    Y, _, _ = ybus(grid)
    nnz = Y.nnz
    plan = cst.SpMVPlan(Y)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n) + 1j * rng.rand(n))

    spmv = jax.jit(lambda p, v: p(v))
    y = spmv(plan, x)
    jax.block_until_ready(y)
    reps = 20
    t = _median_time(
        lambda: jax.block_until_ready(spmv(plan, x)), iters=5, warmup=1
    )
    # amortize dispatch: time a loop of reps matvecs via lax.scan
    def many(p, v):
        def body(c, _):
            return p(c), None
        out, _ = jax.lax.scan(body, v, None, length=reps)
        return out
    many_j = jax.jit(many)
    jax.block_until_ready(many_j(plan, x))
    t_loop = _median_time(lambda: jax.block_until_ready(many_j(plan, x)), iters=5)
    t_per = min(t, t_loop / reps)
    spmv_nnz_s = nnz / t_per

    ys = Y.to_scipy().tocsr()
    xh = np.asarray(x).astype(np.complex128)
    t_sp = _median_time(lambda: ys @ xh, iters=5, warmup=1)
    extra["spmv_t_s"] = t_per
    extra["spmv_scipy_t_s"] = t_sp
    extra["spmv_nnz"] = int(nnz)

    # ---- LU factor + 1024-RHS batched solve (pegase scale) -----------------
    ng = 3000
    g2 = synthetic_grid(ng, seed=1)
    Y2, _, _ = ybus(g2)
    import scipy.sparse as sp

    Y2r = cst.CSC.from_scipy(
        (Y2.to_scipy() + sp.eye(ng) * (0.3 + 0.3j)).tocsc()
    )
    t0 = time.perf_counter()
    lu = splu(Y2r, ordering="amd")
    extra["lu_factor_s"] = time.perf_counter() - t0
    extra["lu_fill_nnz"] = int(lu.lnz + lu.unz)
    splan = lu.solve_plan()
    B = jnp.asarray(rng.rand(ng, 1024) + 1j * rng.rand(ng, 1024))
    solve = jax.jit(lambda p, b: p(b))
    jax.block_until_ready(solve(splan, B))
    t_solve = _median_time(lambda: jax.block_until_ready(solve(splan, B)), iters=5)
    extra["lu_solve_rhs_per_s"] = 1024 / t_solve
    extra["lu_solve_nnz_per_s"] = (lu.lnz + lu.unz) * 1024 / t_solve

    # scipy oracle for the same batched solve
    import scipy.sparse.linalg as spla
    slu = spla.splu(Y2r.to_scipy().tocsc())
    Bh = np.asarray(B).astype(np.complex128)
    t_scipy_solve = _median_time(lambda: slu.solve(Bh), iters=3, warmup=1)
    extra["lu_solve_scipy_rhs_per_s"] = 1024 / t_scipy_solve

    # ---- SpGEMM C = A·Aᵀ (config 2 shape) ----------------------------------
    from csparse3_tpu.models.grids import connectivity

    Cf, Ct = connectivity(g2)
    C = Cf - Ct
    t0 = time.perf_counter()
    G = C.dot(C.t())
    jax.block_until_ready(G.data)
    t_gemm = time.perf_counter() - t0
    extra["spgemm_out_nnz"] = int(G.nnz)
    extra["spgemm_nnz_per_s"] = G.nnz / t_gemm

    print(json.dumps({
        "metric": "spmv_nnz_per_s",
        "value": spmv_nnz_s,
        "unit": "nnz/s",
        "vs_baseline": spmv_nnz_s / (nnz / t_sp),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
