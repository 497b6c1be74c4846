"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: complex SpMV throughput (nnz/s) on a 200k-bus synthetic-grid
admittance matrix — the hot kernel of every power-flow iteration
(BASELINE.md configs).  The reference records no numbers of its own, so
``vs_baseline`` is the speedup over scipy.sparse running the same op on
this machine's host CPU — the backend the reference actually dispatches
to (SURVEY §1 L2b).

Device arithmetic is split-complex (ops.matvec.SplitSpMV): real pairs
only — the TPU-native formulation (no complex ALU).  Timing is pure
device (block_until_ready); no transfers inside timed regions.

Robustness: each section runs in its OWN subprocess.  Some accelerator
runtimes (notably remote-attached dev chips) degrade or wedge transfers
within a long-lived process; per-section processes keep one flaky
section from killing the whole benchmark.  Failures degrade to an
"error" field instead of aborting.

Sections / extra sub-metrics:
* spmv  — headline (config 1/5 shape)
* lu    — native-C++ AMD+factor, 1024-RHS batched level-scheduled device
          solve, KLU-style device refactorization rate (configs 3/4)
* spgemm — C = A·Aᵀ on the branch connectivity matrix (config 2)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def _t(fn, iters=5, warmup=2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _guarded(fn, seconds=60, default=None):
    """Run fn with a SIGALRM timeout — device->host transfers may hang;
    a benchmark must degrade, not die."""
    import signal

    def _raise(signum, frame):
        raise TimeoutError("transfer timed out")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        return fn()
    except Exception as e:  # noqa: BLE001
        return default if default is not None else f"unavailable ({type(e).__name__})"
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


# ---------------------------------------------------------------------------
# sections (each runs in its own process)
# ---------------------------------------------------------------------------

def section_spmv():
    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst
    from csparse3_tpu.models.grids import synthetic_grid, ybus

    out = {"device": str(jax.devices()[0])}
    n = 200_000
    grid = synthetic_grid(n, seed=0)
    Y, _, _ = ybus(grid)
    nnz = Y.nnz
    plan = cst.SplitSpMV(Y)
    rng = np.random.RandomState(0)
    xr_np, xi_np = rng.rand(n), rng.rand(n)
    xr, xi = jnp.asarray(xr_np), jnp.asarray(xi_np)
    # time a scan of `reps` chained matvecs: amortizes per-dispatch
    # latency (large on remote-attached chips) out of the measurement
    reps = 20

    def many(p, a, b):
        def body(c, _):
            return p(*c), None
        o, _ = jax.lax.scan(body, (a, b), None, length=reps)
        return o

    many_j = jax.jit(many)
    t_per = _t(lambda: many_j(plan, xr, xi), iters=3, warmup=1) / reps
    spmv = jax.jit(lambda p, a, b: p(a, b))
    out["spmv_t_s"] = t_per
    out["spmv_nnz"] = int(nnz)
    out["spmv_nnz_per_s"] = nnz / t_per

    ys = Y.to_scipy().tocsr()
    xh = (xr_np + 1j * xi_np).astype(np.complex128)
    t0 = time.perf_counter()
    for _ in range(5):
        ys @ xh
    out["spmv_scipy_t_s"] = (time.perf_counter() - t0) / 5

    def _check():
        yr, yi = spmv(plan, xr, xi)
        yref = ys[:1000] @ xh
        return float(np.abs(
            (np.asarray(yr[:1000]) + 1j * np.asarray(yi[:1000])) - yref
        ).max())

    out["spmv_max_abs_err_f32"] = _guarded(_check, seconds=90)
    return out


def section_lu():
    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst
    from csparse3_tpu.linalg import splu
    from csparse3_tpu.models.grids import synthetic_grid

    out = {}
    ng = 3000
    g2 = synthetic_grid(ng, seed=1)
    bp = 1.0 / g2.x
    rows = np.concatenate([g2.f, g2.t, g2.f, g2.t])
    cols = np.concatenate([g2.f, g2.t, g2.t, g2.f])
    vals = np.concatenate([bp, bp, -bp, -bp])
    B = cst.from_triplets(rows, cols, vals, (ng, ng))
    Breg = cst.add(B, cst.diags(np.full(ng, 3.0)))
    t0 = time.perf_counter()
    lu = splu(Breg, ordering="amd")
    out["lu_factor_s"] = time.perf_counter() - t0
    out["lu_fill_nnz"] = int(lu.lnz + lu.unz)
    splan = lu.solve_plan()
    RHS_np = np.random.RandomState(1).rand(ng, 1024)
    RHS = jnp.asarray(RHS_np)
    solve = jax.jit(lambda p, b: p(b))
    t_solve = _t(lambda: solve(splan, RHS), iters=3, warmup=1)
    out["lu_solve_rhs_per_s"] = 1024 / t_solve
    out["lu_solve_nnz_per_s"] = (lu.lnz + lu.unz) * 1024 / t_solve

    import scipy.sparse.linalg as spla

    slu = spla.splu(Breg.to_scipy().tocsc())
    t0 = time.perf_counter()
    slu.solve(RHS_np)
    out["lu_solve_scipy_rhs_per_s"] = 1024 / (time.perf_counter() - t0)

    rp = lu.refactor_plan(Breg)
    data = jnp.asarray(Breg.np_arrays()[2])
    refac = jax.jit(lambda p, d: p.factor_values(d))
    t_rf = _t(lambda: refac(rp, data), iters=3, warmup=1)
    out["refactor_per_s"] = 1.0 / t_rf
    return out


def section_spgemm():
    import jax

    import csparse3_tpu as cst  # noqa: F401
    from csparse3_tpu.models.grids import connectivity, synthetic_grid

    out = {}
    g2 = synthetic_grid(3000, seed=1)
    Cf, Ct = connectivity(g2)
    C = Cf - Ct
    t0 = time.perf_counter()
    G = C.dot(C.t())
    jax.block_until_ready(G.data)
    t_gemm = time.perf_counter() - t0
    out["spgemm_out_nnz"] = int(G.nnz)
    out["spgemm_nnz_per_s"] = G.nnz / t_gemm

    import scipy.sparse as sp  # noqa: F401

    cs = C.to_scipy()
    t0 = time.perf_counter()
    (cs @ cs.T).tocsc()
    out["spgemm_scipy_nnz_per_s"] = G.nnz / (time.perf_counter() - t0)
    return out


_SECTIONS = {"spmv": section_spmv, "lu": section_lu, "spgemm": section_spgemm}


def main():
    extra = {}
    for name in ("spmv", "lu", "spgemm"):
        print(f"[bench] section {name} ...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--section", name],
                capture_output=True, text=True, timeout=420,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            payload = None
            for line in reversed(r.stdout.strip().splitlines()):
                if line.startswith("{"):
                    payload = json.loads(line)
                    break
            if payload is None:
                raise RuntimeError(
                    f"no output (rc={r.returncode}): {r.stderr[-200:]}"
                )
            extra.update(payload)
            print(f"[bench] section {name} done in "
                  f"{time.perf_counter() - t0:.0f}s", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            extra[f"{name}_error"] = str(e)[:200]
            print(f"[bench] section {name} FAILED: {str(e)[:120]}",
                  file=sys.stderr, flush=True)

    spmv_nnz_s = extra.get("spmv_nnz_per_s", 0.0)
    t_sp = extra.get("spmv_scipy_t_s")
    nnz = extra.get("spmv_nnz", 1)
    vs = spmv_nnz_s / (nnz / t_sp) if (t_sp and nnz) else 0.0
    print(json.dumps({
        "metric": "spmv_nnz_per_s",
        "value": spmv_nnz_s,
        "unit": "nnz/s",
        "vs_baseline": vs,
        "extra": extra,
    }))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        print(json.dumps(_SECTIONS[sys.argv[2]]()))
    else:
        main()
