"""Device-op timeline breakdowns via jax.profiler (VERDICT r4 items 2/8).

Traces the two contested kernels on the REAL chip and attributes their
per-iteration time to individual fused HLO ops, so the analytic binding
model (utils/roofline.py) can be reconciled against MEASURED device time
instead of estimated op counts:

  * spmv_bp   — SplitBandPoints complex SpMV at 200k (bench `spmv_bp`)
  * refactor  — MultifrontalRefactor.factor_values at 10k
                (bench `refactor_general10k`)

Usage:  python probes/trace_breakdown.py [spmv|refactor|both]

Writes the summary to stdout; keep the numbers in BENCH_NOTES.md.
"""

from __future__ import annotations

import functools
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _device_op_summary(trace_dir, drop_under_us=0.05):
    """Sum ph='X' events on the TPU device track by op name."""
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                             recursive=True))
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    # find the device pid
    dev_pids = {e.get("pid") for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    from collections import Counter, defaultdict

    dur = defaultdict(float)
    cnt = Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            nm = e.get("name", "?")
            us = float(e.get("dur", 0.0))
            dur[nm] += us
            cnt[nm] += 1
            total += us
    rows = sorted(dur.items(), key=lambda kv: -kv[1])
    return total, [(nm, dur[nm], cnt[nm]) for nm, _ in
                   [(r[0], None) for r in rows]
                   if dur[nm] >= drop_under_us]


def _trace(fn, tag):
    import jax

    out_dir = f"/tmp/trace_{tag}_{int(time.time())}"
    fn()  # warm
    with jax.profiler.trace(out_dir):
        fn()
    return out_dir


def spmv_breakdown(R=256):
    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst
    from csparse3_tpu.models.grids import synthetic_grid, ybus

    n = 200_000
    grid = synthetic_grid(n, seed=0)
    Y, _, _ = ybus(grid)
    plan = cst.SplitBandPoints(Y)
    rng = np.random.RandomState(0)
    xr = jnp.asarray(rng.rand(n).astype(np.float32))
    xi = jnp.asarray(rng.rand(n).astype(np.float32))

    @functools.partial(jax.jit, static_argnums=3)
    def many(p, a, b, R):
        def body(c, _):
            yr, yi = p(*c)
            s = 1.0 / jnp.maximum(jnp.max(jnp.abs(yr)),
                                  jnp.max(jnp.abs(yi)))
            return (yr * s, yi * s), None

        o, _ = jax.lax.scan(body, (a, b), None, length=R)
        return o[0][:64], o[1][:64]

    c = many.lower(plan, xr, xi, R).compile()

    def run():
        o = c(plan, xr, xi)
        np.asarray(o[0])

    t0 = time.perf_counter()
    run()
    wall = (time.perf_counter() - t0) / R
    td = _trace(run, "spmv")
    total, rows = _device_op_summary(td)
    print(f"\n== spmv_bp @200k: wall {wall*1e6:.1f} us/op, device "
          f"{total/R:.1f} us/op over {R} iters ==")
    for nm, us, k in rows[:24]:
        print(f"  {us/R:8.2f} us/op  x{k:6d}  {nm[:96]}")
    return wall, total / R / 1e6


def refactor_breakdown(R=24):
    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst
    from csparse3_tpu.linalg import MultifrontalRefactor, splu
    from csparse3_tpu.models.grids import synthetic_grid

    ng = 10_000
    g2 = synthetic_grid(ng, seed=1)
    bp = 1.0 / g2.x
    rows = np.concatenate([g2.f, g2.t, g2.f, g2.t])
    cols = np.concatenate([g2.f, g2.t, g2.t, g2.f])
    vals = np.concatenate([bp, bp, -bp, -bp])
    B = cst.add(cst.from_triplets(rows, cols, vals, (ng, ng)),
                cst.diags(np.full(ng, 3.0)))
    lu = splu(B, ordering="nd", tol=0.0)
    sr = MultifrontalRefactor(lu._h, B)
    data = jnp.asarray(np.asarray(B.np_arrays()[2], np.float32))

    @functools.partial(jax.jit, static_argnums=2)
    def chain(p, d0, R):
        def body(d, _):
            Lx, Ux = p.factor_values(d)
            s = (1.0 + 1e-9 * jnp.max(jnp.abs(Ux))).astype(d0.dtype)
            return d0 * s, None

        o, _ = jax.lax.scan(body, d0, None, length=R)
        return o[:8]

    c = chain.lower(sr, data, R).compile()

    def run():
        np.asarray(c(sr, data))

    t0 = time.perf_counter()
    run()
    wall = (time.perf_counter() - t0) / R
    td = _trace(run, "refactor")
    total, rows_ = _device_op_summary(td)
    print(f"\n== factor_values @10k: wall {wall*1e3:.2f} ms/op, device "
          f"{total/R/1e3:.2f} ms/op over {R} iters "
          f"(snodes {sr.nsnodes}, levels {sr.nlevels}) ==")
    for nm, us, k in rows_[:30]:
        print(f"  {us/R:8.1f} us/op  x{k:6d}  {nm[:96]}")
    return wall, total / R / 1e6


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("spmv", "both"):
        spmv_breakdown()
    if which in ("refactor", "both"):
        refactor_breakdown()
