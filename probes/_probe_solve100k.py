"""Probe: config-4 — 1024-RHS solve against a factored 100k-node grid.

Usage: python _probe_solve100k.py R [N] [STYLE]
STYLE: banded | level (solve-plan style)
"""
import functools
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    reps = int(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    style = sys.argv[3] if len(sys.argv) > 3 else "banded"

    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst
    from csparse3_tpu.linalg import splu
    from csparse3_tpu.models.grids import synthetic_grid

    g = synthetic_grid(n, seed=1)
    bp = 1.0 / g.x
    rows = np.concatenate([g.f, g.t, g.f, g.t])
    cols = np.concatenate([g.f, g.t, g.t, g.f])
    vals = np.concatenate([bp, bp, -bp, -bp])
    B = cst.from_triplets(rows, cols, vals, (n, n))
    Breg = cst.add(B, cst.diags(np.full(n, 3.0)))
    t0 = time.perf_counter()
    if style == "banded":
        lu = splu(Breg, ordering="rcm", tol=0.0)
        t_factor = time.perf_counter() - t0
        t0 = time.perf_counter()
        plan = lu.banded_solve_plan()
    else:
        lu = splu(Breg, ordering="amd")
        t_factor = time.perf_counter() - t0
        t0 = time.perf_counter()
        plan = lu.solve_plan()
    t_plan = time.perf_counter() - t0
    log("factor", t_factor, "plan", t_plan, "fill", lu.lnz + lu.unz)
    RHS = jnp.asarray(np.random.RandomState(1).rand(n, 1024).astype(np.float32))

    @functools.partial(jax.jit, static_argnums=2)
    def chain(p, b0, R):
        def body(b, _):
            x = p(b)
            return x / jnp.max(jnp.abs(x)), None

        o, _ = jax.lax.scan(body, b0, None, length=R)
        return o

    t0 = time.perf_counter()
    compiled = chain.lower(plan, RHS, reps).compile()
    t_compile = time.perf_counter() - t0
    log("compile", t_compile)
    t0 = time.perf_counter()
    got = np.asarray(compiled(plan, RHS))
    t = time.perf_counter() - t0

    import scipy.sparse.linalg as spla

    slu = spla.splu(Breg.to_scipy().tocsc())
    xh = np.asarray(RHS, dtype=np.float64)
    t_sp = time.perf_counter()
    for _ in range(reps):
        xh = slu.solve(xh)
        xh = xh / np.abs(xh).max()
    t_scipy = (time.perf_counter() - t_sp) / reps
    err = float(np.max(np.abs(got - xh)) / max(1e-30, np.abs(xh).max()))
    print(json.dumps({"t": t, "reps": reps, "n": n, "style": style,
                      "factor_s": t_factor, "plan_s": t_plan,
                      "compile_s": t_compile, "fill": int(lu.lnz + lu.unz),
                      "scipy_solve_s": t_scipy,
                      "rel_err": err, "correct": bool(err < 8e-2)}))


if __name__ == "__main__":
    main()
