"""Probe: download correctness + timing, one process.

Runs the DIA matvec chain for R reps at n, downloads the FULL output and
compares against a CPU-in-process numpy reference. If values are correct,
execution definitely completed before the download returned.

Usage: python _probe_verify.py R [N] [CHUNK]
"""
import functools
import json
import sys
import time

import numpy as np


def main():
    reps = int(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst
    from csparse3_tpu.linalg.ordering import rcm
    from csparse3_tpu.models.grids import synthetic_grid, ybus
    from csparse3_tpu.ops.matvec import DIAPlan
    from csparse3_tpu.types import CSC

    grid = synthetic_grid(n, seed=0)
    Y, _, _ = ybus(grid)
    perm = rcm(Y)
    Yp = Y[perm, perm]
    ip, rows, vals = Yp.np_arrays()
    re = CSC(Yp.m, Yp.n, ip, rows, np.ascontiguousarray(vals.real),
             canonical=Yp.canonical)
    plan = DIAPlan(re, chunk=int(sys.argv[3]) if len(sys.argv) > 3 else 32)
    rng = np.random.RandomState(0)
    x0 = rng.rand(n, 2).astype(np.float32)

    @functools.partial(jax.jit, static_argnums=2)
    def many(p, x, R):
        def body(c, _):
            y = p(c)
            return y * (1.0 / jnp.max(jnp.abs(y))), None

        o, _ = jax.lax.scan(body, x, None, length=R)
        return o

    compiled = many.lower(plan, jnp.asarray(x0), reps).compile()
    t0 = time.perf_counter()
    dev = np.asarray(compiled(jax.device_put(plan), jnp.asarray(x0)))
    t_dev = time.perf_counter() - t0

    # scipy reference
    A = Yp.to_scipy().tocsr().real.astype(np.float32)
    x = x0.copy()
    for _ in range(reps):
        y = A @ x
        x = y * (1.0 / np.abs(y).max())
    err = float(np.max(np.abs(dev - x)) / max(1e-30, np.abs(x).max()))
    print(json.dumps({"t_download": t_dev, "reps": reps, "chunk": plan.chunk, "rel_err": err,
                      "correct": bool(err < 1e-2)}))


if __name__ == "__main__":
    main()
