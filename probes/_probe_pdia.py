"""Probe: Pallas DIA kernel vs XLA DIAPlan on the chip, verified downloads.

Usage: python _probe_pdia.py {pallas|xla} R [N] [P1] [P2]
  pallas: P1=tile (default 512), P2=dchunk (default 64)
  xla:    P1=chunk (default 32)
Full-result download + scipy correctness check.
"""
import functools
import json
import sys
import time

import numpy as np


def main():
    kind = sys.argv[1]
    reps = int(sys.argv[2])
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000

    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst
    from csparse3_tpu.linalg.ordering import rcm
    from csparse3_tpu.models.grids import synthetic_grid, ybus
    from csparse3_tpu.ops.matvec import DIAPlan
    from csparse3_tpu.kernels.dia_pallas import PallasDIA
    from csparse3_tpu.types import CSC

    grid = synthetic_grid(n, seed=0)
    Y, _, _ = ybus(grid)
    perm = rcm(Y)
    Yp = Y[perm, perm]
    ip, rows, vals = Yp.np_arrays()
    re = CSC(Yp.m, Yp.n, ip, rows, np.ascontiguousarray(vals.real),
             canonical=Yp.canonical)
    if kind == "pallas":
        tile = int(sys.argv[4]) if len(sys.argv) > 4 else 512
        dchunk = int(sys.argv[5]) if len(sys.argv) > 5 else 64
        plan = PallasDIA(re, tile=tile, dchunk=dchunk)
        meta = {"tile": tile, "dchunk": dchunk}
    else:
        chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 32
        plan = DIAPlan(re, chunk=chunk)
        meta = {"chunk": chunk}
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
    dev = np.asarray(compiled(plan, jnp.asarray(x0)))
    t_dev = time.perf_counter() - t0

    A = Yp.to_scipy().tocsr().real.astype(np.float32)
    x = x0.copy()
    for _ in range(reps):
        y = A @ x
        x = y * (1.0 / np.abs(y).max())
    err = float(np.max(np.abs(dev - x)) / max(1e-30, np.abs(x).max()))
    print(json.dumps({"t": t_dev, "kind": kind, "reps": reps, "n": n,
                      "rel_err": err, "correct": bool(err < 1e-2), **meta}))


if __name__ == "__main__":
    main()
