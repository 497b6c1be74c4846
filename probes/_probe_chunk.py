"""Probe: DIAPlan chunk-size sweep on the chip, batched (n,2) input.

Usage: python _probe_chunk.py CHUNK REPS [N]
Prints {"t": ..., "chunk": ..., "nsteps": ...}; delta two REPS runs.
"""
import functools
import json
import sys
import time

import numpy as np


def main():
    chunk = int(sys.argv[1])
    reps = int(sys.argv[2])
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000

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
    plan = DIAPlan(re, chunk=chunk)
    D = plan.ndiag
    rng = np.random.RandomState(0)
    x2 = jnp.asarray(rng.rand(n, 2).astype(np.float32))

    @functools.partial(jax.jit, static_argnums=2)
    def many(p, x, R):
        def body(c, _):
            y = p(c)
            return y * 1e-2, None

        o, _ = jax.lax.scan(body, x, None, length=R)
        return o[:1, :1]

    compiled = many.lower(plan, x2, reps).compile()
    t0 = time.perf_counter()
    np.asarray(compiled(plan, x2))
    t = time.perf_counter() - t0
    print(json.dumps({"t": t, "reps": reps, "chunk": chunk, "D": D,
                      "nsteps": -(-D // max(1, min(chunk, D)))}))


if __name__ == "__main__":
    main()
