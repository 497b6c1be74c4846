"""Probe: SplitDIA vs SplitSymDIA SpMV throughput on the TPU.

Usage: python _probe_symdia.py {dia|symdia} REPS [N]
Prints one JSON line {"t": seconds, ...} — use delta between two REPS.
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

    grid = synthetic_grid(n, seed=0)
    Y, _, _ = ybus(grid)
    perm = rcm(Y)
    Yp = Y[perm, perm]
    plan = cst.SplitSymDIA(Yp, tol=1e-12) if kind == "symdia" else cst.SplitDIA(Yp)
    rng = np.random.RandomState(0)
    xr, xi = jnp.asarray(rng.rand(n)), jnp.asarray(rng.rand(n))

    @functools.partial(jax.jit, static_argnums=3)
    def many(p, a, b, R):
        def body(c, _):
            yr, yi = p(*c)
            return (yr * 1e-2, yi * 1e-2), None

        o, _ = jax.lax.scan(body, (a, b), None, length=R)
        return o[0][:1]

    compiled = many.lower(plan, xr, xi, reps).compile()
    t0 = time.perf_counter()
    np.asarray(compiled(plan, xr, xi))
    nd = plan.re.ndiag if kind == "symdia" else plan.re.ndiag
    print(json.dumps({"t": time.perf_counter() - t0, "reps": reps,
                      "nnz": int(Y.nnz), "ndiag": nd}))


if __name__ == "__main__":
    main()
