"""Probe: SplitBandPoints on the chip, verified downloads.

Usage: python _probe_bp.py R [N] [TILE] [FRAC]
"""
import functools
import json
import sys
import time

import numpy as np


def main():
    reps = int(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    frac = float(sys.argv[4]) if len(sys.argv) > 4 else 0.02

    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst
    from csparse3_tpu.models.grids import synthetic_grid, ybus
    from csparse3_tpu.kernels.bandpoints import SplitBandPoints

    grid = synthetic_grid(n, seed=0)
    Y, _, _ = ybus(grid)
    plan = SplitBandPoints(Y, tile=tile, frac=frac)
    rng = np.random.RandomState(0)
    xr0 = rng.rand(n).astype(np.float32)
    xi0 = rng.rand(n).astype(np.float32)

    @functools.partial(jax.jit, static_argnums=3)
    def many(p, a, b, R):
        def body(c, _):
            yr, yi = p(*c)
            s = 1.0 / jnp.maximum(jnp.max(jnp.abs(yr)), jnp.max(jnp.abs(yi)))
            return (yr * s, yi * s), None

        o, _ = jax.lax.scan(body, (a, b), None, length=R)
        return o

    compiled = many.lower(plan, jnp.asarray(xr0), jnp.asarray(xi0),
                          reps).compile()
    t0 = time.perf_counter()
    out = compiled(plan, jnp.asarray(xr0), jnp.asarray(xi0))
    gr, gi = np.asarray(out[0]), np.asarray(out[1])
    t = time.perf_counter() - t0

    A = Y.to_scipy().tocsr()
    z = xr0.astype(np.complex64) + 1j * xi0.astype(np.complex64)
    for _ in range(reps):
        z = A @ z
        z = z / max(np.abs(z.real).max(), np.abs(z.imag).max())
    err = max(np.abs(gr - z.real).max(), np.abs(gi - z.imag).max())
    rel = float(err / max(1e-30, np.abs(z).max()))
    groups = [(int(w.shape[1]), meta[1]) for (w, _r, _a, _b), meta in
              zip(plan.point_data, plan.point_meta)]
    print(json.dumps({"t": t, "reps": reps, "n": n, "tile": tile,
                      "groups": groups,
                      "core": plan.core_ndiag, "nnz": int(Y.nnz),
                      "rel_err": rel, "correct": bool(rel < 1e-2)}))


if __name__ == "__main__":
    main()
