"""Probe: SplitBandPoints full-step timing, in-process delta method.

Usage: python _probe_bp_split.py R1 R2 [N] [TILE] [FRAC]
"""
import functools
import json
import sys
import time

import numpy as np


def main():
    r1, r2 = int(sys.argv[1]), int(sys.argv[2])
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
    tile = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    frac = float(sys.argv[5]) if len(sys.argv) > 5 else 0.02

    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst  # noqa: F401
    from csparse3_tpu.models.grids import synthetic_grid, ybus
    from csparse3_tpu.kernels.bandpoints import SplitBandPoints

    grid = synthetic_grid(n, seed=0)
    Y, _, _ = ybus(grid)
    plan = SplitBandPoints(Y, tile=tile, frac=frac)
    rng = np.random.RandomState(0)
    xr0 = jnp.asarray(rng.rand(n).astype(np.float32))
    xi0 = jnp.asarray(rng.rand(n).astype(np.float32))

    @functools.partial(jax.jit, static_argnums=1)
    def many(c, R):
        def body(c, _):
            yr, yi = plan(*c)
            s = 1.0 / jnp.maximum(jnp.max(jnp.abs(yr)) + 1e-9,
                                  jnp.max(jnp.abs(yi)) + 1e-9)
            return (yr * s, yi * s), None
        o, _ = jax.lax.scan(body, c, None, length=R)
        return o

    c1 = many.lower((xr0, xi0), r1).compile()
    c2 = many.lower((xr0, xi0), r2).compile()
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(c1((xr0, xi0))[0][:8]); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(c2((xr0, xi0))[0][:8]); t2 = time.perf_counter() - t0
        d = (t2 - t1) / (r2 - r1)
        if d > 0 and (best is None or d < best):
            best = d
    print(json.dumps({"full": best, "tile": tile, "frac": frac, "n": n,
                      "ndiag": plan.core_ndiag,
                      "groups": len(plan.point_data)}))


if __name__ == "__main__":
    main()
