"""Probe: KLU-style RefactorPlan vs BandedRefactor device refactorization
rate at 3000-bus B' (in-process delta)."""
import functools
import json
import sys
import time

import numpy as np


def main():
    r1, r2 = int(sys.argv[1]), int(sys.argv[2])
    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst
    from csparse3_tpu.linalg import splu, BandedLU, BandedRefactor
    from csparse3_tpu.models.grids import synthetic_grid

    ng = 3000
    g2 = synthetic_grid(ng, seed=1)
    bp = 1.0 / g2.x
    rows = np.concatenate([g2.f, g2.t, g2.f, g2.t])
    cols = np.concatenate([g2.f, g2.t, g2.t, g2.f])
    vals = np.concatenate([bp, bp, -bp, -bp])
    B = cst.from_triplets(rows, cols, vals, (ng, ng))
    Breg = cst.add(B, cst.diags(np.full(ng, 3.0)))
    data = jnp.asarray(Breg.np_arrays()[2])
    out = {}

    # KLU-style
    lu = splu(Breg, ordering="amd")
    rp = lu.refactor_plan(Breg)

    @functools.partial(jax.jit, static_argnums=2)
    def chain_klu(p, d0, R):
        def body(d, _):
            Lx, Ux = p.factor_values(d)
            s = 1.0 + 1e-9 * (jnp.max(jnp.abs(Lx)) + jnp.max(jnp.abs(Ux)))
            return d0 * s, None
        o, _ = jax.lax.scan(body, d0, None, length=R)
        return p.factor_values(o)

    # Banded block-Thomas
    bl = BandedLU(Breg)
    br = BandedRefactor(bl, Breg)

    @functools.partial(jax.jit, static_argnums=2)
    def chain_band(p, d0, R):
        def body(d, _):
            plan = p(d)
            s = 1.0 + 1e-9 * jnp.max(jnp.abs(plan._sinv))
            return d0 * s, None
        o, _ = jax.lax.scan(body, d0, None, length=R)
        return p(o)._sinv

    for name, chain, arg in [("klu", chain_klu, rp), ("band", chain_band, br)]:
        try:
            c1 = chain.lower(arg, data, r1).compile()
            c2 = chain.lower(arg, data, r2).compile()
            best = None
            for _ in range(3):
                t0 = time.perf_counter(); jax.tree.map(np.asarray, c1(arg, data)); t1 = time.perf_counter() - t0
                t0 = time.perf_counter(); jax.tree.map(np.asarray, c2(arg, data)); t2 = time.perf_counter() - t0
                d = (t2 - t1) / (r2 - r1)
                if d > 0 and (best is None or d < best):
                    best = d
            out[name] = best
        except Exception as e:  # noqa: BLE001
            out[name + "_error"] = str(e)[:150]
    out["bw"] = int(bl.bw)
    out["s"] = int(bl.s)
    out["nblocks"] = int(bl.nblocks)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
