"""Probe: does Pallas execute at hardware speed on this runtime?

Streams a (R_TILES*256, 512) f32 array through VMEM doing a triad, grid
over row tiles (each block 512KB), chained via scan with small carry.

Usage: python _probe_pallas.py REPS [MB]
"""
import functools
import json
import sys
import time

import numpy as np


def main():
    reps = int(sys.argv[1])
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cols = 512
    tile = 256
    rows_total = mb * 1_000_000 // 4 // cols
    nt = rows_total // tile
    rows = nt * tile
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(rows, cols).astype(np.float32))

    def kernel(s_ref, a_ref, o_ref):
        # triad on the tile + running scalar coupling
        o_ref[:] = a_ref[:] * s_ref[0] + 0.5

    def triad(a, s):
        return pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((tile, cols), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((tile, cols), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        )(s, a)

    @functools.partial(jax.jit, static_argnums=2)
    def many(a, s0, R):
        def body(c, _):
            y = triad(a, c)
            # couple: next scale depends on one element of y
            return jnp.full((1,), 1.0, jnp.float32) + y[0, 0] * 1e-9, None

        o, _ = jax.lax.scan(body, s0, None, length=R)
        return o

    s0 = jnp.ones((1,), jnp.float32)
    compiled = many.lower(a, s0, reps).compile()
    t0 = time.perf_counter()
    np.asarray(compiled(a, s0))
    t = time.perf_counter() - t0
    print(json.dumps({"t": t, "reps": reps, "mb": rows * cols * 4 / 1e6,
                      "tiles": nt}))


if __name__ == "__main__":
    main()
