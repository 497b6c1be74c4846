import sys, time, functools
import numpy as np
import jax, jax.numpy as jnp
import csparse3_tpu as cst
from csparse3_tpu.models.grids import synthetic_grid, ybus

reps = int(sys.argv[1])
n = 200_000
grid = synthetic_grid(n, seed=0)
Y, _, _ = ybus(grid)
plan = cst.SplitSpMV(Y)
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
v = np.asarray(compiled(plan, xr, xi))
print(f"reps={reps} t={time.perf_counter()-t0:.3f} v={v}", flush=True)
