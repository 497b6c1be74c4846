import time, functools, numpy as np
t00 = time.time()
import jax, jax.numpy as jnp
import csparse3_tpu as cst
from csparse3_tpu.linalg.ordering import rcm
from csparse3_tpu.models.grids import synthetic_grid, ybus
n = 50_000
g = synthetic_grid(n, seed=0)
Y, _, _ = ybus(g)
p = rcm(Y)
Yp = Y[p, p]
plan = cst.SplitDIA(Yp)
print('built, ndiag', plan.re.ndiag, time.time()-t00, flush=True)
rng = np.random.RandomState(0)
xr, xi = jnp.asarray(rng.rand(n).astype(np.float32)), jnp.asarray(rng.rand(n).astype(np.float32))

@functools.partial(jax.jit, static_argnums=3)
def many(p_, a, b, R):
    def body(c, _):
        yr, yi = p_(*c)
        return (yr * 1e-2, yi * 1e-2), None
    o, _ = jax.lax.scan(body, (a, b), None, length=R)
    return o[0][:1]

t0 = time.time()
c5 = many.lower(plan, xr, xi, 5).compile()
print('compiled R=5', time.time()-t0, flush=True)
t0 = time.time()
v = np.asarray(c5(plan, xr, xi))
print('R=5 run+force', time.time()-t0, 'v', v, flush=True)
t0 = time.time()
c55 = many.lower(plan, xr, xi, 55).compile()
print('compiled R=55', time.time()-t0, flush=True)
t0 = time.time()
v = np.asarray(c55(plan, xr, xi))
print('R=55 run+force', time.time()-t0, 'v', v, flush=True)
