import sys, time, functools, numpy as np
import jax, jax.numpy as jnp
import csparse3_tpu as cst
from csparse3_tpu.linalg import splu
from csparse3_tpu.models.grids import synthetic_grid

R = int(sys.argv[1])
ng = 3000
g2 = synthetic_grid(ng, seed=1)
bp = 1.0 / g2.x
rows = np.concatenate([g2.f, g2.t, g2.f, g2.t])
cols = np.concatenate([g2.f, g2.t, g2.t, g2.f])
B = cst.from_triplets(rows, cols, np.concatenate([bp, bp, -bp, -bp]), (ng, ng))
Breg = cst.add(B, cst.diags(np.full(ng, 3.0)))
t0 = time.time()
lu = splu(Breg, ordering="rcm", tol=0.0)
plan = lu.banded_solve_plan()
print("factor+plan", time.time() - t0, "s; nblocks", plan.nblocks, "s", plan.s, flush=True)
RHS = jnp.asarray(np.random.RandomState(1).rand(ng, 1024).astype(np.float32))

@functools.partial(jax.jit, static_argnums=2)
def chain(p, b0, RR):
    def body(b, _):
        x = p(b)
        return x / jnp.max(jnp.abs(x)), None
    o, _ = jax.lax.scan(body, b0, None, length=RR)
    return o[:1, :1]

c = chain.lower(plan, RHS, R).compile()
t0 = time.perf_counter()
v = np.asarray(c(plan, RHS))
print(f"R={R}: t={time.perf_counter()-t0:.3f} v={v}", flush=True)
