"""Probe: supernodal device refactorization rate on chip."""
import sys, time, functools
import numpy as np
import jax, jax.numpy as jnp
import csparse3_tpu as cst
from csparse3_tpu.linalg import splu
from csparse3_tpu.linalg.supernodal import SupernodalRefactor
from csparse3_tpu.models.grids import synthetic_grid

ng = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 24
ordering = sys.argv[3] if len(sys.argv) > 3 else "amd"

g2 = synthetic_grid(ng, seed=1)
bp = 1.0 / g2.x
rows = np.concatenate([g2.f, g2.t, g2.f, g2.t])
cols = np.concatenate([g2.f, g2.t, g2.t, g2.f])
vals = np.concatenate([bp, bp, -bp, -bp])
B = cst.add(cst.from_triplets(rows, cols, vals, (ng, ng)), cst.diags(np.full(ng, 3.0)))
t0 = time.perf_counter()
lu = splu(B, ordering=ordering, tol=0.0)
sr = SupernodalRefactor(lu._h, B)
shapes = [(lv[0].shape) for lv in sr.levels]
print(f"build={time.perf_counter()-t0:.1f}s snodes={sr.nsnodes} levels={sr.nlevels} "
      f"fill={sr.lnz+sr.unz} biggest={max(shapes, key=lambda s: s[0]*s[1]*s[2])}", flush=True)

data = jnp.asarray(np.asarray(B.np_arrays()[2], np.float32))
b = jnp.asarray(np.random.RandomState(2).rand(ng).astype(np.float32))

@functools.partial(jax.jit, static_argnums=3)
def chain(p, d0, b, R):
    def bd(d, _):
        Lx, Ux = p.factor_values(d)
        s = 1.0 + 1e-9 * jnp.max(jnp.abs(Ux))
        return d0 * s, None
    o, _ = jax.lax.scan(bd, d0, None, length=R)
    return p.refactor(o)(b)

R1 = max(reps // 6, 1)
t0 = time.perf_counter()
c1 = chain.lower(sr, data, b, R1).compile()
c2 = chain.lower(sr, data, b, reps).compile()
print(f"compile={time.perf_counter()-t0:.1f}s", flush=True)
per = None; got = None
for _ in range(3):
    t0 = time.perf_counter(); np.asarray(c1(sr, data, b)); t1 = time.perf_counter()-t0
    t0 = time.perf_counter(); got = np.asarray(c2(sr, data, b)); t2 = time.perf_counter()-t0
    d = (t2-t1)/(reps-R1)
    print(f"  delta per-factor: {d*1e3:.2f} ms ({1/d:.1f}/s)", flush=True)
    if d > 0 and (per is None or d < per): per = d
As = B.to_scipy().tocsc()
res = float(np.linalg.norm(As @ np.asarray(got, np.float64) - np.asarray(b, np.float64)) / np.linalg.norm(np.asarray(b)))
print(f"rate={1/per:.1f}/s residual={res:.2e}", flush=True)
