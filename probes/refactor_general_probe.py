"""Probe: general (level-scheduled) RefactorPlan rate on chip vs unroll."""
import sys, time, functools
import numpy as np
import jax, jax.numpy as jnp
import csparse3_tpu as cst
from csparse3_tpu.linalg import splu
from csparse3_tpu.linalg.refactor import RefactorPlan
from csparse3_tpu.models.grids import synthetic_grid

unroll = int(sys.argv[1]) if len(sys.argv) > 1 else 1
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 12

ng = 3000
g2 = synthetic_grid(ng, seed=1)
bp = 1.0 / g2.x
rows = np.concatenate([g2.f, g2.t, g2.f, g2.t])
cols = np.concatenate([g2.f, g2.t, g2.t, g2.f])
vals = np.concatenate([bp, bp, -bp, -bp])
B = cst.add(cst.from_triplets(rows, cols, vals, (ng, ng)), cst.diags(np.full(ng, 3.0)))
t0 = time.perf_counter()
lu = splu(B, ordering="amd")
rf = RefactorPlan(lu._h, B)
print(f"build={time.perf_counter()-t0:.2f}s nsegs={len(rf.slab_groups)} "
      f"steps={sum(g[0].shape[0] for g in rf.slab_groups)} "
      f"widths={[tuple(g[0].shape)+tuple(g[2].shape[1:]) for g in rf.slab_groups][:5]}...", flush=True)

# monkeypatch unroll
orig = RefactorPlan.factor_values
def factor_values(self, new_data):
    new_data = jnp.asarray(new_data)
    dtype = jnp.result_type(new_data.dtype, self.dtype)
    X = jnp.zeros(self.lnz + self.unz + 2, dtype=dtype)
    X = X.at[self.lnz + self.unz].set(1)
    X = X.at[self.l_unit].set(1)
    X = X.at[self.a_dst].add(new_data)
    def body(X, slab):
        dd, dp, ud, ul, uu = slab
        X = X.at[dd].set(X[dd] / X[dp])
        X = X.at[ud].add(-(X[ul] * X[uu]))
        X = X.at[self.lnz + self.unz].set(1)
        X = X.at[self.lnz + self.unz + 1].set(0)
        return X, None
    for group in self.slab_groups:
        X, _ = jax.lax.scan(body, X, group, unroll=min(unroll, group[0].shape[0]))
    return X[: self.lnz], X[self.lnz : self.lnz + self.unz]
RefactorPlan.factor_values = factor_values

data = jnp.asarray(np.asarray(B.np_arrays()[2], np.float32))

@functools.partial(jax.jit, static_argnums=2)
def chain(p, d0, R):
    def bd(d, _):
        Lx, Ux = p.factor_values(d)
        s = 1.0 + 1e-9 * jnp.max(jnp.abs(Ux))
        return d0 * s, None
    o, _ = jax.lax.scan(bd, d0, None, length=R)
    return p.factor_values(o)[1][:8]

R1 = max(reps // 6, 1)
t0 = time.perf_counter()
c1 = chain.lower(rf, data, R1).compile()
c2 = chain.lower(rf, data, reps).compile()
print(f"compile={time.perf_counter()-t0:.1f}s", flush=True)
per = None
for _ in range(3):
    t0 = time.perf_counter(); np.asarray(c1(rf, data)); t1 = time.perf_counter()-t0
    t0 = time.perf_counter(); got = np.asarray(c2(rf, data)); t2 = time.perf_counter()-t0
    d = (t2-t1)/(reps-R1)
    print(f"  delta per-factor: {d*1e3:.2f} ms ({1/d:.1f}/s)", flush=True)
    if d > 0 and (per is None or d < per): per = d
print(f"unroll={unroll} per={per*1e3:.2f} ms rate={1/per:.1f}/s", flush=True)
