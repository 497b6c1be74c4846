"""Probe: on-chip ESC SpGEMM per-op time (delta method) on config-2 cases."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
import functools
import csparse3_tpu as cst
from csparse3_tpu.ops.spgemm_device import ESCSpGEMM
from csparse3_tpu.ops import construct

case = sys.argv[1] if len(sys.argv) > 1 else "conn3000"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 32

if case == "conn3000":
    from csparse3_tpu.models.grids import connectivity, synthetic_grid
    g = synthetic_grid(3000, seed=1)
    Cf, Ct = connectivity(g)
    A = Cf - Ct
else:
    import scipy.sparse as sp
    a10 = sp.random(10_000, 10_000, density=1e-3, format="csc",
                    random_state=np.random.RandomState(0))
    A = cst.CSC.from_scipy(a10)

B = construct.transpose(A)
plan = ESCSpGEMM(A, B)
print(f"case={case} m={A.m} n={A.n} nnz={A.nnz} total_products={plan.total}", flush=True)
a0 = jnp.asarray(np.asarray(A.np_arrays()[2], np.float32))
b0 = jnp.asarray(np.asarray(B.np_arrays()[2], np.float32))

@functools.partial(jax.jit, static_argnums=2)
def chain(a, b, R):
    def body(c, _):
        ip, r, d, nz = plan(c, b)
        s = 1.0 + 1e-12 * jnp.max(jnp.abs(d))
        return a * s, None
    o, _ = jax.lax.scan(body, a, None, length=R)
    return plan(o, b)

R1 = max(reps // 8, 1)
t0 = time.perf_counter()
c1 = chain.lower(a0, b0, R1).compile()
c2 = chain.lower(a0, b0, reps).compile()
print(f"compile={time.perf_counter()-t0:.1f}s", flush=True)
per = None
for _ in range(3):
    t0 = time.perf_counter()
    o1 = c1(a0, b0); [np.asarray(x) for x in o1]
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    o2 = c2(a0, b0); out = [np.asarray(x) for x in o2]
    t2 = time.perf_counter() - t0
    d = (t2 - t1) / (reps - R1)
    print(f"  delta per-op: {d*1e3:.3f} ms", flush=True)
    if d > 0 and (per is None or d < per):
        per = d

ip, r, dta, nz = out
nz = int(nz)
got = cst.CSC(A.m, A.m, ip.astype(np.int64), r[:nz].astype(np.int64), dta[:nz]).to_scipy().copy()
As = A.to_scipy()
ref = (As @ As.T).tocsc()
err = abs(got - ref).max() / max(abs(ref).max(), 1e-30)
print(f"out_nnz={nz} rel_err={err:.2e}", flush=True)

t_sp = None
for _ in range(5):
    t0 = time.perf_counter()
    (As @ As.T).tocsc()
    t_sp = min(t_sp or 1e9, time.perf_counter() - t0)
print(f"per_op={per*1e3:.3f} ms  scipy={t_sp*1e3:.3f} ms  device_nnz_per_s={nz/per:.3e}  scipy_nnz_per_s={nz/t_sp:.3e}", flush=True)
