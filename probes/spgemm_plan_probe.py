"""Probe: device two-phase SpGEMM numeric (SpGEMMPlan) per-op on chip."""
import sys, time, functools
import numpy as np
import jax, jax.numpy as jnp
import csparse3_tpu as cst
from csparse3_tpu.ops.spgemm import spgemm_symbolic
from csparse3_tpu.ops import construct

case = sys.argv[1] if len(sys.argv) > 1 else "conn3000"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 64

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
t0 = time.perf_counter()
plan = spgemm_symbolic(A, B)
t_sym = time.perf_counter() - t0
print(f"case={case} nnz={A.nnz} out_nnz={plan.out_nnz} sym_host={t_sym*1e3:.2f} ms", flush=True)
a0 = jnp.asarray(np.asarray(A.np_arrays()[2], np.float32))
b0 = jnp.asarray(np.asarray(B.np_arrays()[2], np.float32))

@functools.partial(jax.jit, static_argnums=2)
def chain(a, b, R):
    def body(c, _):
        C = plan.numeric(c, b)
        s = 1.0 + 1e-12 * jnp.max(jnp.abs(C.data))
        return a * s, None
    o, _ = jax.lax.scan(body, a, None, length=R)
    return plan.numeric(o, b).data

R1 = max(reps // 8, 1)
t0 = time.perf_counter()
c1 = chain.lower(a0, b0, R1).compile()
c2 = chain.lower(a0, b0, reps).compile()
print(f"compile={time.perf_counter()-t0:.1f}s", flush=True)
per = None
for _ in range(3):
    t0 = time.perf_counter(); np.asarray(c1(a0, b0)); t1 = time.perf_counter()-t0
    t0 = time.perf_counter(); out = np.asarray(c2(a0, b0)); t2 = time.perf_counter()-t0
    d = (t2-t1)/(reps-R1)
    print(f"  delta per-op: {d*1e3:.3f} ms", flush=True)
    if d > 0 and (per is None or d < per): per = d

got = cst.CSC(A.m, A.m, plan.template.np_arrays()[0], plan.template.np_arrays()[1], out).to_scipy().copy()
As = A.to_scipy(); ref = (As @ As.T).tocsc()
err = abs(got-ref).max()/max(abs(ref).max(),1e-30)
t_sp = min(min((time.perf_counter(), (As @ As.T).tocsc(), time.perf_counter())[2::-2]) for _ in range(1))  # dummy
import time as _t
t_sp = None
for _ in range(5):
    t0=_t.perf_counter(); (As @ As.T).tocsc(); t_sp = min(t_sp or 1e9, _t.perf_counter()-t0)
print(f"rel_err={err:.2e} per_op={per*1e3:.3f} ms (sym amortized: +{t_sym*1e3:.2f} once) scipy={t_sp*1e3:.3f} ms", flush=True)
print(f"device_nnz_per_s={plan.out_nnz/per:.3e} scipy_nnz_per_s={plan.out_nnz/t_sp:.3e}", flush=True)
