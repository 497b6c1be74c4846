"""Ablate rand10k SpGEMMPlan numeric stages on chip."""
import functools, time, sys
import numpy as np
import jax, jax.numpy as jnp
import scipy.sparse as sp
sys.path.insert(0, "/root/repo")
import csparse3_tpu as cst
from csparse3_tpu.ops import construct
from csparse3_tpu.ops.spgemm import spgemm_symbolic, _rowgather, _ROWG_K

a10 = sp.random(10_000, 10_000, density=1e-3, format="csc",
                random_state=np.random.RandomState(0))
A = cst.CSC.from_scipy(a10)
B = construct.transpose(A)
plan = spgemm_symbolic(A, B)
pa_s, pb_s, sel, tailpos, tailgid, ntail, padA, padB = plan._v2
a0 = jnp.asarray(np.asarray(A.np_arrays()[2], np.float32))
b0 = jnp.asarray(np.asarray(B.np_arrays()[2], np.float32))
T = int(pa_s.shape[0])
print(f"T={T} out={plan.out_nnz} ntail={ntail} tailprods={len(tailpos)}")

def bench(fn, R=48, label=""):
    @functools.partial(jax.jit, static_argnums=1)
    def chain(a, RR):
        def body(c, _):
            y = fn(c)
            s = 1.0 + 1e-12 * jnp.max(jnp.abs(y))
            return c * s, None
        o, _ = jax.lax.scan(body, a, None, length=RR)
        return fn(o)[:8]
    R1 = max(R // 4, 1)
    c1 = chain.lower(a0, R1).compile()
    c2 = chain.lower(a0, R).compile()
    per = None
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(c1(a0)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(c2(a0)); t2 = time.perf_counter() - t0
        d = (t2 - t1) / (R - R1)
        if d > 0 and (per is None or d < per):
            per = d
    print(f"{label}: {per*1e3:.2f} ms", flush=True)

bench(lambda a: _rowgather(a, pa_s, padA), label="ga only (1.1M from 100k)")
bench(lambda a: _rowgather(a, pa_s, padA) * _rowgather(b0, pb_s, padB),
      label="ga*gb (gb loop-inv)")
def with_tail(a):
    w = _rowgather(a, pa_s, padA) * _rowgather(b0, pb_s, padB)
    tw = _rowgather(w, tailpos, -(-T // _ROWG_K) * _ROWG_K)
    return jax.ops.segment_sum(tw, tailgid, num_segments=int(ntail))
bench(with_tail, label="+tail gather+segsum")
bench(lambda a: plan.numeric(a, b0).data, label="full numeric")
