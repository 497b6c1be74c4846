"""A/B: supertile resident-x kernel vs per-tile window DMA kernel at 200k."""
import sys, time, functools
import numpy as np
import jax, jax.numpy as jnp
import csparse3_tpu as cst
from csparse3_tpu.models.grids import synthetic_grid, ybus
from csparse3_tpu.kernels.bandpoints import SplitBandPoints

mode = sys.argv[1] if len(sys.argv) > 1 else "super"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 320

g = synthetic_grid(n, seed=0)
Y, _, _ = ybus(g)
plan = SplitBandPoints(Y, supertile=(mode == "super"))
print(f"mode={mode} D={plan.core_ndiag} KW={plan.point_meta[0][1]} E={plan.point_data[0][0].shape[1]}", flush=True)
rng = np.random.RandomState(0)
xr = jnp.asarray(rng.rand(n).astype(np.float32))
xi = jnp.asarray(rng.rand(n).astype(np.float32))

@functools.partial(jax.jit, static_argnums=3)
def many(p, a, b, R):
    def body(c, _):
        yr, yi = p(*c)
        s = 1.0 / jnp.maximum(jnp.max(jnp.abs(yr)), jnp.max(jnp.abs(yi)))
        return (yr * s, yi * s), None
    o, _ = jax.lax.scan(body, (a, b), None, length=R)
    return o

R1 = max(reps // 16, 1)
t0 = time.perf_counter()
c1 = many.lower(plan, xr, xi, R1).compile()
c2 = many.lower(plan, xr, xi, reps).compile()
print(f"compile={time.perf_counter()-t0:.1f}s", flush=True)
per = None
for _ in range(3):
    t0 = time.perf_counter(); o1 = c1(plan, xr, xi); np.asarray(o1[0]); np.asarray(o1[1]); t1 = time.perf_counter()-t0
    t0 = time.perf_counter(); out = c2(plan, xr, xi); gr, gi = np.asarray(out[0]), np.asarray(out[1]); t2 = time.perf_counter()-t0
    d = (t2-t1)/(reps-R1)
    print(f"  per-op {d*1e6:.0f} us", flush=True)
    if d > 0 and (per is None or d < per): per = d

A = Y.to_scipy().tocsr()
z = rng.rand(0)  # placeholder
z = np.asarray(xr).astype(np.complex64) + 1j*np.asarray(xi)
for _ in range(reps):
    z = A @ z
    z = z / max(np.abs(z.real).max(), np.abs(z.imag).max())
err = max(np.abs(gr - z.real).max(), np.abs(gi - z.imag).max()) / max(np.abs(z).max(), 1e-30)
print(f"mode={mode} per={per*1e6:.0f} us nnz/s={Y.nnz/per:.3e} rel_err={err:.1e}", flush=True)
