"""Probe: device BandedLU factorization time at 10k/100k vs host constructor."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
import csparse3_tpu as cst
from csparse3_tpu.linalg import BandedLU
from csparse3_tpu.linalg.banded import BandedRefactor
from csparse3_tpu.models.grids import synthetic_grid

n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
g = synthetic_grid(n, seed=1)
bp = 1.0/g.x
rows = np.concatenate([g.f,g.t,g.f,g.t]); cols = np.concatenate([g.f,g.t,g.t,g.f])
vals = np.concatenate([bp,bp,-bp,-bp])
A = cst.add(cst.from_triplets(rows,cols,vals,(n,n)), cst.diags(np.full(n,3.0)))

t0 = time.perf_counter()
rf = BandedRefactor.from_matrix(A)
t_sym = time.perf_counter() - t0
nb = rf._aux[2]; s = rf._aux[1]
print(f"n={n} bw={rf._aux[3]} s={s} nb={nb} symbolic={t_sym:.3f}s", flush=True)

data = jnp.asarray(np.asarray(A.np_arrays()[2], np.float32))
b = jnp.asarray(np.random.RandomState(2).rand(n).astype(np.float32))

# factor+solve fused so completion is forced by downloading x (n floats)
def fs(d, b):
    lu = rf(d)
    return lu(b)

t0 = time.perf_counter()
c = jax.jit(fs).lower(data, b).compile()
print(f"compile={time.perf_counter()-t0:.2f}s", flush=True)

for trial in range(3):
    t0 = time.perf_counter()
    x = np.asarray(c(data, b))
    print(f"trial{trial} factor+solve={time.perf_counter()-t0:.3f}s", flush=True)

As = A.to_scipy().tocsc()
res = np.linalg.norm(As @ x.astype(np.float64) - np.asarray(b, np.float64)) / np.linalg.norm(np.asarray(b))
print(f"residual={res:.2e}", flush=True)
