import os, time, resource, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from jax.sharding import Mesh
import csparse3_tpu as cst
from csparse3_tpu.models.grids import synthetic_grid
from csparse3_tpu.linalg.ordering import rcm

def rss(): return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss/1e6

N = int(sys.argv[1]) if len(sys.argv) > 1 else 204800
g = synthetic_grid(N, seed=1)
bp = 1.0/g.x
rows = np.concatenate([g.f,g.t,g.f,g.t]); cols = np.concatenate([g.f,g.t,g.t,g.f])
vals = np.concatenate([bp,bp,-bp,-bp])
A0 = cst.add(cst.from_triplets(rows,cols,vals,(N,N)), cst.diags(np.full(N,3.0)))
perm = rcm(A0); A = A0[perm,perm]
from csparse3_tpu.parallel import DistBandedLU
mesh = Mesh(np.array(jax.devices()[:8]), ('rows',))
t0=time.perf_counter()
dk = DistBandedLU.factor_device(A, mesh=mesh, ordering=None, s=2560)
jax.block_until_ready((dk._sinv, dk._uhat, dk._r_si))
print(f'factor total {time.perf_counter()-t0:.1f}s rss {rss():.1f}GB', flush=True)
b = jnp.asarray(np.ones(N, np.float32))
t0=time.perf_counter(); bb = dk.blocks(b); jax.block_until_ready(bb)
print(f'blocks {time.perf_counter()-t0:.1f}s', flush=True)
t0=time.perf_counter(); xx = dk.solve_blocks(bb); jax.block_until_ready(xx)
print(f'solve_blocks (compile+run) {time.perf_counter()-t0:.1f}s rss {rss():.1f}GB', flush=True)
t0=time.perf_counter(); xx2 = dk.solve_blocks(bb); jax.block_until_ready(xx2)
print(f'solve_blocks (warm) {time.perf_counter()-t0:.1f}s', flush=True)
t0=time.perf_counter(); x = dk.unblocks(xx)
print(f'unblocks {time.perf_counter()-t0:.1f}s', flush=True)
a = A.to_scipy().tocsc()
resid = np.linalg.norm(a @ np.asarray(x,np.float64)[:N,0] - 1.0)/np.sqrt(N)
print(f'resid {resid:.2e} rss {rss():.1f}GB', flush=True)
