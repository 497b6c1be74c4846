import os, time, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from jax.sharding import Mesh
sys.path.insert(0, "/root/repo")
import csparse3_tpu as cst
from csparse3_tpu.parallel import DistBandedLU

for s_req in (int(sys.argv[1]) if len(sys.argv)>1 else 640,):
    m = 3; Pn = 8
    n = Pn*m*s_req
    # simple tridiagonal band matrix with bandwidth 1 but force s
    diag = np.full(n, 4.0); off = np.full(n-1, -1.0)
    rows = np.concatenate([np.arange(n), np.arange(n-1), np.arange(1,n)])
    cols = np.concatenate([np.arange(n), np.arange(1,n), np.arange(n-1)])
    vals = np.concatenate([diag, off, off])
    A = cst.from_triplets(rows, cols, vals, (n,n))
    mesh = Mesh(np.array(jax.devices()[:8]), ('rows',))
    t0=time.perf_counter()
    dk = DistBandedLU.factor_device(A, mesh=mesh, ordering=None, s=s_req)
    jax.block_until_ready(dk._sinv)
    t_fac=time.perf_counter()-t0
    b = jnp.asarray(np.ones(n, np.float32))
    bb = dk.blocks(b)
    t0=time.perf_counter()
    xx = dk.solve_blocks(bb); jax.block_until_ready(xx)
    t_sc=time.perf_counter()-t0
    t0=time.perf_counter()
    xx = dk.solve_blocks(bb); jax.block_until_ready(xx)
    t_sw=time.perf_counter()-t0
    print(f"s={s_req} m={m}: factor(total) {t_fac:.1f}s solve compile+run {t_sc:.1f}s warm {t_sw:.2f}s", flush=True)
