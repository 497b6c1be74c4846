import time, numpy as np
import jax, jax.numpy as jnp
import scipy.sparse as sp
from jax.sharding import Mesh
import csparse3_tpu as cst
from csparse3_tpu.parallel import BlockJacobi, dist_bicgstab, dist_spmv, partition_rows

n = 1_000_000
diag_off = -np.ones(n-1); d2 = -0.5*np.ones(n-16)
a = sp.diags([d2, diag_off, 4.0*np.ones(n), diag_off, d2], [-16,-1,0,1,16]).tocsc()
A = cst.CSC.from_scipy(a)
print('nnz', A.nnz, flush=True)
t0=time.time(); part = partition_rows(A, 8); print('partition', time.time()-t0, 's; strategy', part.strategy, 'k', part.k, flush=True)
mesh = Mesh(np.array(jax.devices()[:8]), ('rows',))
x = np.random.RandomState(0).rand(n)
with mesh:
    t0=time.time(); y = dist_spmv(part, jnp.asarray(x), mesh); jax.block_until_ready(y)
    print('dist spmv compile+run', time.time()-t0, flush=True)
    t0=time.time(); y = dist_spmv(part, jnp.asarray(x), mesh); jax.block_until_ready(y)
    print('dist spmv steady', time.time()-t0, flush=True)
print('spmv err', np.abs(np.asarray(part.trim_vector(y)) - a @ x).max(), flush=True)
t0=time.time(); prec = BlockJacobi.build(A, part); print('block-jacobi build', time.time()-t0, flush=True)
b = np.random.RandomState(1).rand(n)
with mesh:
    t0=time.time(); xs, res, it = dist_bicgstab(part, b, mesh, prec=prec, tol=1e-8, maxiter=100)
    print('dist solve', time.time()-t0, 's; iters', int(it), flush=True)
print('solve rel err', np.linalg.norm(a @ np.asarray(xs) - b)/np.linalg.norm(b), flush=True)
