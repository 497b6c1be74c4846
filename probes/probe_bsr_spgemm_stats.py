import numpy as np, scipy.sparse as sp
import sys
sys.path.insert(0, '/root/repo')
import os
os.environ.setdefault("JAX_PLATFORMS","cpu")
import jax; jax.config.update("jax_platforms","cpu")
import csparse3_tpu as cst
from csparse3_tpu.models.grids import connectivity, synthetic_grid
from csparse3_tpu.linalg.ordering import rcm

def stats(A_sp, B_sp, name, Rb, permute=True):
    m, k = A_sp.shape
    k2, n = B_sp.shape
    if permute:
        # cluster: RCM on the gram-ish pattern of rows of A
        G = (A_sp @ A_sp.T).tocsc()
        Gc = cst.CSC.from_scipy(G)
        p = rcm(Gc)
        A_sp = A_sp[p]
        B_sp = B_sp[:, p]
        # columns of A (rows of B): sort by mean row index to cluster
        Ac = A_sp.tocsc()
        colkey = []
        for j in range(Ac.shape[1]):
            rs = Ac.indices[Ac.indptr[j]:Ac.indptr[j+1]]
            colkey.append(rs.mean() if len(rs) else 0)
        q = np.argsort(colkey, kind="stable")
        A_sp = A_sp.tocsc()[:, q]
        B_sp = B_sp.tocsr()[q]
    def pad(M, Rb):
        mm = -(-M.shape[0]//Rb)*Rb; nn = -(-M.shape[1]//Rb)*Rb
        Mc = M.tocoo()
        return sp.coo_matrix((Mc.data, (Mc.row, Mc.col)), shape=(mm, nn)).tocsr()
    A_sp = pad(A_sp, Rb); B_sp = pad(B_sp, Rb)
    Ab = sp.bsr_matrix(A_sp, blocksize=(Rb, Rb))
    Bb = sp.bsr_matrix(B_sp, blocksize=(Rb, Rb))
    nA, nB = Ab.indices.shape[0], Bb.indices.shape[0]
    # products: for each A block (i,kb) count B blocks in brow kb
    brow_counts = np.diff(Bb.indptr)
    acols = Ab.indices  # block cols of A entries
    nprod = int(brow_counts[acols].sum())
    C = (A_sp @ B_sp).tocsc()
    Cb = sp.bsr_matrix(C, blocksize=(Rb, Rb))
    nC = Cb.indices.shape[0]
    flops = nprod * 2 * Rb**3
    bytes_seg = nprod * Rb * Rb * 4 * 2
    print(f"{name} Rb={Rb} perm={permute}: Ablk={nA} Bblk={nB} prod={nprod} "
          f"Cblk={nC} out_nnz={C.nnz} fillC={C.nnz/max(nC,1)/Rb**2:.3f} "
          f"flops={flops/1e9:.2f}G segbytes={bytes_seg/1e6:.0f}MB")

g2 = synthetic_grid(3000, seed=1)
Cf, Ct = connectivity(g2)
Cm = (Cf - Ct)
C_sp = Cm.to_scipy().tocsc()
B_sp = C_sp.T.tocsc()
for Rb in (8, 16, 32):
    for pm in (False, True):
        stats(C_sp, B_sp, "conn3000", Rb, pm)

a10 = sp.random(10_000, 10_000, density=1e-3, format="csc",
                random_state=np.random.RandomState(0))
for Rb in (8, 16, 32):
    for pm in (False, True):
        stats(a10, a10.T.tocsc(), "rand10k", Rb, pm)
