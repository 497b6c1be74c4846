"""End-to-end drive through the public package surface (verify skill)."""
import sys

import numpy as np

import csparse3_tpu as cst
from csparse3_tpu import LilMat  # reference-compatible alias?  guard below

import jax
import jax.numpy as jnp

print("device:", jax.devices()[0], flush=True)

# --- canonical GridCal flow (SURVEY §3.1) ---------------------------------
branches = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (4, 5)]  # island {4,5}
m, nb = len(branches), 6
f = cst.LilMat(m, nb)
t = cst.LilMat(m, nb)
for k, (i, j) in enumerate(branches):
    f[k, i] = 1.0
    t[k, j] = 1.0
C = f.to_csc() - t.to_csc()
A = C.t() * C  # bus-bus laplacian-ish
isl = A.islands()
print("islands:", [sorted(s) for s in isl], flush=True)
assert len(isl) == 2 and sorted(isl[1]) == [4, 5]

x = np.random.RandomState(0).rand(nb)
plan = cst.SpMVPlan(A)
y = np.asarray(jax.jit(lambda p, v: p(v))(plan, jnp.asarray(x)))
ref = np.asarray(A.todense()) @ x
assert np.allclose(y, ref, rtol=1e-4, atol=1e-5), (y, ref)
print("SpMVPlan jit ok", flush=True)

# --- split-complex banded plans (XLA + Pallas) on a synthetic Ybus --------
from csparse3_tpu.linalg.ordering import rcm
from csparse3_tpu.models.grids import synthetic_grid, ybus

n = 2000
g = synthetic_grid(n, seed=0)
Y, _, _ = ybus(g)
p = rcm(Y)
Yp = Y[p, p]
xr = np.random.RandomState(1).rand(n).astype(np.float32)
xi = np.random.RandomState(2).rand(n).astype(np.float32)
z = Yp.to_scipy() @ (xr + 1j * xi)
for name, mk in [("SplitDIA", lambda: cst.SplitDIA(Yp, chunk=32)),
                 ("SplitPallasDIA", lambda: cst.SplitPallasDIA(Yp)),
                 ("SplitBandPoints", lambda: cst.SplitBandPoints(Y))]:
    pl_ = mk()
    zc = z if name != "SplitBandPoints" else Y.to_scipy() @ (xr + 1j * xi)
    yr, yi = jax.jit(lambda q, a, b: q(a, b))(pl_, jnp.asarray(xr),
                                              jnp.asarray(xi))
    err = max(np.abs(np.asarray(yr) - zc.real).max(),
              np.abs(np.asarray(yi) - zc.imag).max()) / np.abs(zc).max()
    print(f"{name} rel_err {err:.2e}", flush=True)
    assert err < 1e-3, name

# --- LU factor + solve vs scipy -------------------------------------------
import scipy.sparse.linalg as spla

bp = 1.0 / g.x
rows = np.concatenate([g.f, g.t, g.f, g.t])
cols = np.concatenate([g.f, g.t, g.t, g.f])
vals = np.concatenate([bp, bp, -bp, -bp])
B = cst.from_triplets(rows, cols, vals, (n, n))
Breg = cst.add(B, cst.diags(np.full(n, 3.0)))
lu = cst.linalg.splu(Breg, ordering="amd")
b = np.random.RandomState(3).rand(n)
xs = lu.solve(b)
xref = spla.spsolve(Breg.to_scipy().tocsc(), b)
print("LU rel_err", np.abs(xs - xref).max() / np.abs(xref).max(), flush=True)
assert np.allclose(xs, xref, rtol=1e-6, atol=1e-8)
print("LU ok (fill", lu.lnz + lu.unz, ")", flush=True)

# --- error probes ----------------------------------------------------------
try:
    A[0, 0] = 5.0
    raise AssertionError("setitem should raise")
except TypeError:
    print("setitem raises TypeError ok", flush=True)

try:
    cst.spmv(A, np.ones(nb + 1))
    raise AssertionError("shape mismatch should raise")
except ValueError:
    print("spmv shape mismatch raises ok", flush=True)

E = cst.from_triplets(np.array([], dtype=np.int64), np.array([], dtype=np.int64),
                      np.array([]), (4, 4))
assert cst.transpose(E).nnz == 0
assert len(E.islands()) == 4
G2 = cst.spgemm(E, E)
assert G2.nnz == 0
print("empty-matrix paths ok", flush=True)

S = cst.from_triplets(np.array([0, 1]), np.array([0, 1]),
                      np.array([1.0, 0.0]), (2, 2))
lus = cst.linalg.splu(S, ordering="natural")
assert lus.is_singular, "singular column must be reported"
print("singular reporting ok (cols=%s)" % lus.singular_cols, flush=True)

print("VERIFY DRIVE PASSED", flush=True)
