"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: split-complex SpMV throughput (nnz/s) on a 200k-bus
synthetic-grid admittance matrix — the hot kernel of every power-flow
iteration (BASELINE.md configs).  The reference records no numbers of
its own, so ``vs_baseline`` is the speedup over scipy.sparse running the
same op on this machine's host CPU — the backend the reference actually
dispatches to (SURVEY §1 L2b).

Measurement method (built for remote-attached dev chips whose runtime
neither blocks in block_until_ready nor keeps transfers alive for long):

* every measurement runs in a FRESH subprocess;
* device work is a jitted ``lax.scan`` chain of R dependent iterations
  (values rescaled each step so chains don't overflow), completion
  FORCED by downloading one element;
* the metric is the delta between a long and a short chain:
  (t(R2) - t(R1)) / (R2 - R1) — dispatch, transfer and compile overhead
  cancel out.

Failures degrade to "*_error" fields instead of aborting.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def _force(x):
    """Download one element — the only reliable completion barrier."""
    return np.asarray(x)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


# ---------------------------------------------------------------------------
# measurement kernels (run in fresh subprocesses, one (kind, reps) each)
# ---------------------------------------------------------------------------

def run_spmv(reps: int, n: int = 200_000, plan_kind: str = "dia"):
    import functools

    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst
    from csparse3_tpu.models.grids import synthetic_grid, ybus

    grid = synthetic_grid(n, seed=0)
    Y, _, _ = ybus(grid)
    if plan_kind == "bandpoints":
        # natural order: the lattice backbone IS the heavy-diagonal core;
        # scattered long lines go through the one-hot MXU point kernel
        Yp = Y
        plan = cst.SplitBandPoints(Y)
        ndiag = plan.core_ndiag
    else:
        # RCM + gather-free banded split-complex plan: TPU gathers lower
        # to near-scalar code, so the banded formulation is the TPU SpMV
        from csparse3_tpu.linalg.ordering import rcm

        perm = rcm(Y)
        Yp = Y[perm, perm]
        if plan_kind == "pallas":
            plan = cst.SplitPallasDIA(Yp)
            ndiag = plan.re.ndiag
        else:
            plan = cst.SplitDIA(Yp, chunk=32)
            ndiag = plan.re.ndiag
    rng = np.random.RandomState(0)
    xr0 = rng.rand(n).astype(np.float32)
    xi0 = rng.rand(n).astype(np.float32)

    VROWS = 4096   # verified rows (the global renorm makes every row
    #                depend on the whole chain; 32 KB download)

    @functools.partial(jax.jit, static_argnums=3)
    def many(p, a, b, R):
        def body(c, _):
            yr, yi = p(*c)
            s = 1.0 / jnp.maximum(jnp.max(jnp.abs(yr)), jnp.max(jnp.abs(yi)))
            return (yr * s, yi * s), None

        o, _ = jax.lax.scan(body, (a, b), None, length=R)
        return o[0][:VROWS], o[1][:VROWS]

    # in-process delta (see run_solve100k): two chain lengths compiled
    # once, timed back-to-back per trial, TINY verified downloads and
    # chains long enough (reps ~2560) that the compute delta stands far
    # above per-download tunnel variance — short chains with MB-sized
    # downloads recorded flattered deltas (down to 28 us/op for a
    # kernel whose sustained wall-clock slope is ~400 us/op).
    R1 = max(reps // 4, 1)
    xr_d, xi_d = jnp.asarray(xr0), jnp.asarray(xi0)
    c1 = many.lower(plan, xr_d, xi_d, R1).compile()
    c2 = many.lower(plan, xr_d, xi_d, reps).compile()
    per = None
    got_r = got_i = None
    for _ in range(3):
        t0 = time.perf_counter()
        o1 = c1(plan, xr_d, xi_d)
        np.asarray(o1[0]), np.asarray(o1[1])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = c2(plan, xr_d, xi_d)
        got_r, got_i = np.asarray(out[0]), np.asarray(out[1])
        t2 = time.perf_counter() - t0
        d = (t2 - t1) / (reps - R1)
        if d > 0 and (per is None or d < per):
            per = d

    A = Yp.to_scipy().tocsr()
    # strong value check: ONE full matvec vs scipy (the long chain
    # converges to the dominant eigenvector, so its slice check mostly
    # proves the chain executed; this one proves the values)
    y1r, y1i = plan(jnp.asarray(xr0), jnp.asarray(xi0))
    z1 = A @ (xr0.astype(np.complex64) + 1j * xi0.astype(np.complex64))
    err1 = max(np.abs(np.asarray(y1r) - z1.real).max(),
               np.abs(np.asarray(y1i) - z1.imag).max())
    scale1 = max(1e-30, np.abs(z1).max())
    z = xr0.astype(np.complex64) + 1j * xi0.astype(np.complex64)
    for _ in range(reps):
        z = A @ z
        z = z / max(np.abs(z.real).max(), np.abs(z.imag).max())
    z = z[:VROWS]
    scale = max(1e-30, np.abs(z).max())
    err = max(np.abs(got_r - z.real).max(), np.abs(got_i - z.imag).max())
    err = max(err / scale, err1 / scale1) * scale  # combined gate below
    from csparse3_tpu.utils.roofline import plan_bytes

    out = {
        "t": (per or -1.0) * reps,  # back-compat: t/reps ~ per-op
        "per": per,
        "reps": reps,
        "nnz": int(Y.nnz),
        "ndiag": ndiag,
        # compulsory traffic: plan state + x in + y out (split-complex)
        "bytes_per_op": plan_bytes(plan) + 4 * n * 4,
        "rel_err": float(err / scale),
        "correct": bool(err / scale < 1e-2),
        "device": str(jax.devices()[0]),
    }
    if plan_kind == "bandpoints":
        # binding-resource model (VERDICT r3 item 2c): the points pass
        # is VPU/MXU-bound, not HBM-bound; report its op counts so the
        # harness can compute %-of-binding-roofline
        from csparse3_tpu.utils.roofline import bandpoints_binding_model

        out["binding_model"] = bandpoints_binding_model(plan)
        # trace-backed kernel time (VERDICT r4 item 2): the chained
        # harness adds a renorm (max/abs/select fusions) the binding
        # model rightly does not price; a device timeline separates the
        # Pallas kernel's own time from that scaffolding
        try:
            ktime, wtime = _spmv_kernel_trace(c1, plan, xr_d, xi_d, R1)
            out["kernel_us"] = ktime
            out["devloop_us"] = wtime
            # SAME-timebase binding fraction: the kernel time above is
            # device-timeline; pricing the model's op counts at
            # WALL-measured substrate rates mixes timebases and
            # inherits the substrate rig's chip-state variance (the
            # r5 validation run read 56.8% purely because small_dot's
            # wall measurement came out 23% hot).  Measure the two
            # dominant substrate rates from device timelines too.
            from csparse3_tpu.utils.roofline import (
                measure_onehot_mix, measure_small_dot)

            bm = out["binding_model"]
            oh_tr = measure_onehot_mix(nt=3128, reps=512, trace=True)
            sd_tr = measure_small_dot(nt=64, reps=8192, trace=True)
            out["onehot_traced_telem"] = oh_tr / 1e12
            out["small_dot_traced_tflops"] = sd_tr / 1e12
            bound_tr = ((bm["vpu_ops"] / 2.0) / oh_tr
                        + 2.0 * bm["mxu_macs"] / sd_tr)
            out["bound_traced_us"] = round(bound_tr * 1e6, 1)
            out["pct_binding_traced_nohbm"] = round(
                100.0 * bound_tr * 1e6 / ktime, 1)
        except Exception as e:  # noqa: BLE001  (profiler optional)
            out["trace_error"] = str(e)[:120]
    return out


def _spmv_kernel_trace(cfun, plan, xr, xi, R):
    """(kernel_us_per_op, loop_us_per_op) from a jax.profiler device
    timeline of one chained run: kernel = the band_points Pallas call,
    loop = the whole scan body (kernel + harness renorm)."""
    import tempfile

    import jax

    from csparse3_tpu.utils.roofline import device_trace_events

    td = tempfile.mkdtemp(prefix="spmv_trace")
    with jax.profiler.trace(td):
        o = cfun(plan, xr, xi)
        np.asarray(o[0])
    ev, dev_pids = device_trace_events(td)
    kern = 0.0
    loop = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        nm = e.get("name", "")
        if "band_points" in nm:
            kern += float(e.get("dur", 0.0))
        elif nm.startswith("while"):
            loop = max(loop, float(e.get("dur", 0.0)))
    if not kern:
        raise RuntimeError("no band_points events in trace")
    return kern / R, loop / R


def run_lusolve(reps: int, ng: int = 10_000):
    """Config-3 (BASELINE.md): LU factor + 1024-RHS triangular solve at
    case2869pegase-scale (~10k nodes)."""
    import functools

    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst
    from csparse3_tpu.linalg import splu
    from csparse3_tpu.models.grids import synthetic_grid

    g2 = synthetic_grid(ng, seed=1)
    bp = 1.0 / g2.x
    rows = np.concatenate([g2.f, g2.t, g2.f, g2.t])
    cols = np.concatenate([g2.f, g2.t, g2.t, g2.f])
    vals = np.concatenate([bp, bp, -bp, -bp])
    B = cst.from_triplets(rows, cols, vals, (ng, ng))
    Breg = cst.add(B, cst.diags(np.full(ng, 3.0)))
    t0 = time.perf_counter()
    lu = splu(Breg, ordering="rcm", tol=0.0)  # banded, no row exchanges
    t_factor = time.perf_counter() - t0
    # block-bidiagonal MXU solve path (gather/scatter-free)
    splan = lu.banded_solve_plan()
    RHS = jnp.asarray(np.random.RandomState(1).rand(ng, 1024))

    # verified slice: 16 columns x 4096 rows (256 KB) — columns are
    # independent chains and every row depends on the whole chain, so
    # the slice is a full-length verification; the TINY download plus
    # long chains keep the timing delta above tunnel variance (see
    # run_solve100k / BENCH_NOTES items 14-16)
    VER, VROWS = 16, 4096

    @functools.partial(jax.jit, static_argnums=2)
    def chain(p, b0, R):
        # block-space chain (see run_solve100k): the rcm/tol=0 factor
        # has perm_r == perm_c, so the solution feeds back as the next
        # RHS without leaving block space; padded tail rows stay exactly
        # zero (unit-diagonal pad blocks, zero off-coupling)
        bb = p.blocks(b0)

        def body(b, _):
            z = p.solve_blocks(b)
            m = jnp.max(jnp.abs(z), axis=(0, 1), keepdims=True)
            return z / m, None

        o, _ = jax.lax.scan(body, bb, None, length=R)
        return p.unblocks(o)[:VROWS, :VER]

    # in-process delta (see run_solve100k)
    R1 = max(reps // 4, 1)
    c1 = chain.lower(splan, RHS, R1).compile()
    c2 = chain.lower(splan, RHS, reps).compile()
    per = None
    got = None
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(c1(splan, RHS))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        got = np.asarray(c2(splan, RHS))
        t2 = time.perf_counter() - t0
        d = (t2 - t1) / (reps - R1)
        if d > 0 and (per is None or d < per):
            per = d
    # host oracle chain (scipy splu on the same matrix) over the
    # verified slice only; per-column normalization keeps scales
    # comparable, so f32-vs-f64 drift stays tiny
    import scipy.sparse.linalg as spla

    slu = spla.splu(Breg.to_scipy().tocsc())
    xh = np.asarray(RHS[:, :VER], dtype=np.float64)
    for _ in range(reps):
        xh = slu.solve(xh)
        xh = xh / np.abs(xh).max(axis=0, keepdims=True)
    err = float(np.max(np.abs(got - xh[:VROWS]))
                / max(1e-30, np.abs(xh).max()))
    return {
        "t": (per or -1.0) * reps,  # back-compat: t/reps ~ per-solve
        "per": per,
        "reps": reps,
        "rhs": 1024,
        "fill": int(lu.lnz + lu.unz),
        "factor_s": t_factor,
        "rel_err": err,
        "correct": bool(err < 1e-3),
    }


def run_solve100k(reps: int, n: int = 100_000):
    """Config-4 (BASELINE.md): 1024-RHS solve against a factored
    100k-node grid on one chip.  Factor = linalg.BandedLU block-Thomas
    (no sparse LU); solve chain = inverse iteration with PER-COLUMN
    normalization, so any column slice of the final result is its own
    full-length chain — the verified download is 64 of the 1024 columns
    (25 MB instead of 400 MB over the flaky tunnel) replayed against the
    host twin.

    The chain iterates in BLOCK SPACE (``solve_blocks``), permuting
    once on entry and once on exit — the documented usage for chained
    solvers (``BandedLU.blocks``): a row permutation commutes with the
    per-column renormalization, so the iteration is exactly the
    unpermuted one, without paying a 400 MB permute gather+scatter per
    step."""
    import functools

    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst
    from csparse3_tpu.linalg import BandedLU
    from csparse3_tpu.models.grids import synthetic_grid

    # VER=16 columns x VROWS=4096 rows: the block-space chain is ~10x
    # faster than round 2's, so the verified download must stay TINY
    # (256 KB) or per-download tunnel flakes (seconds) swamp the delta
    # between chain lengths.  Rows of the solution depend on the whole
    # chain, so a row slice is still a full-length verification.
    B, VER, VROWS = 1024, 16, 4096
    g = synthetic_grid(n, seed=1)
    bp = 1.0 / g.x
    rows = np.concatenate([g.f, g.t, g.f, g.t])
    cols = np.concatenate([g.f, g.t, g.t, g.f])
    vals = np.concatenate([bp, bp, -bp, -bp])
    A = cst.add(cst.from_triplets(rows, cols, vals, (n, n)),
                cst.diags(np.full(n, 3.0)))
    # factor ON DEVICE (symbolic-only host work); oracle below is an
    # independent host-side f64 block-Thomas factorization
    from csparse3_tpu.linalg.banded import BandedRefactor

    t0 = time.perf_counter()
    rf = BandedRefactor.from_matrix(A)
    t_sym = time.perf_counter() - t0
    data = jnp.asarray(np.asarray(A.np_arrays()[2], np.float32))
    t0 = time.perf_counter()
    fac = jax.jit(rf.__call__).lower(data).compile()
    t_fcompile = time.perf_counter() - t0
    # {symbolic, compile, execute} reported separately (VERDICT r3 item
    # 4: the lumped number swung 10x between runs because one flaky
    # download or a cold host page dominated it); execute is min-of-4
    # with a recorded spread
    t_execs = []
    for _ in range(4):
        t0 = time.perf_counter()
        plan = fac(data)
        # slice download: forces the scan far enough for a wall bound
        np.asarray(plan._sinv[-1, :1])
        t_execs.append(time.perf_counter() - t0)
    t_exec = min(t_execs)
    t_factor = t_sym + t_exec
    host_plan = BandedLU(A)  # untimed: the verification oracle
    RHS = jnp.asarray(
        np.random.RandomState(1).rand(n, B).astype(np.float32))

    @functools.partial(jax.jit, static_argnums=2)
    def chain(p, b0, R):
        bb = p.blocks(b0)

        def body(b, _):
            x = p.solve_blocks(b)
            # per-column max over block space == max over rows (padded
            # tail rows stay exactly zero through the sweeps)
            m = jnp.max(jnp.abs(x), axis=(0, 1), keepdims=True)
            return x / m, None

        o, _ = jax.lax.scan(body, bb, None, length=R)
        return p.unblocks(o)

    # in-process delta: both chain lengths compiled once, then timed
    # back-to-back per trial — the flaky tunnel's per-download variance
    # hits both sides of each pairing equally and cancels in the delta
    R1 = max(reps // 6, 1)
    c1 = chain.lower(plan, RHS, R1).compile()
    c2 = chain.lower(plan, RHS, reps).compile()
    got = None
    per = None
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(c1(plan, RHS)[:VROWS, :VER])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        Xd = c2(plan, RHS)
        got = np.asarray(Xd[:VROWS, :VER])
        t2 = time.perf_counter() - t0
        d = (t2 - t1) / (reps - R1)
        if d > 0 and (per is None or d < per):
            per = d
    # host twin on the verified columns (independent f64-recurrence
    # host factorization of the same matrix)
    xh = np.asarray(RHS[:, :VER], dtype=np.float64)
    for _ in range(reps):
        xh = host_plan.solve_host(xh)
        xh = xh / np.abs(xh).max(axis=0, keepdims=True)
    err = float(np.max(np.abs(got - xh[:VROWS]))
                / max(1e-30, np.abs(xh).max()))
    from csparse3_tpu.utils.roofline import plan_bytes

    return {
        "t": (per or -1.0) * reps,  # back-compat: t/reps ~ per-solve
        "per": per,
        "reps": reps,
        "rhs": B,
        "n": n,
        "bw": int(plan.bw),
        "factor_s": t_factor,
        "factor_sym_s": t_sym,
        "factor_compile_s": t_fcompile,
        "factor_exec_s": t_exec,
        "factor_exec_spread": round(max(t_execs) / max(t_exec, 1e-12), 2),
        # factor stacks + RHS in + X out per solve
        "bytes_per_op": plan_bytes(plan) + 2 * n * B * 4,
        # sweep matmul flops per solve: fwd 1 + bwd 2 (s,s)@(s,B) per block
        "flops_per_op": plan.nblocks * 3 * 2.0 * plan.s ** 2 * B,
        "rel_err": err,
        # f32 device sweeps vs f64-math-on-f32-factors host twin drift
        "correct": bool(err < 5e-2),
    }


def run_factor_device(reps: int, n: int = 10_000):
    """On-chip numeric LU factorization (VERDICT r2 item 1): block-Thomas
    recurrence as a jitted lax.scan of batched (s,s) inverses + MXU
    matmuls — host does symbolic only (ordering + block index map).
    Measured as a delta between two chained-factorization lengths; the
    final factorization solves one RHS whose downloaded value gates
    correctness (residual; fwd error vs scipy.splu at 10k)."""
    import functools

    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst
    from csparse3_tpu.linalg.banded import BandedRefactor
    from csparse3_tpu.models.grids import synthetic_grid

    g = synthetic_grid(n, seed=1)
    bp = 1.0 / g.x
    rows = np.concatenate([g.f, g.t, g.f, g.t])
    cols = np.concatenate([g.f, g.t, g.t, g.f])
    vals = np.concatenate([bp, bp, -bp, -bp])
    A = cst.add(cst.from_triplets(rows, cols, vals, (n, n)),
                cst.diags(np.full(n, 3.0)))
    t0 = time.perf_counter()
    rf = BandedRefactor.from_matrix(A)
    t_sym = time.perf_counter() - t0
    data = jnp.asarray(np.asarray(A.np_arrays()[2], np.float32))
    b = jnp.asarray(np.random.RandomState(2).rand(n).astype(np.float32))

    @functools.partial(jax.jit, static_argnums=3)
    def chain(p, d0, b, R):
        def body(d, _):
            lu = p(d)
            s = 1.0 + 1e-9 * jnp.max(jnp.abs(lu._sinv))
            return d0 * s, None

        o, _ = jax.lax.scan(body, d0, None, length=R)
        return p(o)(b)  # final factor + solve comes back for verification

    R1 = max(reps // 6, 1)
    t0 = time.perf_counter()
    c1 = chain.lower(rf, data, b, R1).compile()
    c2 = chain.lower(rf, data, b, reps).compile()
    t_compile = time.perf_counter() - t0
    per = None
    got = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(c1(rf, data, b))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        got = np.asarray(c2(rf, data, b))
        t2 = time.perf_counter() - t0
        d = (t2 - t1) / (reps - R1)
        if d > 0 and (per is None or d < per):
            per = d
    As = A.to_scipy().tocsc()
    bh = np.asarray(b, np.float64)
    x = np.asarray(got, np.float64)
    res = float(np.linalg.norm(As @ x - bh) / np.linalg.norm(bh))
    from csparse3_tpu.utils.roofline import thomas_factor_flops

    nb_, s_ = rf._aux[2], rf._aux[1]
    out = {"t": (per or -1.0) * reps, "per": per, "reps": reps, "n": n,
           "bw": int(rf._aux[3]), "s": int(s_),
           "sym_s": t_sym, "compile_s": t_compile,
           "flops": thomas_factor_flops(nb_, s_),
           "rel_err": res, "correct": bool(res < 1e-3)}
    if n <= 20_000:
        import scipy.sparse.linalg as spla

        xr = spla.spsolve(As, bh)
        out["fwd_err"] = float(np.abs(x - xr).max() / np.abs(xr).max())
        out["correct"] = bool(out["correct"] and out["fwd_err"] < 1e-2)
    return out


def run_factor100k(reps: int):
    return run_factor_device(reps, n=100_000)


def run_refactor(reps: int):
    """Device numeric refactorization rate, block-Thomas (BandedRefactor):
    same-pattern new values -> solvable factorization entirely on device,
    the factor-per-iteration Newton building block.  (The KLU-style
    RefactorPlan measures ~380x slower here — level-latency-bound —
    and remains available for patterns that aren't block-tridiagonal.)"""
    import functools

    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst
    from csparse3_tpu.linalg import BandedLU, BandedRefactor
    from csparse3_tpu.models.grids import synthetic_grid

    ng = 3000
    g2 = synthetic_grid(ng, seed=1)
    bp = 1.0 / g2.x
    rows = np.concatenate([g2.f, g2.t, g2.f, g2.t])
    cols = np.concatenate([g2.f, g2.t, g2.t, g2.f])
    vals = np.concatenate([bp, bp, -bp, -bp])
    B = cst.from_triplets(rows, cols, vals, (ng, ng))
    Breg = cst.add(B, cst.diags(np.full(ng, 3.0)))
    bl = BandedLU(Breg)
    rf = BandedRefactor(bl, Breg)
    data = jnp.asarray(Breg.np_arrays()[2])
    b = jnp.asarray(np.random.RandomState(2).rand(ng).astype(np.float32))

    @functools.partial(jax.jit, static_argnums=3)
    def chain(p, d0, b, R):
        def body(d, _):
            plan = p(d)
            s = 1.0 + 1e-9 * jnp.max(jnp.abs(plan._sinv))
            return d0 * s, None

        o, _ = jax.lax.scan(body, d0, None, length=R)
        # final refactor + solve comes back for verification
        return p(o)(b)

    R1 = max(reps // 6, 1)
    c1 = chain.lower(rf, data, b, R1).compile()
    c2 = chain.lower(rf, data, b, reps).compile()
    per = None
    got = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(c1(rf, data, b))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        got = np.asarray(c2(rf, data, b))
        t2 = time.perf_counter() - t0
        d = (t2 - t1) / (reps - R1)
        if d > 0 and (per is None or d < per):
            per = d
    # verify by RESIDUAL: f32 factorization forward error scales with
    # cond(A), but backward error (residual) stays at ~eps_f32
    As = Breg.to_scipy().tocsc()
    bh = np.asarray(b, np.float64)
    res = float(np.linalg.norm(As @ np.asarray(got, np.float64) - bh)
                / np.linalg.norm(bh))
    return {"t": (per or -1.0) * reps, "per": per, "reps": reps,
            "bw": int(bl.bw), "rel_err": res,
            "correct": bool(res < 1e-3)}


def run_refactor_general(reps: int, ng: int = 3000):
    """General-pattern device refactorization: the multifrontal
    matmul-extend-add sweep (linalg/multifrontal.py) on an ND-ordered
    (non-banded-plan) factorization — all per-level arbitrary-index
    traffic of the supernodal panel schedule (45/s) replaced by one-hot
    MXU matmuls (~3x) on top of the ~22x the panel sweep had over the
    scalar level-scheduled RefactorPlan (~2/s on this chip).  Verified
    by residual like run_refactor."""
    import functools

    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst
    from csparse3_tpu.linalg import MultifrontalRefactor, splu
    from csparse3_tpu.models.grids import synthetic_grid

    g2 = synthetic_grid(ng, seed=1)
    bp = 1.0 / g2.x
    rows = np.concatenate([g2.f, g2.t, g2.f, g2.t])
    cols = np.concatenate([g2.f, g2.t, g2.t, g2.f])
    vals = np.concatenate([bp, bp, -bp, -bp])
    B = cst.add(cst.from_triplets(rows, cols, vals, (ng, ng)),
                cst.diags(np.full(ng, 3.0)))
    t0 = time.perf_counter()
    lu = splu(B, ordering="nd", tol=0.0)
    t_splu = time.perf_counter() - t0
    t0 = time.perf_counter()
    sr = MultifrontalRefactor(lu._h, B)
    t_build = time.perf_counter() - t0
    data = jnp.asarray(np.asarray(B.np_arrays()[2], np.float32))
    b = jnp.asarray(np.random.RandomState(2).rand(ng).astype(np.float32))

    @functools.partial(jax.jit, static_argnums=3)
    def chain(p, d0, b, R):
        def body(d, _):
            Lx, Ux = p.factor_values(d)
            s = (1.0 + 1e-9 * jnp.max(jnp.abs(Ux))).astype(d0.dtype)
            return d0 * s, None

        o, _ = jax.lax.scan(body, d0, None, length=R)
        return p.refactor(o)(b)

    R1 = max(reps // 6, 1)
    c1 = chain.lower(sr, data, b, R1).compile()
    c2 = chain.lower(sr, data, b, reps).compile()
    per = None
    got = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(c1(sr, data, b))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        got = np.asarray(c2(sr, data, b))
        t2 = time.perf_counter() - t0
        d = (t2 - t1) / (reps - R1)
        if d > 0 and (per is None or d < per):
            per = d
    As = B.to_scipy().tocsc()
    bh = np.asarray(b, np.float64)
    res = float(np.linalg.norm(As @ np.asarray(got, np.float64) - bh)
                / np.linalg.norm(bh))
    return {"t": (per or -1.0) * reps, "per": per, "reps": reps,
            "snodes": sr.nsnodes, "levels": sr.nlevels,
            "splu_s": t_splu, "build_s": t_build,
            "rel_err": res, "correct": bool(res < 1e-3)}


def run_spgemm(reps: int):
    import csparse3_tpu as cst  # noqa: F401
    from csparse3_tpu.models.grids import connectivity, synthetic_grid

    g2 = synthetic_grid(3000, seed=1)
    Cf, Ct = connectivity(g2)
    C = Cf - Ct
    reps = max(reps, 1)
    # min-of-trials on BOTH sides: the sandboxed host's page-fault noise
    # dwarfs the op itself, and min is the honest statistic for it
    G = cst.gram(C)  # caches the symbolic phase on the container
    # warm = numeric revalue over the cached pattern (values-only pass;
    # the production shape: topology fixed, values change per iteration)
    t = min(_timed(lambda: cst.gram(C)) for _ in range(reps))
    # cold = fresh container, full symbolic + numeric every call
    ip_, ix_, dt_ = C.np_arrays()
    t_cold = min(
        _timed(lambda: cst.gram(cst.CSC(C.m, C.n, ip_, ix_, dt_)))
        for _ in range(reps))
    cs = C.to_scipy()
    (cs @ cs.T).tocsc()  # warm
    t_sp = min(_timed(lambda: (cs @ cs.T).tocsc()) for _ in range(reps))
    # exactness gate vs scipy
    err = abs(G.to_scipy().copy() - (cs @ cs.T).tocsc()).max()
    out = {"t": t, "t_cold": t_cold, "out_nnz": int(G.nnz), "scipy_t": t_sp,
           "reps": reps, "correct": bool(err < 1e-9)}

    # BASELINE config-2 second case: random 10k x 10k CSC, 0.1% density,
    # C = A @ A.T (plus the add/transpose the config bundles with it)
    import scipy.sparse as sp

    a10 = sp.random(10_000, 10_000, density=1e-3, format="csc",
                    random_state=np.random.RandomState(0))
    A10 = cst.CSC.from_scipy(a10)
    G10 = cst.gram(A10)  # warm
    t10 = min(_timed(lambda: cst.add(cst.gram(A10), A10).t())
              for _ in range(reps))
    ip_, ix_, dt_ = A10.np_arrays()
    t10_cold = min(
        _timed(lambda: cst.add(
            cst.gram(cst.CSC(A10.m, A10.n, ip_, ix_, dt_)), A10).t())
        for _ in range(reps))
    a10csc = a10.tocsc()
    t10_sp = min(_timed(lambda: ((a10csc @ a10csc.T) + a10csc).T.tocsc())
                 for _ in range(reps))
    err10 = abs(cst.gram(A10).to_scipy().copy()
                - (a10csc @ a10csc.T).tocsc()).max()
    out.update({"t_10k": t10, "t_10k_cold": t10_cold,
                "out_nnz_10k": int(G10.nnz), "scipy_t_10k": t10_sp,
                "correct": bool(out["correct"] and err10 < 1e-9)})
    return out


def run_spgemm_tpu(reps: int):
    """On-chip SpGEMM measured by the chained-delta method: the two-phase
    plan numeric (gather+segment-sum, csr_matmat_pass2 analogue) and the
    full ESC (expand+sort+compress all on device).  Recorded honestly:
    arbitrary-index gathers and sorts on this chip run near-scalar, so
    these trail the host kernels at config-2 sizes — the device path
    exists for jit-resident pipelines, not for eager host products."""
    import functools

    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst
    from csparse3_tpu.models.grids import connectivity, synthetic_grid
    from csparse3_tpu.ops import construct
    from csparse3_tpu.ops.spgemm import spgemm_symbolic

    g2 = synthetic_grid(3000, seed=1)
    Cf, Ct = connectivity(g2)
    A = Cf - Ct
    B = construct.transpose(A)
    plan = spgemm_symbolic(A, B)
    a0 = jnp.asarray(np.asarray(A.np_arrays()[2], np.float32))
    b0 = jnp.asarray(np.asarray(B.np_arrays()[2], np.float32))

    @functools.partial(jax.jit, static_argnums=2)
    def chain(a, b, R):
        def body(c, _):
            Cc = plan.numeric(c, b)
            s = 1.0 + 1e-12 * jnp.max(jnp.abs(Cc.data))
            return a * s, None

        o, _ = jax.lax.scan(body, a, None, length=R)
        return plan.numeric(o, b).data

    R1 = max(reps // 8, 1)
    c1 = chain.lower(a0, b0, R1).compile()
    c2 = chain.lower(a0, b0, reps).compile()
    per = None
    out = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(c1(a0, b0))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = np.asarray(c2(a0, b0))
        t2 = time.perf_counter() - t0
        d = (t2 - t1) / (reps - R1)
        if d > 0 and (per is None or d < per):
            per = d
    tpl = plan.template
    got = cst.CSC(A.m, A.m, tpl.np_arrays()[0], tpl.np_arrays()[1],
                  out).to_scipy().copy()
    As = A.to_scipy()
    ref = (As @ As.T).tocsc()
    rel = float(abs(got - ref).max() / max(abs(ref).max(), 1e-30))
    res = {"per": per, "reps": reps, "out_nnz": int(plan.out_nnz),
           "rel_err": rel, "correct": bool(rel < 1e-3)}

    # config-2 second case: random 10k x 10k, 0.1% density.  C = A A^T
    # rides the SYMMETRY-folded GramPlan (r5): products for the lower
    # triangle only, mirror composed into the host select maps — same
    # trick as the native host gram kernel it is compared against
    # (measured 1.2x over the generic plan; gathers are index-rate-bound)
    import scipy.sparse as sp

    from csparse3_tpu.ops.spgemm import gram_symbolic

    a10 = sp.random(10_000, 10_000, density=1e-3, format="csc",
                    random_state=np.random.RandomState(0))
    A10 = cst.CSC.from_scipy(a10)
    plan10 = gram_symbolic(A10)
    a1 = jnp.asarray(np.asarray(A10.np_arrays()[2], np.float32))

    @functools.partial(jax.jit, static_argnums=1)
    def chain10(a, R):
        def body(c, _):
            Cc = plan10.numeric(c)
            s = 1.0 + 1e-12 * jnp.max(jnp.abs(Cc.data))
            return a * s, None

        o, _ = jax.lax.scan(body, a, None, length=R)
        return plan10.numeric(o).data

    reps10 = max(reps // 4, 4)
    R1 = max(reps10 // 4, 1)
    c1 = chain10.lower(a1, R1).compile()
    c2 = chain10.lower(a1, reps10).compile()
    per10 = None
    out10 = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(c1(a1)[:8])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        out10 = np.asarray(c2(a1))
        t2 = time.perf_counter() - t0
        d = (t2 - t1) / (reps10 - R1)
        if d > 0 and (per10 is None or d < per10):
            per10 = d
    tpl10 = plan10.template
    got10 = cst.CSC(A10.m, A10.m, tpl10.np_arrays()[0],
                    tpl10.np_arrays()[1], out10).to_scipy().copy()
    ref10 = (a10 @ a10.T).tocsc()
    rel10 = float(abs(got10 - ref10).max() / max(abs(ref10).max(), 1e-30))
    res.update({"per10": per10, "out_nnz10": int(plan10.out_nnz),
                "rel_err10": rel10,
                "correct": bool(res["correct"] and rel10 < 1e-3)})
    # device-timeline per-op (stable across chip states, like the
    # spmv_bp kernel trace): wall measurements of this gather-bound
    # pass swing up to 6x with chip state
    try:
        import tempfile

        from csparse3_tpu.utils.roofline import device_trace_events

        td = tempfile.mkdtemp(prefix="spgemm_trace")
        with jax.profiler.trace(td):
            np.asarray(c2(a1)[:8])
        ev, dev = device_trace_events(td)
        loop = max((float(e.get("dur", 0.0)) for e in ev
                    if e.get("ph") == "X" and e.get("pid") in dev
                    and e.get("name", "").startswith("while")),
                   default=0.0)
        if loop:
            res["per10_dev"] = loop / reps10 / 1e6
    except Exception as e:  # noqa: BLE001
        res["trace_error"] = str(e)[:120]
    return res


def run_spgemm_bsr(reps: int):
    """On-chip BSR block-Gustavson SpGEMM (ops/bsr_ops.py::BSRMatMatPlan
    — bsr.h:249-316 register-blocking blueprint mapped to MXU batched
    einsum + segment-sum over block products).  This is the SpGEMM
    workload class the MXU is built for: 16384x16384, 32x32 blocks,
    ~6 block-nnz per block row.  Verified against scipy.sparse.bsr."""
    import functools

    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from csparse3_tpu.ops.bsr_ops import BSRMatMatPlan
    from csparse3_tpu.types import BSR

    Rb, nb_rows, bpr = 32, 512, 6
    n = nb_rows * Rb
    rng = np.random.RandomState(0)
    rowsb = np.repeat(np.arange(nb_rows), bpr)
    colsb = rng.randint(0, nb_rows, nb_rows * bpr)
    key = np.unique(rowsb * nb_rows + colsb)
    rowsb, colsb = key // nb_rows, key % nb_rows
    nblk = len(rowsb)
    data = rng.rand(nblk, Rb, Rb).astype(np.float32)
    indptr = np.searchsorted(rowsb, np.arange(nb_rows + 1))
    A = sp.bsr_matrix((data, colsb, indptr), shape=(n, n))
    t_sp = None
    for _ in range(2):
        t0 = time.perf_counter()
        Cs = A @ A
        dt = time.perf_counter() - t0
        t_sp = dt if t_sp is None else min(t_sp, dt)
    Ab = BSR(n, n, Rb, Rb, jnp.asarray(indptr.astype(np.int64)),
             jnp.asarray(colsb), jnp.asarray(data), nnz_blocks=nblk)
    plan = BSRMatMatPlan(Ab, Ab)
    d0 = jnp.asarray(data)

    @functools.partial(jax.jit, static_argnums=2)
    def chain(p, d, R):
        def body(dd, _):
            out = p.numeric(dd, dd)
            s = (1.0 + 1e-12 * jnp.max(jnp.abs(out.data))).astype(dd.dtype)
            return dd * s, None

        o, _ = jax.lax.scan(body, d, None, length=R)
        return p.numeric(o, o).data

    R1 = max(reps // 6, 1)
    c1 = chain.lower(plan, d0, R1).compile()
    c2 = chain.lower(plan, d0, reps).compile()
    per = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(c1(plan, d0)[:8])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(c2(plan, d0)[:8])
        t2 = time.perf_counter() - t0
        d = (t2 - t1) / (reps - R1)
        if d > 0 and (per is None or d < per):
            per = d
    # full-output download for verification, untimed (72 MB)
    got = np.asarray(c2(plan, d0))
    Cb = sp.bsr_matrix((got, np.asarray(plan.indices),
                        np.asarray(plan.indptr)), shape=(n, n)).tocsr()
    ref = Cs.tocsr()
    rel = float(abs(Cb - ref).max() / max(abs(ref).max(), 1e-30))
    return {"per": per, "reps": reps, "out_nnz": int(Cs.nnz),
            "scipy_t": t_sp, "rel_err": rel,
            "correct": bool(rel < 1e-3)}


def run_factor_scratch(reps: int, ng: int = 3000):
    """FROM-SCRATCH device LU with within-front partial pivoting
    (linalg.MultifrontalLU, VERDICT r3 item 5): host contributes only
    symbolic structure; the numeric factorization (incl. the pivot
    search) runs on chip.  Verified against scipy.splu's solution."""
    import functools

    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst
    from csparse3_tpu.linalg import MultifrontalLU
    from csparse3_tpu.models.grids import synthetic_grid

    g2 = synthetic_grid(ng, seed=1)
    bp = 1.0 / g2.x
    rows = np.concatenate([g2.f, g2.t, g2.f, g2.t])
    cols = np.concatenate([g2.f, g2.t, g2.t, g2.f])
    vals = np.concatenate([bp, bp, -bp, -bp])
    B = cst.add(cst.from_triplets(rows, cols, vals, (ng, ng)),
                cst.diags(np.full(ng, 3.0)))
    t0 = time.perf_counter()
    mf = MultifrontalLU.from_matrix(B)
    t_build = time.perf_counter() - t0
    data = jnp.asarray(np.asarray(B.np_arrays()[2], np.float32))
    b = jnp.asarray(np.random.RandomState(2).rand(ng).astype(np.float32))

    @functools.partial(jax.jit, static_argnums=3)
    def chain(p, d0, b, R):
        def body(d, _):
            _, stats = p.factor_piv(d)
            s = (1.0 + 1e-9 * stats["max_u"]).astype(d0.dtype)
            return d0 * s, None

        o, _ = jax.lax.scan(body, d0, None, length=R)
        fac, stats = p.factor_piv(o)
        return p.solve_piv(fac, b), stats["min_pivot"]

    R1 = max(reps // 6, 1)
    c1 = chain.lower(mf, data, b, R1).compile()
    c2 = chain.lower(mf, data, b, reps).compile()
    per = None
    got = minp = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(c1(mf, data, b)[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = c2(mf, data, b)
        got, minp = np.asarray(out[0]), float(out[1])
        t2 = time.perf_counter() - t0
        d = (t2 - t1) / (reps - R1)
        if d > 0 and (per is None or d < per):
            per = d
    import scipy.sparse.linalg as spla

    As = B.to_scipy().tocsc()
    bh = np.asarray(b, np.float64)
    xr = spla.spsolve(As, bh)
    fwd = float(np.abs(got.astype(np.float64) - xr).max()
                / np.abs(xr).max())
    res = float(np.linalg.norm(As @ got.astype(np.float64) - bh)
                / np.linalg.norm(bh))
    return {"per": per, "reps": reps, "n": ng, "build_s": t_build,
            "min_pivot": minp, "fwd_err": fwd, "rel_err": res,
            "correct": bool(res < 1e-3 and fwd < 1e-2)}


def run_factor_scratch10k(reps: int):
    return run_factor_scratch(reps, ng=10_000)


def run_refactor_general10k(reps: int):
    """Scale point for the multifrontal refactorization (10k nodes,
    ND): bucketed fronts keep the padded volume linear-ish (28.8M
    floats vs 314M unbucketed)."""
    return run_refactor_general(reps, ng=10_000)


def run_newton10k(reps: int):
    """Device Newton power flow at config-3 scale (~10k nodes, VERDICT
    r3 item 7): NewtonPowerFlow(solver='multifrontal') — per-iteration
    Jacobian refactorization as matmul extend-add fronts, level-
    scheduled solve, all inside one lax.while_loop.  Measured as a
    delta between two sequential-solve counts (each full Newton from
    flat start); gated on the power-flow mismatch of the final state
    rebuilt on host scipy."""
    import jax
    import jax.numpy as jnp

    from csparse3_tpu.models.grids import synthetic_grid, ybus
    from csparse3_tpu.models.powerflow import NewtonPowerFlow, sbus

    ng = 10_000
    g = synthetic_grid(ng, seed=3)
    t0 = time.perf_counter()
    # f32 device math: tol below the f32 mismatch floor (measured
    # ~3e-5 at 10k) would pin every solve at max_iter instead of
    # converging; the host-rebuilt gate below stays at 1e-4
    pf = NewtonPowerFlow(g, tol=5e-5, solver="multifrontal")
    t_build = time.perf_counter() - t0
    vm0 = jnp.asarray(g.vm0.astype(np.float64))
    va0 = jnp.zeros(ng)
    sb = sbus(g)
    sbr0, sbi0 = np.asarray(sb.real), np.asarray(sb.imag)
    # the plan state enters as a pytree ARGUMENT — static-self run bakes
    # the 10k index maps in as HLO literals and trips the tunnel's
    # remote-compile request limit (HTTP 413)
    run = jax.jit(NewtonPowerFlow.run_fn)

    def solves(R, seed):
        """R full Newton solves with slightly perturbed injections —
        every call converges from flat start; one download each."""
        rng = np.random.RandomState(seed)
        tot_it = 0
        worst = 0.0
        vm = va = None
        for i in range(R):
            f = 1.0 + 1e-4 * rng.rand(ng)
            vm, va, it, res, _bad = run(pf, vm0, va0,
                                        jnp.asarray(sbr0 * f),
                                        jnp.asarray(sbi0 * f))
            tot_it += int(it)
            worst = max(worst, float(res))
        return np.asarray(vm), np.asarray(va), tot_it, worst

    R1 = max(reps // 4, 1)
    solves(1, 0)  # compile + warm
    per = None
    got = None
    for t in range(3):
        t0 = time.perf_counter()
        solves(R1, 10 + t)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        got = solves(reps, 10 + t)
        t2 = time.perf_counter() - t0
        d = (t2 - t1) / (reps - R1)
        if d > 0 and (per is None or d < per):
            per = d
    vm, va, tot_it, worst = got
    # host oracle: AC mismatch of the device solution on scipy
    Y, _, _ = ybus(g)
    Ys = Y.to_scipy().tocsr()
    v = vm.astype(np.float64) * np.exp(1j * va.astype(np.float64))
    # the last perturbed injection the device solved against
    rng = np.random.RandomState(12)
    for _ in range(reps - 1):
        rng.rand(ng)
    f = 1.0 + 1e-4 * rng.rand(ng)
    sbp = (sbr0 + 1j * sbi0) * f
    mis = v * np.conj(Ys @ v) - sbp
    pvpq = np.concatenate([g.pv, g.pq])
    res = float(max(np.abs(mis.real[pvpq]).max(),
                    np.abs(mis.imag[g.pq]).max()))
    return {"per": per, "reps": reps, "n": ng, "build_s": t_build,
            "mean_iters": tot_it / reps, "rel_err": res,
            "correct": bool(res < 1e-4)}


def run_factor_shard(reps: int):
    """One config-5 SHARD factored on the real chip (VERDICT r3 item 1):
    the leading 125k rows of the RCM-ordered 1M-node B' (bandwidth
    ~2453, s=2560) — the per-chip work unit of the 8-way distributed 1M
    factorization, measured by the chained-delta method like
    run_factor_device."""
    import functools

    import jax
    import jax.numpy as jnp

    import csparse3_tpu as cst
    from csparse3_tpu.linalg.banded import BandedRefactor
    from csparse3_tpu.linalg.ordering import rcm
    from csparse3_tpu.models.grids import synthetic_grid

    N = 1_000_000
    g = synthetic_grid(N, seed=1)
    bp = 1.0 / g.x
    rows = np.concatenate([g.f, g.t, g.f, g.t])
    cols = np.concatenate([g.f, g.t, g.t, g.f])
    vals = np.concatenate([bp, bp, -bp, -bp])
    t0 = time.perf_counter()
    A0 = cst.add(cst.from_triplets(rows, cols, vals, (N, N)),
                 cst.diags(np.full(N, 3.0)))
    perm = rcm(A0)
    n = 125_000
    # MIDDLE shard: RCM level sets start narrow, so the leading shard's
    # bandwidth (~1265) under-represents the 8-way chunk work; the
    # middle of the order carries the full ~2453 band
    sub = perm[(N - n) // 2: (N + n) // 2]
    A = A0[sub, sub]
    t_build = time.perf_counter() - t0
    # force the GLOBAL block size: SPIKE sizes s from the full matrix's
    # max bandwidth (2453 -> 2560), not the shard's local ~1255
    t0 = time.perf_counter()
    rf = BandedRefactor.from_matrix(A, ordering=None, s=2560)
    t_sym = time.perf_counter() - t0
    data = jnp.asarray(np.asarray(A.np_arrays()[2], np.float32))
    b = jnp.asarray(np.random.RandomState(2).rand(n).astype(np.float32))

    @functools.partial(jax.jit, static_argnums=3)
    def chain(p, d0, b, R):
        def body(d, _):
            lu = p(d)
            s = 1.0 + 1e-9 * jnp.max(jnp.abs(lu._sinv))
            return d0 * s, None

        o, _ = jax.lax.scan(body, d0, None, length=R)
        return p(o)(b)

    R1 = max(reps // 6, 1)
    t0 = time.perf_counter()
    c1 = chain.lower(rf, data, b, R1).compile()
    c2 = chain.lower(rf, data, b, reps).compile()
    t_compile = time.perf_counter() - t0
    # 4 trials with a MEDIAN-of-positives pick: with only 2 trials a
    # download flake inflating the SHORT chain once flattered the delta
    # to 0.125 s/factor = 52.7 "TFLOPS" (above the chip's measured 31.3
    # peak — impossible)
    ds = []
    got = None
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(c1(rf, data, b))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        got = np.asarray(c2(rf, data, b))
        t2 = time.perf_counter() - t0
        d = (t2 - t1) / (reps - R1)
        if d > 0:
            ds.append(d)
    per = float(np.median(ds)) if ds else None
    spread = float(max(ds) / min(ds)) if len(ds) >= 2 else None
    As = A.to_scipy().tocsc()
    bh = np.asarray(b, np.float64)
    x = np.asarray(got, np.float64)
    res = float(np.linalg.norm(As @ x - bh) / np.linalg.norm(bh))
    from csparse3_tpu.utils.roofline import thomas_factor_flops

    nb_, s_ = rf._aux[2], rf._aux[1]
    return {"per": per, "spread": spread, "reps": reps, "n": n,
            "bw": int(rf._aux[3]),
            "s": int(s_), "build_s": t_build, "sym_s": t_sym,
            "compile_s": t_compile,
            "flops": thomas_factor_flops(nb_, s_),
            "rel_err": res, "correct": bool(res < 1e-3)}


def run_spike1m(reps: int):
    """Config-5 AT FULL SCALE on the ONE REAL CHIP (VERDICT r4 item 9):
    the 1M-node RCM-ordered B' factored+solved by StreamedSPIKE (chunk-
    rematerialized out-of-core SPIKE, linalg/spike_stream.py).  All 8
    chunks stream through the chip's HBM; ~6 GB transient per chunk
    visit.  Reports the warm factor+solve wall (both passes refactor
    every chunk — there is no retained factor state) and the residual
    rebuilt on host."""
    import jax  # noqa: F401

    import csparse3_tpu as cst
    from csparse3_tpu.linalg import StreamedSPIKE
    from csparse3_tpu.linalg.ordering import rcm
    from csparse3_tpu.models.grids import synthetic_grid

    N = 1_000_000
    t0 = time.perf_counter()
    g = synthetic_grid(N, seed=0)
    bp = 1.0 / g.x
    rows = np.concatenate([g.f, g.t, g.f, g.t])
    cols = np.concatenate([g.f, g.t, g.t, g.f])
    vals = np.concatenate([bp, bp, -bp, -bp])
    A0 = cst.add(cst.from_triplets(rows, cols, vals, (N, N)),
                 cst.diags(np.full(N, 3.0)))
    perm = rcm(A0)
    A = A0[perm, perm]
    t_build = time.perf_counter() - t0
    sk = StreamedSPIKE(A, P=8, ordering=None)
    b = np.random.RandomState(3).rand(N).astype(np.float32)
    t0 = time.perf_counter()
    x = sk(b)
    t_first = time.perf_counter() - t0
    b2 = np.random.RandomState(4).rand(N).astype(np.float32)
    per = None
    res = None
    for _ in range(max(reps, 1)):
        t0 = time.perf_counter()
        x = sk(b2)
        d = time.perf_counter() - t0
        if per is None or d < per:
            per = d
    a_sp = A.to_scipy().tocsr()
    res = float(np.linalg.norm(a_sp @ x.astype(np.float64) - b2)
                / np.linalg.norm(b2))
    return {"per": per, "first_s": t_first, "build_s": t_build,
            "n": N, "P": int(sk.P), "s": int(sk.s), "bw": int(sk.bw),
            "rel_err": res, "correct": bool(res < 1e-4)}


def run_mxu_f32(reps: int):
    """Achievable f32-('highest')-precision matmul FLOP/s — the compute
    roofline denominator for the MXU-bound solve sweeps."""
    import csparse3_tpu  # noqa: F401  (platform/env setup)
    from csparse3_tpu.utils.roofline import measure_mxu_f32

    return {"tflops": measure_mxu_f32(reps=reps) / 1e12}


def run_mxu_bf16(reps: int):
    """Single-pass (DEFAULT precision) matmul FLOP/s — the per-pass
    denominator for the split-precision one-hot dots."""
    import csparse3_tpu  # noqa: F401
    from csparse3_tpu.utils.roofline import measure_mxu_bf16

    return {"tflops": measure_mxu_bf16(reps=reps) / 1e12}


def run_vpu_f32(reps: int):
    """Elementwise VPU f32 op rate — the denominator for one-hot build
    (compare/select) streams."""
    import csparse3_tpu  # noqa: F401
    from csparse3_tpu.utils.roofline import measure_vpu_f32

    # mb=64: the 8-MB default's per-step compute (~45 us) sat below the
    # tunnel's download variance and the delta min once picked a
    # flattered pairing reading 59 Tops (impossible hardware-wise)
    return {"tops": measure_vpu_f32(mb=64, reps=max(reps, 256)) / 1e12}


def run_onehot_mix(reps: int):
    """One-hot build+select+reduce rate at the SpMV kernel's shapes."""
    import csparse3_tpu  # noqa: F401
    from csparse3_tpu.utils.roofline import measure_onehot_mix

    return {"telem": measure_onehot_mix(
        nt=3128, reps=max(reps, 512)) / 1e12}


def run_small_dot(reps: int):
    """3-part small one-hot dot FLOP/s at the kernel's shapes.

    nt=64 keeps the batch VMEM-resident (the kernel's dots never leave
    VMEM; a big batch measures HBM streaming instead — 11 TF vs 49.5);
    the 8192-deep chain keeps the delta far above download noise."""
    import csparse3_tpu  # noqa: F401
    from csparse3_tpu.utils.roofline import measure_small_dot

    return {"tflops": measure_small_dot(
        nt=64, reps=max(reps, 8192)) / 1e12}


def run_hbm_bw(reps: int):
    """Achievable HBM bandwidth of the attached chip (utils/roofline.py)
    — the denominator for every %-of-roofline metric below."""
    import csparse3_tpu  # noqa: F401  (platform/env setup)
    from csparse3_tpu.utils.roofline import measure_hbm_bw

    bw = measure_hbm_bw(mb=256, reps=max(reps, 16))
    return {"bw_bytes_per_s": bw, "bw_gbs": bw / 1e9}


def run_scipy_spmv(reps: int, n: int = 200_000):
    import csparse3_tpu as cst  # noqa: F401
    from csparse3_tpu.models.grids import synthetic_grid, ybus

    grid = synthetic_grid(n, seed=0)
    Y, _, _ = ybus(grid)
    ys = Y.to_scipy().tocsr()
    rng = np.random.RandomState(0)
    xh = (rng.rand(n) + 1j * rng.rand(n)).astype(np.complex128)
    ys @ xh
    t0 = time.perf_counter()
    for _ in range(reps):
        ys @ xh
    return {"t": (time.perf_counter() - t0) / reps, "nnz": int(Y.nnz)}


def run_spmv_small(reps: int):
    """50k-bus fallback: ~4x fewer upload bytes for degraded-tunnel days."""
    return run_spmv(reps, n=50_000)


def run_scipy_spmv_small(reps: int):
    return run_scipy_spmv(reps, n=50_000)


def run_spmv_pallas(reps: int):
    return run_spmv(reps, plan_kind="pallas")


def run_spmv_pallas_small(reps: int):
    return run_spmv(reps, n=50_000, plan_kind="pallas")


def run_spmv_bp(reps: int):
    return run_spmv(reps, plan_kind="bandpoints")


def run_spmv_bp_small(reps: int):
    return run_spmv(reps, n=50_000, plan_kind="bandpoints")


def run_solve10k(reps: int):
    """Config-3 scale via the block-Thomas path (BandedLU at 10k)."""
    return run_solve100k(reps, n=10_000)




def run_contingency(reps: int):
    """N-1 DC contingency screening rate: vmapped device refactor+solve
    per outage (models/contingency.py).  Verified against the host base
    solve; warm rate over `reps` outages."""
    import time as _time

    import numpy as np

    from csparse3_tpu.models.contingency import DCContingency
    from csparse3_tpu.models.grids import synthetic_grid

    g = synthetic_grid(1000, seed=4)
    ca = DCContingency(g)
    K = min(max(int(reps), 64), ca.n_branch)
    ks = np.arange(K)
    flows, theta, ok = ca.run(ks, batch=64)  # compile + warm
    t0 = _time.perf_counter()
    flows, theta, ok = ca.run(ks, batch=64)
    t = _time.perf_counter() - t0
    # correctness: non-islanding scenarios finite, and scenario 0 matches
    # a host-differential rebuild
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from csparse3_tpu.models.grids import SLACK

    n = g.n_bus
    keep = np.flatnonzero(np.asarray(g.bus_type) != SLACK)
    P = (np.asarray(g.pg) - np.asarray(g.pd))[keep]
    mask = np.ones(g.n_branch, bool); mask[0] = False
    f, t_, x = g.f[mask], g.t[mask], g.x[mask]
    bv = 1.0 / x
    rows = np.concatenate([f, t_, f, t_]); cols = np.concatenate([t_, f, f, t_])
    vals = np.concatenate([-bv, -bv, bv, bv])
    B = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsc()[keep][:, keep]
    th = np.zeros(n); th[keep] = spla.spsolve(B.tocsc(), P)
    ref = (th[g.f] - th[g.t]) / g.x; ref[0] = 0.0
    rel = float(np.abs(flows[0] - ref).max() / max(np.abs(ref).max(), 1e-12))
    return {"t": t, "K": int(K), "ok": int(ok.sum()), "rel_err": rel,
            "correct": rel < 5e-4}


def run_ac_contingency(reps: int):
    """Full-AC N-1 screening rate: vmapped device Newton per outage
    (models/contingency.ACContingency) with per-scenario Ybus value
    overrides.  Verified against a sequential host Newton on outage 1
    (the 111 scen/s r2 claim, now measured by the harness)."""
    import time as _time
    import warnings

    import numpy as np

    from csparse3_tpu.models.contingency import ACContingency
    from csparse3_tpu.models.grids import Grid, synthetic_grid

    g = synthetic_grid(500, seed=4)
    ca = ACContingency(g)
    K = min(max(int(reps), 64), ca.n_branch)
    ks = np.arange(K)
    vm, va, iters, ok = ca.run(ks, batch=64)  # compile + warm
    t0 = _time.perf_counter()
    vm, va, iters, ok = ca.run(ks, batch=64)
    t = _time.perf_counter() - t0
    # oracle: rebuild outage-1's grid on host (scipy) and check the AC
    # power-flow mismatch of the device solution — a residual gate that
    # never touches the device (host Newton would upload a complex
    # vector through SpMVPlan; complex transfers are UNIMPLEMENTED on
    # this attachment, BENCH_NOTES r2)
    from csparse3_tpu.models.grids import ybus
    from csparse3_tpu.models.powerflow import sbus

    k = 1
    mask = np.ones(g.n_branch, bool)
    mask[k] = False
    g2 = Grid(n_bus=g.n_bus, f=g.f[mask], t=g.t[mask], r=g.r[mask],
              x=g.x[mask], b=g.b[mask], tap=np.asarray(g.tap)[mask],
              bus_type=g.bus_type, pd=g.pd, qd=g.qd, pg=g.pg,
              vm0=g.vm0, gs=g.gs, bs=g.bs)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        Y2, _, _ = ybus(g2)
    Ys = Y2.to_scipy().tocsr()
    sb = np.asarray(sbus(g2))
    v = np.asarray(vm[k], np.float64) * np.exp(
        1j * np.asarray(va[k], np.float64))
    mis = v * np.conj(Ys @ v) - sb
    pvpq = np.concatenate([g2.pv, g2.pq])
    res = float(max(np.abs(mis.real[pvpq]).max() if pvpq.size else 0.0,
                    np.abs(mis.imag[g2.pq]).max() if g2.pq.size else 0.0))
    return {"t": t, "K": int(K), "ok": int(ok.sum()),
            "mean_iters": float(np.mean(iters)), "rel_err": res,
            "correct": bool(ok[k]) and res < 1e-3}


def run_lodf(reps: int):
    """LODF-based linear N-1 screening (models/sensitivity.py): one-time
    PTDF build (chunked multi-RHS device solves) then screening as a
    broadcasted axpy.  Verified against a host-differential rebuild of
    outage 0 (the same oracle as run_contingency)."""
    import time as _time

    import numpy as np

    from csparse3_tpu.models.grids import synthetic_grid
    from csparse3_tpu.models.sensitivity import LinearContingency

    g = synthetic_grid(2000, seed=4)
    t0 = _time.perf_counter()
    lin = LinearContingency(g)
    build_s = _time.perf_counter() - t0
    K = lin.n_branch
    ks = np.arange(K)
    flows, ok = lin.run(ks)  # compile + warm
    t0 = _time.perf_counter()
    flows, ok = lin.run(ks)
    t = _time.perf_counter() - t0

    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from csparse3_tpu.models.grids import SLACK

    n = g.n_bus
    keep = np.flatnonzero(np.asarray(g.bus_type) != SLACK)
    P = (np.asarray(g.pg) - np.asarray(g.pd))[keep]
    mask = np.ones(g.n_branch, bool); mask[0] = False
    f, t_, x = g.f[mask], g.t[mask], g.x[mask]
    bv = 1.0 / x
    rows = np.concatenate([f, t_, f, t_]); cols = np.concatenate([t_, f, f, t_])
    vals = np.concatenate([-bv, -bv, bv, bv])
    B = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsc()[keep][:, keep]
    th = np.zeros(n); th[keep] = spla.spsolve(B.tocsc(), P)
    ref = (th[g.f] - th[g.t]) / g.x; ref[0] = 0.0
    rel = float(np.abs(flows[0] - ref).max() / max(np.abs(ref).max(), 1e-12))
    return {"t": t, "K": int(K), "build_s": build_s, "ok": int(ok.sum()),
            "rel_err": rel, "correct": rel < 5e-4}


_KINDS = {
    "spmv": run_spmv,
    "solve10k": run_solve10k,
    "spmv_small": run_spmv_small,
    "spmv_pallas": run_spmv_pallas,
    "spmv_pallas_small": run_spmv_pallas_small,
    "spmv_bp": run_spmv_bp,
    "spmv_bp_small": run_spmv_bp_small,
    "hbm_bw": run_hbm_bw,
    "mxu_f32": run_mxu_f32,
    "mxu_bf16": run_mxu_bf16,
    "vpu_f32": run_vpu_f32,
    "onehot_mix": run_onehot_mix,
    "small_dot": run_small_dot,
    "scipy_spmv_small": run_scipy_spmv_small,
    "lusolve": run_lusolve,
    "solve100k": run_solve100k,
    "factor10k": run_factor_device,
    "factor100k": run_factor100k,
    "refactor": run_refactor,
    "refactor_general": run_refactor_general,
    "refactor_general10k": run_refactor_general10k,
    "newton10k": run_newton10k,
    "factor_shard": run_factor_shard,
    "spike1m": run_spike1m,
    "factor_scratch": run_factor_scratch,
    "factor_scratch10k": run_factor_scratch10k,
    "spgemm": run_spgemm,
    "spgemm_tpu": run_spgemm_tpu,
    "spgemm_bsr": run_spgemm_bsr,
    "contingency": run_contingency,
    "ac_contingency": run_ac_contingency,
    "lodf": run_lodf,
    "scipy_spmv": run_scipy_spmv,
}


def _sub(kind, reps, timeout=300, attempts=3):
    err = "unknown"
    for a in range(attempts):
        print(f"[bench] {kind} reps={reps} (attempt {a}) ...",
              file=sys.stderr, flush=True)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--kind", kind,
                 str(reps)],
                capture_output=True, text=True, timeout=timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            for line in reversed(r.stdout.strip().splitlines()):
                if line.startswith("{"):
                    return json.loads(line)
            raise RuntimeError(f"rc={r.returncode}: {r.stderr[-160:]}")
        except Exception as e:  # noqa: BLE001
            err = str(e)[:160]
            print(f"[bench] {kind} reps={reps} FAILED: {err}",
                  file=sys.stderr, flush=True)
            # a crashed TPU worker needs time to restart
            time.sleep(90 if "UNAVAILABLE" in err else 15)
    return {"error": err}


def main():
    extra = {}

    # candidate plans, best-first: Pallas band kernel, then the XLA scan
    # plan; 200k-bus first, 50k fallback for degraded-tunnel days
    # the dense-range DIA plan is not a candidate at 200k: its slabs are
    # ~3 GB there (200x redundancy) and the upload alone can outlast the
    # subprocess budget on a degraded tunnel
    candidates = [  # (kind, scipy twin, fallback tag, reps)
        ("spmv_bp", "scipy_spmv", None, 2560),
        ("spmv_bp_small", "scipy_spmv_small", "50k", 2560),
        ("spmv_small", "scipy_spmv_small", "50k", 1280),
    ]
    per_spmv, a, scipy_kind = None, {}, "scipy_spmv"
    fail_log = {}
    for kind, sck, fb, r2 in candidates:
        a = _sub(kind, r2, timeout=600, attempts=2)
        per = a.get("per")
        if a.get("correct") is False:
            a.setdefault("error", f"wrong result (rel_err={a.get('rel_err')})")
            per = None
        if not per:
            fail_log[kind] = str(a.get("error", "no delta"))
        if per:
            per_spmv, scipy_kind = per, sck
            if fb:
                extra["spmv_fallback"] = fb
            extra["spmv_plan"] = kind
            break
    spmv_bytes = a.get("bytes_per_op") if per_spmv else None
    if per_spmv:
        extra["spmv_t_s"] = per_spmv
        extra["spmv_nnz"] = a["nnz"]
        extra["device"] = a.get("device", "?")
    else:
        extra["spmv_error"] = str(a.get("error", "no delta"))
    if fail_log:
        extra["spmv_rejected"] = fail_log

    # measured achievable HBM bandwidth -> % of roofline for the
    # bandwidth-bound kernels (BASELINE.md "% of per-chip roofline")
    bwp = _sub("hbm_bw", 64)
    hbm_bw = bwp.get("bw_bytes_per_s") or 0.0
    # v5e HBM spec is 819 GB/s; a reading above it is a wall-clock flake
    # (one run recorded 1003).  Retry, keep the conservative minimum,
    # and HARD-CAP at spec — a >spec denominator would overstate every
    # %-of-roofline field no matter how many retries flaked high.
    if hbm_bw > 850e9:
        extra["hbm_bw_implausible_gbs"] = round(hbm_bw / 1e9, 1)
        bwp2 = _sub("hbm_bw", 64)
        hbm_bw = min(hbm_bw, bwp2.get("bw_bytes_per_s") or hbm_bw)
        if hbm_bw > 850e9:
            hbm_bw = 819e9
            extra["hbm_bw_capped"] = True
    if hbm_bw:
        extra["hbm_bw_gbs"] = hbm_bw / 1e9
        if per_spmv and spmv_bytes:
            extra["spmv_pct_roofline"] = round(
                100.0 * (spmv_bytes / per_spmv) / hbm_bw, 1)
    else:
        extra["hbm_bw_error"] = str(bwp.get("error", "?"))

    mx = _sub("mxu_f32", 32)
    mxu_fs = (mx.get("tflops") or 0.0) * 1e12
    if mxu_fs:
        extra["mxu_f32_tflops"] = round(mxu_fs / 1e12, 2)
    else:
        extra["mxu_f32_error"] = str(mx.get("error", "?"))

    # binding-resource roofline for the points-dominated SpMV kernel
    # (VERDICT r3 item 2): the wash is one-hot MXU contractions with VPU
    # compare/select builds — %-of-HBM misstates a compute-bound kernel
    mb16 = _sub("mxu_bf16", 64)
    mxu_bf = (mb16.get("tflops") or 0.0) * 1e12
    if mxu_bf:
        extra["mxu_bf16_tflops"] = round(mxu_bf / 1e12, 2)
    vp = _sub("vpu_f32", 64)
    vpu_rate = (vp.get("tops") or 0.0) * 1e12
    if vpu_rate:
        extra["vpu_f32_tops"] = round(vpu_rate / 1e12, 3)
    oh = _sub("onehot_mix", 256)
    oh_rate = (oh.get("telem") or 0.0) * 1e12
    if oh_rate:
        extra["onehot_mix_telem"] = round(oh_rate / 1e12, 2)
    sd = _sub("small_dot", 256)
    sd_rate = (sd.get("tflops") or 0.0) * 1e12
    if sd_rate:
        extra["small_dot_tflops"] = round(sd_rate / 1e12, 1)
    bm = a.get("binding_model") if per_spmv else None
    if bm and vpu_rate and mxu_bf:
        # peak-rate decomposition (transparency)
        t_vpu = bm["vpu_ops"] / vpu_rate
        t_mxu = 2.0 * bm["mxu_macs"] / mxu_bf
        t_hbm = bm["hbm_bytes"] / hbm_bw if hbm_bw else 0.0
        extra["spmv_model_vpu_us"] = round(t_vpu * 1e6, 1)
        extra["spmv_model_mxu_us"] = round(t_mxu * 1e6, 1)
        extra["spmv_model_hbm_us"] = round(t_hbm * 1e6, 1)
        kus = a.get("kernel_us")
        if kus:
            extra["spmv_kernel_us"] = round(kus, 1)
            if a.get("devloop_us"):
                extra["spmv_scaffold_us"] = round(
                    a["devloop_us"] - kus, 1)
        if a.get("bound_traced_us") and kus:
            # SAME-timebase binding fraction (r5): op counts priced at
            # DEVICE-TIMELINE substrate rates over the device-timeline
            # kernel time.  Wall-clock substrate rates swing with chip
            # state while traced times are stable, so mixing timebases
            # made the fraction inherit the rig's variance (r4 weak #6)
            bound = a["bound_traced_us"] / 1e6 + t_hbm
            extra["spmv_bound_us"] = round(bound * 1e6, 1)
            extra["spmv_pct_binding"] = round(
                100.0 * bound * 1e6 / kus, 1)
            if a.get("onehot_traced_telem"):
                extra["onehot_traced_telem"] = round(
                    a["onehot_traced_telem"], 2)
            if a.get("small_dot_traced_tflops"):
                extra["small_dot_traced_tflops"] = round(
                    a["small_dot_traced_tflops"], 1)
            extra["spmv_pct_binding_wall"] = round(
                100.0 * bound / per_spmv, 1)
        elif oh_rate and sd_rate:
            # fallback: wall-measured substrate rates (the r4 scheme)
            t_oh = (bm["vpu_ops"] / 2.0) / oh_rate
            t_sd = 2.0 * bm["mxu_macs"] / sd_rate
            bound = t_oh + t_sd + t_hbm
            extra["spmv_bound_us"] = round(bound * 1e6, 1)
            if kus:
                extra["spmv_pct_binding"] = round(
                    100.0 * bound * 1e6 / kus, 1)
            extra["spmv_pct_binding_wall"] = round(
                100.0 * bound / per_spmv, 1)
            if not kus:
                extra["spmv_pct_binding"] = extra[
                    "spmv_pct_binding_wall"]

    sc = _sub(scipy_kind, 5)
    if "error" not in sc:
        extra["spmv_scipy_t_s"] = sc["t"]

    a = _sub("lusolve", 96, timeout=900)
    per_solve = a.get("per")
    if a.get("correct") is False:
        per_solve = None
        a.setdefault("error", f"wrong result (rel_err={a.get('rel_err')})")
    if per_solve:
        extra["lu_solve_rhs_per_s"] = 1024 / per_solve
        extra["lu_fill_nnz"] = a["fill"]
        extra["lu_factor_s"] = a["factor_s"]
        extra["lu_solve_nnz_per_s"] = a["fill"] * 1024 / per_solve
    else:
        extra["lusolve_error"] = str(a.get("error", "no delta"))

    a = _sub("solve10k", 192, timeout=900)
    per_10k = a.get("per")
    if a.get("correct") is False:
        per_10k = None
        a.setdefault("error", f"wrong result (rel_err={a.get('rel_err')})")
    if per_10k:
        extra["solve10k_rhs_per_s"] = 1024 / per_10k
        extra["solve10k_factor_s"] = a["factor_s"]
    else:
        extra["solve10k_error"] = str(a.get("error", "no delta"))

    a = _sub("solve100k", 192, timeout=900, attempts=2)
    per_100k = a.get("per")
    if a.get("correct") is False:
        per_100k = None
        a.setdefault("error", f"wrong result (rel_err={a.get('rel_err')})")
    if per_100k:
        extra["solve100k_rhs_per_s"] = 1024 / per_100k
        extra["solve100k_factor_s"] = a["factor_s"]
        for k in ("factor_sym_s", "factor_compile_s", "factor_exec_s",
                  "factor_exec_spread"):
            if k in a:
                extra[f"solve100k_{k}"] = a[k]
        extra["solve100k_bw"] = a["bw"]
        if hbm_bw and a.get("bytes_per_op"):
            extra["solve100k_pct_roofline"] = round(
                100.0 * (a["bytes_per_op"] / per_100k) / hbm_bw, 1)
        if mxu_fs and a.get("flops_per_op"):
            # the sweeps are compute-bound at 'highest' precision: the
            # honest roofline is the measured f32-matmul peak
            extra["solve100k_pct_mxu"] = round(
                100.0 * (a["flops_per_op"] / per_100k) / mxu_fs, 1)
    else:
        extra["solve100k_error"] = str(a.get("error", "no delta"))

    for kind, tag in (("factor10k", "factor10k"), ("factor100k",
                                                   "factor100k")):
        # physical-sanity retry (VERDICT r4 weak #3): a chained-delta
        # flake once recorded 479 "TFLOPS" on a 31-TFLOPS chip; any
        # implied rate above 1.2x the measured matmul peak is discarded
        # outright, and two plausible readings get the house
        # min-unless-2x-disagreement convention (the flake mode
        # FLATTERS, so disagreeing trials report the slower one)
        cands = []
        implausible = []
        a = {}
        for _attempt in range(3):
            a = _sub(kind, 12, timeout=900, attempts=2)
            cand = a.get("per")
            if a.get("correct") is False:
                a.setdefault("error",
                             f"wrong result (rel_err={a.get('rel_err')},"
                             f" fwd={a.get('fwd_err')})")
                continue
            if cand and a.get("flops") and mxu_fs and \
                    a["flops"] / cand > 1.2 * mxu_fs:
                implausible.append(cand)
                continue
            if cand:
                cands.append(cand)
            if len(cands) == 2:
                break
        if implausible:
            extra[f"{tag}_implausible_s"] = implausible
        per_f = None
        if cands:
            spread = max(cands) / min(cands)
            per_f = min(cands) if spread <= 2.0 else max(cands)
            extra[f"{tag}_spread"] = round(spread, 2)
        if per_f:
            extra[f"{tag}_device_s"] = per_f
            extra[f"{tag}_sym_s"] = a["sym_s"]
            if a.get("flops"):
                extra[f"{tag}_tflops"] = round(a["flops"] / per_f / 1e12, 2)
            if "fwd_err" in a:
                extra[f"{tag}_fwd_err"] = a["fwd_err"]
        else:
            extra[f"{tag}_error"] = str(a.get("error",
                                              "no plausible delta"))

    # refactor: min over TWO fresh subprocesses with a spread bound —
    # a headline metric is only recorded when the two runs agree within
    # 2x (the r1->r2 runs disagreed by 100x; see VERDICT r2 weak #3)
    rf_runs = []
    a = {}
    for _ in range(2):
        a = _sub("refactor", 60)
        if a.get("correct") is False:
            a.setdefault("error",
                         f"wrong result (rel_err={a.get('rel_err')})")
            continue
        if a.get("per"):
            rf_runs.append(a["per"])
    if rf_runs:
        spread = max(rf_runs) / min(rf_runs)
        # disagreeing trials: report the CONSERVATIVE (slower) one — a
        # noise-flattered min is worse than an honest slow number
        per_rf = min(rf_runs) if spread <= 2.0 else max(rf_runs)
        extra["refactor_per_s"] = 1.0 / per_rf
        extra["refactor_spread"] = round(spread, 2)
        if spread > 2.0:
            extra["refactor_unstable"] = True
    else:
        extra["refactor_error"] = str(a.get("error", "no delta"))

    a = _sub("contingency", 256)
    if a.get("correct") and a.get("t"):
        extra["contingency_per_s"] = a["K"] / a["t"]
    else:
        extra["contingency_error"] = str(a.get("error", a.get("rel_err", "?")))

    a = _sub("ac_contingency", 256, timeout=600)
    if a.get("correct") and a.get("t"):
        extra["ac_contingency_per_s"] = a["K"] / a["t"]
    else:
        extra["ac_contingency_error"] = str(
            a.get("error", a.get("rel_err", "?")))

    a = _sub("lodf", 1, timeout=600)
    if a.get("correct") and a.get("t"):
        extra["lodf_per_s"] = a["K"] / a["t"]
        extra["lodf_build_s"] = a["build_s"]
    else:
        extra["lodf_error"] = str(a.get("error", a.get("rel_err", "?")))

    # general-refactor kinds get the same min-of-two-subprocess + spread
    # treatment as `refactor` (VERDICT r3 item 4: 3.3x driver-vs-local
    # swings): disagreeing trials report the CONSERVATIVE (slower) one
    # chains deep enough that the in-process delta dwarfs download
    # noise (24-deep at 3.6 ms/op read anywhere from 0.16 to 9.4 ms);
    # residual spread is genuine tunnel-state dispatch variance
    for kind, reps_k in (("refactor_general", 96),
                         ("refactor_general10k", 48)):
        runs = []
        a = {}
        for _ in range(2):
            a = _sub(kind, reps_k, timeout=600)
            if a.get("correct") is False:
                a.setdefault("error",
                             f"wrong result (rel_err={a.get('rel_err')})")
                continue
            if a.get("per"):
                runs.append(a["per"])
        if runs:
            spread = max(runs) / min(runs)
            per_k = min(runs) if spread <= 2.0 else max(runs)
            extra[f"{kind}_per_s"] = 1.0 / per_k
            extra[f"{kind}_spread"] = round(spread, 2)
            if "build_s" in a:
                extra[f"{kind}_build_s"] = a["build_s"]
            if spread > 2.0:
                extra[f"{kind}_unstable"] = True
        else:
            extra[f"{kind}_error"] = str(
                a.get("error", a.get("rel_err", "?")))

    a = _sub("newton10k", 8, timeout=900, attempts=2)
    if a.get("correct") and a.get("per"):
        extra["newton10k_per_s"] = 1.0 / a["per"]
        extra["newton10k_mean_iters"] = a["mean_iters"]
        extra["newton10k_build_s"] = a["build_s"]
    else:
        extra["newton10k_error"] = str(a.get("error",
                                             a.get("rel_err", "?")))

    for kind, reps_k in (("factor_scratch", 24),
                         ("factor_scratch10k", 12)):
        a = _sub(kind, reps_k, timeout=900, attempts=2)
        if a.get("correct") and a.get("per"):
            extra[f"{kind}_per_s"] = 1.0 / a["per"]
            extra[f"{kind}_fwd_err"] = a["fwd_err"]
        else:
            extra[f"{kind}_error"] = str(a.get("error",
                                               a.get("rel_err", "?")))

    a = _sub("factor_shard", 8, timeout=900, attempts=2)
    if a.get("correct") and a.get("per"):
        extra["factor_shard_device_s"] = a["per"]
        extra["factor_shard_bw"] = a["bw"]
        extra["factor_shard_s"] = a["s"]
        if a.get("spread"):
            # within-subprocess trial spread (median-of-4 pick); >2x is
            # the same chip-state instability flag as refactor's
            extra["factor_shard_spread"] = round(a["spread"], 2)
            if a["spread"] > 2.0:
                extra["factor_shard_unstable"] = True
        if a.get("flops"):
            extra["factor_shard_tflops"] = round(
                a["flops"] / a["per"] / 1e12, 2)
    else:
        extra["factor_shard_error"] = str(a.get("error",
                                                a.get("rel_err", "?")))

    # config-5 at FULL scale on the real chip: 1M factor+solve via the
    # chunk-rematerialized StreamedSPIKE (2 solves; host build ~60 s +
    # compile ~90 s inside the subprocess budget)
    a = _sub("spike1m", 2, timeout=900, attempts=2)
    if a.get("correct") and a.get("per"):
        extra["factor_1m_real_s"] = round(a["per"], 2)
        extra["spike1m_first_s"] = round(a["first_s"], 1)
        extra["spike1m_s"] = a["s"]
        extra["solve_1m_real_resid"] = a["rel_err"]
    else:
        extra["spike1m_error"] = str(a.get("error",
                                           a.get("rel_err", "?")))

    gm = _sub("spgemm", 9)
    if "error" not in gm and gm.get("correct", True):
        extra["spgemm_out_nnz"] = gm["out_nnz"]
        extra["spgemm_nnz_per_s"] = gm["out_nnz"] / gm["t"]
        extra["spgemm_cold_nnz_per_s"] = gm["out_nnz"] / gm["t_cold"]
        extra["spgemm_scipy_nnz_per_s"] = gm["out_nnz"] / gm["scipy_t"]
        if "t_10k" in gm:  # BASELINE config-2: random 10k, 0.1% density
            extra["spgemm10k_nnz_per_s"] = gm["out_nnz_10k"] / gm["t_10k"]
            extra["spgemm10k_cold_nnz_per_s"] = (
                gm["out_nnz_10k"] / gm["t_10k_cold"])
            extra["spgemm10k_scipy_nnz_per_s"] = (
                gm["out_nnz_10k"] / gm["scipy_t_10k"])
    elif "error" in gm:
        extra["spgemm_error"] = str(gm["error"])

    # two fresh subprocesses with the min-unless-2x rule (the 10k case
    # is gather-rate-bound and one run measured a 6x chip-state
    # collapse while the SAME subprocess's Pallas 3k case was fast)
    runs3k, runs10k = [], []
    dev10 = []
    gm = {}
    for _ in range(2):
        gm = _sub("spgemm_tpu", 64, timeout=600)
        if gm.get("correct") and gm.get("per"):
            runs3k.append(gm["out_nnz"] / gm["per"])
            if gm.get("per10"):
                runs10k.append(gm["out_nnz10"] / gm["per10"])
            if gm.get("per10_dev"):
                dev10.append(gm["out_nnz10"] / gm["per10_dev"])
    if dev10:
        extra["spgemm_tpu10k_dev_nnz_per_s"] = max(dev10)
    if runs3k:
        sp3 = max(runs3k) / min(runs3k)
        extra["spgemm_tpu_nnz_per_s"] = (
            max(runs3k) if sp3 <= 2.0 else min(runs3k))
        extra["spgemm_tpu_spread"] = round(sp3, 2)
    else:
        extra["spgemm_tpu_error"] = str(gm.get("error",
                                               gm.get("rel_err", "?")))
    if runs10k:
        sp10 = max(runs10k) / min(runs10k)
        # rates: the conservative pick under disagreement is the LOWER
        extra["spgemm_tpu10k_nnz_per_s"] = (
            max(runs10k) if sp10 <= 2.0 else min(runs10k))
        extra["spgemm_tpu10k_spread"] = round(sp10, 2)
        if sp10 > 2.0:
            extra["spgemm_tpu10k_unstable"] = True

    gm = _sub("spgemm_bsr", 12, timeout=600)
    if gm.get("correct") and gm.get("per"):
        extra["spgemm_bsr_nnz_per_s"] = gm["out_nnz"] / gm["per"]
        extra["spgemm_bsr_scipy_nnz_per_s"] = gm["out_nnz"] / gm["scipy_t"]
    else:
        extra["spgemm_bsr_error"] = str(gm.get("error",
                                               gm.get("rel_err", "?")))

    # chip-state drift marker (VERDICT r4 item 4): the same substrate
    # probe that opened the run, re-measured at the end — wobbly kinds
    # correlate with the drift between these two numbers, separating
    # "code got slower" from "chip state changed mid-run"
    mx2 = _sub("mxu_f32", 32)
    if mx2.get("tflops"):
        extra["mxu_f32_tflops_end"] = round(mx2["tflops"], 2)
        if mxu_fs:
            extra["chip_state_drift"] = round(
                mx2["tflops"] * 1e12 / mxu_fs, 3)

    nnz = extra.get("spmv_nnz", 0)
    spmv_nnz_s = nnz / extra["spmv_t_s"] if "spmv_t_s" in extra else 0.0
    t_sp = extra.get("spmv_scipy_t_s")
    vs = spmv_nnz_s / (nnz / t_sp) if (t_sp and nnz and spmv_nnz_s) else 0.0

    # Full extras go to a FILE and a non-final line; the LAST stdout line
    # is a compact JSON guaranteed to fit in the driver's tail-capture
    # window (r4 regression: the 60-field single-line JSON outgrew the
    # window and the driver recorded parsed=null).
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_extra.json"), "w") as fh:
            json.dump(extra, fh, indent=1)
    except OSError:
        pass
    print(json.dumps({"full_extra": extra}), flush=True)
    headline_keys = (
        "spmv_plan", "device", "spmv_pct_roofline", "spmv_pct_binding",
        "hbm_bw_gbs", "mxu_f32_tflops", "lu_solve_rhs_per_s",
        "solve100k_rhs_per_s", "solve100k_factor_s", "factor100k_tflops",
        "factor_shard_tflops", "factor_shard_spread", "refactor_per_s",
        "refactor_general10k_per_s", "refactor_general10k_spread",
        "spgemm_nnz_per_s", "spgemm_tpu_nnz_per_s",
        "spgemm10k_nnz_per_s", "spgemm_tpu10k_nnz_per_s",
        "spgemm_tpu10k_dev_nnz_per_s",
        "spmv_1m_real_s", "factor_1m_real_s", "solve_1m_real_resid",
    )
    def _short(v):
        return float(f"{v:.5g}") if isinstance(v, float) else v

    compact = {k: _short(extra[k]) for k in headline_keys if k in extra}
    compact["extra_file"] = "BENCH_extra.json"
    print(json.dumps({
        "metric": "spmv_nnz_per_s",
        "value": spmv_nnz_s,
        "unit": "nnz/s",
        "vs_baseline": vs,
        "extra": compact,
    }), flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--kind":
        print(json.dumps(_KINDS[sys.argv[2]](int(sys.argv[3]))))
    else:
        main()
