"""Measured overlap / collective cost of dist_spmv (VERDICT r4 item 7).

The 8-device CPU-mesh strong-scaling proxy reads ~0.4x; the scaling
model (probes/scaling_model.py) asserts >=86% 8-chip ICI efficiency but
prices SpMV comm "counted unoverlapped".  This probe replaces the
assumption with data: a jax.profiler timeline of the 100k ring-halo
SpMV chain on the virtual 8-device CPU mesh, attributing device time to
collective-permute vs compute, per device.

Run:  PYTHONPATH= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python probes/trace_dist_spmv.py
"""

from __future__ import annotations

import functools
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(R=40):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import csparse3_tpu as cst
    from csparse3_tpu.linalg.ordering import rcm
    from csparse3_tpu.models.grids import synthetic_grid
    from csparse3_tpu.parallel import dist_spmv, partition_rows

    devs = jax.devices()
    n_dev = len(devs)
    N = 100_000
    gg = synthetic_grid(N, seed=1)
    bp = 1.0 / gg.x
    rws = np.concatenate([gg.f, gg.t, gg.f, gg.t])
    cls = np.concatenate([gg.f, gg.t, gg.t, gg.f])
    vls = np.concatenate([bp, bp, -bp, -bp])
    A0 = cst.add(cst.from_triplets(rws, cls, vls, (N, N)),
                 cst.diags(np.full(N, 3.0)))
    perm = rcm(A0)
    A = A0[perm, perm]
    mesh = Mesh(np.array(devs), ("rows",))
    part = partition_rows(A, n_dev)
    print(f"partition: {part.strategy} k={part.k}")
    x = jnp.asarray(np.linspace(0.0, 1.0, N, dtype=np.float32))

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def chain(p, x0, mesh_in, R):
        def body(c, _):
            yy = dist_spmv(p, c, mesh_in)[: c.shape[0]]
            return yy / jnp.max(jnp.abs(yy)), None

        o, _ = jax.lax.scan(body, x0, None, length=R)
        return o

    jax.block_until_ready(chain(part, x, mesh, R))
    t0 = time.perf_counter()
    jax.block_until_ready(chain(part, x, mesh, R))
    wall = (time.perf_counter() - t0) / R
    td = f"/tmp/trace_dist_{int(time.time())}"
    with jax.profiler.trace(td):
        jax.block_until_ready(chain(part, x, mesh, R))

    paths = sorted(glob.glob(f"{td}/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    pid_name = {e.get("pid"): str(e.get("args", {}).get("name", ""))
                for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"}
    from collections import defaultdict

    per_dev = defaultdict(lambda: defaultdict(float))
    for e in ev:
        if e.get("ph") != "X":
            continue
        nm_dev = pid_name.get(e.get("pid"), "")
        if "TFRT" not in nm_dev and "CPU" not in nm_dev \
                and "TPU" not in nm_dev:
            continue
        nm = e.get("name", "")
        cat = ("collective" if ("collective" in nm or "permute" in nm
                                or "all-gather" in nm or "psum" in nm
                                or "all-reduce" in nm)
               else "infeed" if "infeed" in nm
               else "compute")
        per_dev[nm_dev][cat] += float(e.get("dur", 0.0))
    print(f"\nwall {wall*1e6:.0f} us/op over {R}-step chain, "
          f"{n_dev} devices")
    tot_comp = tot_coll = 0.0
    for dvn in sorted(per_dev):
        row = per_dev[dvn]
        c, co = row.get("compute", 0.0) / R, row.get("collective", 0.0) / R
        tot_comp += c
        tot_coll += co
        print(f"  {dvn[:40]:42s} compute {c:8.1f} us/op   "
              f"collective {co:8.1f} us/op")
    if tot_comp + tot_coll:
        print(f"\nmean/device: compute {tot_comp/max(n_dev,1):.1f} us/op, "
              f"collective {tot_coll/max(n_dev,1):.1f} us/op "
              f"({100*tot_coll/(tot_comp+tot_coll):.0f}% of device time "
              f"is collectives)")
    # top individual ops for attribution
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in ev:
        if e.get("ph") == "X" and pid_name.get(e.get("pid"), ""):
            agg[e.get("name", "?")] += float(e.get("dur", 0.0))
            cnt[e.get("name", "?")] += 1
    print("\ntop ops (all devices, us/op):")
    for nm, v in sorted(agg.items(), key=lambda kv: -kv[1])[:14]:
        print(f"  {v/R:9.1f}  x{cnt[nm]:6d}  {nm[:80]}")


if __name__ == "__main__":
    main()
