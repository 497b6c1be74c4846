"""Chip microbench: gather/scatter substrates for SpGEMM/SpMV redesign.

Variants, each timed as a jitted scan chain delta (R vs R/4):
  take      y = v[idx]                        (arbitrary scalar gather)
  rowgather V2[idx//K] then one-hot select    (contiguous K-row gather + VPU)
  segsum    segment_sum(vals, sorted ids)     (the SpGEMM compress)
  scatter   zeros.at[ids].add(vals)           (unsorted scatter-add)
"""
import functools, sys, time
import numpy as np
import jax, jax.numpy as jnp

E = 1 << 17
K = 128
rng = np.random.RandomState(0)
v0 = jnp.asarray(rng.rand(E).astype(np.float32))

def bench(fn, args, R=512, label=""):
    @functools.partial(jax.jit, static_argnums=1)
    def chain(a, RR):
        def body(c, _):
            y = fn(c, *args[1:])
            s = 1.0 + 1e-12 * jnp.max(jnp.abs(y))
            return c * s, None
        o, _ = jax.lax.scan(body, a, None, length=RR)
        return fn(o, *args[1:])
    R1 = max(R // 4, 1)
    c1 = chain.lower(args[0], R1).compile()
    c2 = chain.lower(args[0], R).compile()
    per = None
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(c1(args[0])[:8]); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(c2(args[0])[:8]); t2 = time.perf_counter() - t0
        d = (t2 - t1) / (R - R1)
        if d > 0 and (per is None or d < per):
            per = d
    print(f"{label}: {per*1e6:.1f} us", flush=True)
    return per

for T in (16384, 262144, 1048576):
    idx = jnp.asarray(rng.randint(0, E, T).astype(np.int32))
    q, r = idx // K, idx % K
    iota = jnp.arange(K, dtype=jnp.int32)
    sids = jnp.asarray(np.sort(rng.randint(0, max(T // 8, 1), T)).astype(np.int32))
    uids = jnp.asarray(rng.randint(0, max(T // 8, 1), T).astype(np.int32))
    vals = jnp.asarray(rng.rand(T).astype(np.float32))
    S = int(max(T // 8, 1))

    per = bench(lambda v: v[idx], (v0,), label=f"T={T} take")
    print(f"   -> {T/per/1e6:.1f} M elem/s", flush=True)
    def rowg(v):
        V2 = v.reshape(E // K, K)
        Vq = V2[q]
        return jnp.sum(Vq * (iota[None, :] == r[:, None]), axis=1)
    per = bench(rowg, (v0,), label=f"T={T} rowgather+select")
    print(f"   -> {T/per/1e6:.1f} M elem/s", flush=True)
    def rowg_dyn(v):
        V2 = v.reshape(E // K, K)
        Vq = jnp.take(V2, q, axis=0)
        return jnp.take_along_axis(Vq, r[:, None], axis=1)[:, 0]
    per = bench(rowg_dyn, (v0,), label=f"T={T} rowgather+takealong")
    print(f"   -> {T/per/1e6:.1f} M elem/s", flush=True)
    per = bench(lambda w: jax.ops.segment_sum(w, sids, num_segments=S),
                (vals,), label=f"T={T} segsum(sorted)")
    print(f"   -> {T/per/1e6:.1f} M elem/s", flush=True)
    per = bench(lambda w: jnp.zeros(S, w.dtype).at[uids].add(w),
                (vals,), label=f"T={T} scatter-add")
    print(f"   -> {T/per/1e6:.1f} M elem/s", flush=True)
    # one-hot scatter: sorted segments as (S, T) matmul is too big; skip
