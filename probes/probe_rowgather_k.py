"""K sweep for the rowgather+select substrate (bytes/elem = 4*K)."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp

E = 1 << 17
rng = np.random.RandomState(0)
v0 = jnp.asarray(rng.rand(E).astype(np.float32))
T = 262144
idx = jnp.asarray(rng.randint(0, E, T).astype(np.int32))

def bench(fn, R=512, label=""):
    @functools.partial(jax.jit, static_argnums=1)
    def chain(a, RR):
        def body(c, _):
            y = fn(c)
            s = 1.0 + 1e-12 * jnp.max(jnp.abs(y))
            return c * s, None
        o, _ = jax.lax.scan(body, a, None, length=RR)
        return fn(o)
    R1 = max(R // 4, 1)
    c1 = chain.lower(v0, R1).compile()
    c2 = chain.lower(v0, R).compile()
    per = None
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(c1(v0)[:8]); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(c2(v0)[:8]); t2 = time.perf_counter() - t0
        d = (t2 - t1) / (R - R1)
        if d > 0 and (per is None or d < per):
            per = d
    print(f"{label}: {per*1e6:.1f} us -> {T/per/1e6:.0f} M elem/s", flush=True)

for K in (8, 16, 32, 64, 128, 256):
    q, r = idx // K, idx % K
    iota = jnp.arange(K, dtype=jnp.int32)
    def rowg(v, K=K, q=q, r=r, iota=iota):
        V2 = v.reshape(E // K, K)
        return jnp.sum(V2[q] * (iota[None, :] == r[:, None]), axis=1)
    bench(rowg, label=f"K={K}")
