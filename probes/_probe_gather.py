import sys, time, functools
import numpy as np
import jax, jax.numpy as jnp

which = sys.argv[1]
R = int(sys.argv[2])
n = 200_000
k = 2_200_000
rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.rand(n).astype(np.float32))

if which == "rand":
    idx = rng.randint(0, n, k)
elif which == "sorted":
    idx = np.sort(rng.randint(0, n, k))
elif which == "window":  # banded-like: index = row*~0.09 + small offset
    base = np.repeat(np.arange(n), 11)
    idx = np.clip(base + rng.randint(-700, 700, n * 11), 0, n - 1)
idx = jnp.asarray(idx.astype(np.int32))

@functools.partial(jax.jit, static_argnums=2)
def chain(x, idx, R):
    def body(c, _):
        g = c[idx]                     # the gather under test
        s = jnp.sum(g) * 1e-7
        return c * 0.999 + s, None
    o, _ = jax.lax.scan(body, x, None, length=R)
    return o[:1]

c = chain.lower(x0, idx, R).compile()
t0 = time.perf_counter()
v = np.asarray(c(x0, idx))
print(f"{which} R={R}: t={time.perf_counter()-t0:.2f}s v={v}", flush=True)
