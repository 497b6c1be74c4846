"""Probe: batched matmul with correctness-verified full download.

Chain: x <- normalize(einsum(A, x)) for R reps; downloads full result and
checks against numpy. Usage: python _probe_bmm2.py R [G] [S] [K]
"""
import functools
import json
import sys
import time

import numpy as np


def main():
    reps = int(sys.argv[1])
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 391
    s = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    a_h = rng.rand(G, s, s).astype(np.float32) - 0.5
    x_h = rng.rand(G, s, k).astype(np.float32)
    a = jnp.asarray(a_h)

    @functools.partial(jax.jit, static_argnums=2)
    def many(a, x, R):
        def body(c, _):
            y = jnp.einsum("bij,bjk->bik", a, c)
            return y * (1.0 / jnp.max(jnp.abs(y))), None

        o, _ = jax.lax.scan(body, x, None, length=R)
        return o

    compiled = many.lower(a, jnp.asarray(x_h), reps).compile()
    t0 = time.perf_counter()
    dev = np.asarray(compiled(a, jnp.asarray(x_h)))
    t = time.perf_counter() - t0

    x = x_h.copy()
    for _ in range(reps):
        y = np.einsum("bij,bjk->bik", a_h, x)
        x = y * (1.0 / np.abs(y).max())
    err = float(np.max(np.abs(dev - x)) / max(1e-30, np.abs(x).max()))
    print(json.dumps({"t": t, "reps": reps, "G": G, "s": s, "k": k,
                      "rel_err": err, "correct": bool(err < 1e-2)}))


if __name__ == "__main__":
    main()
