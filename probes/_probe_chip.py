"""Microbench: what does this chip runtime execute fast?

Modes:
  matmul REPS N  — (N,N)@(N,N) f32 matmul chain
  bw     REPS MB — elementwise triad y = a*y + 0.5*y on MB-sized f32 arrays

Usage: python _probe_chip.py MODE REPS [...]
All device state passes as jit arguments (axon cannot download closure
constants at trace time).
"""
import functools
import json
import sys
import time

import numpy as np


def main():
    mode = sys.argv[1]
    reps = int(sys.argv[2])
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    if mode == "matmul":
        n = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
        a = jnp.asarray(rng.rand(n, n).astype(np.float32))

        @functools.partial(jax.jit, static_argnums=2)
        def many(a, x, R):
            def body(c, _):
                return (c @ a) * 1e-3, None

            o, _ = jax.lax.scan(body, x, None, length=R)
            return o.reshape(-1)[:1]

        compiled = many.lower(a, a, reps).compile()
        t0 = time.perf_counter()
        np.asarray(compiled(a, a))
        t = time.perf_counter() - t0
        out = {"t": t, "mode": mode, "n": n, "gflop_per_rep": 2 * n**3 / 1e9}
    elif mode == "bw":
        mb = int(sys.argv[3]) if len(sys.argv) > 3 else 64
        n = mb * 1_000_000 // 4
        a = jnp.asarray(rng.rand(n).astype(np.float32))

        @functools.partial(jax.jit, static_argnums=2)
        def many(a, x, R):
            def body(c, _):
                return a * c + 0.5 * c, None

            o, _ = jax.lax.scan(body, x, None, length=R)
            return o[:1]

        compiled = many.lower(a, a, reps).compile()
        t0 = time.perf_counter()
        np.asarray(compiled(a, a))
        t = time.perf_counter() - t0
        # per rep traffic: read a + read c + write c
        out = {"t": t, "mode": mode, "mb": mb, "mb_per_rep": 3 * mb}
    else:
        raise SystemExit(f"unknown mode {mode}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
