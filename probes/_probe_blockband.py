"""Probe: block-banded MXU SpMV formulation vs DIA slabs.

Builds raw (ndo, nb, s, s) block-diagonal slabs (random data, same shape a
50k-bus RCM Ybus with halfwidth ~439 would produce) and times a
split-complex matvec chain on the device via the delta method.

Usage: python _probe_blockband.py REPS [N] [S]
"""
import functools
import json
import sys
import time

import numpy as np


def main():
    reps = int(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    s = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    hw = 439  # halfwidth of the RCM band at 50k buses (879 diagonals)

    import jax
    import jax.numpy as jnp

    nb = -(-n // s)
    kb = -(-hw // s)
    ndo = 2 * kb + 1  # block offsets -kb..kb
    rng = np.random.RandomState(0)
    # re+im slabs
    ar = jnp.asarray(rng.rand(ndo, nb, s, s).astype(np.float32))
    ai = jnp.asarray(rng.rand(ndo, nb, s, s).astype(np.float32))
    xr = jnp.asarray(rng.rand(n).astype(np.float32))
    xi = jnp.asarray(rng.rand(n).astype(np.float32))

    def matvec(ar, ai, xr, xi):
        # x2: (nb, s, 2) stacked [xr, xi]
        x2 = jnp.stack([jnp.pad(xr, (0, nb * s - n)).reshape(nb, s),
                        jnp.pad(xi, (0, nb * s - n)).reshape(nb, s)], axis=-1)
        # padded by kb blocks on both sides for aligned block shifts
        xpad = jnp.pad(x2, ((kb, kb), (0, 0), (0, 0)))
        yr2 = jnp.zeros((nb, s, 2), jnp.float32)
        yi2 = jnp.zeros((nb, s, 2), jnp.float32)
        for t in range(ndo):
            xw = jax.lax.slice_in_dim(xpad, t, t + nb, axis=0)  # blocks i + (t-kb)
            yr2 = yr2 + jnp.einsum("bij,bjk->bik", ar[t], xw)
            yi2 = yi2 + jnp.einsum("bij,bjk->bik", ai[t], xw)
        # (Ar + iAi)(xr + ixi): re = Ar xr - Ai xi ; im = Ar xi + Ai xr
        out_r = (yr2[..., 0] - yi2[..., 1]).reshape(-1)[:n]
        out_i = (yr2[..., 1] + yi2[..., 0]).reshape(-1)[:n]
        return out_r, out_i

    @functools.partial(jax.jit, static_argnums=4)
    def many(ar, ai, a, b, R):
        def body(c, _):
            yr, yi = matvec(ar, ai, c[0], c[1])
            return (yr * 1e-2, yi * 1e-2), None

        o, _ = jax.lax.scan(body, (a, b), None, length=R)
        return o[0][:1]

    compiled = many.lower(ar, ai, xr, xi, reps).compile()
    t0 = time.perf_counter()
    np.asarray(compiled(ar, ai, xr, xi))
    t = time.perf_counter() - t0
    bytes_per = 2 * ndo * nb * s * s * 4
    print(json.dumps({"t": t, "reps": reps, "ndo": ndo, "nb": nb, "s": s,
                      "slab_mb": bytes_per / 1e6}))


if __name__ == "__main__":
    main()
