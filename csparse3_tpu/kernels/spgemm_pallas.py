"""Fused SpGEMM numeric pass as ONE Pallas kernel (small-operand regime).

``SpGEMMPlan.numeric``'s XLA path runs ~8 separate device ops (two value
gathers, products, tail compress, output select); at config-2 sizes
(conn3000 gram: 60k products, 54k outputs) the op-launch floor alone is
~0.5 ms on a tunnel-attached chip — slower than the HOST kernel.  When
both value arrays fit VMEM, the whole numeric pass is one kernel:

* products are re-tiled BY OUTPUT BLOCK (256 outputs per grid step,
  each step's products padded to a static P) — so the compress needs no
  cross-step accumulation;
* the value "gathers" are factored one-hot MXU contractions
  (q = idx//32 row one-hot against the (K, 32)-reshaped values, then a
  lane select — the bandpoints substrate, kernels/bandpoints.py);
* the compress is one one-hot write-back dot per step.

All dots use ``_dot_onehot`` (3-part bf16 split = exact f32).

Reference kernels replaced: csc_matmat_pass2 / csr_matmat_pass2
(/root/reference/src/sparsetools/csr.h:609-670 — the linked-list
numeric Gustavson loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .bandpoints import _default_interpret, _dot_onehot

__all__ = ["build_numeric_pallas_maps", "spgemm_numeric_pallas"]

OUT_T = 256    # outputs per grid step
_LANES = 128   # product-axis padding granularity


def build_numeric_pallas_maps(pa_s, pb_s, gid, out_nnz, nnz_a, nnz_b,
                              max_p=2048, max_rows=1024):
    """Host symbolic: re-tile the gid-sorted product stream by output
    block.  Returns (pa_t, pb_t, lo_t, meta) or None when the regime
    does not apply (values too big for VMEM residency, or a hub output
    block would make the padded P pathological)."""
    ka = -(-max(nnz_a, 1) // 32)
    kb = -(-max(nnz_b, 1) // 32)
    if ka + 1 > max_rows or kb + 1 > max_rows:
        return None
    nt = -(-max(out_nnz, 1) // OUT_T)
    tile = gid // OUT_T
    counts = np.bincount(tile, minlength=nt)
    P = int(counts.max()) if len(counts) else 1
    P = -(-max(P, 1) // _LANES) * _LANES
    if P > max_p:
        return None
    pa_t = np.full((nt, P), nnz_a, dtype=np.int32)   # pad -> zero slot
    pb_t = np.full((nt, P), nnz_b, dtype=np.int32)
    lo_t = np.full((nt, P), OUT_T, dtype=np.int32)   # pad -> no output
    starts = np.zeros(nt + 1, dtype=np.int64)
    starts[1:] = np.cumsum(counts)
    for i in range(nt):
        s, e = starts[i], starts[i + 1]
        pa_t[i, : e - s] = pa_s[s:e]
        pb_t[i, : e - s] = pb_s[s:e]
        lo_t[i, : e - s] = gid[s:e] - i * OUT_T
    meta = (nt, P, ka, kb)
    return (jnp.asarray(pa_t), jnp.asarray(pb_t), jnp.asarray(lo_t),
            meta)


@functools.partial(jax.jit, static_argnames=("nt", "P", "ka", "kb",
                                             "out_nnz", "parts",
                                             "interpret"))
def spgemm_numeric_pallas(pa_t, pb_t, lo_t, a_vals, b_vals, *, nt, P,
                          ka, kb, out_nnz, parts=3, interpret=False):
    """One-launch numeric pass: (a_vals, b_vals) -> (out_nnz,) data."""
    f32 = jnp.float32
    a2 = jnp.zeros(((ka + 1) * 32,), f32).at[: a_vals.shape[0]].set(
        a_vals.astype(f32)).reshape(ka + 1, 32)
    b2 = jnp.zeros(((kb + 1) * 32,), f32).at[: b_vals.shape[0]].set(
        b_vals.astype(f32)).reshape(kb + 1, 32)

    def kernel(pa_ref, pb_ref, lo_ref, a_ref, b_ref, o_ref):
        pa = pa_ref[0, 0]                                # (P,) int32
        pb = pb_ref[0, 0]
        lo = lo_ref[0, 0]

        def gather(idx, vals2, krows):
            q = idx // 32
            r = idx - q * 32
            # (krows+1, P) row one-hot, data side split for exactness
            rsub = jax.lax.broadcasted_iota(jnp.int32, (krows + 1, P), 0)
            Moh = (rsub == q[None, :]).astype(f32)
            G = _dot_onehot(vals2.T, Moh, parts=parts)   # (32, P)
            lane = jax.lax.broadcasted_iota(jnp.int32, (32, P), 0)
            return jnp.sum(jnp.where(lane == r[None, :], G, 0.0), axis=0)

        ga = gather(pa, a_ref[...], ka)
        gb = gather(pb, b_ref[...], kb)
        w = (ga * gb)[None, :]                           # (1, P)
        osub = jax.lax.broadcasted_iota(jnp.int32, (P, OUT_T), 1)
        OH = (osub == lo[:, None]).astype(f32)           # (P, OUT_T)
        o_ref[0] = _dot_onehot(w, OH, parts=parts)       # (1, OUT_T)

    # (nt, 1, P) table layout: a (1, 1, P) block satisfies Mosaic's
    # block-shape rule (second-to-last dim equals the array's)
    out = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0)),
            pl.BlockSpec((ka + 1, 32), lambda i: (0, 0)),
            pl.BlockSpec((kb + 1, 32), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, OUT_T), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nt, 1, OUT_T), f32),
        interpret=interpret,
    )(pa_t.reshape(nt, 1, P), pb_t.reshape(nt, 1, P),
      lo_t.reshape(nt, 1, P), a2, b2)
    return out.reshape(nt * OUT_T)[:out_nnz]


def numeric_pallas_or_none(plan, a_vals, b_vals):
    """Run the fused kernel for ``plan`` if its maps were built and the
    value dtypes are f32 (the kernel computes exact f32; integer and
    f64 data stay on the XLA path, which preserves their dtype)."""
    maps = getattr(plan, "_pallas_maps", None)
    if maps is None:
        return None
    a_vals = jnp.asarray(a_vals)
    b_vals = jnp.asarray(b_vals)
    if a_vals.dtype != jnp.float32 or b_vals.dtype != jnp.float32:
        return None
    pa_t, pb_t, lo_t, (nt, P, ka, kb) = maps
    return spgemm_numeric_pallas(
        pa_t, pb_t, lo_t, a_vals, b_vals,
        nt=nt, P=P, ka=ka, kb=kb, out_nnz=plan.out_nnz,
        parts=3, interpret=_default_interpret())
