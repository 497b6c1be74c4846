"""Distributed SpMV / SpMM over a device mesh.

SPMD y = A x with A row-partitioned (parallel/partition.py) and x/y
block-distributed over one mesh axis.  Two comm strategies:

* **ring**: halo exchange via bidirectional ``lax.ppermute`` rings, with
  the d=0 (pure local) contraction issued before the first exchange so the
  ICI transfer overlaps the local gather+scatter-add (the north-star
  "halo vector entries via ICI collectives overlapped with compute").
* **allgather**: one ``lax.all_gather`` of x, then a single local
  contraction with global column ids — right when the pattern is not
  banded (halo radius covers most shards).

Two entry levels:

* ``spmv_local(part, x_local, axis)`` — the per-shard body, for composing
  *inside* a user's own ``shard_map`` (e.g. a distributed Krylov solver).
* ``dist_spmv(part, x, mesh, axis)`` — convenience wrapper that shard_maps
  the body over ``mesh`` and returns the distributed result.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .partition import RowPartition

__all__ = ["spmv_local", "dist_spmv", "dist_spmm"]


def _contract(er, ec, ev, xs, mloc):
    """Scatter-add of one entry group: er/ec/ev (E,), xs (mloc,) or
    (mloc, B).  Padding rows carry er == mloc -> land in the dummy slot."""
    if xs.ndim == 1:
        contrib = ev * xs[ec]
        y = jnp.zeros(mloc + 1, dtype=contrib.dtype)
    else:
        contrib = ev[:, None] * xs[ec]
        y = jnp.zeros((mloc + 1, xs.shape[1]), dtype=contrib.dtype)
    return y.at[er].add(contrib)[:mloc]


def spmv_local(part: RowPartition, x_local, axis: str):
    """Per-shard SpMV body.  ``part`` leaves must already be the LOCAL
    slice (leading shard dim of size 1); x_local is (mloc,) or (mloc, B).
    Call inside shard_map with in_specs P(axis, ...) for the partition
    leaves and P(axis) for x."""
    er, ec, ev = part.e_rows[0], part.e_cols[0], part.e_vals[0]
    mloc, k, S = part.mloc, part.k, part.S

    if part.strategy == "allgather":
        # er/ec/ev: (E,) with global columns
        x_full = jax.lax.all_gather(x_local, axis, tiled=True)
        return _contract(er, ec, ev, x_full, mloc)

    # ring: er/ec/ev are (2k+1, E); group g holds offset d = g - k
    y = _contract(er[k], ec[k], ev[k], x_local, mloc)  # d=0, pre-exchange
    fwd = [(i, (i + 1) % S) for i in range(S)]
    bwd = [(i, (i - 1) % S) for i in range(S)]
    x_fwd = x_local
    x_bwd = x_local
    for s in range(1, k + 1):
        x_fwd = jax.lax.ppermute(x_fwd, axis, fwd)  # x of shard (me - s)
        x_bwd = jax.lax.ppermute(x_bwd, axis, bwd)  # x of shard (me + s)
        y = y + _contract(er[k - s], ec[k - s], ev[k - s], x_fwd, mloc)
        y = y + _contract(er[k + s], ec[k + s], ev[k + s], x_bwd, mloc)
    return y


def _part_specs(part: RowPartition, axis: str):
    ndim = part.e_rows.ndim  # 3 for ring, 2 for allgather
    spec = P(axis, *([None] * (ndim - 1)))
    return RowPartition(
        part.m, part.n, part.S, part.mloc, part.k, part.strategy,
        spec, spec, spec,
    )


def dist_spmv(part: RowPartition, x, mesh: Mesh, axis: str = "rows"):
    """y = A x with A row-partitioned over mesh axis ``axis``.

    x: (m,) or padded (m_pad,); returns y of the same (padded) length,
    sharded P(axis).  Also accepts multi-RHS (m, B) -> (m_pad, B)."""
    x = part.pad_vector(x)
    xspec = P(axis) if x.ndim == 1 else P(axis, None)
    f = jax.shard_map(
        partial(spmv_local, axis=axis),
        mesh=mesh,
        in_specs=(_part_specs(part, axis), xspec),
        out_specs=xspec,
    )
    return f(part, x)


def dist_spmm(part: RowPartition, X, mesh: Mesh, axis: str = "rows"):
    """Multi-RHS distributed SpMM: X (m, B) -> (m_pad, B)."""
    return dist_spmv(part, X, mesh, axis)
