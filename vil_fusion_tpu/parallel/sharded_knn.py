"""Multi-chip kNN: LiDAR map points sharded over the mesh.

Each device holds a map shard and computes a local top-k for the (replicated)
query tile; the global top-k is a k-wide all_gather + merge — the SURVEY §2.3
"map-shard kNN (all_gather query tiles against local map shards)" design. ICI
traffic per query is O(k) instead of O(map).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vil_fusion_tpu.ops import knn as knn_ops
from vil_fusion_tpu.parallel.mesh import AXIS


def knn_sharded(mesh, queries, database, db_valid, k: int = 5, tile: int = 2048):
    """queries replicated, database/db_valid sharded on axis 0.

    Returns (dists2 (Nq, k), global_idx (Nq, k))."""
    n_shard = database.shape[0] // mesh.devices.size

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS)),
        out_specs=(P(), P()),
        check_vma=False)
    def body(q, db_loc, valid_loc):
        d2, idx = knn_ops.knn(q, db_loc, valid_loc, k=k, tile=min(tile, n_shard))
        my = jax.lax.axis_index(AXIS)
        gidx = idx + my * n_shard
        # gather all shards' candidates: (n_dev, Nq, k) -> merge
        d2_all = jax.lax.all_gather(d2, AXIS)
        gi_all = jax.lax.all_gather(gidx, AXIS)
        d2_cat = jnp.moveaxis(d2_all, 0, 1).reshape(q.shape[0], -1)
        gi_cat = jnp.moveaxis(gi_all, 0, 1).reshape(q.shape[0], -1)
        neg_top, arg = jax.lax.top_k(-d2_cat, k)
        return -neg_top, jnp.take_along_axis(gi_cat, arg, axis=1)

    return body(queries, database, db_valid)
