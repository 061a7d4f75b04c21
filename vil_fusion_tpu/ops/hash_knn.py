"""k-nearest-neighbour lookup in a voxel-hash table (O(1) per query).

The LiDAR maps are maintained by ops/voxel.voxel_downsample_hash, whose
output buffer IS a spatial hash table: slot hash_bucket(voxel_key(p)) holds
(at most) one representative point of that voxel. This turns kNN from a
brute-force scan over the whole map (ops/knn.py: ~300 M distance pairs per
frame at HDL-64 scale) into a gather of the (2r+1)^3 neighbor buckets per
query — a few hundred candidates — followed by one small top-k.

Approximations vs exact kNN (all gated downstream by correspondence checks):
  * candidates only within +-r voxels (fine: correspondence gates reject
    far matches anyway);
  * hash collisions may alias a far voxel into a neighbor bucket (distance
    check rejects it) or hide a true neighbor (rare, degrades one point).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from vil_fusion_tpu.ops.voxel import hash_bucket


@functools.partial(jax.jit, static_argnames=("k", "radius", "grid_dim"))
def hash_knn(
    queries: jnp.ndarray,  # (Nq, 3)
    table_pts: jnp.ndarray,  # (C, 3) hash-table buffer (voxel_downsample_hash)
    table_valid: jnp.ndarray,  # (C,)
    resolution: float,
    origin: jnp.ndarray,  # (3,) the origin the table was built with
    k: int = 5,
    radius: int = 2,  # neighbor cells each side
    grid_dim: int = 1024,
):
    """Returns (dists2 (Nq, k), idx (Nq, k)) like ops.knn.knn (inf = missing)."""
    C = table_pts.shape[0]
    nq = queries.shape[0]
    dtype = queries.dtype

    ijk = jnp.floor((queries - origin) / resolution).astype(jnp.int32)
    ijk = jnp.clip(ijk, 0, grid_dim - 1)

    r = radius
    offs = np.stack(np.meshgrid(*([np.arange(-r, r + 1)] * 3), indexing="ij"),
                    axis=-1).reshape(-1, 3)
    offs = jnp.asarray(offs, jnp.int32)  # (M, 3)
    M = offs.shape[0]

    nb = ijk[:, None, :] + offs[None, :, :]  # (Nq, M, 3)
    in_grid = jnp.all((nb >= 0) & (nb < grid_dim), axis=-1)
    key = (nb[..., 0] * grid_dim + nb[..., 1]) * grid_dim + nb[..., 2]
    slot = hash_bucket(key.reshape(-1), C).reshape(nq, M)

    cand = table_pts[slot]  # (Nq, M, 3)
    cand_ok = table_valid[slot] & in_grid
    # verify the candidate actually lies in the probed voxel (collision check)
    cand_ijk = jnp.floor((cand - origin) / resolution).astype(jnp.int32)
    cand_ok = cand_ok & jnp.all(cand_ijk == nb, axis=-1)

    d2 = jnp.sum((cand - queries[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cand_ok, d2, jnp.inf)
    neg_top, arg = jax.lax.top_k(-d2, k)
    idx = jnp.take_along_axis(slot, arg, axis=1)
    out_d = -neg_top
    idx = jnp.where(jnp.isfinite(out_d), idx, 0)
    return out_d, idx
