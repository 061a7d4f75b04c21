"""Multi-chip ScanContext retrieval: database rows sharded over the mesh.

SURVEY §2.3: "sharded ScanContext database rows". Each device scores the
(replicated) query against its shard of descriptors across all 60 shifts;
the global best is an argmin over an all_gathered (n_dev,) candidate set —
O(1) ICI traffic per query against an arbitrarily large place-recognition
database.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vil_fusion_tpu.models import scancontext as sc
from vil_fusion_tpu.parallel.mesh import AXIS


def detect_loop_sharded(mesh, db: sc.ScanContextDB, query: jnp.ndarray):
    """db.desc/ring_key sharded on axis 0 (capacity divisible by mesh size);
    db.count replicated. Returns (best_idx, best_dist, best_shift)."""
    cap = db.desc.shape[0]
    n_dev = mesh.devices.size
    shard = cap // n_dev

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    def body(desc_loc, rk_loc, count, q):
        my = jax.lax.axis_index(AXIS)
        base = my * shard
        local_db = sc.ScanContextDB(desc=desc_loc, ring_key=rk_loc, count=count)
        # local detect with global recency exclusion: detect_loop uses
        # (idx < count - exclude) with LOCAL idx; rebase by offsetting count
        idx = jnp.arange(shard) + base
        usable = idx < count - sc.NUM_EXCLUDE_RECENT
        rk_d = jnp.linalg.norm(rk_loc - sc.ring_key(q)[None, :], axis=-1)
        rk_d = jnp.where(usable, rk_d, jnp.inf)
        neg_top, cand = jax.lax.top_k(-rk_d, min(sc.NUM_CANDIDATES, shard))
        cand_ok = jnp.isfinite(-neg_top)
        shifts = jnp.stack([jnp.roll(q, s, axis=1) for s in range(sc.N_SECTOR)])
        cand_desc = desc_loc[cand]
        num = jnp.einsum("crw,srw->csw", cand_desc, shifts)
        cn = jnp.linalg.norm(cand_desc, axis=1)
        qn = jnp.linalg.norm(shifts, axis=1)
        denom = cn[:, None, :] * qn[None, :, :]
        col_ok = denom > 1e-6
        cos = jnp.where(col_ok, num / jnp.maximum(denom, 1e-6), 0.0)
        n_cols = jnp.maximum(jnp.sum(col_ok, axis=-1), 1)
        dist = 1.0 - jnp.sum(cos, axis=-1) / n_cols
        dist_min = jnp.where(cand_ok, jnp.min(dist, axis=-1), jnp.inf)
        shift_arg = jnp.argmin(dist, axis=-1)
        b = jnp.argmin(dist_min)
        loc_best = jnp.stack([dist_min[b],
                              (cand[b] + base).astype(jnp.float32),
                              shift_arg[b].astype(jnp.float32)])
        allb = jax.lax.all_gather(loc_best, AXIS)  # (n_dev, 3)
        w = jnp.argmin(allb[:, 0])
        return (allb[w, 1].astype(jnp.int32), allb[w, 0],
                allb[w, 2].astype(jnp.int32))

    return body(db.desc, db.ring_key, db.count, query)
