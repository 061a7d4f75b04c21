#!/usr/bin/env python
"""Per-stage device timing of the lidar odometry step (extraction, sorts,
kNN, GN, map update) at HDL-64 scale, CHAINED: each call's carried value
feeds the next so the remote-execution tunnel cannot dedup or overlap the
measured work (independent same-input calls time as ~0 there).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  __import__("os").path.expanduser("~/.cache/jax_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from vil_fusion_tpu.models import lidar_features as lf
from vil_fusion_tpu.models import lidar_odometry as lo
from vil_fusion_tpu.ops import lie
from vil_fusion_tpu.ops.pallas import knn_pallas as knn_ops
from vil_fusion_tpu.runtime import sim


def chained(name, step_fn, state0, n=20, warm=3):
    """step_fn(carry, i) -> carry (device pytree). Chains; blocks once."""
    s = state0
    for i in range(warm):
        s = step_fn(s, i)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for i in range(n):
        s = step_fn(s, i)
    jax.block_until_ready(s)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:38s} {ms:8.2f} ms", flush=True)
    return s


def main():
    cfg = lo.OdomConfig(
        lidar=lf.LidarConfig(n_scan=64, width=1800, fov_up_deg=2.0,
                             fov_down_deg=-24.8, edge_cap=2048, surf_cap=8192),
        edge_map_cap=16384, surf_map_cap=32768)
    scene = sim.RaycastScene()
    traj = sim.Trajectory(sim.TrajectoryConfig(speed=2.0))
    scans = []
    for i in range(4):
        pts, val = sim.simulate_lidar_scan(
            scene, traj.rotation(0.1 * i),
            traj.position(0.1 * i) + np.array([0, 0, 1.5]),
            n_scan=64, width=1800, fov_up_deg=2.0, fov_down_deg=-24.8,
            max_range=80.0)
        scans.append((jnp.asarray(pts), jnp.asarray(val)))

    # realistic map state
    state = lo.init_state(cfg)
    for i in range(4):
        state, _ = lo.odometry_step(state, *scans[i], cfg)
    jax.block_until_ready(state.p)

    chained("full odometry_step",
            lambda s, i: lo.odometry_step(s, *scans[i % 4], cfg)[0], state)

    @jax.jit
    def extract(carry, pts, val):
        f = lf.extract_features(pts + carry * 0, val, cfg.lidar)
        return f.edge[0, 0]

    chained("extract_features",
            lambda s, i: extract(s, *scans[i % 4]), jnp.zeros(()))

    @jax.jit
    def proj(carry, pts, val):
        img, ok = lf.project_range_image(pts + carry * 0, val, cfg.lidar)
        return img[0, 0]

    chained("  project_range_image",
            lambda s, i: proj(s, *scans[i % 4]), jnp.zeros(()))

    feats = jax.jit(lambda p, v: lf.extract_features(p, v, cfg.lidar))(*scans[0])

    @jax.jit
    def msort(carry, pts, valid):
        p = knn_ops.morton_sort(pts + carry * 0, valid)
        return pts[p][0, 0]

    chained("morton_sort surf_map (32k)",
            lambda s, i: msort(s, state.surf_map, state.surf_map_valid),
            jnp.zeros(()))

    # presorted inputs for kernel timing
    ms_ = jax.jit(knn_ops.morton_sort)
    emp = ms_(state.edge_map, state.edge_map_valid)
    e_map, e_mv = state.edge_map[emp], state.edge_map_valid[emp]
    smp = ms_(state.surf_map, state.surf_map_valid)
    s_map, s_mv = state.surf_map[smp], state.surf_map_valid[smp]
    ep = ms_(feats.edge, feats.edge_valid)
    e_w = lie.qrot(state.q, feats.edge[ep]) + state.p
    e_v = feats.edge_valid[ep]
    sp = ms_(feats.surf, feats.surf_valid)
    s_w = lie.qrot(state.q, feats.surf[sp]) + state.p
    s_v = feats.surf_valid[sp]
    jax.block_until_ready((e_w, s_w))

    @jax.jit
    def knn_e(carry):
        d, idx = knn_ops.knn(e_w + carry * 0, e_map, e_mv, k=5, radius=3.0,
                             q_sorted=True, db_sorted=True)
        return jnp.where(jnp.isfinite(d[0, 0]), d[0, 0], 0.0) * 1e-9

    chained("knn edge->edge_map (sparse)", lambda s, i: knn_e(s), jnp.zeros(()))

    @jax.jit
    def knn_s(carry):
        d, idx = knn_ops.knn(s_w + carry * 0, s_map, s_mv, k=5, radius=3.0,
                             q_sorted=True, db_sorted=True)
        return jnp.where(jnp.isfinite(d[0, 0]), d[0, 0], 0.0) * 1e-9

    chained("knn surf->surf_map (sparse)", lambda s, i: knn_s(s), jnp.zeros(()))

    @jax.jit
    def reg(carry):
        q, p = lo.scan_to_map(
            feats, state.edge_map, state.edge_map_valid, state.surf_map,
            state.surf_map_valid, state.q, state.p + carry, cfg,
            state.map_origin)
        return (p - state.p) * 1e-9

    chained("scan_to_map (2x assoc, 2x4 GN)", lambda s, i: reg(s),
            jnp.zeros(3))

    @jax.jit
    def upd(carry):
        maps = lo._update_maps(state, feats, state.q, state.p + carry, cfg)
        return maps[0][0] * 1e-12

    chained("_update_maps (hash merge)", lambda s, i: upd(s), jnp.zeros(3))


if __name__ == "__main__":
    main()
