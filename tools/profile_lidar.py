#!/usr/bin/env python
"""Per-stage device timing of the lidar odometry step (extraction, sorts,
kNN, GN, map update) at HDL-64 scale. Run on the real TPU to find the next
kernel to optimize; prints mean ms per sub-stage with bounded-depth sync.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vil_fusion_tpu.models import lidar_features as lf
from vil_fusion_tpu.models import lidar_odometry as lo
from vil_fusion_tpu.ops import lie
from vil_fusion_tpu.ops import voxel as voxel_ops
from vil_fusion_tpu.ops.pallas import knn_pallas as knn_ops
from vil_fusion_tpu.runtime import sim


def timed(name, fn, *args, n=20, warm=3):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:36s} {ms:8.2f} ms")
    return out


def main():
    cfg = lo.OdomConfig(
        lidar=lf.LidarConfig(n_scan=64, width=1800, fov_up_deg=2.0,
                             fov_down_deg=-24.8, edge_cap=2048, surf_cap=8192),
        edge_map_cap=16384, surf_map_cap=32768)
    scene = sim.RaycastScene()
    traj = sim.Trajectory(sim.TrajectoryConfig(speed=2.0))
    pts, val = sim.simulate_lidar_scan(
        scene, traj.rotation(0.3), traj.position(0.3) + np.array([0, 0, 1.5]),
        n_scan=64, width=1800, fov_up_deg=2.0, fov_down_deg=-24.8,
        max_range=80.0)
    pts = jnp.asarray(pts)
    val = jnp.asarray(val)

    # build a realistic map state by running a few steps
    state = lo.init_state(cfg)
    for i in range(4):
        state, _ = lo.odometry_step(state, pts, val, cfg)
    jax.block_until_ready(state.p)

    timed("full odometry_step", lambda: lo.odometry_step(state, pts, val, cfg))

    extract = jax.jit(lambda p, v: lf.extract_features(p, v, cfg.lidar))
    feats = timed("extract_features", extract, pts, val)

    proj = jax.jit(lambda p, v: lf.project_range_image(p, v, cfg.lidar))
    timed("  project_range_image", proj, pts, val)

    ms = jax.jit(knn_ops.morton_sort)
    timed("morton_sort surf_map (32k)", lambda: state.surf_map[ms(state.surf_map, state.surf_map_valid)])
    timed("morton_sort edge feats (2k)", lambda: feats.edge[ms(feats.edge, feats.edge_valid)])

    # presorted inputs for kernel timing
    emp = ms(state.edge_map, state.edge_map_valid)
    e_map = state.edge_map[emp]
    e_mv = state.edge_map_valid[emp]
    smp = ms(state.surf_map, state.surf_map_valid)
    s_map = state.surf_map[smp]
    s_mv = state.surf_map_valid[smp]
    ep = ms(feats.edge, feats.edge_valid)
    e_w = lie.qrot(state.q, feats.edge[ep]) + state.p
    e_v = feats.edge_valid[ep]
    sp = ms(feats.surf, feats.surf_valid)
    s_w = lie.qrot(state.q, feats.surf[sp]) + state.p
    s_v = feats.surf_valid[sp]
    jax.block_until_ready((e_w, s_w))

    timed("knn edge->edge_map (sparse)",
          lambda: knn_ops.knn(e_w, e_map, e_mv, k=5, radius=3.0,
                              q_sorted=True, db_sorted=True))
    timed("knn surf->surf_map (sparse)",
          lambda: knn_ops.knn(s_w, s_map, s_mv, k=5, radius=3.0,
                              q_sorted=True, db_sorted=True))

    reg = jax.jit(lambda f: lo.scan_to_map(
        f, state.edge_map, state.edge_map_valid, state.surf_map,
        state.surf_map_valid, state.q, state.p, cfg, state.map_origin))
    timed("scan_to_map (2x assoc, 2x4 GN)", reg, feats)

    upd = jax.jit(lambda: lo._update_maps(state, feats, state.q, state.p, cfg))
    timed("_update_maps (hash merge)", upd)


if __name__ == "__main__":
    main()
