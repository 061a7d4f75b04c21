#!/usr/bin/env python
"""A/B the grouped-merge (approximate) kNN against the exact merge at
HDL-64 deployment shapes (VERDICT r4 weak #6: the accuracy guard only ever
ran in interpret mode on toy shapes).

Runs the SAME 60-frame lidar-only segment (KITTI scan shape, 64x1800,
urban-block scene) through odometry twice — approx_knn=True (deployed
default) vs False (exact) — and reports the trajectory delta. Records go to
PERF.md.

    python tools/ab_knn.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run(approx: bool, reuse: bool, scans, cfg_base):
    import jax.numpy as jnp

    from vil_fusion_tpu.models import lidar_odometry as lo

    cfg = cfg_base._replace(approx_knn=approx, reuse_knn=reuse)
    state = lo.init_state(cfg)
    ps = []
    t0 = time.perf_counter()
    for pts, val in scans:
        state, (q, p, _, _) = lo.odometry_step(
            state, jnp.asarray(pts), jnp.asarray(val), cfg)
        ps.append(np.asarray(p))
    wall = time.perf_counter() - t0
    return np.stack(ps), wall


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     os.path.expanduser("~/.cache/jax_tpu")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vil_fusion_tpu.models import lidar_features as lf
    from vil_fusion_tpu.models import lidar_odometry as lo
    from vil_fusion_tpu.runtime import sim

    cfg = lo.OdomConfig(
        lidar=lf.LidarConfig(n_scan=64, width=1800, fov_up_deg=2.0,
                             fov_down_deg=-24.8, edge_cap=2048,
                             surf_cap=8192),
        edge_map_cap=16384, surf_map_cap=32768)
    # urban scene at moderate density: the default RaycastScene is
    # geometry-poor on a radius-60 circuit (first A/B attempt measured ATE
    # ~3.6-3.9 m for EVERY arm incl. exact — degenerate ground-plane-only
    # registration whose arm deltas are meaningless)
    scene = sim.JaxRaycast(sim.urban_block_scene(
        60.0, pillar_step_deg=8.0, box_step_deg=10.0))
    traj = sim.LoopTrajectory(radius=60.0, period=2 * np.pi * 60.0 / 8.0,
                              laps=1.0)
    n_frames = 60
    scans, gt = [], []
    for i in range(n_frames):
        t = 1.0 + i * 0.1
        R = traj.rotation(t)
        p = traj.position(t) + np.array([0, 0, 1.5])
        pts, val = sim.simulate_lidar_scan(
            scene, R, p, n_scan=64, width=1800, fov_up_deg=2.0,
            fov_down_deg=-24.8, max_range=80.0, range_noise=0.02, seed=i)
        scans.append((np.asarray(pts), np.asarray(val)))
        gt.append(p)
    gt = np.stack(gt)
    gt = gt - gt[0]

    arms = {
        "deployed (approx+reuse)": (True, True),
        "approx only": (True, False),
        "reuse only": (False, True),
        "exact": (False, False),
    }
    traj, wall = {}, {}
    for name, (a, r) in arms.items():
        traj[name], wall[name] = run(a, r, scans, cfg)

    def ate(p):
        # Umeyama-aligned ATE: odometry starts at identity while GT starts
        # mid-circle, so unaligned error is dominated by the constant frame
        # rotation, not drift
        from vil_fusion_tpu.runtime import tum

        return round(tum.ate_rmse(p, gt), 5)

    p_exact = traj["exact"]
    out = {
        "frames": n_frames,
        "path_m": round(float(np.sum(np.linalg.norm(
            np.diff(gt, axis=0), axis=-1))), 1),
    }
    for name, p in traj.items():
        d = np.linalg.norm(p - p_exact, axis=-1)
        out[name] = {
            "ate_rmse_m": ate(p),
            "delta_vs_exact_mean_m": round(float(d.mean()), 5),
            "delta_vs_exact_max_m": round(float(d.max()), 5),
            "wall_s": round(wall[name], 1),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
