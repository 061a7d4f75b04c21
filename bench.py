"""Benchmark: full LiDAR-odometry pipeline frames/s + BA iterations/s.

Runs on whatever accelerator JAX finds (the driver runs it on the real TPU).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference is a real-time system driven at 10 Hz frame cadence
(kitti_config.yaml freq: 10; BASELINE.md "Front-end cadence") with no
published throughput numbers, so vs_baseline = frames_per_s / 10.0 — how many
times faster than the reference's real-time requirement the fused TPU
pipeline runs the same per-frame work (feature extraction + scan-to-map GN +
map update) at KITTI HDL-64 scale.
"""
from __future__ import annotations

import json
import time

import numpy as np


def bench_lidar_odometry(n_frames=24, warmup=3):
    import jax
    import jax.numpy as jnp

    from vil_fusion_tpu.models import lidar_features as lf
    from vil_fusion_tpu.models import lidar_odometry as lo
    from vil_fusion_tpu.runtime import sim

    cfg = lo.OdomConfig(
        lidar=lf.LidarConfig(n_scan=64, width=1800, fov_up_deg=2.0,
                             fov_down_deg=-24.8, edge_cap=2048, surf_cap=8192),
        edge_map_cap=16384, surf_map_cap=32768)
    scene = sim.RaycastScene()
    traj = sim.Trajectory(sim.TrajectoryConfig(speed=2.0))

    scans = []
    for i in range(6):
        R = traj.rotation(i * 0.1)
        p = traj.position(i * 0.1) + np.array([0, 0, 1.5])
        pts, val = sim.simulate_lidar_scan(
            scene, R, p, n_scan=64, width=1800, fov_up_deg=2.0,
            fov_down_deg=-24.8, max_range=80.0)
        scans.append((jnp.asarray(pts), jnp.asarray(val)))

    state = lo.init_state(cfg)
    # warmup / compile
    for i in range(warmup):
        state, out = lo.odometry_step(state, *scans[i % len(scans)], cfg)
    np.asarray(out[1])

    # bounded-depth pipelined measurement: a host sync every frame-minus-2
    # keeps at most 2 frames in flight (deployment-shaped double buffering)
    # while preventing the unbounded-async artifact where block_until_ready
    # on the final output alone understates the work by 100x+ under the
    # remote-execution tunnel. Measured: depth 1..8 all give the same
    # number, so this is the true steady-state cost.
    inflight = []
    t0 = time.perf_counter()
    for i in range(n_frames):
        state, out = lo.odometry_step(state, *scans[i % len(scans)], cfg)
        inflight.append(out[1])
        if len(inflight) > 2:
            np.asarray(inflight.pop(0))
    for x in inflight:
        np.asarray(x)
    dt = time.perf_counter() - t0
    return n_frames / dt


def bench_ba(n_solves=10, warmup=2):
    import jax

    import __graft_entry__ as ge
    from vil_fusion_tpu.models import ba

    cfg = ba.BAConfig(max_iters=8)
    state, feats, pre, lidar, prior = ge._example_problem(f_cap=128)
    for _ in range(warmup):
        out = ba.optimize(state, feats, pre, lidar, prior, cfg)
    np.asarray(out[2])
    t0 = time.perf_counter()
    for _ in range(n_solves):
        out = ba.optimize(state, feats, pre, lidar, prior, cfg)
        np.asarray(out[2])  # per-solve host sync (see bench_lidar_odometry)
    dt = time.perf_counter() - t0
    return n_solves * cfg.max_iters / dt


def main():
    frames_per_s = bench_lidar_odometry()
    ba_iters_per_s = bench_ba()
    print(json.dumps({
        "metric": "lidar_odometry_frames_per_s",
        "value": round(frames_per_s, 3),
        "unit": "frames/s (HDL-64 scale; aux: ba_iters_per_s=%.1f)" % ba_iters_per_s,
        "vs_baseline": round(frames_per_s / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
