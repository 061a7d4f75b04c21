#!/usr/bin/env python
"""Decompose the per-frame HOST cost of the deployment pipeline feed path.

BENCH_r04 measured 123.8 ms wall/frame against a 47.9 ms device program —
~76 ms/frame of host/tunnel overhead. This profiler times each host-side
component of a steady-state bench-shaped frame (uploads, conversions, IMU
pushes, program enqueue, completion fetch) so the cuts target measured cost,
not guesses.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     os.path.expanduser("~/.cache/jax_tpu")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from vil_fusion_tpu.runtime import sim
    from vil_fusion_tpu.runtime.config import RigConfig
    from vil_fusion_tpu.runtime.pipeline import VILFusionPipeline

    R_BC = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    H, W = 370, 1226
    FX = FY = 718.856
    CX, CY = 607.19, 185.22
    rig = RigConfig(
        name="kitti-bench",
        camera=dict(model_type="PINHOLE",
                    projection_parameters=dict(fx=FX, fy=FY, cx=CX, cy=CY),
                    distortion_parameters=dict(k1=0.0, k2=0.0, p1=0.0, p2=0.0)),
        image_height=H, image_width=W,
        q_ic=sim.R_to_q(R_BC), t_ic=np.zeros(3),
        q_cl=sim.R_to_q(R_BC.T), t_cl=np.zeros(3),
        max_cnt=150, min_dist=30, n_scan=64,
        lidar_fov_up=2.0, lidar_fov_down=-24.8, lidar_min_range=1.0,
        lidar_max_range=80.0, use_lidar=True)
    pipe = VILFusionPipeline(rig, mode="vil", sync_depth=2, scan_quant=0.0025)

    scene = sim.RaycastScene()
    traj = sim.Trajectory(sim.TrajectoryConfig(speed=8.0))
    frame_dt, t0 = 0.1, 1.0
    q0, p0 = traj.pose(t0)
    pipe.estimator.set_initial_state(p=p0 + np.array([0, 0, 1.5]), q=q0,
                                     v=traj.velocity(t0))
    warmup, n_frames = 26, 30
    frames = []
    for i in range(warmup + n_frames):
        t = t0 + i * frame_dt
        imu = sim.simulate_imu(traj, t - frame_dt, t, 200.0) if i else None
        R_wb = traj.rotation(t)
        p_wb = traj.position(t) + np.array([0, 0, 1.5])
        img = np.clip(np.asarray(sim.render_camera_image(
            scene, R_wb @ R_BC, p_wb, FX, FY, CX, CY, H, W)) * 255.0 + 0.5,
            0, 255).astype(np.uint8)
        pts, val = sim.simulate_lidar_scan(
            scene, R_wb, p_wb, n_scan=64, width=1800, fov_up_deg=2.0,
            fov_down_deg=-24.8, max_range=80.0)
        frames.append((t, imu, img, np.asarray(pts), np.asarray(val)))

    acc = {}

    def timed(name, fn, *a, **kw):
        t0_ = time.perf_counter()
        r = fn(*a, **kw)
        acc.setdefault(name, []).append(time.perf_counter() - t0_)
        return r

    def feed(frame, measure=False):
        t, imu, img, pts, val = frame
        T = timed if measure else (lambda n, f, *a, **kw: f(*a, **kw))
        if imu is not None:
            ts_i, a_, g_ = imu

            def push_all():
                for k in range(1, len(ts_i)):
                    pipe.push_imu(ts_i[k], a_[k], g_[k])
            T("imu_pushes", push_all)
        T("push_scan", pipe.push_scan, t, pts, val)
        T("push_image", pipe.push_image, t, img)

    for f in frames[:warmup]:
        feed(f)
    while len(pipe._pending) > 0:
        pipe._complete_frame(pipe._pending.pop(0))
    if pipe.fusion is not None:
        pipe.fusion.prewarm()

    t_start = time.perf_counter()
    for f in frames[warmup:]:
        feed(f, measure=True)
    pipe.finalize()
    wall = time.perf_counter() - t_start
    print(f"wall/frame: {1e3 * wall / n_frames:.1f} ms "
          f"({n_frames / wall:.2f} fps)")
    from vil_fusion_tpu.utils.tracing import GLOBAL_TIMERS
    import json as _json
    print(_json.dumps({k: round(v["mean_ms"], 2) for k, v in GLOBAL_TIMERS.summary().items()}, indent=1))
    for k, v in acc.items():
        v = np.array(v) * 1e3
        print(f"  {k:12s} n={len(v):3d} mean={v.mean():7.2f} ms "
              f"p50={np.percentile(v, 50):7.2f} max={v.max():7.2f}")


if __name__ == "__main__":
    main()
