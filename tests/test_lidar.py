"""LiDAR feature extraction + scan-to-map odometry tests (C3/C5 parity)."""
import jax.numpy as jnp
import numpy as np

from vil_fusion_tpu.models import lidar_features as lf
from vil_fusion_tpu.models import lidar_odometry as lo
from vil_fusion_tpu.ops import lie
from vil_fusion_tpu.runtime import sim

CFG = lf.LidarConfig(
    n_scan=32, width=900, min_range=1.0, max_range=80.0,
    fov_up_deg=30.0, fov_down_deg=-30.0,
    edge_cap=512, surf_cap=2048, edge_per_sector=6,
)


def _scan(traj, t, scene, seed=0, noise=0.0):
    R = traj.rotation(t)
    p = traj.position(t) + np.array([0, 0, 1.5])  # sensor above ground
    pts, val = sim.simulate_lidar_scan(
        scene, R, p, n_scan=CFG.n_scan, width=CFG.width,
        fov_up_deg=CFG.fov_up_deg, fov_down_deg=CFG.fov_down_deg,
        max_range=CFG.max_range, range_noise=noise, seed=seed)
    return jnp.asarray(pts), jnp.asarray(val), (R, p)


def test_range_image_projection():
    # single point straight ahead (x+) at mid elevation -> known cell
    pts = jnp.asarray([[10.0, 0.0, 0.0]], dtype=jnp.float32)
    img, iv = lf.project_range_image(pts, jnp.ones(1, bool), CFG)
    occ = np.argwhere(np.asarray(iv))
    assert len(occ) == 1
    ring, col = occ[0]
    assert abs(ring - (CFG.n_scan - 1) * CFG.fov_up_deg / 60.0) <= 1  # va=0
    assert abs(col - CFG.width // 2) <= 1  # az=0 -> pi offset -> mid column
    np.testing.assert_allclose(np.asarray(img)[ring, col], [10, 0, 0], atol=1e-6)


def test_extract_features_classifies_structure():
    scene = sim.RaycastScene()
    traj = sim.Trajectory()
    pts, val, _ = _scan(traj, 1.0, scene)
    feats = lf.extract_features(pts, val, CFG)
    n_edge = int(np.asarray(feats.edge_valid).sum())
    n_surf = int(np.asarray(feats.surf_valid).sum())
    assert n_surf > 200, f"expected many planar points, got {n_surf}"
    assert n_edge >= 4, f"expected some edge points, got {n_edge}"
    # planar points must lie on the scene surfaces (ground z=-1.5 or walls
    # y=+-12 in body frame approx at t=1 where rotation is small)


def test_scan_to_map_recovers_known_transform():
    """Register synthetic plane+line features against a dense map of the same
    surfaces; ground-truth offset must be recovered."""
    rng = np.random.default_rng(5)
    # map: 3 orthogonal planes + a vertical line of points
    n = 1500
    ground = np.stack([rng.uniform(-10, 10, n), rng.uniform(-10, 10, n), np.zeros(n)], -1)
    wall1 = np.stack([rng.uniform(-10, 10, n), np.full(n, 8.0), rng.uniform(0, 5, n)], -1)
    wall2 = np.stack([np.full(n, 9.0), rng.uniform(-10, 10, n), rng.uniform(0, 5, n)], -1)
    surf_map = np.concatenate([ground, wall1, wall2]).astype(np.float32)
    k = 400
    line = np.stack([np.full(k, 4.0), np.full(k, -3.0), np.linspace(0, 5, k)], -1)
    line2 = np.stack([np.full(k, -5.0), np.full(k, 2.0), np.linspace(0, 5, k)], -1)
    edge_map = np.concatenate([line, line2]).astype(np.float32)

    # scan features: subsample of the same structures, expressed in a body
    # frame offset by a known transform
    q_true = lie.so3_exp(jnp.asarray([0.02, -0.03, 0.05], jnp.float32))
    p_true = jnp.asarray([0.3, -0.2, 0.1], jnp.float32)
    R_true = np.asarray(lie.q2R(q_true))
    surf_scan_w = surf_map[rng.choice(len(surf_map), 600, replace=False)]
    edge_scan_w = edge_map[rng.choice(len(edge_map), 100, replace=False)]
    # body = R^T (w - p)
    surf_scan_b = ((surf_scan_w - np.asarray(p_true)) @ R_true).astype(np.float32)
    edge_scan_b = ((edge_scan_w - np.asarray(p_true)) @ R_true).astype(np.float32)

    feats = lf.LidarFeatures(
        edge=jnp.asarray(edge_scan_b), edge_valid=jnp.ones(100, bool),
        surf=jnp.asarray(surf_scan_b), surf_valid=jnp.ones(600, bool),
    )
    cfg = lo.OdomConfig(lidar=CFG)
    q0 = jnp.asarray([1.0, 0, 0, 0], jnp.float32)  # identity init (0.4 m off)
    p0 = jnp.zeros(3, jnp.float32)
    q_est, p_est = lo.scan_to_map(
        feats, jnp.asarray(edge_map), jnp.ones(len(edge_map), bool),
        jnp.asarray(surf_map), jnp.ones(len(surf_map), bool), q0, p0, cfg)
    assert np.linalg.norm(np.asarray(p_est) - np.asarray(p_true)) < 0.03
    ang = lie.so3_log(lie.qmul(lie.qconj(q_est), q_true))
    assert float(jnp.linalg.norm(ang)) < 0.01


def test_odometry_sequence_low_drift():
    """Full pipeline over a short synthetic sequence: extract -> register ->
    map update; trajectory error stays bounded."""
    scene = sim.RaycastScene()
    traj = sim.Trajectory(sim.TrajectoryConfig(speed=1.5))
    cfg = lo.OdomConfig(
        lidar=CFG, edge_map_cap=4096, surf_map_cap=8192,
        edge_map_voxel=0.3, surf_map_voxel=0.5)
    state = lo.init_state(cfg)
    dt_frame = 0.2
    errs = []
    for i in range(10):
        t = i * dt_frame
        pts, val, (R_gt, p_gt) = _scan(traj, t, scene, seed=100 + i)
        state, (q, p, _, _) = lo.odometry_step(state, pts, val, cfg)
        # odometry frame = first body frame; express ground truth there
        if i == 0:
            R0, p0 = R_gt, p_gt
        p_gt_local = R0.T @ (p_gt - p0)
        errs.append(np.linalg.norm(np.asarray(p) - p_gt_local))
    assert errs[-1] < 0.3, f"drift too large: {errs}"
    assert max(errs) < 0.5, f"trajectory error: {errs}"


def test_deskew_points_correctness():
    """Isolated deskew: distorted-scan points, corrected with the true scan
    motion, must land back on the analytic scene surfaces."""
    from vil_fusion_tpu.models.deskew import deskew_points

    scene = sim.RaycastScene()
    traj = sim.Trajectory(sim.TrajectoryConfig(speed=6.0))
    off = np.array([0, 0, 1.5])
    t_end, dt = 1.0, 0.15
    pts_d, val_d = sim.simulate_lidar_scan_distorted(
        scene, traj, t_end, dt, off, n_scan=32, width=900,
        fov_up_deg=30.0, fov_down_deg=-30.0)
    R_e = traj.rotation(t_end)
    p_e = traj.position(t_end) + off
    R_s = traj.rotation(t_end - dt)
    p_s = traj.position(t_end - dt) + off
    q_rel, p_rel = lie.pose_between(
        (jnp.asarray(sim.R_to_q(R_s), jnp.float32), jnp.asarray(p_s, jnp.float32)),
        (jnp.asarray(sim.R_to_q(R_e), jnp.float32), jnp.asarray(p_e, jnp.float32)))
    out = np.asarray(deskew_points(jnp.asarray(pts_d), jnp.asarray(val_d), q_rel, p_rel))

    def surf_dist(body_pts):
        W = body_pts @ R_e.T + p_e
        return np.minimum(np.abs(W[:, 2]), np.abs(np.abs(W[:, 1]) - 12.0))

    raw_med = np.median(surf_dist(pts_d[val_d]))
    fix_med = np.median(surf_dist(out[val_d]))
    assert fix_med < 0.3 * raw_med, (raw_med, fix_med)


def test_deskew_odometry_no_regression():
    """Closed-loop deskew (predicted motion + refined-map reinsertion) must
    not degrade odometry on distorted scans and should match/beat it late."""
    scene = sim.RaycastScene()
    traj = sim.Trajectory(sim.TrajectoryConfig(speed=6.0))  # ~0.9 m/scan
    off = np.array([0, 0, 1.5])
    frame_dt = 0.15

    def run(deskew):
        cfg = lo.OdomConfig(lidar=CFG, edge_map_cap=4096, surf_map_cap=8192,
                            edge_map_voxel=0.3, surf_map_voxel=0.5, deskew=deskew)
        state = lo.init_state(cfg)
        errs = []
        for i in range(8):
            t = i * frame_dt
            pts, val = sim.simulate_lidar_scan_distorted(
                scene, traj, t, frame_dt, off, n_scan=CFG.n_scan,
                width=CFG.width, fov_up_deg=CFG.fov_up_deg,
                fov_down_deg=CFG.fov_down_deg, max_range=CFG.max_range)
            state, (q, p, _, _) = lo.odometry_step(
                state, jnp.asarray(pts), jnp.asarray(val), cfg)
            R_gt = traj.rotation(t)
            p_gt = traj.position(t) + off
            if i == 0:
                R0, p0 = R_gt, p_gt
            errs.append(np.linalg.norm(np.asarray(p) - R0.T @ (p_gt - p0)))
        return np.array(errs)

    e_plain = run(False)
    e_deskew = run(True)
    # late frames (consistent motion-compensated map): at least as good
    assert e_deskew[-2:].mean() <= 1.05 * e_plain[-2:].mean(), (e_plain, e_deskew)
    assert e_deskew.max() < 0.35, e_deskew
