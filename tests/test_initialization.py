"""Initialization tests: SfM, gyro-bias solve, visual-IMU alignment."""
import jax
import jax.numpy as jnp
import numpy as np

from vil_fusion_tpu.models import imu as imu_mod, initialization as init_mod, window
from vil_fusion_tpu.ops import lie
from vil_fusion_tpu.runtime import sim

R_BC = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
FRAME_DT = 0.3  # generous baseline for SfM
IMU_RATE = 200.0


def camera_pose(traj, t):
    R_wb = traj.rotation(t)
    R_wc = R_wb @ R_BC
    p_wc = traj.position(t)
    return R_wc, p_wc


def make_obs(seed=0, n=400):
    """(F, K, 2) observations + valid + ground-truth camera poses."""
    traj = sim.Trajectory()
    world = sim.LandmarkWorld(n=n, seed=seed)
    t0 = 1.0
    ts = t0 + np.arange(window.K) * FRAME_DT
    F_CAP = 160
    obs = np.zeros((F_CAP, window.K, 2), np.float32)
    valid = np.zeros((F_CAP, window.K), bool)
    per_frame = []
    for t in ts:
        ids, xy, z = sim.project_landmarks(
            world, traj.rotation(t), traj.position(t), R_bc=R_BC)
        per_frame.append(dict(zip(ids.tolist(), xy)))
    slot = 0
    for lm in range(n):
        frames = [i for i in range(window.K) if lm in per_frame[i]]
        if len(frames) < 4 or slot >= F_CAP:
            continue
        for i in frames:
            obs[slot, i] = per_frame[i][lm]
            valid[slot, i] = True
        slot += 1
    Rs, ps = zip(*[camera_pose(traj, t) for t in ts])
    return (jnp.asarray(obs), jnp.asarray(valid), np.stack(Rs), np.stack(ps),
            traj, ts)


def test_relative_pose_ransac():
    obs, valid, Rs, ps, traj, ts = make_obs()
    x1 = obs[:, 0]
    x2 = obs[:, window.K - 1]
    both = valid[:, 0] & valid[:, window.K - 1]
    R, t, inl, n_good = init_mod.relative_pose_ransac(
        x1, x2, both, jax.random.PRNGKey(1))
    # ground truth: x_c2 = R_gt x_c1 + t_gt
    R_gt = Rs[-1].T @ Rs[0]
    t_gt = Rs[-1].T @ (ps[0] - ps[-1])
    t_gt = t_gt / np.linalg.norm(t_gt)
    assert int(n_good) > 20
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=0.02)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=0.03)


def test_global_sfm_recovers_geometry():
    obs, valid, Rs, ps, traj, ts = make_obs()
    sfm, pts_w, pts_ok = init_mod.global_sfm(obs, valid, jax.random.PRNGKey(0))
    assert bool(sfm.ok)
    l = int(sfm.l_frame)
    # compare relative rotations to ground truth
    for i in range(window.K):
        R_est = np.asarray(lie.q2R(sfm.q[i]))
        R_gt_rel = Rs[l].T @ Rs[i]
        err = np.linalg.norm(
            np.asarray(lie.so3_log(lie.R2q(jnp.asarray(R_est @ R_gt_rel.T, jnp.float32)))))
        assert err < 0.02, (i, err)
    # translations up to a single global scale
    p_gt_rel = (ps - ps[l]) @ Rs[l]  # in frame-l camera coords
    p_est = np.asarray(sfm.p)
    num = (p_est * p_gt_rel).sum()
    den = (p_est * p_est).sum() + 1e-12
    s = num / den
    assert s > 0
    np.testing.assert_allclose(p_est * s, p_gt_rel, atol=0.05)


def test_gyro_bias_solve():
    traj = sim.Trajectory()
    ts = 1.0 + np.arange(window.K) * 0.1
    bg_true = np.array([0.01, -0.02, 0.015])
    dq = [jnp.asarray([1.0, 0, 0, 0], jnp.float32)]
    jac = [jnp.zeros((3, 3), jnp.float32)]
    for i in range(1, window.K):
        t_s, acc, gyr = sim.simulate_imu(traj, ts[i - 1], ts[i], IMU_RATE,
                                         bias_g=bg_true)
        pre = imu_mod.preintegrate(
            jnp.asarray(acc, jnp.float32), jnp.asarray(gyr, jnp.float32),
            jnp.asarray(np.diff(t_s), jnp.float32), jnp.zeros(3), jnp.zeros(3))
        dq.append(pre.dq)
        jac.append(pre.jac[3:6, 12:15])
    q_body = jnp.asarray(np.stack([sim.R_to_q(traj.rotation(t)) for t in ts]), jnp.float32)
    qic = jnp.asarray(sim.R_to_q(R_BC), jnp.float32)
    q_cam = lie.qmul(q_body, qic[None, :])
    dbg = init_mod.solve_gyro_bias(
        q_cam, qic, jnp.stack(dq), jnp.stack(jac), jnp.ones(window.K, bool))
    np.testing.assert_allclose(np.asarray(dbg), bg_true, atol=2e-3)


def test_linear_alignment_scale_gravity():
    traj = sim.Trajectory()
    ts = 1.0 + np.arange(window.K) * 0.2
    scale_true = 0.25  # SfM positions = scale_true * metric
    # body rotations (world frame = world here; gravity (0,0,9.81))
    q_b = jnp.asarray(np.stack([sim.R_to_q(traj.rotation(t)) for t in ts]), jnp.float32)
    p_c = []
    for t in ts:
        R_wc, p_wc = camera_pose(traj, t)
        p_c.append(scale_true * p_wc)  # camera positions up to scale, tic=0
    p_c = jnp.asarray(np.stack(p_c), jnp.float32)
    dp = [jnp.zeros(3)]
    dv = [jnp.zeros(3)]
    dts = [jnp.zeros(())]
    for i in range(1, window.K):
        t_s, acc, gyr = sim.simulate_imu(traj, ts[i - 1], ts[i], IMU_RATE)
        pre = imu_mod.preintegrate(
            jnp.asarray(acc, jnp.float32), jnp.asarray(gyr, jnp.float32),
            jnp.asarray(np.diff(t_s), jnp.float32), jnp.zeros(3), jnp.zeros(3))
        dp.append(pre.dp)
        dv.append(pre.dv)
        dts.append(pre.dt_sum)
    valid = jnp.ones(window.K, bool)
    v, g, s = init_mod.linear_alignment(
        q_b, p_c, jnp.stack(dp), jnp.stack(dv), jnp.stack(dts), valid,
        jnp.zeros(3))
    # scale maps SfM camera positions to metric: s * p_c == metric, so
    # s == 1/scale_true
    assert float(s) > 0
    np.testing.assert_allclose(float(s), 1.0 / scale_true, rtol=0.02)
    g_ref, v_ref, s_ref = init_mod.refine_gravity(
        q_b, p_c, jnp.stack(dp), jnp.stack(dv), jnp.stack(dts), valid,
        jnp.zeros(3), g)
    np.testing.assert_allclose(np.asarray(g_ref), sim.GRAVITY, atol=0.05)
    np.testing.assert_allclose(float(s_ref), 1.0 / scale_true, rtol=0.02)
    v_true = np.stack([traj.rotation(t).T @ traj.velocity(t) for t in ts])
    np.testing.assert_allclose(np.asarray(v_ref), v_true, atol=0.05)


def test_initial_ex_rotation():
    rng = np.random.default_rng(3)
    qic_true = jnp.asarray(sim.R_to_q(R_BC), jnp.float32)
    q_imu = []
    q_cam = []
    for _ in range(30):
        th = rng.uniform(-0.3, 0.3, 3).astype(np.float32)
        qi = lie.so3_exp(jnp.asarray(th))
        qc = lie.qmul(lie.qmul(lie.qconj(qic_true), qi), qic_true)
        q_imu.append(qi)
        q_cam.append(qc)
    q_est = init_mod.initial_ex_rotation(jnp.stack(q_cam), jnp.stack(q_imu), 30)
    err = lie.so3_log(lie.qmul(lie.qconj(q_est), qic_true))
    assert float(jnp.linalg.norm(err)) < 1e-3, q_est


def test_fixed_scale_alignment_matches_truth():
    """linear_alignment_fixed_scale + refine_gravity(s_fixed): with the
    metric scale pinned (vil mode: from the lidar odometry) the [v, g] solve
    recovers gravity and body velocities exactly on clean data — and the
    lidar scale estimator recovers the pin from per-segment translations."""
    traj = sim.Trajectory()
    ts = 1.0 + np.arange(window.K) * 0.2
    scale_true = 0.25
    q_b = jnp.asarray(np.stack([sim.R_to_q(traj.rotation(t)) for t in ts]), jnp.float32)
    p_c = []
    for t in ts:
        R_wc, p_wc = camera_pose(traj, t)
        p_c.append(scale_true * p_wc)
    p_c = jnp.asarray(np.stack(p_c), jnp.float32)
    dp = [jnp.zeros(3)]; dv = [jnp.zeros(3)]; dts = [jnp.zeros(())]
    lidar_rel = [np.zeros(3)]
    for i in range(1, window.K):
        t_s, acc, gyr = sim.simulate_imu(traj, ts[i - 1], ts[i], IMU_RATE)
        pre = imu_mod.preintegrate(
            jnp.asarray(acc, jnp.float32), jnp.asarray(gyr, jnp.float32),
            jnp.asarray(np.diff(t_s), jnp.float32), jnp.zeros(3), jnp.zeros(3))
        dp.append(pre.dp); dv.append(pre.dv); dts.append(pre.dt_sum)
        # metric body-frame relative translation (what lidar odometry measures)
        lidar_rel.append(traj.rotation(ts[i - 1]).T
                         @ (traj.position(ts[i]) - traj.position(ts[i - 1])))
    valid = jnp.ones(window.K, bool)

    s_est, n_used = init_mod.lidar_scale_estimate(
        p_c, np.stack(lidar_rel), np.ones(window.K, bool))
    assert n_used >= 3
    np.testing.assert_allclose(s_est, 1.0 / scale_true, rtol=0.02)

    v, g = init_mod.linear_alignment_fixed_scale(
        q_b, p_c, jnp.stack(dp), jnp.stack(dv), jnp.stack(dts), valid,
        jnp.zeros(3), jnp.float32(s_est))
    np.testing.assert_allclose(np.asarray(g), sim.GRAVITY, atol=0.08)
    g_ref, v_ref, s_ref = init_mod.refine_gravity(
        q_b, p_c, jnp.stack(dp), jnp.stack(dv), jnp.stack(dts), valid,
        jnp.zeros(3), g, s_fixed=jnp.float32(s_est))
    np.testing.assert_allclose(np.asarray(g_ref), sim.GRAVITY, atol=0.05)
    np.testing.assert_allclose(float(s_ref), 1.0 / scale_true, rtol=0.02)
    v_true = np.stack([traj.rotation(t).T @ traj.velocity(t) for t in ts])
    np.testing.assert_allclose(np.asarray(v_ref), v_true, atol=0.05)
