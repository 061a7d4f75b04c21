"""Sliding-window BA tests: recover a perturbed window on synthetic VIO data."""
import jax
import jax.numpy as jnp
import numpy as np

from vil_fusion_tpu.models import ba, imu as imu_mod, window
from vil_fusion_tpu.ops import lie
from vil_fusion_tpu.runtime import sim

F_CAP = 96
IMU_CAP = 32
FRAME_DT = 0.1
IMU_RATE = 200.0

# body FLU -> camera RDF (z forward along body +x); columns = camera axes in body
R_BC = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])


def make_vio_problem(seed=0, n_landmarks=300, depth_noise=0.0, dtype=np.float32):
    """Build (state_gt, feats, pre, lidar) from the analytic simulator."""
    rng = np.random.default_rng(seed)
    jdt = jnp.dtype(dtype)
    traj = sim.Trajectory()
    world = sim.LandmarkWorld(n=n_landmarks, seed=seed)
    t0 = 1.0
    ts = t0 + np.arange(window.K) * FRAME_DT

    # ground-truth window state
    qs = np.stack([traj.pose(t)[0] for t in ts])
    ps = np.stack([traj.pose(t)[1] for t in ts])
    vs = np.stack([traj.velocity(t) for t in ts])
    state = window.init_window(dtype=jdt)._replace(
        p=jnp.asarray(ps, jdt), q=jnp.asarray(qs, jdt),
        v=jnp.asarray(vs, jdt),
        qic=jnp.asarray(sim.R_to_q(R_BC), jdt))

    # IMU segments
    pre = window.init_preint(IMU_CAP, dtype=jdt)
    rows = []
    for i in range(window.K):
        if i == 0:
            rows.append(jax.tree.map(lambda a: a[0], pre._asdict()))
            continue
        _, acc, gyr = sim.simulate_imu(traj, ts[i - 1], ts[i], IMU_RATE)
        n = len(acc)
        acc_b = np.zeros((IMU_CAP, 3), dtype)
        gyr_b = np.zeros((IMU_CAP, 3), dtype)
        dt_b = np.zeros((IMU_CAP - 1,), dtype)
        acc_b[:n] = acc
        gyr_b[:n] = gyr
        acc_b[n:] = acc[-1]
        gyr_b[n:] = gyr[-1]
        dt_b[: n - 1] = 1.0 / IMU_RATE
        rows.append(window.make_segment(
            jnp.asarray(acc_b), jnp.asarray(gyr_b), jnp.asarray(dt_b),
            jnp.int32(n), jnp.zeros(3, jdt), jnp.zeros(3, jdt),
            imu_mod.ImuNoise(), IMU_CAP))
    pre = window.StackedPreint(**{
        k: jnp.stack([jnp.asarray(r[k]) for r in rows]) for k in pre._asdict()})

    # feature tracks: landmarks visible in >= 3 frames
    feats = window.init_features(F_CAP, dtype=jdt)
    obs = np.zeros((F_CAP, window.K, 2), dtype)
    obs_valid = np.zeros((F_CAP, window.K), bool)
    start = np.zeros(F_CAP, np.int32)
    inv_depth = np.full(F_CAP, -1.0, dtype)
    active = np.zeros(F_CAP, bool)
    per_frame = []
    for i, t in enumerate(ts):
        ids, xy, z = sim.project_landmarks(
            world, traj.rotation(t), traj.position(t), R_bc=R_BC)
        per_frame.append(dict(zip(ids.tolist(), zip(xy, z))))
    slot = 0
    for lm in range(n_landmarks):
        frames = [i for i in range(window.K) if lm in per_frame[i]]
        if len(frames) < 3 or slot >= F_CAP:
            continue
        s = frames[0]
        for i in frames:
            obs[slot, i] = per_frame[i][lm][0]
            obs_valid[slot, i] = True
        start[slot] = s
        depth_gt = per_frame[s][lm][1]
        inv_depth[slot] = 1.0 / (depth_gt * (1 + depth_noise * rng.normal()))
        active[slot] = True
        slot += 1
    feats = feats._replace(
        obs=jnp.asarray(obs), obs_valid=jnp.asarray(obs_valid),
        start=jnp.asarray(start), inv_depth=jnp.asarray(inv_depth),
        active=jnp.asarray(active))

    # lidar inter-frame constraints: ground-truth relative body poses
    q_rel = np.zeros((window.K, 4), dtype)
    p_rel = np.zeros((window.K, 3), dtype)
    q_rel[:, 0] = 1.0
    lvalid = np.zeros(window.K, bool)
    for i in range(1, window.K):
        qr, pr = lie.pose_between(
            (jnp.asarray(qs[i - 1], jdt), jnp.asarray(ps[i - 1], jdt)),
            (jnp.asarray(qs[i], jdt), jnp.asarray(ps[i], jdt)))
        q_rel[i] = np.asarray(qr)
        p_rel[i] = np.asarray(pr)
        lvalid[i] = True
    lidar = window.LidarConstraints(
        q_rel=jnp.asarray(q_rel), p_rel=jnp.asarray(p_rel), valid=jnp.asarray(lvalid))
    return state, feats, pre, lidar, int(active.sum())


def perturb(state, seed=1, pos_sig=0.05, rot_sig=0.01, vel_sig=0.05):
    """Perturb frames 1..K-1 (frame 0 anchors the gauge)."""
    rng = np.random.default_rng(seed)
    dtype = np.dtype(state.p.dtype.name)
    dp = rng.normal(0, pos_sig, (window.K, 3)).astype(dtype)
    dth = rng.normal(0, rot_sig, (window.K, 3)).astype(dtype)
    dv = rng.normal(0, vel_sig, (window.K, 3)).astype(dtype)
    dp[0] = 0
    dth[0] = 0
    dv[0] = 0
    q_new, p_new = lie.pose_retract(
        (state.q, state.p), jnp.asarray(np.concatenate([dp, dth], -1)))
    return state._replace(p=p_new, q=q_new, v=state.v + jnp.asarray(dv))


def _pos_err(state, state_gt):
    return float(jnp.max(jnp.linalg.norm(state.p - state_gt.p, axis=-1)))


def test_residuals_near_zero_at_truth():
    state, feats, pre, lidar, nf = make_vio_problem()
    assert nf > 30
    cfg = ba.BAConfig()
    prior = ba.empty_prior(state)
    cost = ba.total_cost(state, feats, pre, lidar, prior, cfg)
    # projection residuals are exactly 0 (exact depths); IMU residuals tiny
    assert float(cost) < 1.0, float(cost)


def test_optimize_recovers_perturbed_window():
    state_gt, feats, pre, lidar, _ = make_vio_problem()
    state0 = perturb(state_gt)
    err0 = _pos_err(state0, state_gt)
    # cold start from a 14 cm perturbation: give the solver triple the
    # runtime budget (at runtime BA starts from IMU-propagated states and
    # 8 iterations suffice — see test_depth_perturbation_recovered).
    # Convergence trace at this geometry: 16 iters -> 2.1 cm, 24 -> 0.99 cm,
    # 32 -> 0.76 cm (the graduated Cauchy schedule spends the first iters
    # at a wide kernel, so cold-start convergence lags the warm-start case).
    cfg = ba.BAConfig(max_iters=24)
    prior = ba.empty_prior(state0)
    state1, feats1, cost = ba.optimize(state0, feats, pre, lidar, prior, cfg)
    err1 = _pos_err(state1, state_gt)
    assert err1 < 0.25 * err0, (err0, err1)
    assert err1 < 0.02, err1
    assert float(cost) < 5.0


def test_optimize_without_lidar_vio_only():
    state_gt, feats, pre, lidar, _ = make_vio_problem()
    state0 = perturb(state_gt, seed=2)
    cfg = ba.BAConfig(use_lidar=False)
    prior = ba.empty_prior(state0)
    state1, _, _ = ba.optimize(state0, feats, pre, lidar, prior, cfg)
    err0 = _pos_err(state0, state_gt)
    err1 = _pos_err(state1, state_gt)
    assert err1 < 0.4 * err0, (err0, err1)


def test_depth_perturbation_recovered():
    state_gt, feats, pre, lidar, nf = make_vio_problem(depth_noise=0.05)
    cfg = ba.BAConfig()
    prior = ba.empty_prior(state_gt)
    state1, feats1, _ = ba.optimize(state_gt, feats, pre, lidar, prior, cfg)
    # depths should move toward truth: residual cost near zero
    cost = ba.total_cost(state1, feats1, pre, lidar, prior, cfg)
    assert float(cost) < 2.0, float(cost)


def test_lidar_flag_depths_held_constant():
    state_gt, feats, pre, lidar, _ = make_vio_problem(depth_noise=0.10)
    flags = jnp.zeros(F_CAP, bool).at[:F_CAP // 2].set(True)
    feats = feats._replace(lidar_flag=flags)
    cfg = ba.BAConfig()
    prior = ba.empty_prior(state_gt)
    _, feats1, _ = ba.optimize(state_gt, feats, pre, lidar, prior, cfg)
    d0 = np.asarray(feats.inv_depth)
    d1 = np.asarray(feats1.inv_depth)
    held = np.asarray(flags) & (d0 > 0)
    free = ~np.asarray(flags) & (d0 > 0) & np.asarray(feats.active)
    np.testing.assert_allclose(d1[held], d0[held], atol=1e-7)
    assert np.abs(d1[free] - d0[free]).max() > 1e-5  # free depths moved


def test_extrinsic_self_calibration():
    """estimate_extrinsic=True: a perturbed camera-IMU rotation must be
    pulled back toward truth by the BA (C10 extrinsic self-calib hook)."""
    state_gt, feats, pre, lidar, _ = make_vio_problem()
    # perturb the extrinsic rotation by ~2 deg
    dq = lie.so3_exp(jnp.asarray([0.02, -0.03, 0.015], jnp.float32))
    state0 = state_gt._replace(qic=lie.qmul(state_gt.qic, dq))
    err0 = float(jnp.linalg.norm(lie.so3_log(
        lie.qmul(lie.qconj(state0.qic), state_gt.qic))))
    cfg = ba.BAConfig(estimate_extrinsic=True, max_iters=16)
    prior = ba.empty_prior(state0)
    state1, _, _ = ba.optimize(state0, feats, pre, lidar, prior, cfg)
    err1 = float(jnp.linalg.norm(lie.so3_log(
        lie.qmul(lie.qconj(state1.qic), state_gt.qic))))
    assert err1 < 0.35 * err0, (err0, err1)


def test_td_estimation():
    """estimate_td=True: synthetic time offset applied to observations via
    their velocities must be recovered (ProjectionTdFactor capability)."""
    state_gt, feats, pre, lidar, _ = make_vio_problem()
    td_true = 0.02
    rng = np.random.default_rng(4)
    # synthesize velocities and shift observations: obs_measured = obs_true +
    # td * vel (the td factor corrects obs by -td * vel)
    vel = rng.uniform(-0.5, 0.5, feats.vel.shape).astype(np.float32)
    feats = feats._replace(
        vel=jnp.asarray(vel),
        obs=feats.obs + td_true * jnp.asarray(vel))
    cfg = ba.BAConfig(estimate_td=True, max_iters=16)
    prior = ba.empty_prior(state_gt)
    state1, _, _ = ba.optimize(state_gt, feats, pre, lidar, prior, cfg)
    assert abs(float(state1.td) - td_true) < 0.006, float(state1.td)


def test_rolling_shutter_row_terms():
    """Nonzero TR: per-observation readout shifts (tshift channel, the
    reference's TR/ROW row terms, projection_td_factor.cpp:51-52) must be
    compensated exactly; ignoring them biases the cost at ground truth."""
    state_gt, feats, pre, lidar, _ = make_vio_problem()
    rng = np.random.default_rng(5)
    vel = rng.uniform(-0.5, 0.5, feats.vel.shape).astype(np.float32)
    # rows spread over the frame at TR = 30 ms -> shifts within +-15 ms
    tsh = rng.uniform(-0.015, 0.015, feats.tshift.shape).astype(np.float32)
    feats_rs = feats._replace(
        vel=jnp.asarray(vel),
        obs=feats.obs + jnp.asarray(tsh)[:, :, None] * jnp.asarray(vel),
        tshift=jnp.asarray(tsh))
    cfg = ba.BAConfig(max_iters=8)
    prior = ba.empty_prior(state_gt)
    c_with = float(ba.total_cost(state_gt, feats_rs, pre, lidar, prior, cfg))
    c_without = float(ba.total_cost(
        state_gt, feats_rs._replace(tshift=jnp.zeros_like(feats_rs.tshift)),
        pre, lidar, prior, cfg))
    assert c_with < 0.02 * c_without, (c_with, c_without)
