"""End-to-end sliding-window estimator test on a synthetic sequence.

Covers the full loop the reference runs per frame (estimator_node process():
IMU segment -> feature ingest -> triangulate -> BA -> marginalize -> slide)
with ground-truth oracles from the analytic simulator.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from vil_fusion_tpu.models import ba, estimator as est_mod, window
from vil_fusion_tpu.ops import lie
from vil_fusion_tpu.runtime import sim

R_BC = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
FRAME_DT = 0.1
IMU_RATE = 200.0


MAX_FEATS_PER_FRAME = 60  # emulates the tracker's MAX_CNT budget (setMask)


def select_tracked(ids, prev_ids, cap=MAX_FEATS_PER_FRAME):
    """Track-continuity priority like FeatureTracker::setMask: keep ids seen
    last frame first, then fill with new detections up to the budget."""
    prev = [i for i in ids if i in prev_ids]
    new = [i for i in ids if i not in prev_ids]
    keep = (prev + new)[:cap]
    keep_set = set(keep)
    sel = np.array([i in keep_set for i in ids])
    return sel


def run_sequence(n_frames=25, with_lidar=True, lidar_depth_frac=0.6,
                 pix_noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    traj = sim.Trajectory()
    world = sim.LandmarkWorld(n=400, seed=seed)
    cfg = est_mod.EstimatorConfig(
        ba=ba.BAConfig(use_lidar=with_lidar, max_iters=8))
    est = est_mod.VILEstimator(cfg)
    est.set_extrinsics(qic=sim.R_to_q(R_BC), tic=np.zeros(3))

    t0 = 1.0
    q0, p0 = traj.pose(t0)
    est.set_initial_state(p=p0, q=q0, v=traj.velocity(t0))

    errs = []
    for i in range(n_frames):
        t = t0 + i * FRAME_DT
        # IMU segment since previous frame
        if i == 0:
            acc = gyr = np.zeros((0, 3))
            dts = np.zeros((0,))
        else:
            ts_i, acc, gyr = sim.simulate_imu(traj, t - FRAME_DT, t, IMU_RATE)
            dts = np.diff(ts_i)
        # camera features (budgeted with track continuity like the tracker)
        ids, xy, z = sim.project_landmarks(
            world, traj.rotation(t), traj.position(t), R_bc=R_BC)
        sel = select_tracked(ids.tolist(), prev_ids if i > 0 else set())
        ids, xy, z = ids[sel], xy[sel], z[sel]
        prev_ids = set(ids.tolist())
        if pix_noise > 0:
            xy = xy + rng.normal(0, pix_noise, xy.shape)
        depth = np.where(rng.random(len(ids)) < lidar_depth_frac, z, 0.0)
        # lidar relative pose (ground truth with small noise)
        lidar_q = lidar_p = None
        if with_lidar and i > 0:
            q_prev, p_prev = traj.pose(t - FRAME_DT)
            q_cur, p_cur = traj.pose(t)
            qr, pr = lie.pose_between(
                (jnp.asarray(q_prev, jnp.float32), jnp.asarray(p_prev, jnp.float32)),
                (jnp.asarray(q_cur, jnp.float32), jnp.asarray(p_cur, jnp.float32)))
            lidar_q, lidar_p = np.asarray(qr), np.asarray(pr)

        p_est, q_est, v_est = est.process_frame(
            acc, gyr, dts, ids, xy, obs_depth=depth,
            lidar_q_rel=lidar_q, lidar_p_rel=lidar_p)
        slot = min(i, window.K - 1)
        q_gt, p_gt = traj.pose(t)
        errs.append(np.linalg.norm(p_est - p_gt))
    assert not est.failed
    return np.array(errs), est


@pytest.mark.slow
def test_estimator_tracks_truth_with_lidar():
    errs, est = run_sequence(n_frames=25, with_lidar=True)
    # after the window fills (frame 10) the estimator must track tightly
    assert errs[10:].max() < 0.10, errs
    assert errs[-1] < 0.05, errs


@pytest.mark.slow
def test_gauge_transform_exact_for_relocalization_feedback():
    """apply_drift (relo feedback re-anchoring) must be an exact gauge
    transform: the BA objective is invariant, and a drifted clone fed the
    SAME (frame-invariant) inputs stays related by exactly (R_d, t_d)."""
    import copy

    _, est = run_sequence(n_frames=14, with_lidar=True)
    est2 = copy.copy(est)
    yaw = np.deg2rad(25.0)
    c, s = np.cos(yaw), np.sin(yaw)
    R_d = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    t_d = np.array([3.0, -2.0, 0.5], np.float32)

    cost_before = float(ba.total_cost(est.window, est.feats, est.pre,
                                      est.lidar, est.prior, est.cfg.ba))
    est2.apply_drift(R_d, t_d)
    cost_after = float(ba.total_cost(est2.window, est2.feats, est2.pre,
                                     est2.lidar, est2.prior, est2.cfg.ba))
    np.testing.assert_allclose(cost_after, cost_before,
                               rtol=1e-4, atol=1e-3)

    # continue BOTH estimators on identical inputs (IMU samples, normalized
    # camera obs and lidar relative poses are all invariant to a world-frame
    # yaw+t); after 4 more full BA/marginalization/slide cycles the states
    # must still differ by exactly the applied transform.
    traj = sim.Trajectory()
    world = sim.LandmarkWorld(n=400, seed=0)
    t0 = 1.0
    prev_ids: set = set()
    for i in range(14, 18):
        t = t0 + i * FRAME_DT
        ts_i, acc, gyr = sim.simulate_imu(traj, t - FRAME_DT, t, IMU_RATE)
        dts = np.diff(ts_i)
        ids, xy, z = sim.project_landmarks(
            world, traj.rotation(t), traj.position(t), R_bc=R_BC)
        sel = select_tracked(ids.tolist(), prev_ids)
        ids, xy, z = ids[sel], xy[sel], z[sel]
        prev_ids = set(ids.tolist())
        q_prev, p_prev = traj.pose(t - FRAME_DT)
        q_cur, p_cur = traj.pose(t)
        qr, pr = lie.pose_between(
            (jnp.asarray(q_prev, jnp.float32), jnp.asarray(p_prev, jnp.float32)),
            (jnp.asarray(q_cur, jnp.float32), jnp.asarray(p_cur, jnp.float32)))
        args = dict(obs_depth=np.where(np.arange(len(ids)) % 2 == 0, z, 0.0),
                    lidar_q_rel=np.asarray(qr), lidar_p_rel=np.asarray(pr))
        p1, q1, v1 = est.process_frame(acc, gyr, dts, ids, xy, **args)
        p2, q2, v2 = est2.process_frame(acc, gyr, dts, ids, xy, **args)

    np.testing.assert_allclose(p2, R_d @ p1 + t_d, atol=2e-2)
    np.testing.assert_allclose(v2, R_d @ v1, atol=2e-2)
    q_expect = np.asarray(lie.qmul(
        jnp.asarray(lie.R2q(jnp.asarray(R_d, jnp.float32))),
        jnp.asarray(q1, jnp.float32)))
    # quaternion sign ambiguity
    dot = abs(float(np.dot(q_expect, q2)))
    assert dot > 1.0 - 1e-4, (q_expect, q2)
    assert not est2.failed


@pytest.mark.slow
def test_estimator_vio_only():
    errs, est = run_sequence(n_frames=20, with_lidar=False, lidar_depth_frac=0.0)
    assert errs[10:].max() < 0.20, errs


@pytest.mark.slow
def test_estimator_with_noise():
    errs, est = run_sequence(n_frames=20, with_lidar=True,
                             pix_noise=0.5 / 460.0, seed=3)
    assert errs[10:].max() < 0.15, errs


@pytest.mark.slow
def test_estimator_cold_start_initialization():
    """No oracle state: the estimator must self-initialize (SfM + IMU
    alignment) once the window fills, then track in its own gravity-aligned
    frame. Compare against ground truth after 4-dof (yaw+translation)
    alignment at the init epoch."""
    from vil_fusion_tpu.ops import lie as lie_ops

    rng = np.random.default_rng(11)
    traj = sim.Trajectory()
    world = sim.LandmarkWorld(n=400, seed=11)
    cfg = est_mod.EstimatorConfig(ba=ba.BAConfig(use_lidar=False, max_iters=8))
    est = est_mod.VILEstimator(cfg)
    est.set_extrinsics(qic=sim.R_to_q(R_BC), tic=np.zeros(3))

    t0 = 1.0
    frame_dt = 0.15
    n_frames = 22
    results = []
    prev_ids = set()
    for i in range(n_frames):
        t = t0 + i * frame_dt
        if i == 0:
            acc = gyr = np.zeros((0, 3)); dts = np.zeros((0,))
        else:
            ts_i, acc, gyr = sim.simulate_imu(traj, t - frame_dt, t, IMU_RATE)
            dts = np.diff(ts_i)
        ids, xy, z = sim.project_landmarks(
            world, traj.rotation(t), traj.position(t), R_bc=R_BC)
        sel = select_tracked(ids.tolist(), prev_ids)
        ids, xy = ids[sel], xy[sel]
        prev_ids = set(ids.tolist())
        p_est, q_est, v_est = est.process_frame(acc, gyr, dts, ids, xy)
        results.append((t, p_est, q_est, est.initialized))

    init_frame = next(i for i, r in enumerate(results) if r[3])
    assert init_frame <= window.K + 1, "initialization too late"
    # alignment: estimated world -> true world via the pose at init epoch
    t_i, p_i, q_i, _ = results[init_frame]
    # estimated frame of the CURRENT newest at init == body at t_i
    R_w_est = np.asarray(lie_ops.q2R(jnp.asarray(q_i, jnp.float32)))
    R_w_gt = traj.rotation(t_i)
    # yaw-only alignment (pitch/roll observable via gravity)
    R_align = R_w_gt @ R_w_est.T
    ypr = np.asarray(lie_ops.R2ypr(jnp.asarray(R_align, jnp.float32)))
    R_align = np.asarray(lie_ops.ypr2R(jnp.asarray([ypr[0], 0.0, 0.0], jnp.float32)))
    p_off = traj.position(t_i) - R_align @ np.asarray(p_i)
    errs = []
    for t, p_e, q_e, _ in results[init_frame:]:
        p_aligned = R_align @ np.asarray(p_e) + p_off
        errs.append(np.linalg.norm(p_aligned - traj.position(t)))
    errs = np.array(errs)
    assert errs.max() < 0.30, errs
    assert errs[-1] < 0.20, errs
