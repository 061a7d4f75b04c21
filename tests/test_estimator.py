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
def test_estimator_vio_only():
    errs, est = run_sequence(n_frames=20, with_lidar=False, lidar_depth_frac=0.0)
    assert errs[10:].max() < 0.20, errs


@pytest.mark.slow
def test_estimator_with_noise():
    errs, est = run_sequence(n_frames=20, with_lidar=True,
                             pix_noise=0.5 / 460.0, seed=3)
    assert errs[10:].max() < 0.15, errs
