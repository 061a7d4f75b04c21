"""Loop-closure stack tests: ScanContext, ICP, pose graph, global fusion."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vil_fusion_tpu.models import global_fusion as gf
from vil_fusion_tpu.models import icp as icp_mod
from vil_fusion_tpu.models import posegraph as pg
from vil_fusion_tpu.models import scancontext as sc
from vil_fusion_tpu.ops import lie
from vil_fusion_tpu.runtime import sim


def _scan_at(scene, R, p, n_scan=32, width=900):
    pts, val = sim.simulate_lidar_scan(
        scene, R, p, n_scan=n_scan, width=width, fov_up_deg=30.0,
        fov_down_deg=-30.0, max_range=80.0)
    return jnp.asarray(pts), jnp.asarray(val)


def _yaw_R(yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def test_scancontext_detects_revisit_with_yaw():
    scene = sim.RaycastScene()
    p0 = np.array([20.0, 2.0, 1.5])
    db = sc.init_db(256)
    # populate database along a path
    for i in range(40):
        p = p0 + np.array([1.2 * i, 0.1 * i, 0.0])
        pts, val = _scan_at(scene, _yaw_R(0.05 * i), p)
        db = sc.add_keyframe(db, sc.make_descriptor(pts, val))
    # revisit keyframe 2's place with a 90-degree yaw
    p_re = p0 + np.array([2.4, 0.2, 0.0])
    pts, val = _scan_at(scene, _yaw_R(np.pi / 2), p_re)
    q_desc = sc.make_descriptor(pts, val)
    idx, dist, shift = sc.detect_loop(db, q_desc)
    assert float(dist) < sc.SC_DIST_THRES, float(dist)
    assert abs(int(idx) - 2) <= 2, int(idx)
    yaw_est = float(sc.shift_to_yaw(shift))
    yaw_err = (yaw_est - np.pi / 2 + np.pi) % (2 * np.pi) - np.pi
    assert abs(yaw_err) < 0.3, yaw_est


def test_scancontext_rejects_distinct_places():
    scene = sim.RaycastScene()
    db = sc.init_db(256)
    for i in range(35):
        pts, val = _scan_at(scene, _yaw_R(0.0), np.array([1.5 * i, -2.0, 1.5]))
        db = sc.add_keyframe(db, sc.make_descriptor(pts, val))
    # a genuinely different place (near a box cluster far from early frames)
    pts, val = _scan_at(scene, _yaw_R(0.3), np.array([104.0, 5.0, 1.5]))
    idx, dist, shift = sc.detect_loop(db, sc.make_descriptor(pts, val))
    # recency exclusion leaves only far-away early frames -> high distance
    assert float(dist) > 0.1


def test_icp_recovers_transform():
    rng = np.random.default_rng(0)
    # structured target: two walls + ground
    n = 1200
    tgt = np.concatenate([
        np.stack([rng.uniform(-10, 10, n), rng.uniform(-8, 8, n), np.zeros(n)], -1),
        np.stack([rng.uniform(-10, 10, n), np.full(n, 8.0), rng.uniform(0, 4, n)], -1),
        np.stack([np.full(n, 10.0), rng.uniform(-8, 8, n), rng.uniform(0, 4, n)], -1),
    ]).astype(np.float32)
    q_true = lie.so3_exp(jnp.asarray([0.03, -0.02, 0.3], jnp.float32))
    p_true = jnp.asarray([0.8, -0.5, 0.2], jnp.float32)
    R_true = np.asarray(lie.q2R(q_true))
    src = ((tgt[::2] - np.asarray(p_true)) @ R_true).astype(np.float32)
    q0 = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    p0 = jnp.zeros(3, jnp.float32)
    q_est, p_est, fit = icp_mod.icp_point2point(
        jnp.asarray(src), jnp.ones(len(src), bool),
        jnp.asarray(tgt), jnp.ones(len(tgt), bool), q0, p0)
    assert float(fit) < 0.05, float(fit)
    assert np.linalg.norm(np.asarray(p_est) - np.asarray(p_true)) < 0.05
    ang = lie.so3_log(lie.qmul(lie.qconj(q_est), q_true))
    assert float(jnp.linalg.norm(ang)) < 0.02


def test_posegraph_closes_loop():
    """Square path with odometry drift; a loop edge to the start corrects it."""
    rng = np.random.default_rng(1)
    n_side = 10
    step = 1.0
    yaw_step = np.pi / 2
    graph = pg.init_graph(256, 32)
    # ground truth: square, 4 sides x n_side steps
    q_cur = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    p_cur = jnp.zeros(3, jnp.float32)
    graph = pg.add_node(graph, q_cur, p_cur, q_cur, p_cur * 0)
    poses_gt = [(q_cur, p_cur)]
    drift = np.array([0.01, 0.004, 0.0])  # per-step odometry bias
    for k in range(4 * n_side):
        q_rel_gt = (lie.so3_exp(jnp.asarray([0.0, 0.0, yaw_step], jnp.float32))
                    if (k + 1) % n_side == 0 else jnp.asarray([1.0, 0, 0, 0], jnp.float32))
        p_rel_gt = jnp.asarray([step, 0.0, 0.0], jnp.float32)
        q_gt, p_gt = lie.pose_compose(poses_gt[-1], (q_rel_gt, p_rel_gt))
        poses_gt.append((q_gt, p_gt))
        p_rel_noisy = p_rel_gt + jnp.asarray(drift, jnp.float32)
        # yaw drift compounds around the square (translation drift alone
        # cancels by symmetry)
        q_rel_noisy = lie.qmul(q_rel_gt,
                               lie.so3_exp(jnp.asarray([0.0, 0.0, 0.006], jnp.float32)))
        q_abs, p_abs = lie.pose_compose(
            (graph.q[k], graph.p[k]), (q_rel_noisy, p_rel_noisy))
        graph = pg.add_node(graph, q_abs, p_abs, q_rel_noisy, p_rel_noisy)
    n = 4 * n_side
    drift_before = float(jnp.linalg.norm(graph.p[n] - poses_gt[n][1]))
    assert drift_before > 0.3  # drift accumulated
    # loop edge: node n observed at the true relative pose from node 0
    q_rel, p_rel = lie.pose_between(poses_gt[0], poses_gt[n])
    graph = pg.add_loop(graph, jnp.int32(0), jnp.int32(n), q_rel, p_rel)
    graph = pg.optimize(graph)
    drift_after = float(jnp.linalg.norm(graph.p[n] - poses_gt[n][1]))
    assert drift_after < 0.2 * drift_before, (drift_before, drift_after)
    return graph


def test_posegraph_bucketed_matches_full():
    """optimize_bucketed on a 256-capacity graph with 41 active nodes solves
    in a 64-slot bucket and must match the full-capacity solve exactly."""
    full = test_posegraph_closes_loop()  # optimized at full capacity
    # rebuild the same un-optimized graph: re-run deterministic construction
    # is awkward, so instead reset poses to odometry composition and optimize
    n = int(full.n_nodes)
    graph = full
    q, p = graph.q, graph.p
    q = q.at[0].set(jnp.asarray([1.0, 0, 0, 0], jnp.float32))
    p = p.at[0].set(jnp.zeros(3, jnp.float32))
    for k in range(1, n):
        qa, pa = lie.pose_compose((q[k - 1], p[k - 1]),
                                  (graph.odo_q[k], graph.odo_p[k]))
        q = q.at[k].set(qa)
        p = p.at[k].set(pa)
    fresh = graph._replace(q=q, p=p)
    out_full = pg.optimize(fresh)
    out_bkt = pg.optimize_bucketed(fresh, n)
    assert out_bkt.q.shape == fresh.q.shape
    np.testing.assert_allclose(np.asarray(out_bkt.p[:n]),
                               np.asarray(out_full.p[:n]), atol=1e-4)
    np.testing.assert_allclose(np.abs(np.sum(
        np.asarray(out_bkt.q[:n]) * np.asarray(out_full.q[:n]), axis=-1)),
        1.0, atol=1e-5)


@pytest.mark.slow
def test_global_fusion_end_to_end_loop():
    """Circle path revisiting the start: odometry drifts, global fusion must
    detect the loop via ScanContext + ICP and pull the end back."""
    scene = sim.RaycastScene()
    fusion = gf.GlobalFusion(gf.GlobalFusionConfig(
        keyframe_dist=2.0, node_capacity=128, loop_capacity=16,
        submap_half_span=4, cloud_capacity=2048))
    center = np.array([30.0, 0.0, 1.5])
    radius = 9.0
    n_steps = 34
    drift_rate = 0.004  # m per m
    p_odom = None
    gt = []
    for k in range(n_steps):
        ang = 2 * np.pi * k / (n_steps - 2)  # slightly past full circle
        p_gt = center + radius * np.array([np.cos(ang), np.sin(ang), 0.0])
        yaw = ang + np.pi / 2
        R_gt = _yaw_R(yaw)
        gt.append((R_gt, p_gt))
        # drifting odometry: accumulate biased relative motion
        if k == 0:
            q_odom = jnp.asarray(sim.R_to_q(R_gt), jnp.float32)
            p_odom = jnp.asarray(p_gt, jnp.float32)
        else:
            R_prev, p_prev = gt[k - 1]
            q_rel, p_rel = lie.pose_between(
                (jnp.asarray(sim.R_to_q(R_prev), jnp.float32), jnp.asarray(p_prev, jnp.float32)),
                (jnp.asarray(sim.R_to_q(R_gt), jnp.float32), jnp.asarray(p_gt, jnp.float32)))
            p_rel = p_rel + drift_rate * jnp.linalg.norm(p_rel) * jnp.asarray([1.0, 0.5, 0.0], jnp.float32)
            q_odom, p_odom = lie.pose_compose((q_odom, p_odom), (q_rel, p_rel))
        pts, val = _scan_at(scene, R_gt, p_gt)
        fusion.add_frame(q_odom, p_odom, pts, val)
    fusion.flush()  # resolve the last keyframe's in-flight loop query
    assert len(fusion.loops_found) >= 1, "no loop detected"
    q_all, p_all = fusion.poses()
    # end-of-loop error vs ground truth start (first and last gt positions align)
    errs = [np.linalg.norm(p_all[i] - gt_i[1]) for i, gt_i in
            zip(range(fusion.n_kf), [g for g in gt])]
    # uncorrected drift over ~57 m at 0.004 with lateral term ~ 0.3+ m;
    # after closure the final keyframes must be well under that
    assert errs[-1] < 0.25, errs[-5:]
