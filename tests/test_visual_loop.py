"""Visual loop closure tests: BRIEF/Hamming, BoW, 4-DoF graph, keyframe DB."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vil_fusion_tpu.models import brief, cameras, posegraph4dof as pg4, visual_loop as vl
from vil_fusion_tpu.ops import lie
from vil_fusion_tpu.runtime import sim

from test_vision import render, smooth_texture  # reuse texture helpers

H, W = 240, 320
CAM = cameras.PinholeCamera(fx=250.0, fy=250.0, cx=W / 2, cy=H / 2)


def test_brief_descriptors_stable_under_shift():
    tex = smooth_texture(H, W, seed=0, scale=6)
    img1 = jnp.asarray(render(tex, H, W))
    img2 = jnp.asarray(render(tex, H, W, shift=(3.0, 1.0)))
    rng = np.random.default_rng(1)
    pts = rng.uniform([30, 30], [W - 30, H - 30], (64, 2)).astype(np.float32)
    d1 = brief.brief_descriptors(img1, jnp.asarray(pts), jnp.ones(64, bool))
    # same physical content appears at pts - shift in img2
    d2 = brief.brief_descriptors(img2, jnp.asarray(pts - [3.0, 1.0]), jnp.ones(64, bool))
    dist_same = np.diagonal(np.asarray(brief.hamming_matrix(d1, d2)))
    d_rand = brief.brief_descriptors(img2, jnp.asarray(pts[::-1].copy()), jnp.ones(64, bool))
    dist_rand = np.asarray(brief.hamming_matrix(d1, d_rand)).mean()
    assert dist_same.mean() < 40, dist_same.mean()
    assert dist_rand > 90, dist_rand


def test_hamming_match_and_popcount():
    rng = np.random.default_rng(2)
    a = rng.integers(-(2**31), 2**31 - 1, (10, 8), dtype=np.int32)
    d = np.asarray(brief.hamming_matrix(jnp.asarray(a), jnp.asarray(a)))
    assert (np.diagonal(d) == 0).all()
    # flip exactly one bit
    b = a.copy()
    b[0, 0] ^= 1
    d2 = np.asarray(brief.hamming_matrix(jnp.asarray(a[:1]), jnp.asarray(b[:1])))
    assert d2[0, 0] == 1


def test_bow_scores_discriminate():
    tex1 = smooth_texture(H, W, seed=3, scale=6)
    tex2 = smooth_texture(H, W, seed=33, scale=6)
    imgs = [render(tex1, H, W), render(tex1, H, W, shift=(4.0, 2.0)), render(tex2, H, W)]
    hists = []
    for im_ in imgs:
        xy, val = __import__("vil_fusion_tpu.ops.image", fromlist=["im"]).detect_features(
            jnp.asarray(im_), jnp.zeros((1, 2)), jnp.zeros(1, bool), max_pts=128, min_dist=10)
        d = brief.brief_descriptors(jnp.asarray(im_), xy, val)
        hists.append(brief.word_histogram(brief.words_of(d), val))
    s_same = float(brief.bow_scores(hists[0], jnp.stack([hists[1]]))[0])
    s_diff = float(brief.bow_scores(hists[0], jnp.stack([hists[2]]))[0])
    assert s_same > s_diff + 0.05, (s_same, s_diff)


def test_posegraph_4dof_closes_yaw_drift():
    graph = pg4.init_graph(128, 16)
    n = 30
    # straight ground truth along x; odometry has yaw drift
    yaw_drift = 0.01
    p = np.zeros(3)
    yaw = 0.0
    for i in range(n):
        graph = pg4.add_node(graph, jnp.asarray(p, jnp.float32), jnp.float32(yaw),
                             jnp.float32(0.02), jnp.float32(-0.01))
        yaw += yaw_drift
        p = p + np.array([np.cos(yaw), np.sin(yaw), 0.0])
    # ground truth of node n-1: (n-1, 0, 0) with yaw 0 -> loop edge from node 0
    t_rel = jnp.asarray([float(n - 1), 0.0, 0.0], jnp.float32)
    graph = pg4.add_loop(graph, jnp.int32(0), jnp.int32(n - 1), t_rel, jnp.float32(0.0))
    before = float(jnp.linalg.norm(graph.p[n - 1] - jnp.asarray([n - 1.0, 0, 0])))
    graph = pg4.optimize(graph)
    after = float(jnp.linalg.norm(graph.p[n - 1] - jnp.asarray([n - 1.0, 0, 0])))
    assert before > 1.0
    assert after < 0.25 * before, (before, after)
    # pitch/roll untouched by construction
    np.testing.assert_allclose(graph.pitch[:n], 0.02, atol=1e-6)


@pytest.mark.slow
def test_visual_loop_db_detects_revisit(tmp_path):
    """Keyframes along a path; revisiting the first pose must be detected,
    geometrically verified, and closed in the 4-DoF graph."""
    scene = sim.RaycastScene()
    R_BC = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    db = vl.VisualLoopDB(vl.VisualLoopConfig(capacity=128, win_cap=64, extra_cap=128),
                         qic=sim.R_to_q(R_BC), tic=np.zeros(3))
    world = sim.LandmarkWorld(n=300, seed=5)

    from vil_fusion_tpu.ops import image as im_ops

    def keyframe_inputs(p_wb, yaw):
        """Window points = detected corners with depth from raycasting (in
        the real pipeline they are tracked corners triangulated by the BA)."""
        c, s = np.cos(yaw), np.sin(yaw)
        R_wb = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        R_wc = R_wb @ R_BC
        img = sim.render_camera_image(scene, R_wc, p_wb, 250.0, 250.0,
                                      W / 2, H / 2, H, W)
        pxj, pval = im_ops.detect_features(
            jnp.asarray(img), jnp.zeros((1, 2)), jnp.zeros(1, bool),
            max_pts=64, min_dist=16)
        px = np.asarray(pxj)[np.asarray(pval)]
        dirs_c = np.concatenate([(px - [W / 2, H / 2]) / 250.0,
                                 np.ones((len(px), 1))], -1)
        dirs_c /= np.linalg.norm(dirs_c, axis=-1, keepdims=True)
        dirs_w = dirs_c @ R_wc.T
        t = scene.raycast(np.broadcast_to(p_wb, dirs_w.shape), dirs_w)
        hit = np.isfinite(t)
        pts3d = p_wb + t[hit, None] * dirs_w[hit]
        return (img, sim.R_to_q(R_wb), p_wb, pts3d.astype(np.float32),
                px[hit].astype(np.float32), np.ones(hit.sum(), bool))

    # 60 keyframes moving away and returning (recency exclusion=50)
    n_total = 56
    for k in range(n_total):
        ang = 2 * np.pi * k / n_total
        p_wb = np.array([8.0 * (1 - np.cos(ang)) + 3.0, 6.0 * np.sin(ang), 1.5])
        img, q, p, pts3d, px, pv = keyframe_inputs(p_wb, yaw=0.2 * np.sin(ang))
        db.add_keyframe(img, q, p, pts3d, px, pv, CAM)
    # revisit keyframe 1's pose
    img, q, p, pts3d, px, pv = keyframe_inputs(
        np.array([3.0 + 8.0 * (1 - np.cos(2 * np.pi / n_total)),
                  6.0 * np.sin(2 * np.pi / n_total), 1.5]),
        yaw=0.2 * np.sin(2 * np.pi / n_total))
    i_cur = db.add_keyframe(img, q, p, pts3d, px, pv, CAM)
    cand = db.detect(i_cur)
    assert cand is not None and cand <= 4, cand
    hit = db.detect_and_verify(i_cur)
    assert hit is not None
    cand, q_rel, p_rel = hit
    assert cand <= 4
    assert np.linalg.norm(p_rel) < 1.0  # revisit at (nearly) the same pose
    db.close_loop(i_cur, cand, q_rel, p_rel)

    # save / load roundtrip (pose graph checkpoint C13)
    path = str(tmp_path / "pose_graph.npz")
    db.save(path)
    db2 = vl.VisualLoopDB(vl.VisualLoopConfig(capacity=128, win_cap=64, extra_cap=128),
                          qic=sim.R_to_q(R_BC), tic=np.zeros(3))
    db2.load(path)
    assert db2.n == db.n
    assert db2.detect_candidates(i_cur) == db.detect_candidates(i_cur)


def test_detect_two_tier_gates_and_earliest_candidate():
    """detectLoop's two-tier top-4 gate (pose_graph.cpp:307-389): best score
    must pass 0.05, a RUNNER-UP must pass 0.015, and the EARLIEST qualifying
    keyframe wins — even when it is only the second-best score."""
    db = vl.VisualLoopDB(vl.VisualLoopConfig(capacity=128))
    db.n = 60
    i_q = 56

    def set_hist(i, sim_to_query):
        # unit vectors with a controlled dot product against the query hist
        h = np.zeros(brief.N_WORDS, np.float32)
        h[0] = sim_to_query
        h[i + 1] = np.sqrt(max(1.0 - sim_to_query**2, 0.0))
        db.hists = db.hists.at[i].set(jnp.asarray(h))

    q = np.zeros(brief.N_WORDS, np.float32)
    q[0] = 1.0
    db.hists = db.hists.at[i_q].set(jnp.asarray(q))

    # best candidate is index 5, but index 2 also passes the 0.015 tier:
    # the reference returns the EARLIEST (min_index scan)
    set_hist(5, 0.30)
    set_hist(2, 0.10)
    assert db.detect(i_q) == 2

    # runner-up below 0.015 -> no second independent candidate -> reject
    set_hist(2, 0.005)
    assert db.detect(i_q) is None

    # best below 0.05 -> reject outright even with close runner-ups
    set_hist(5, 0.04)
    set_hist(2, 0.03)
    assert db.detect(i_q) is None

    # recency exclusion: candidates within the last 50 keyframes are masked
    set_hist(5, 0.0)
    set_hist(2, 0.0)
    set_hist(10, 0.5)  # 10 > 56 - 50
    set_hist(55, 0.5)
    assert db.detect(i_q) is None


def test_multi_sequence_edges_not_straddling():
    """Sequential edges must not connect nodes of different sessions; a loop
    edge between sessions stitches them (new_sequence capability)."""
    graph = pg4.init_graph(64, 8)
    # session 0: 10 nodes along x
    for i in range(10):
        graph = pg4.add_node(graph, jnp.asarray([float(i), 0, 0], jnp.float32),
                             jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0), 0)
    # session 1: starts with a wrong absolute guess (disconnected)
    for i in range(10):
        graph = pg4.add_node(graph, jnp.asarray([float(i), 5.0, 0], jnp.float32),
                             jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0), 1)
    # loop edge: session-1 node 10 observed at session-0 node 2's position
    # with relative translation [0, 0, 0] (same place)
    graph = pg4.add_loop(graph, jnp.int32(2), jnp.int32(10),
                         jnp.asarray([0.0, 0.0, 0.0], jnp.float32), jnp.float32(0.0))
    g2 = pg4.optimize(graph)
    # session-1 chain pulled onto session 0 (node 10 -> node 2's position),
    # while session-0 nodes stay anchored
    assert float(jnp.linalg.norm(g2.p[10] - g2.p[2])) < 0.2
    np.testing.assert_allclose(np.asarray(g2.p[:10, 1]), 0.0, atol=0.2)
    # internal session-1 shape preserved (relative structure intact)
    rel = np.asarray(g2.p[11] - g2.p[10])
    np.testing.assert_allclose(rel, [1.0, 0.0, 0.0], atol=0.1)


@pytest.mark.slow
def test_place_recognition_kitti_scale_with_drift():
    """Mid-scale CI guard for the regime where r4's detector was inert
    (ACCEPTANCE_r04: 0 visual loops at 1226x370 over 2 identical laps,
    VERDICT r4 #2): full KITTI image width, 2 laps of an urban circuit,
    keyframes every 2 m, and a VIO-like 1%/m drift applied to lap-2 poses
    AND landmarks (the estimator exports both in the same drifted frame).
    The 320x240 toy e2e is demonstrably not predictive of this regime.

    Asserts the chain detects + geometrically verifies loops (accepted > 0)
    and that lap-2 queries recall their lap-1 counterparts at a usable rate.
    Exercises: LSH-BoW scoring, ratio-tested BRIEF matching, and the
    dual-seed PnP (the drift makes the old-pose seed a basin away)."""
    import jax.numpy as jnp

    from vil_fusion_tpu.models import cameras as cam_mod
    from vil_fusion_tpu.models import visual_loop as vl
    from vil_fusion_tpu.ops import image as im
    from vil_fusion_tpu.runtime import sim

    H, W = 370, 1226
    FX = FY = 718.856
    CX, CY = 607.0, 185.0
    R_BC = np.array([[0.0, 0, 1], [-1, 0, 0], [0, -1, 0]])
    cam = cam_mod.from_config(dict(
        model_type="PINHOLE",
        projection_parameters=dict(fx=FX, fy=FY, cx=CX, cy=CY),
        distortion_parameters=dict(k1=0.0, k2=0.0, p1=0.0, p2=0.0)))

    radius, kf_gap, drift_per_m = 20.0, 2.0, 0.01
    period = 2 * np.pi * radius / 8.0
    traj = sim.LoopTrajectory(radius=radius, period=period, laps=2.0)
    scene = sim.JaxRaycast(sim.urban_block_scene(
        radius, pillar_step_deg=8.0, box_step_deg=12.0))
    lap_len = 2 * np.pi * radius
    n_kf_lap = int(lap_len / kf_gap)  # 62/lap > RECENT_EXCLUDE=50
    n_kf = 2 * n_kf_lap
    db = vl.VisualLoopDB(vl.VisualLoopConfig(capacity=256),
                         qic=sim.R_to_q(R_BC), tic=np.zeros(3))

    results = []
    for i in range(n_kf):
        dist = i * kf_gap
        t = 1.0 + (dist / lap_len) * period
        R_wb = traj.rotation(t)
        p_wb = traj.position(t) + np.array([0, 0, 1.5])
        R_wc = R_wb @ R_BC
        img = np.clip(np.asarray(sim.render_camera_image(
            scene, R_wc, p_wb, FX, FY, CX, CY, H, W)) * 255.0 + 0.5,
            0, 255).astype(np.uint8)
        exy, evalid = im.detect_features(
            jnp.asarray(img, jnp.float32), jnp.zeros((1, 2), jnp.float32),
            jnp.zeros((1,), bool), max_pts=db.cfg.win_cap, min_dist=20)
        exy = np.asarray(exy)
        evalid = np.asarray(evalid)
        rays_c = np.stack([(exy[:, 0] - CX) / FX, (exy[:, 1] - CY) / FY,
                           np.ones(len(exy))], -1)
        rays_c /= np.linalg.norm(rays_c, axis=-1, keepdims=True)
        t_hit = scene.raycast(np.broadcast_to(p_wb, rays_c.shape),
                              rays_c @ R_wc.T, max_range=120.0)
        hit = np.isfinite(t_hit)
        pts_w = p_wb + np.where(hit, t_hit, 0.0)[:, None] * (rays_c @ R_wc.T)
        ok = evalid & hit

        d = drift_per_m * dist if i >= n_kf_lap else 0.0
        offs = np.array([d, 0.3 * d, 0.05 * d])
        i_cur = db.add_keyframe(img, sim.R_to_q(R_wb), p_wb + offs,
                                pts_w + offs, exy, ok, cam)
        assert i_cur is not None
        hit_res = db.detect_and_verify(i_cur)
        if i >= n_kf_lap:
            expect = i - n_kf_lap
            got = hit_res[0] if hit_res is not None else None
            results.append(got is not None and abs(got - expect) <= 3)

    st = db.stats_summary()
    assert st["accepted"] > 0, f"no loops verified at KITTI scale: {st}"
    recall = float(np.mean(results))
    assert recall >= 0.25, f"lap-2 recall {recall:.2f} too low: {st}"
