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
