"""Visual-inertial initialization: SfM bootstrap + IMU alignment.

Rebuild of the reference's initialization stack (C12):
  * 5-point relative pose  — initial/solve_5pts.{h,cpp} (cv::findFundamentalMat
    + recoverPose) -> batched 8-point RANSAC on normalized coords (E == F
    there) + closed-form E decomposition with cheirality voting.
  * global SfM              — initial/initial_sfm.{h,cpp} GlobalSFM::construct:
    baseline-frame selection by parallax (estimator.cpp relativePose
    :461-490), triangulation + PnP chain + reprojection-only GN refinement.
  * gyro bias + velocity/gravity/scale alignment — initial/initial_aligment.cpp
    solveGyroscopeBias :3-44, LinearAlignment :77-160, RefineGravity :162-207.
  * camera-IMU rotation self-calibration — initial/initial_ex_rotation.cpp
    (rotation-constraint nullspace).

All solvers are fixed-iteration, batched, jit-safe.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vil_fusion_tpu.models import klt
from vil_fusion_tpu.models.window import K
from vil_fusion_tpu.ops import lie


# ---------------------------------------------------------------------------
# Two-view geometry
# ---------------------------------------------------------------------------

def triangulate_two_view(R, t, x1, x2):
    """Mid-point-free DLT for each correspondence under cam2 = R (cam1) + t?
    Convention: x2_h ~ R x1_h d + t (R, t map cam1 points into cam2).
    Returns depth d in cam1 and reprojection residual in cam2."""
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[..., :1])], axis=-1)
    # solve per-point least squares: cross(x2h, R x1h d + t) = 0
    Rx1 = x1h @ R.T
    c = jnp.cross(x2h, Rx1)
    ct = jnp.cross(x2h, jnp.broadcast_to(t, x2h.shape))
    # c * d + ct = 0  (3 eqs, 1 unknown)
    d = -jnp.sum(c * ct, axis=-1) / jnp.maximum(jnp.sum(c * c, axis=-1), 1e-12)
    p2 = Rx1 * d[..., None] + t
    rep = p2[..., :2] / jnp.maximum(p2[..., 2:3], 1e-6) - x2
    return d, p2[..., 2], jnp.linalg.norm(rep, axis=-1)


def decompose_essential(E, x1, x2, valid):
    """4-way (R, t) decomposition with cheirality voting (recoverPose analog).

    Returns (R, t) mapping cam1 coords to cam2: x2 ~ R x1 + t, |t| = 1."""
    U, _, Vt = jnp.linalg.svd(E)
    # keep proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t1 = U[:, 2]
    cands = [(R1, t1), (R1, -t1), (R2, t1), (R2, -t1)]

    def score(Rt):
        R, t = Rt
        d1, z2, _ = triangulate_two_view(R, t, x1, x2)
        return jnp.sum(((d1 > 0) & (z2 > 0) & valid))

    scores = jnp.stack([score(c) for c in cands])
    best = jnp.argmax(scores)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return Rs[best], ts[best], scores[best]


def relative_pose_ransac(x1, x2, valid, key, thresh_px=0.6, focal=460.0):
    """solveRelativeRT rebuild: E by 8-point RANSAC + cheirality decomposition.

    Returns (R, t, inliers, n_inliers) with x2 ~ R x1 + t."""
    inl, F = klt.ransac_fundamental(x1, x2, valid, key,
                                    thresh_px=thresh_px, focal=focal)
    # F on normalized coords scaled by `focal` is E up to the focal factor:
    # E = diag(f,f,1)^T F diag(f,f,1) recovers the normalized-coords essential
    S = jnp.diag(jnp.array([focal, focal, 1.0], x1.dtype))
    E = S.T @ F @ S
    R, t, n_good = decompose_essential(E, x1, x2, inl)
    return R, t, inl, n_good


@functools.partial(jax.jit, static_argnames=("iters",))
def pnp_gn(pts3d, obs, valid, q0, p0, iters: int = 10):
    """Batched-residual Gauss-Newton PnP: find (q, p) with x ~ proj(R^T(X - p))
    — pose of the CAMERA in the world (solvePnP analog, fixed iterations)."""
    dtype = pts3d.dtype

    def res_fn(delta, q, p):
        q_, p_ = lie.pose_retract((q, p), delta)
        pc = lie.qrot(lie.qconj(q_)[None, :], pts3d - p_[None, :])
        z = jnp.maximum(pc[..., 2], 1e-4)
        r = pc[..., :2] / z[..., None] - obs
        return (r * valid[:, None]).reshape(-1)

    def body(_, qp):
        q, p = qp
        z = jnp.zeros(6, dtype)
        r = res_fn(z, q, p)
        J = jax.jacfwd(res_fn)(z, q, p)
        H = J.T @ J + 1e-6 * jnp.eye(6, dtype=dtype)
        delta = jnp.linalg.solve(H, -J.T @ r)
        return lie.pose_retract((q, p), jnp.clip(delta, -0.5, 0.5))

    q, p = jax.lax.fori_loop(0, iters, body, (q0, p0))
    # final inlier check
    pc = lie.qrot(lie.qconj(q)[None, :], pts3d - p[None, :])
    z = jnp.maximum(pc[..., 2], 1e-4)
    rep = jnp.linalg.norm(pc[..., :2] / z[..., None] - obs, axis=-1)
    return q, p, rep


# ---------------------------------------------------------------------------
# Global SfM over the window (GlobalSFM::construct)
# ---------------------------------------------------------------------------

class SfMResult(NamedTuple):
    q: jnp.ndarray  # (K, 4) camera-frame rotations (world = frame l camera)
    p: jnp.ndarray  # (K, 3) camera positions (up to scale)
    ok: jnp.ndarray  # () success flag
    l_frame: jnp.ndarray  # () baseline frame index


def _find_baseline_frame(feats_obs, feats_valid, min_parallax=0.0217, min_corr=20):
    """relativePose :461-490: first frame l with enough correspondences to the
    newest frame and mean parallax above threshold (30/460)."""
    newest = K - 1
    par_list = []
    cnt_list = []
    for l in range(K - 1):
        both = feats_valid[:, l] & feats_valid[:, newest]
        par = jnp.linalg.norm(feats_obs[:, l] - feats_obs[:, newest], axis=-1)
        n = jnp.sum(both)
        par_list.append(jnp.sum(jnp.where(both, par, 0.0)) / jnp.maximum(n, 1))
        cnt_list.append(n)
    par = jnp.stack(par_list)
    cnt = jnp.stack(cnt_list)
    good = (par > min_parallax) & (cnt >= min_corr)
    l = jnp.argmax(good)  # first True
    return l, jnp.any(good)


def global_sfm(feats_obs, feats_valid, key, reproj_iters: int = 12):
    """Pure-visual SfM over the K window frames.

    feats_obs: (F, K, 2) normalized observations; feats_valid: (F, K).
    Returns SfMResult with camera poses in the frame-l camera coordinate
    system (x_w = R_i x_ci + p_i), translation scale |t_{l,newest}| = 1.
    """
    dtype = feats_obs.dtype
    Fn = feats_obs.shape[0]
    newest = K - 1
    l, found = _find_baseline_frame(feats_obs, feats_valid)

    obs_l = feats_obs[:, l]
    obs_n = feats_obs[:, newest]
    both_ln = feats_valid[:, l] & feats_valid[:, newest]
    R_rel, t_rel, inl, n_good = relative_pose_ransac(obs_l, obs_n, both_ln, key)

    # poses: world = camera l frame. x_cn = R_rel x_cl + t_rel
    # => R_n (cam->world) = R_rel^T, p_n = -R_rel^T t_rel
    q = jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (K, 1))
    p = jnp.zeros((K, 3), dtype)
    q = q.at[newest].set(lie.R2q(R_rel.T))
    p = p.at[newest].set(-R_rel.T @ t_rel)

    # triangulate l<->newest
    d_l, _, _ = triangulate_two_view(R_rel, t_rel, obs_l, obs_n)
    pts_w = jnp.concatenate([obs_l, jnp.ones((Fn, 1), dtype)], -1) * d_l[:, None]
    pts_ok = both_ln & inl & (d_l > 0.05)

    solved = jnp.zeros((K,), bool).at[l].set(True).at[newest].set(True)

    # PnP chain: frames after l (forward), then before l (backward), each
    # followed by fresh triangulation against frame l's camera (static loop)
    def solve_frame(i, q, p, pts_w, pts_ok, init_slot):
        vis = feats_valid[:, i] & pts_ok
        qi, pi, rep = pnp_gn(pts_w, feats_obs[:, i], vis.astype(dtype),
                             q[init_slot], p[init_slot])
        q = q.at[i].set(qi)
        p = p.at[i].set(pi)
        # triangulate new points vs frame l using solved pose i
        R_li = lie.q2R(lie.qmul(lie.qconj(qi), q[l]))  # cam l -> cam i
        t_li = lie.qrot(lie.qconj(qi), p[l] - pi)
        d_new, z2, rep2 = triangulate_two_view(R_li, t_li, obs_l, feats_obs[:, i])
        new_ok = (feats_valid[:, l] & feats_valid[:, i] & ~pts_ok
                  & (d_new > 0.05) & (z2 > 0.05) & (rep2 < 0.02))
        pts_new = jnp.concatenate([obs_l, jnp.ones((Fn, 1), dtype)], -1) * d_new[:, None]
        pts_w = jnp.where(new_ok[:, None], pts_new, pts_w)
        pts_ok = pts_ok | new_ok
        return q, p, pts_w, pts_ok

    for i in range(K):
        # forward pass: i > l (init from previous frame), backward: i < l
        def fwd(args):
            q, p, pw, po = args
            return solve_frame(i, q, p, pw, po, jnp.maximum(i - 1, 0))

        def skip(args):
            return args

        do = (jnp.asarray(i) > l) & (jnp.asarray(i) < newest)
        q, p, pts_w, pts_ok = jax.lax.cond(do, fwd, skip, (q, p, pts_w, pts_ok))
    for i in range(K - 2, -1, -1):
        def bwd(args):
            q, p, pw, po = args
            return solve_frame(i, q, p, pw, po, jnp.minimum(i + 1, K - 1))

        def skip(args):
            return args

        q, p, pts_w, pts_ok = jax.lax.cond(jnp.asarray(i) < l, bwd, skip,
                                           (q, p, pts_w, pts_ok))

    # full-SfM refinement: alternate pose-GN with multi-view DLT structure
    # re-triangulation (the reference's GlobalSFM full BA optimizes points
    # AND poses, initial_sfm.h :56-69; structure triangulated only against
    # frame l is biased at narrow baselines and warps the pose chain —
    # observed as a backwards step in an otherwise smooth window, which then
    # collapses the visual-IMU scale solve)
    def sfm_residual(delta_flat, q, p, pts_w, pts_ok):
        delta = delta_flat.reshape(K, 6)
        mask = jnp.ones((K, 1), dtype).at[l].set(0.0)
        qn, pn = lie.pose_retract((q, p), delta * mask)
        # project every (feature, frame) pair
        pc = lie.qrot(lie.qconj(qn)[None, :, :],
                      pts_w[:, None, :] - pn[None, :, :])  # (F, K, 3)
        z = jnp.maximum(pc[..., 2], 1e-4)
        r = pc[..., :2] / z[..., None] - feats_obs
        w = (feats_valid & pts_ok[:, None]).astype(dtype)
        return (r * w[..., None]).reshape(-1)

    def gn_body(_, state):
        q, p, pts_w, pts_ok = state
        z = jnp.zeros(K * 6, dtype)
        r = sfm_residual(z, q, p, pts_w, pts_ok)
        J = jax.jacfwd(sfm_residual)(z, q, p, pts_w, pts_ok)
        H = J.T @ J + 1e-5 * jnp.eye(K * 6, dtype=dtype)
        delta = jnp.linalg.solve(H, -J.T @ r)
        mask = jnp.ones((K, 6), dtype).at[l].set(0.0).reshape(-1)
        qn, pn = lie.pose_retract((q, p), (delta * mask).reshape(K, 6))
        return qn, pn, pts_w, pts_ok

    def retriangulate(q, p, pts_w, pts_ok):
        """Multi-view DLT per feature from the current poses; keeps the
        two-view point where DLT lacks support. Gauge: poses+points rescaled
        so |p[newest]| stays 1 (the scale is otherwise free once structure
        floats)."""
        R_t = jax.vmap(lambda qq: lie.q2R(qq).T)(q)  # (K, 3, 3) world->cam
        # rows: (R^T[0] - u R^T[2]) . X = (R^T[0] - u R^T[2]) . p_i, same v
        a_u = R_t[None, :, 0] - feats_obs[..., 0:1] * R_t[None, :, 2]
        a_v = R_t[None, :, 1] - feats_obs[..., 1:2] * R_t[None, :, 2]
        b_u = jnp.einsum("fkc,kc->fk", a_u, p)
        b_v = jnp.einsum("fkc,kc->fk", a_v, p)
        w = feats_valid.astype(dtype)[..., None]
        A = jnp.concatenate([a_u * w, a_v * w], axis=1)  # (F, 2K, 3)
        b = jnp.concatenate([b_u * w[..., 0], b_v * w[..., 0]], axis=1)
        AtA = jnp.einsum("frc,frd->fcd", A, A) + 1e-6 * jnp.eye(3, dtype=dtype)
        Atb = jnp.einsum("frc,fr->fc", A, b)
        X = jnp.linalg.solve(AtA, Atb[..., None])[..., 0]  # (F, 3)
        n_obs = feats_valid.sum(axis=1)
        # quality: positive depth in frame l and newest, bounded reprojection
        def depth_in(i):
            return lie.qrot(lie.qconj(q[i]), X - p[i])[..., 2]
        pc = lie.qrot(lie.qconj(q)[None, :, :], X[:, None, :] - p[None, :, :])
        z = jnp.maximum(pc[..., 2], 1e-4)
        rep = jnp.linalg.norm(pc[..., :2] / z[..., None] - feats_obs, axis=-1)
        rep_ok = jnp.where(feats_valid, rep, 0.0).max(axis=1) < 0.05
        good = (n_obs >= 2) & (depth_in(l) > 0.05) & rep_ok
        pts_new = jnp.where(good[:, None], X, pts_w)
        ok_new = pts_ok | good
        # re-fix the gauge
        scale = 1.0 / jnp.maximum(jnp.linalg.norm(p[newest]), 1e-6)
        return pts_new * scale, ok_new, scale

    rounds = max(1, reproj_iters // 4)
    for _ in range(rounds):
        q, p, pts_w, pts_ok = jax.lax.fori_loop(
            0, 4, gn_body, (q, p, pts_w, pts_ok))
        pts_w, pts_ok, scale = retriangulate(q, p, pts_w, pts_ok)
        p = p * scale
    ok = found & (n_good > 15)
    return SfMResult(q=q, p=p, ok=ok, l_frame=l), pts_w, pts_ok


# ---------------------------------------------------------------------------
# Visual-IMU alignment (initial_aligment.cpp)
# ---------------------------------------------------------------------------

def solve_gyro_bias(q_cam, qic, pre_dq, pre_jac_q_bg, seg_valid):
    """solveGyroscopeBias :3-44: least squares on rotation preintegration.

    q_cam: (K, 4) camera rotations from SfM; qic camera-IMU rotation.
    Returns delta_bg (3,)."""
    # body rotations
    q_b = lie.qmul(q_cam, lie.qconj(qic)[None, :])
    A = jnp.zeros((3, 3), q_cam.dtype)
    b = jnp.zeros((3,), q_cam.dtype)
    for i in range(K - 1):
        w = seg_valid[i + 1].astype(q_cam.dtype)
        q_ij = lie.qmul(lie.qconj(q_b[i]), q_b[i + 1])
        J = pre_jac_q_bg[i + 1]  # d(theta)/d(bg) (3, 3)
        r = 2.0 * lie.qmul(lie.qconj(pre_dq[i + 1]), q_ij)[1:]
        A = A + w * J.T @ J
        b = b + w * J.T @ r
    return jnp.linalg.solve(A + 1e-8 * jnp.eye(3, dtype=q_cam.dtype), b)


def linear_alignment(q_b, p_c, pre_dp, pre_dv, pre_dt, seg_valid, tic, g_norm=9.81):
    """LinearAlignment :77-160: solve velocities (body frame), gravity (world
    = cam-l frame) and metric scale from preintegrated deltas.

    q_b: (K, 4) body rotations in SfM world; p_c: (K, 3) camera positions
    (up to scale). State x = [v_0..v_{K-1} (3K), g (3), s (1)].
    """
    dtype = q_b.dtype
    n_state = 3 * K + 4
    A = jnp.zeros((n_state, n_state), dtype)
    b = jnp.zeros((n_state,), dtype)
    for i in range(K - 1):
        w = seg_valid[i + 1].astype(dtype)
        dt = pre_dt[i + 1]
        Ri = lie.q2R(q_b[i])
        RiT = Ri.T
        Rj = lie.q2R(q_b[i + 1])
        H = jnp.zeros((6, n_state), dtype)
        z = jnp.zeros((6,), dtype)
        # position rows: dp = Ri^T( s(pc_j - pc_i) - Ri tic + Rj tic
        #                          - v_i dt + 0.5 g dt^2 )  (world gravity +)
        H = H.at[0:3, 3 * i : 3 * i + 3].set(-dt * jnp.eye(3, dtype=dtype))
        H = H.at[0:3, 3 * K : 3 * K + 3].set(0.5 * dt * dt * RiT)
        H = H.at[0:3, 3 * K + 3].set(RiT @ (p_c[i + 1] - p_c[i]))
        z = z.at[0:3].set(pre_dp[i + 1] + RiT @ Rj @ tic - tic)
        # velocity rows: dv = Ri^T( Rj v_j - Ri v_i + g dt )
        H = H.at[3:6, 3 * i : 3 * i + 3].set(-jnp.eye(3, dtype=dtype))
        H = H.at[3:6, 3 * (i + 1) : 3 * (i + 1) + 3].set(RiT @ Rj)
        H = H.at[3:6, 3 * K : 3 * K + 3].set(dt * RiT)
        z = z.at[3:6].set(pre_dv[i + 1])
        A = A + w * H.T @ H
        b = b + w * H.T @ z
    A = A + 1e-8 * jnp.eye(n_state, dtype=dtype)
    # scale the s column like the reference (x1000) for conditioning? use
    # Jacobi preconditioning instead
    s_diag = 1.0 / jnp.sqrt(jnp.abs(jnp.diag(A)) + 1e-10)
    An = A * s_diag[:, None] * s_diag[None, :]
    x = jnp.linalg.solve(An, b * s_diag) * s_diag
    v = x[: 3 * K].reshape(K, 3)
    g = x[3 * K : 3 * K + 3]
    s = x[3 * K + 3]
    return v, g, s


def linear_alignment_fixed_scale(q_b, p_c, pre_dp, pre_dv, pre_dt, seg_valid,
                                 tic, s):
    """LinearAlignment with the metric scale KNOWN (vil mode: the lidar
    odometry's relative translations are metric — reference novelty #2 —
    so s never has to be estimated from the near-degenerate joint system;
    under sustained circular motion the joint [v, g, s] solve can explain
    the centripetal term with a tilted, inflated gravity and collapse s).
    State x = [v_0..v_{K-1} (3K), g (3)]."""
    dtype = q_b.dtype
    n_state = 3 * K + 3
    A = jnp.zeros((n_state, n_state), dtype)
    b = jnp.zeros((n_state,), dtype)
    for i in range(K - 1):
        w = seg_valid[i + 1].astype(dtype)
        dt = pre_dt[i + 1]
        RiT = lie.q2R(q_b[i]).T
        Rj = lie.q2R(q_b[i + 1])
        H = jnp.zeros((6, n_state), dtype)
        z = jnp.zeros((6,), dtype)
        H = H.at[0:3, 3 * i : 3 * i + 3].set(-dt * jnp.eye(3, dtype=dtype))
        H = H.at[0:3, 3 * K : 3 * K + 3].set(0.5 * dt * dt * RiT)
        z = z.at[0:3].set(pre_dp[i + 1] + RiT @ Rj @ tic - tic
                          - s * RiT @ (p_c[i + 1] - p_c[i]))
        H = H.at[3:6, 3 * i : 3 * i + 3].set(-jnp.eye(3, dtype=dtype))
        H = H.at[3:6, 3 * (i + 1) : 3 * (i + 1) + 3].set(RiT @ Rj)
        H = H.at[3:6, 3 * K : 3 * K + 3].set(dt * RiT)
        z = z.at[3:6].set(pre_dv[i + 1])
        A = A + w * H.T @ H
        b = b + w * H.T @ z
    A = A + 1e-8 * jnp.eye(n_state, dtype=dtype)
    s_diag = 1.0 / jnp.sqrt(jnp.abs(jnp.diag(A)) + 1e-10)
    An = A * s_diag[:, None] * s_diag[None, :]
    x = jnp.linalg.solve(An, b * s_diag) * s_diag
    return x[: 3 * K].reshape(K, 3), x[3 * K : 3 * K + 3]


def lidar_scale_estimate(p_c, lidar_p_rel, lidar_valid):
    """Metric scale for the SfM translations from the lidar odometry's
    per-segment relative translations (body frame; norms are rotation
    invariant, and t_ic offsets cancel to first order). Robust median over
    the window's valid segments. Returns (s, n_used)."""
    p_c = np.asarray(p_c)
    seg_vis = np.linalg.norm(np.diff(p_c, axis=0), axis=-1)  # (K-1,)
    seg_lid = np.linalg.norm(np.asarray(lidar_p_rel), axis=-1)[1:]  # slot i+1
    ok = np.asarray(lidar_valid)[1:] & (seg_vis > 1e-5) & (seg_lid > 0.02)
    if ok.sum() < 3:
        return -1.0, int(ok.sum())
    return float(np.median(seg_lid[ok] / seg_vis[ok])), int(ok.sum())


def refine_gravity(q_b, p_c, pre_dp, pre_dv, pre_dt, seg_valid, tic,
                   g0, g_norm=9.81, iters: int = 4, s_fixed=None):
    """RefineGravity :162-207: re-solve with |g| fixed, 2-dof tangent basis.
    With `s_fixed` the scale column is moved to the measurement side (vil
    mode: metric scale pinned by the lidar odometry)."""
    dtype = q_b.dtype
    g = g0 / jnp.linalg.norm(g0) * g_norm

    for _ in range(iters):
        # tangent basis of g
        a = g / jnp.linalg.norm(g)
        tmp = jnp.array([0.0, 0.0, 1.0], dtype)
        tmp = jnp.where(jnp.abs(a[2]) > 0.9, jnp.array([1.0, 0.0, 0.0], dtype), tmp)
        b1 = tmp - a * (a @ tmp)
        b1 = b1 / jnp.linalg.norm(b1)
        b2 = jnp.cross(a, b1)
        basis = jnp.stack([b1, b2], axis=1)  # (3, 2)

        n_state = 3 * K + 3  # velocities + dg(2) + s(1; unused if fixed)
        A = jnp.zeros((n_state, n_state), dtype)
        bb = jnp.zeros((n_state,), dtype)
        for i in range(K - 1):
            w = seg_valid[i + 1].astype(dtype)
            dt = pre_dt[i + 1]
            RiT = lie.q2R(q_b[i]).T
            Rj = lie.q2R(q_b[i + 1])
            H = jnp.zeros((6, n_state), dtype)
            z = jnp.zeros((6,), dtype)
            H = H.at[0:3, 3 * i : 3 * i + 3].set(-dt * jnp.eye(3, dtype=dtype))
            H = H.at[0:3, 3 * K : 3 * K + 2].set(0.5 * dt * dt * RiT @ basis)
            zp = pre_dp[i + 1] + RiT @ Rj @ tic - tic - 0.5 * dt * dt * RiT @ g
            if s_fixed is None:
                H = H.at[0:3, 3 * K + 2].set(RiT @ (p_c[i + 1] - p_c[i]))
            else:
                zp = zp - s_fixed * RiT @ (p_c[i + 1] - p_c[i])
            z = z.at[0:3].set(zp)
            H = H.at[3:6, 3 * i : 3 * i + 3].set(-jnp.eye(3, dtype=dtype))
            H = H.at[3:6, 3 * (i + 1) : 3 * (i + 1) + 3].set(RiT @ Rj)
            H = H.at[3:6, 3 * K : 3 * K + 2].set(dt * RiT @ basis)
            z = z.at[3:6].set(pre_dv[i + 1] - dt * RiT @ g)
            A = A + w * H.T @ H
            bb = bb + w * H.T @ z
        A = A + 1e-8 * jnp.eye(n_state, dtype=dtype)
        s_diag = 1.0 / jnp.sqrt(jnp.abs(jnp.diag(A)) + 1e-10)
        x = jnp.linalg.solve(A * s_diag[:, None] * s_diag[None, :], bb * s_diag) * s_diag
        dg = basis @ x[3 * K : 3 * K + 2]
        g = (g + dg) / jnp.linalg.norm(g + dg) * g_norm
    v = x[: 3 * K].reshape(K, 3)
    s = jnp.asarray(s_fixed, dtype) if s_fixed is not None else x[3 * K + 2]
    return g, v, s


def initial_ex_rotation(q_cam_rel, q_imu_rel, n_pairs):
    """Camera-IMU rotation self-calibration (initial_ex_rotation.cpp:14-25):
    stack Qleft(q_imu) - Qright(q_cam) and take the nullspace vector."""
    A_blocks = jax.vmap(lambda qi, qc: lie.Qleft(qi) - lie.Qright(qc))(
        q_imu_rel, q_cam_rel)  # (N, 4, 4)
    A = A_blocks.reshape(-1, 4)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    q = Vt[-1]  # smallest singular vector, (w?) ordering: our Qleft acts on
    # quaternion [w, x, y, z] — the nullspace vector is qic directly
    return lie.positify(lie.qnormalize(q))
