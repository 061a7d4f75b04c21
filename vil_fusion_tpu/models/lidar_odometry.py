"""F-LOAM-style LiDAR scan-to-map odometry, fully jitted.

Rebuild of the reference's `EstimationMapping`
(reference: src/visual_inertial_lidar/feature_tracker/include/EstimationMapping.hpp:
optimation_processing :235-296, EdgeCostFactor :117-172, SurfCostFactor
:174-232, createSubMap :298-352, analytic se3 Jacobians lidarFactor.hpp:6-111).

TPU-first redesign:
  * kd-trees -> tiled brute-force kNN (ops/knn.py), batched over all feature
    points at once.
  * per-point Ceres cost functors -> vmapped residuals with hand-derived
    3x6 pose Jacobians, reduced to a single 6x6 normal system by einsum
    (this mirrors the reference's DENSE_QR on one SE(3) block).
  * 2 relinearizations x <=4 Ceres iters -> n_outer association passes x
    n_inner damped-GN steps inside one jit (static iteration counts).
  * unbounded PCL maps -> fixed-capacity voxel buffers with validity masks,
    crop+voxel maintenance identical in effect to createSubMap.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vil_fusion_tpu.models.lidar_features import LidarConfig, LidarFeatures, extract_features
from vil_fusion_tpu.ops.pallas import knn_pallas as knn_ops  # Pallas on TPU, XLA elsewhere
from vil_fusion_tpu.ops import hash_knn as hknn
from vil_fusion_tpu.ops import lie
from vil_fusion_tpu.ops import voxel as voxel_ops


class OdomConfig(NamedTuple):
    lidar: LidarConfig = LidarConfig()
    edge_map_cap: int = 16384
    surf_map_cap: int = 32768
    edge_map_voxel: float = 0.4
    surf_map_voxel: float = 0.8
    crop_half_extent: float = 100.0
    n_outer: int = 2  # association passes (reference: 2 relinearizations)
    n_inner: int = 4  # GN steps per pass (reference: <=4 Ceres iters)
    knn_k: int = 5
    edge_eig_ratio: float = 3.0  # lambda_max > 3 * lambda_mid
    plane_tol: float = 0.2  # plane-fit residual validity (SurfCostFactor :189)
    huber_delta: float = 0.1  # robust loss scale (matches ceres HuberLoss(0.1))
    lm_lambda: float = 1e-4
    max_corr_dist: float = 3.0  # reject correspondences further than this
    # voxel-hash kNN (maps are hash tables — ops/hash_knn.py). Default OFF on
    # purpose: measured on TPU v5e, the 125-bucket random gather per query is
    # SLOWER than the dense brute-force/Pallas scan (15.5 vs 21.2 fps at
    # HDL-64 scale) — random gathers are the TPU's weak op, dense distance
    # matrices its strong one. The hash path wins on CPU and is kept for it.
    use_hash_knn: bool = False
    edge_hash_radius: int = 3  # +-3 cells @ 0.4 m = +-1.2 m
    surf_hash_radius: int = 2  # +-2 cells @ 0.8 m = +-1.6 m
    deskew: bool = False  # motion-compensate raw scans (models/deskew.py)
    # Morton-sorted AABB-skipping kNN (knn_pallas_sparse). Default OFF:
    # measured on v5e at these map caps (16k/32k), the dense kernel runs the
    # full block scan FASTER than sparse skips it (0.63 vs 1.00 ms on the
    # surf pass) and needs none of the four per-frame Morton argsorts. Turn
    # on for map capacities well beyond 32k where skipped blocks dominate.
    sparse_knn: bool = False
    # grouped two-pass top-k merge in the dense Pallas kernel (bounded
    # approximation: the 5th neighbor may be the 6th-nearest with P~1e-3).
    # Default ON — tools/ab_knn.py A/Bs the odometry trajectory delta at
    # HDL-64 deployment shapes (recorded in PERF.md); False = exact merge.
    approx_knn: bool = True
    # re-rank cached pass-1 kNN candidates in later association passes
    # instead of re-scanning the map (see scan_to_map; ab_knn.py A/Bs it)
    reuse_knn: bool = True


class MapState(NamedTuple):
    edge_map: jnp.ndarray
    edge_map_valid: jnp.ndarray
    surf_map: jnp.ndarray
    surf_map_valid: jnp.ndarray
    map_origin: jnp.ndarray  # (3,) voxel-grid origin of the current maps
    q: jnp.ndarray  # current world pose
    p: jnp.ndarray
    q_prev: jnp.ndarray  # previous pose (constant-velocity prediction)
    p_prev: jnp.ndarray
    frame_count: jnp.ndarray  # int32 scalar


def init_state(cfg: OdomConfig, dtype=jnp.float32) -> MapState:
    q0 = jnp.array([1.0, 0, 0, 0], dtype)
    p0 = jnp.zeros(3, dtype)
    return MapState(
        edge_map=jnp.zeros((cfg.edge_map_cap, 3), dtype),
        edge_map_valid=jnp.zeros((cfg.edge_map_cap,), bool),
        surf_map=jnp.zeros((cfg.surf_map_cap, 3), dtype),
        surf_map_valid=jnp.zeros((cfg.surf_map_cap,), bool),
        map_origin=jnp.full((3,), -cfg.crop_half_extent, dtype),
        q=q0, p=p0, q_prev=q0, p_prev=p0,
        frame_count=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Correspondence building (replaces EdgeCostFactor/SurfCostFactor setup)
# ---------------------------------------------------------------------------

def _map_knn(pts_w, map_pts, map_valid, cfg: OdomConfig, res, radius, origin,
             presorted: bool = False):
    if cfg.use_hash_knn and origin is not None:
        return hknn.hash_knn(pts_w, map_pts, map_valid, res, origin,
                             k=cfg.knn_k, radius=radius)
    if cfg.sparse_knn:
        # correspondences are gated on d2[:, -1] < max_corr_dist^2 below, so
        # the kNN only needs to be exact within that radius — this unlocks
        # Morton AABB block skipping (ops/pallas/knn_pallas.py)
        return knn_ops.knn(pts_w, map_pts, map_valid, k=cfg.knn_k,
                           radius=cfg.max_corr_dist,
                           q_sorted=presorted, db_sorted=presorted)
    # approx: grouped-merge Pallas kernel — the line/plane fits behind
    # this are tolerance-gated, so the bounded 5th-neighbor approximation
    # (P ~ 1e-3 of returning the 6th-nearest instead) is invisible to them
    return knn_ops.knn(pts_w, map_pts, map_valid, k=cfg.knn_k,
                       approx=cfg.approx_knn)


def edge_correspondences(pts_w, valid, map_pts, d2, idx, cfg: OdomConfig):
    """5-NN line fit per edge point: PCA direction + eigenvalue gating
    (EstimationMapping.hpp:254-270 semantics: lambda_max > 3 lambda_mid).
    (d2, idx) come from _map_knn or from a cached-candidate re-rank
    (_reuse_knn) — the fit is symmetric in the k neighbors either way."""
    nn = map_pts[idx]  # (N, k, 3)
    ok = jnp.isfinite(d2).all(axis=-1) & (d2[:, -1] < cfg.max_corr_dist**2) & valid
    centroid = jnp.mean(nn, axis=1)
    centered = nn - centroid[:, None, :]
    from vil_fusion_tpu.ops.linalg import gram3, sym3x3_principal

    cov = gram3(centered) / cfg.knn_k
    # closed-form symmetric 3x3 eigen-decomposition (iterative eigh on
    # thousands of tiny matrices is a TPU anti-pattern)

    lam, direction = sym3x3_principal(cov)
    ok = ok & (lam[:, 2] > cfg.edge_eig_ratio * lam[:, 1])
    finite = jnp.isfinite(direction).all(axis=-1) & jnp.isfinite(centroid).all(axis=-1)
    ok = ok & finite
    z = jnp.array([0.0, 0.0, 1.0], pts_w.dtype)
    direction = jnp.where(finite[:, None], direction, z)
    centroid = jnp.where(finite[:, None], centroid, 0.0)
    return centroid, direction, ok


def surf_correspondences(pts_w, valid, map_pts, d2, idx, cfg: OdomConfig):
    """5-NN plane fit per planar point: solve A n = -1, gate on fit residual
    (SurfCostFactor :174-206 semantics). (d2, idx) as in
    edge_correspondences."""
    nn = map_pts[idx]  # (N, k, 3)
    ok = jnp.isfinite(d2).all(axis=-1) & (d2[:, -1] < cfg.max_corr_dist**2) & valid
    # TLS plane fit: normal = smallest eigenvector of the CENTERED 5-NN
    # covariance (closed form, ops/linalg), offset d = -n.c. Replaces the
    # reference's A n = -1 least squares (SurfCostFactor :174-206): same
    # gate semantics, but (a) batched jnp.linalg.solve on thousands of 3x3
    # systems went through the TPU LU library (slow), and (b) the n.p = -1
    # parameterization is ill-conditioned far from the origin (|n| ~
    # 1/dist), while the centered covariance is scale-free at any range.
    from vil_fusion_tpu.ops.linalg import gram3, sym3x3_smallest

    c = jnp.mean(nn, axis=1)  # (N, 3)
    nc = nn - c[:, None, :]
    cov = gram3(nc)
    _, n_hat = sym3x3_smallest(cov)
    d_off = -jnp.sum(n_hat * c, axis=-1)
    fit_res = jnp.abs(jnp.sum(nn * n_hat[:, None, :], axis=-1)
                      + d_off[:, None])
    ok = ok & jnp.all(fit_res < cfg.plane_tol, axis=-1)
    # sanitize: ill-conditioned fits yield non-finite normals; 0 * NaN = NaN
    # would poison the masked Hessian reduction downstream.
    finite = jnp.isfinite(n_hat).all(axis=-1) & jnp.isfinite(d_off)
    ok = ok & finite
    z = jnp.array([0.0, 0.0, 1.0], pts_w.dtype)
    n_hat = jnp.where(finite[:, None], n_hat, z)
    d_off = jnp.where(finite, d_off, 0.0)
    return n_hat, d_off, ok


# ---------------------------------------------------------------------------
# Damped Gauss-Newton on one SE(3) block
# ---------------------------------------------------------------------------

def _pose_point_jacobian(q, x):
    """d(R exp(th) x + p)/d[dp, dth] = [I | -R skew(x)], (N, 3, 6)."""
    R = lie.q2R(q)
    J_th = -jnp.einsum("ij,njk->nik", R, lie.skew(x))
    J_p = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), J_th.shape)
    return jnp.concatenate([J_p, J_th], axis=-1)


def _huber_w(r_norm, delta):
    return jnp.where(r_norm <= delta, 1.0, delta / jnp.maximum(r_norm, 1e-12))


def _gn_system(q, p, edge_x, e_cent, e_dir, e_ok, surf_x, s_n, s_d, s_ok, cfg: OdomConfig):
    """Assemble the 6x6 normal system from edge + plane residuals."""
    dtype = p.dtype
    # edge residual: (I - d d^T)(p_w - c)
    pe_w = lie.qrot(q, edge_x) + p
    P_line = jnp.eye(3, dtype=dtype) - jnp.einsum("ni,nj->nij", e_dir, e_dir)
    r_e = jnp.einsum("nij,nj->ni", P_line, pe_w - e_cent)  # (N, 3)
    J_e = jnp.einsum("nij,njk->nik", P_line, _pose_point_jacobian(q, edge_x))  # (N,3,6)
    w_e = _huber_w(jnp.linalg.norm(r_e, axis=-1), cfg.huber_delta) * e_ok
    H_e = jnp.einsum("n,nik,nil->kl", w_e, J_e, J_e)
    b_e = jnp.einsum("n,nik,ni->k", w_e, J_e, r_e)
    cost_e = jnp.sum(w_e * jnp.sum(r_e * r_e, axis=-1))

    # plane residual: n . p_w + d
    ps_w = lie.qrot(q, surf_x) + p
    r_s = jnp.einsum("ni,ni->n", s_n, ps_w) + s_d  # (N,)
    J_s = jnp.einsum("ni,nik->nk", s_n, _pose_point_jacobian(q, surf_x))  # (N, 6)
    w_s = _huber_w(jnp.abs(r_s), cfg.huber_delta) * s_ok
    H_s = jnp.einsum("n,nk,nl->kl", w_s, J_s, J_s)
    b_s = jnp.einsum("n,nk,n->k", w_s, J_s, r_s)
    cost_s = jnp.sum(w_s * r_s * r_s)

    return H_e + H_s, -(b_e + b_s), cost_e + cost_s


def scan_to_map(
    feats: LidarFeatures,
    edge_map, edge_map_valid, surf_map, surf_map_valid,
    q_init, p_init, cfg: OdomConfig, map_origin=None, warm=None,
):
    """Register a feature scan against the local map (optimation_processing
    :235-296): n_outer association passes, n_inner damped-GN steps each."""
    # Pre-sort both sides spatially ONCE (TPU sparse-kNN path): rigid motion
    # across the n_outer passes preserves coherence, so one Morton sort here
    # replaces a sort inside every kNN call. Order changes are internal —
    # only poses leave this function.
    if (cfg.sparse_knn and not cfg.use_hash_knn
            and jax.default_backend() in ("tpu", "axon")):
        from vil_fusion_tpu.ops.pallas.knn_pallas import morton_sort

        ep = morton_sort(feats.edge, feats.edge_valid)
        sp = morton_sort(feats.surf, feats.surf_valid)
        feats = feats._replace(
            edge=feats.edge[ep], edge_valid=feats.edge_valid[ep],
            surf=feats.surf[sp], surf_valid=feats.surf_valid[sp])
        emp = morton_sort(edge_map, edge_map_valid)
        edge_map, edge_map_valid = edge_map[emp], edge_map_valid[emp]
        smp = morton_sort(surf_map, surf_map_valid)
        surf_map, surf_map_valid = surf_map[smp], surf_map_valid[smp]
        presorted = True
    else:
        presorted = False

    # Association passes. Pass 1 scans the full map (Pallas kNN); later
    # passes re-rank the CACHED pass-1 candidates under the updated pose
    # (cfg.reuse_knn) instead of re-scanning — the second full kNN is the
    # single most expensive slab of the frame program, and once the
    # constant-velocity prediction is warm the pose moves mm-cm between
    # passes, so the 5-NN set at the refined pose is pass 1's set to within
    # the tolerance gates. COLD frames are the exception: with no velocity
    # estimate the prediction can be a full frame-motion off (~1 m), pass-1
    # candidates are found at a badly wrong pose, and reusing them bakes a
    # persistent early offset into the trajectory (measured ~0.28 m mean
    # over a 45 m A/B before the gate; tools/ab_knn.py) — so reuse is
    # gated on `warm` (odometry frame_count >= 3) via lax.cond and cold
    # frames re-query the map exactly like the reference's per-
    # relinearization kd-tree queries (EstimationMapping.hpp:254-285).
    # Neighbors missing in pass 1 (non-finite d2) stay masked: recomputing
    # distances on their padded indices would resurrect invalid
    # correspondences.
    if warm is None:
        warm = jnp.asarray(True)
    q, p = q_init, p_init
    cache = {}
    for outer in range(cfg.n_outer):
        e_w = lie.qrot(q, feats.edge) + p
        s_w = lie.qrot(q, feats.surf) + p
        if outer == 0 or not cfg.reuse_knn:
            e_d2, e_idx = _map_knn(e_w, edge_map, edge_map_valid, cfg,
                                   cfg.edge_map_voxel, cfg.edge_hash_radius,
                                   map_origin, presorted)
            s_d2, s_idx = _map_knn(s_w, surf_map, surf_map_valid, cfg,
                                   cfg.surf_map_voxel, cfg.surf_hash_radius,
                                   map_origin, presorted)
            cache = dict(e_idx=e_idx, e_fin=jnp.isfinite(e_d2).all(-1),
                         s_idx=s_idx, s_fin=jnp.isfinite(s_d2).all(-1))
        else:
            def _reuse(e_w=e_w, s_w=s_w, cache=cache):
                e_idx, s_idx = cache["e_idx"], cache["s_idx"]
                e_d2 = jnp.sum((e_w[:, None, :] - edge_map[e_idx]) ** 2, -1)
                e_d2 = jnp.sort(jnp.where(cache["e_fin"][:, None], e_d2,
                                          jnp.inf), axis=-1)
                s_d2 = jnp.sum((s_w[:, None, :] - surf_map[s_idx]) ** 2, -1)
                s_d2 = jnp.sort(jnp.where(cache["s_fin"][:, None], s_d2,
                                          jnp.inf), axis=-1)
                return e_d2, e_idx, s_d2, s_idx

            def _requery(e_w=e_w, s_w=s_w):
                e_d2, e_idx = _map_knn(e_w, edge_map, edge_map_valid, cfg,
                                       cfg.edge_map_voxel,
                                       cfg.edge_hash_radius,
                                       map_origin, presorted)
                s_d2, s_idx = _map_knn(s_w, surf_map, surf_map_valid, cfg,
                                       cfg.surf_map_voxel,
                                       cfg.surf_hash_radius,
                                       map_origin, presorted)
                return e_d2, e_idx, s_d2, s_idx

            e_d2, e_idx, s_d2, s_idx = jax.lax.cond(warm, _reuse, _requery)
        e_cent, e_dir, e_ok = edge_correspondences(
            e_w, feats.edge_valid, edge_map, e_d2, e_idx, cfg)
        s_n, s_d, s_ok = surf_correspondences(
            s_w, feats.surf_valid, surf_map, s_d2, s_idx, cfg)

        def inner_body(_, qp, e_cent=e_cent, e_dir=e_dir, e_ok=e_ok,
                       s_n=s_n, s_d=s_d, s_ok=s_ok):
            q, p = qp
            H, b, _ = _gn_system(
                q, p, feats.edge, e_cent, e_dir, e_ok.astype(p.dtype),
                feats.surf, s_n, s_d, s_ok.astype(p.dtype), cfg)
            H = H + cfg.lm_lambda * jnp.eye(6, dtype=p.dtype) * (1.0 + jnp.diag(H))
            # damped H is SPD: unrolled scalar Cholesky instead of the LU
            # custom call (8 library solves per frame were latency, not math)
            from vil_fusion_tpu.ops.linalg import solve_spd_unrolled

            delta = solve_spd_unrolled(H, b)
            # trust clip: cap step at 1 m / ~0.5 rad to survive bad inits
            delta = jnp.clip(delta, -1.0, 1.0)
            return lie.pose_retract((q, p), delta)

        q, p = jax.lax.fori_loop(0, cfg.n_inner, inner_body, (q, p))
    return q, p


# ---------------------------------------------------------------------------
# Full odometry step (extract -> predict -> register -> map update)
# ---------------------------------------------------------------------------

def _update_maps(state: MapState, feats: LidarFeatures, q, p, cfg: OdomConfig):
    e_w = lie.qrot(q, feats.edge) + p
    s_w = lie.qrot(q, feats.surf) + p
    origin = p - cfg.crop_half_extent
    in_e = jnp.all(jnp.abs(state.edge_map - p) <= cfg.crop_half_extent, axis=-1)
    in_s = jnp.all(jnp.abs(state.surf_map - p) <= cfg.crop_half_extent, axis=-1)
    # sort-free hash merge (see voxel_downsample_hash): map maintenance was
    # a large fraction of the per-frame cost with the exact sorted merge
    edge_map, edge_valid = voxel_ops.merge_voxel_hash(
        state.edge_map, state.edge_map_valid & in_e, e_w, feats.edge_valid,
        cfg.edge_map_voxel, origin, cfg.edge_map_cap)
    surf_map, surf_valid = voxel_ops.merge_voxel_hash(
        state.surf_map, state.surf_map_valid & in_s, s_w, feats.surf_valid,
        cfg.surf_map_voxel, origin, cfg.surf_map_cap)
    return edge_map, edge_valid, surf_map, surf_valid, origin


@functools.partial(jax.jit, static_argnames=("cfg",))
def odometry_step(state: MapState, points: jnp.ndarray, valid: jnp.ndarray,
                  cfg: OdomConfig = OdomConfig()):
    """One LiDAR frame: returns (new_state, (q, p, q_rel, p_rel)).

    The relative pose (q_rel, p_rel) between consecutive registered frames is
    what the reference publishes as /Odometry for the estimator's inter-frame
    lidar factors (feature_tracker_node.cpp:399-415).
    """
    # constant-velocity prediction (EstimationMapping.hpp:238-240)
    q_rel0, p_rel0 = lie.pose_between((state.q_prev, state.p_prev), (state.q, state.p))
    q_pred, p_pred = lie.pose_compose((state.q, state.p), (q_rel0, p_rel0))

    raw_points = points
    if cfg.deskew:
        from vil_fusion_tpu.models.deskew import deskew_points

        points = deskew_points(points, valid, q_rel0, p_rel0)

    feats = extract_features(points, valid, cfg.lidar)

    def register(_):
        return scan_to_map(
            feats, state.edge_map, state.edge_map_valid,
            state.surf_map, state.surf_map_valid, q_pred, p_pred, cfg,
            state.map_origin, warm=state.frame_count >= 3)

    def first_frame(_):
        return state.q, state.p

    q_new, p_new = jax.lax.cond(state.frame_count > 0, register, first_frame, None)

    if cfg.deskew:
        # second pass: re-deskew the raw scan with the REFINED motion before
        # inserting into the map — map consistency is what makes deskew pay
        # (a map mixing differently-distorted scans registers worse than a
        # consistently distorted one)
        from vil_fusion_tpu.models.deskew import deskew_points

        q_ref, p_ref = lie.pose_between((state.q, state.p), (q_new, p_new))
        pts_refined = deskew_points(raw_points, valid, q_ref, p_ref)
        feats = extract_features(pts_refined, valid, cfg.lidar)
        # frame 0 went into the map undeskewed (no motion estimate yet);
        # drop it at frame 1 — the map must be uniformly motion-compensated
        drop0 = state.frame_count == 1
        state = state._replace(
            edge_map_valid=state.edge_map_valid & ~drop0,
            surf_map_valid=state.surf_map_valid & ~drop0)

    maps = _update_maps(state, feats, q_new, p_new, cfg)
    new_state = MapState(
        edge_map=maps[0], edge_map_valid=maps[1],
        surf_map=maps[2], surf_map_valid=maps[3], map_origin=maps[4],
        q=q_new, p=p_new, q_prev=state.q, p_prev=state.p,
        frame_count=state.frame_count + 1,
    )
    q_rel, p_rel = lie.pose_between((state.q, state.p), (q_new, p_new))
    return new_state, (q_new, p_new, q_rel, p_rel)


@functools.partial(jax.jit, static_argnames=("cfg",))
def odometry_step_batched(states: MapState, points, valid, cfg: OdomConfig = OdomConfig()):
    """Batched multi-sequence odometry: every leaf of `states` and the scan
    inputs carry a leading sequence axis; S independent sequences advance in
    one fused device program (SURVEY §7: batched multi-sequence evaluation —
    run KITTI 07/08/09 simultaneously, impossible in the reference's
    process-per-sequence design). vmap over the pure single-sequence step.

    For multi-chip scale-out, shard the sequence axis over the mesh
    (parallel/batched_odometry.py)."""
    return jax.vmap(lambda s, p, v: odometry_step(s, p, v, cfg))(states, points, valid)


def init_state_batched(cfg: OdomConfig, n_seq: int, dtype=jnp.float32) -> MapState:
    one = init_state(cfg, dtype)
    return jax.tree.map(lambda a: jnp.broadcast_to(a, (n_seq,) + a.shape).copy(), one)
