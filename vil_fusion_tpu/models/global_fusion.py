"""Global fusion: keyframe gating + ScanContext loops + ICP + pose graph.

Rebuild of the reference's `sensor_fusion_poseGraphOptimization` node
(reference: src/global_fusion/poseGraphOptimization.cpp: keyframe gate by
2 m / 10 deg accumulated motion :518-538, makeAndSaveScancontextAndKeys
:544-554, loopDetection @1 Hz :598-615, icpCalculation vs +-25-keyframe
submap :376-444, isamUpdate @1 Hz :349-374, loopPath re-broadcast :239-308).

The reference's 5 threads collapse into one host loop: every keyframe runs
descriptor insert + loop query; accepted candidates run ICP verification and
a pose-graph relaxation. Keyframe clouds are kept in a fixed-capacity
device-resident store for submap assembly.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vil_fusion_tpu.models import icp as icp_mod
from vil_fusion_tpu.models import posegraph as pg
from vil_fusion_tpu.models import scancontext as sc
from vil_fusion_tpu.ops import lie


@jax.jit
def _node_glue(q_prev_kf, p_prev_kf, q_odom, p_odom, q_graph_prev, p_graph_prev):
    """Odometry edge + absolute init estimate in one dispatch."""
    q_rel, p_rel = lie.pose_between((q_prev_kf, p_prev_kf), (q_odom, p_odom))
    q_abs, p_abs = lie.pose_compose((q_graph_prev, p_graph_prev), (q_rel, p_rel))
    return q_rel, p_rel, q_abs, p_abs


@jax.jit
def _sc_insert_and_detect(db: sc.ScanContextDB, pts, val):
    """Descriptor build + DB insert + loop query in one device program
    (the host-orchestrated version paid one dispatch per stage)."""
    desc = sc.make_descriptor(pts, val)
    db = sc.add_keyframe(db, desc)
    cand, dist, shift = sc.detect_loop(db, desc)
    return db, cand, dist, shift


class GlobalFusionConfig(NamedTuple):
    keyframe_dist: float = 2.0  # m (:518-538)
    keyframe_angle: float = 10.0 * np.pi / 180.0
    sc_dist_thres: float = sc.SC_DIST_THRES
    icp_fitness_max: float = 0.3  # (:431)
    submap_half_span: int = 12  # +-keyframes in ICP target (reference 25)
    node_capacity: int = 2048
    loop_capacity: int = 256
    cloud_capacity: int = 2048  # stored points per keyframe (downsampled)
    optimize_every: int = 1  # keyframes between relaxations (isam 1 Hz analog)


class GlobalFusion:
    """Host orchestration; heavy ops jitted. Mirrors the node's lifecycle."""

    def __init__(self, cfg: GlobalFusionConfig = GlobalFusionConfig(), dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.graph = pg.init_graph(cfg.node_capacity, cfg.loop_capacity, dtype)
        self.scdb = sc.init_db(cfg.node_capacity, dtype)
        self.clouds = jnp.zeros((cfg.node_capacity, cfg.cloud_capacity, 3), dtype)
        self.cloud_valid = jnp.zeros((cfg.node_capacity, cfg.cloud_capacity), bool)
        self.kf_q_odom = []  # odometry pose at each keyframe (host list)
        self.kf_p_odom = []
        self.n_kf = 0
        self.last_q = None
        self.last_p = None
        self.loops_found = []  # (i, j) pairs accepted
        self._pending_opt = 0

    # ------------------------------------------------------------------
    def is_keyframe(self, q, p) -> bool:
        if self.last_q is None:
            return True
        q = np.asarray(q)
        lq = np.asarray(self.last_q)
        dp = np.linalg.norm(np.asarray(p) - np.asarray(self.last_p))
        # host-side angle check (no device dispatch on the non-keyframe path)
        dth = 2.0 * np.arccos(np.clip(np.abs(np.dot(q, lq)), 0.0, 1.0))
        return dp > self.cfg.keyframe_dist or dth > self.cfg.keyframe_angle

    def add_frame(self, q_odom, p_odom, scan_points, scan_valid) -> Optional[tuple]:
        """Feed one odometry pose + body-frame scan. Returns (i, j) if a loop
        was accepted this keyframe, else None. Non-keyframes are ignored
        (the gate :518-538)."""
        q_odom = jnp.asarray(q_odom, self.dtype)
        p_odom = jnp.asarray(p_odom, self.dtype)
        if not self.is_keyframe(q_odom, p_odom):
            return None
        self.last_q = np.asarray(q_odom)
        self.last_p = np.asarray(p_odom)
        cfg = self.cfg
        i = self.n_kf
        if i >= cfg.node_capacity:
            return None  # graph full

        # odometry edge from previous keyframe
        if i == 0:
            q_rel = jnp.array([1.0, 0, 0, 0], self.dtype)
            p_rel = jnp.zeros(3, self.dtype)
            q_abs, p_abs = q_odom, p_odom
        else:
            q_rel, p_rel, q_abs, p_abs = _node_glue(
                jnp.asarray(self.kf_q_odom[-1], self.dtype),
                jnp.asarray(self.kf_p_odom[-1], self.dtype),
                q_odom, p_odom, self.graph.q[i - 1], self.graph.p[i - 1])
        self.graph = pg.add_node(self.graph, q_abs, p_abs, q_rel, p_rel)
        self.kf_q_odom.append(np.asarray(q_odom))
        self.kf_p_odom.append(np.asarray(p_odom))

        # store downsampled cloud + descriptor + loop query — one fused
        # device call (loopDetection :598-615)
        pts = jnp.asarray(scan_points, self.dtype)
        val = jnp.asarray(scan_valid)
        self.scdb, cand, dist, shift = _sc_insert_and_detect(self.scdb, pts, val)
        sel = self._subsample(pts, val, cfg.cloud_capacity)
        self.clouds = self.clouds.at[i].set(sel[0])
        self.cloud_valid = self.cloud_valid.at[i].set(sel[1])
        self.n_kf += 1

        result = None
        if float(dist) < cfg.sc_dist_thres:
            j = int(cand)
            accepted = self._verify_loop(i, j, float(sc.shift_to_yaw(shift)))
            if accepted:
                result = (i, j)
                self.loops_found.append(result)

        self._pending_opt += 1
        if (result is not None) or self._pending_opt >= cfg.optimize_every:
            self.graph = pg.optimize(self.graph)
            self._pending_opt = 0
        return result

    # ------------------------------------------------------------------
    def _subsample(self, pts, val, cap):
        idx = jnp.linspace(0, pts.shape[0] - 1, cap).astype(jnp.int32)
        return pts[idx], val[idx]

    def _verify_loop(self, i: int, j: int, yaw0: float) -> bool:
        """ICP current keyframe vs +-submap_half_span submap around j
        (icpCalculation :376-444); accept on fitness, add robust loop edge."""
        cfg = self.cfg
        # fixed-size submap (static shapes): clamped index span around j
        ks = [min(max(j + d, 0), self.n_kf - 1)
              for d in range(-cfg.submap_half_span, cfg.submap_half_span + 1)]
        # assemble submap in keyframe-j frame using current graph estimates
        q_j = self.graph.q[j]
        p_j = self.graph.p[j]
        tgt_list = []
        tgt_valid = []
        seen = set()
        for k in ks:
            dup = k in seen
            seen.add(k)
            q_k = self.graph.q[k]
            p_k = self.graph.p[k]
            q_rel, p_rel = lie.pose_between((q_j, p_j), (q_k, p_k))
            tgt_list.append(lie.qrot(q_rel[None, :], self.clouds[k]) + p_rel[None, :])
            tgt_valid.append(self.cloud_valid[k] & jnp.asarray(not dup))
        tgt = jnp.concatenate(tgt_list, axis=0)
        tgtv = jnp.concatenate(tgt_valid, axis=0)

        # initial guess: relative pose from graph + SC yaw hint
        q_i = self.graph.q[i]
        p_i = self.graph.p[i]
        q0, p0 = lie.pose_between((q_j, p_j), (q_i, p_i))
        q_yaw = lie.so3_exp(jnp.asarray([0.0, 0.0, yaw0], self.dtype))
        q0 = lie.qnormalize(lie.qmul(q0, q_yaw))

        q_fit, p_fit, fitness = icp_mod.icp_point2point(
            self.clouds[i], self.cloud_valid[i], tgt, tgtv, q0, p0)
        if not np.isfinite(float(fitness)) or float(fitness) > cfg.icp_fitness_max:
            return False
        self.graph = pg.add_loop(self.graph, jnp.int32(j), jnp.int32(i), q_fit, p_fit)
        return True

    # ------------------------------------------------------------------
    def poses(self):
        """(q (n, 4), p (n, 3)) of the optimized keyframe trajectory."""
        n = self.n_kf
        return np.asarray(self.graph.q[:n]), np.asarray(self.graph.p[:n])
