"""4-DoF pose graph (yaw + xyz; pitch/roll fixed from VIO).

Rebuild of the reference's visual-loop pose graph optimizer
(reference: src/visual_inertial_lidar/pose_graph/pose_graph.cpp optimize4DoF
:406-582; FourDOFError/FourDOFWeightError pose_graph.h:161-250): sequential
edges to up to 4 back-neighbors + loop edges, yaw-only rotation DOF (gravity
makes pitch/roll observable in the VIO, so the graph must not touch them),
drift (yaw + t) applied to subsequent frames after each solve (:552-574).

Same edge-wise PCG machinery as posegraph.py, with a 4-dim tangent per node.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vil_fusion_tpu.ops import lie

SEQ_NEIGHBORS = 4  # sequential edges span (pose_graph.cpp:436-470)


class PoseGraph4DoF(NamedTuple):
    # state: position + yaw; fixed pitch/roll carried alongside
    p: jnp.ndarray  # (N, 3)
    yaw: jnp.ndarray  # (N,) radians
    pitch: jnp.ndarray  # (N,) fixed (from VIO)
    roll: jnp.ndarray  # (N,)
    seq: jnp.ndarray  # (N,) int32 session id (multi-sequence support:
    #   sequential edges never straddle a sequence boundary; loop edges
    #   between sequences stitch the sessions — pose_graph.cpp:45-126)
    # immutable VIO poses at insertion: sequential-edge MEASUREMENTS come
    # from these, never from the optimized state (the reference keeps
    # vio_T separately, pose_graph.cpp:436-470); deriving measurements from
    # current poses would bake the drift jump into the first post-loop edge
    vio_p: jnp.ndarray  # (N, 3)
    vio_yaw: jnp.ndarray  # (N,)
    n_nodes: jnp.ndarray
    loop_i: jnp.ndarray  # (L,)
    loop_j: jnp.ndarray
    loop_t: jnp.ndarray  # (L, 3) relative translation in frame i
    loop_yaw: jnp.ndarray  # (L,) relative yaw
    loop_valid: jnp.ndarray
    n_loops: jnp.ndarray


def init_graph(capacity: int = 4096, loop_capacity: int = 256, dtype=jnp.float32):
    z = lambda *s: jnp.zeros(s, dtype)
    return PoseGraph4DoF(
        p=z(capacity, 3), yaw=z(capacity), pitch=z(capacity), roll=z(capacity),
        seq=jnp.zeros((capacity,), jnp.int32),
        vio_p=z(capacity, 3), vio_yaw=z(capacity),
        n_nodes=jnp.zeros((), jnp.int32),
        loop_i=jnp.zeros((loop_capacity,), jnp.int32),
        loop_j=jnp.zeros((loop_capacity,), jnp.int32),
        loop_t=z(loop_capacity, 3), loop_yaw=z(loop_capacity),
        loop_valid=jnp.zeros((loop_capacity,), bool),
        n_loops=jnp.zeros((), jnp.int32))


@jax.jit
def add_node(graph: PoseGraph4DoF, p, yaw, pitch, roll, seq=0):
    """`p`/`yaw` double as the initial state AND the VIO measurement pose
    (callers insert raw VIO keyframe poses)."""
    i = jnp.minimum(graph.n_nodes, graph.p.shape[0] - 1)
    return graph._replace(
        p=graph.p.at[i].set(p), yaw=graph.yaw.at[i].set(yaw),
        pitch=graph.pitch.at[i].set(pitch), roll=graph.roll.at[i].set(roll),
        seq=graph.seq.at[i].set(jnp.int32(seq)),
        vio_p=graph.vio_p.at[i].set(p), vio_yaw=graph.vio_yaw.at[i].set(yaw),
        n_nodes=graph.n_nodes + 1)


@jax.jit
def add_loop(graph: PoseGraph4DoF, i, j, t_rel, yaw_rel):
    k = jnp.minimum(graph.n_loops, graph.loop_i.shape[0] - 1)
    return graph._replace(
        loop_i=graph.loop_i.at[k].set(i), loop_j=graph.loop_j.at[k].set(j),
        loop_t=graph.loop_t.at[k].set(t_rel),
        loop_yaw=graph.loop_yaw.at[k].set(yaw_rel),
        loop_valid=graph.loop_valid.at[k].set(True),
        n_loops=graph.n_loops + 1)


def _R_ypr(yaw, pitch, roll):
    ypr = jnp.stack([yaw, pitch, roll], axis=-1) * (180.0 / jnp.pi)
    return lie.ypr2R(ypr)


def _edge_residual(delta8, p_i, yaw_i, pr_i, p_j, yaw_j, pr_j, t_m, yaw_m):
    """FourDOFError (pose_graph.h:161-199): translation expressed in node i's
    full rotation (yaw free, pitch/roll fixed), plus yaw difference."""
    pi = p_i + delta8[0:3]
    yi = yaw_i + delta8[3]
    pj = p_j + delta8[4:7]
    yj = yaw_j + delta8[7]
    R_i = _R_ypr(yi, pr_i[0], pr_i[1])
    t_rel = R_i.T @ (pj - pi)
    r_t = t_rel - t_m
    r_y = (yj - yi - yaw_m + jnp.pi) % (2 * jnp.pi) - jnp.pi
    return jnp.concatenate([r_t, r_y[None]])


# VINS-Mono semantics (pose_graph.h FourDOFError): translation residual in
# meters with unit weight, yaw residual divided by 10 degrees -> 5.73/rad.
SEQ_W = np.array([1.0, 1.0, 1.0, 5.73], np.float32)
LOOP_W = np.array([1.0, 1.0, 1.0, 5.73], np.float32)
PRIOR_W = 1e4


@functools.partial(jax.jit, static_argnames=("gn_iters", "cg_iters", "lm_lambda"))
def optimize(graph: PoseGraph4DoF, gn_iters: int = 10, cg_iters: int = 64,
             lm_lambda: float = 0.02):
    """optimize4DoF :406-582 rebuild: sequential 4-neighbor edges + loop
    edges, batched GN + block-Jacobi PCG over (x, y, z, yaw) per node."""
    N = graph.p.shape[0]
    dtype = graph.p.dtype
    active = (jnp.arange(N) < graph.n_nodes).astype(dtype)

    # sequential edge lists: (i, i+k) for k in 1..SEQ_NEIGHBORS, measured from
    # the CURRENT vio poses at insertion time == initial graph values. The
    # reference builds them from vio arrays each solve (:436-470); here the
    # initial (p, yaw) serve as the odometry measurements.
    seq_i = []
    seq_j = []
    for k in range(1, SEQ_NEIGHBORS + 1):
        idx = jnp.arange(N)
        seq_i.append(idx)
        seq_j.append(jnp.minimum(idx + k, N - 1))
    seq_i = jnp.concatenate(seq_i)
    seq_j = jnp.concatenate(seq_j)
    seq_valid = ((seq_j < graph.n_nodes) & (seq_j > seq_i)
                 & (graph.seq[seq_i] == graph.seq[seq_j]))

    R_i0 = _R_ypr(graph.vio_yaw[seq_i], graph.pitch[seq_i], graph.roll[seq_i])
    seq_t = jnp.einsum("nij,nj->ni", jnp.swapaxes(R_i0, 1, 2),
                       graph.vio_p[seq_j] - graph.vio_p[seq_i])
    seq_yaw = graph.vio_yaw[seq_j] - graph.vio_yaw[seq_i]

    ei = jnp.concatenate([seq_i, graph.loop_i])
    ej = jnp.concatenate([seq_j, graph.loop_j])
    t_m = jnp.concatenate([seq_t, graph.loop_t])
    yaw_m = jnp.concatenate([seq_yaw, graph.loop_yaw])
    loop_ok = graph.loop_valid & (graph.loop_j < graph.n_nodes)
    valid = jnp.concatenate([seq_valid, loop_ok])
    w = jnp.concatenate([
        jnp.tile(jnp.asarray(SEQ_W, dtype), (seq_i.shape[0], 1)),
        jnp.tile(jnp.asarray(LOOP_W, dtype), (graph.loop_i.shape[0], 1))])
    n_seq = seq_i.shape[0]

    pr = jnp.stack([graph.pitch, graph.roll], axis=-1)

    def gn_step(it, state):
        p, yaw = state

        def one(ii, jj, tm, ym):
            z = jnp.zeros(8, dtype)
            args = (p[ii], yaw[ii], pr[ii], p[jj], yaw[jj], pr[jj], tm, ym)
            r = _edge_residual(z, *args)
            J = jax.jacfwd(_edge_residual)(z, *args)
            return r, J

        r, J = jax.vmap(one)(ei, ej, t_m, yaw_m)
        # annealed Huber on loop edges (reference wraps loop edges in a
        # weighted error with sqrt-weight 1/sqrt? — FourDOFWeightError)
        is_loop = jnp.arange(r.shape[0]) >= n_seq
        rn = jnp.sqrt(jnp.sum((w * r) ** 2, axis=-1) + 1e-12)
        delta_h = jnp.maximum(4.0, 1e4 * 0.1 ** it.astype(dtype))
        rob = jnp.where(is_loop & (rn > delta_h), delta_h / rn, 1.0)
        wr = w * rob[:, None] * valid[:, None].astype(dtype)
        r = r * wr
        J = J * wr[:, :, None]

        JTr = jnp.einsum("erd,er->ed", J, r)
        b = jnp.zeros((N, 4), dtype)
        b = b.at[ei].add(-JTr[:, :4])
        b = b.at[ej].add(-JTr[:, 4:])
        b = b.at[0].add(-PRIOR_W * jnp.concatenate(
            [p[0] - graph.p[0], (yaw[0] - graph.yaw[0])[None]]))

        JTJ_ii = jnp.einsum("erd,erc->edc", J[:, :, :4], J[:, :, :4])
        JTJ_jj = jnp.einsum("erd,erc->edc", J[:, :, 4:], J[:, :, 4:])
        Pblk = jnp.zeros((N, 4, 4), dtype).at[ei].add(JTJ_ii).at[ej].add(JTJ_jj)
        Pblk = Pblk.at[0].add(PRIOR_W * jnp.eye(4, dtype=dtype))
        # LM damping (relative to block diagonal) stabilizes the strong
        # yaw-translation coupling — undamped GN oscillates on long chains
        diag_damp = lm_lambda * jnp.einsum("ndd->nd", Pblk)
        Pblk = Pblk + jax.vmap(jnp.diag)(diag_damp) + 1e-4 * jnp.eye(4, dtype=dtype)
        Pinv = jnp.linalg.inv(Pblk)

        def matvec(v):
            ve = jnp.concatenate([v[ei], v[ej]], axis=-1)
            u = jnp.einsum("erd,ed->er", J, ve)
            JTu = jnp.einsum("erd,er->ed", J, u)
            out = jnp.zeros((N, 4), dtype).at[ei].add(JTu[:, :4]).at[ej].add(JTu[:, 4:])
            out = out.at[0].add(PRIOR_W * v[0])
            out = out + diag_damp * v  # LM damping (matches preconditioner)
            return (out + 1e-6 * v) * active[:, None]

        def apply_P(v):
            return jnp.einsum("nde,ne->nd", Pinv, v) * active[:, None]

        x = jnp.zeros((N, 4), dtype)
        r_cg = b * active[:, None]
        z_cg = apply_P(r_cg)
        pdir = z_cg
        rz = jnp.sum(r_cg * z_cg)

        def cg_body(_, st):
            x, r_cg, pdir, rz = st
            Ap = matvec(pdir)
            denom = jnp.sum(pdir * Ap)
            alpha = rz / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
            x = x + alpha * pdir
            r_new = r_cg - alpha * Ap
            z_new = apply_P(r_new)
            rz_new = jnp.sum(r_new * z_new)
            beta = rz_new / jnp.where(jnp.abs(rz) > 1e-12, rz, 1e-12)
            return x, r_new, z_new + beta * pdir, rz_new

        x, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body, (x, r_cg, pdir, rz))
        x = jnp.clip(x, -2.0, 2.0) * active[:, None]
        return p + x[:, :3], yaw + x[:, 3]

    p, yaw = jax.lax.fori_loop(0, gn_iters, gn_step, (graph.p, graph.yaw))
    return graph._replace(p=p, yaw=yaw)


def drift_transform(graph_before: PoseGraph4DoF, graph_after: PoseGraph4DoF, node):
    """(yaw_drift, t_drift) applied to frames after the optimized span
    (pose_graph.cpp:552-574)."""
    dyaw = graph_after.yaw[node] - graph_before.yaw[node]
    R = _R_ypr(dyaw, jnp.zeros_like(dyaw), jnp.zeros_like(dyaw))
    dt = graph_after.p[node] - R @ graph_before.p[node]
    return dyaw, R, dt
