"""Multi-chip sliding-window BA: feature factors sharded over the mesh.

The BA Hessian assembly is a map-reduce over factors (the reference does the
same on 4 pthreads, marginalization_factor.cpp:232-261). Here each device
assembles the normal-equation contribution of its landmark shard and the
6-DoF-pose-state system is reduced with `psum` over ICI — the direct TPU
analog, scaled from 4 threads to N chips.

Landmark depths stay device-local (H_ll is diagonal and landmark-parallel:
the Schur complement's per-landmark elimination never crosses shards), so the
only communication is one psum of the (D, D) pose system per iteration.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vil_fusion_tpu.models import ba, factors
from vil_fusion_tpu.models.window import D, FeatureStore, WindowState
from vil_fusion_tpu.parallel.mesh import AXIS


def build_system_sharded(state, feats_shard: FeatureStore, pre, lidar, prior,
                         cfg: ba.BAConfig, cauchy_c=1.0):
    """Per-device body (runs under shard_map): assemble local landmark blocks,
    psum the pose-state system; IMU/LiDAR/prior factors evaluated on every
    device at 1/N weight (cheap, avoids a broadcast branch)."""
    dtype = state.p.dtype
    g = jnp.asarray(cfg.gravity, dtype)
    n_dev = jax.lax.psum(jnp.ones((), dtype), AXIS)
    inv_n = 1.0 / n_dev

    H = jnp.zeros((D, D), dtype)
    b = jnp.zeros((D,), dtype)

    r_p = factors.marg_prior_residual(prior, state)
    Jp = jnp.where(prior.valid, 1.0, 0.0) * prior.J
    H = H + Jp.T @ Jp * inv_n
    b = b - Jp.T @ r_p * inv_n
    cost = jnp.sum(r_p * r_p) * inv_n

    r, J, ix = ba._imu_blocks(state, pre, g, dtype)
    JTJ = jnp.einsum("nrd,nre->nde", J, J) * inv_n
    JTr = jnp.einsum("nrd,nr->nd", J, r) * inv_n
    H = H.at[ix[:, :, None], ix[:, None, :]].add(JTJ)
    b = b.at[ix].add(-JTr)
    cost = cost + jnp.sum(r * r) * inv_n

    if cfg.use_lidar:
        r, J, ix = ba._lidar_blocks(state, lidar, dtype)
        JTJ = jnp.einsum("nrd,nre->nde", J, J) * inv_n
        JTr = jnp.einsum("nrd,nr->nd", J, r) * inv_n
        H = H.at[ix[:, :, None], ix[:, None, :]].add(JTJ)
        b = b.at[ix].add(-JTr)
        cost = cost + jnp.sum(r * r) * inv_n

    # local landmark shard (one-hot matmul assembly)
    r, Jpse, Jd, ixp, f_idx, rho_cost = ba._proj_blocks(
        state, feats_shard, cfg, dtype, cauchy_c)
    F_loc = feats_shard.active.shape[0]
    cost = cost + rho_cost
    Hpd = jnp.zeros((D, F_loc), dtype)
    Hd = jnp.zeros((F_loc,), dtype)
    bd = jnp.zeros((F_loc,), dtype)
    H, b, Hpd, Hd, bd = ba.accumulate_proj_quadratic(
        H, b, Hpd, Hd, bd, r, Jpse, Jd, ixp, f_idx)

    # local Schur elimination of the depth block (lam-damped, exactly like
    # ba.schur_solve), then one psum of the pose-state system
    diag_pre = jnp.diag(H)  # pre-Schur diag: LM damping base (matches Ceres)
    d_ok = Hd > 1e-8
    Hd_safe = jnp.where(d_ok, Hd, 1.0) + cauchy_lam(cfg)
    inv_Hd = jnp.where(d_ok, 1.0 / Hd_safe, 0.0)
    H = H - (Hpd * inv_Hd[None, :]) @ Hpd.T
    b = b - Hpd @ (bd * inv_Hd)
    H = jax.lax.psum(H, AXIS)
    b = jax.lax.psum(b, AXIS)
    cost = jax.lax.psum(cost, AXIS)
    diag_pre = jax.lax.psum(diag_pre, AXIS)
    return H, b, cost, diag_pre, (Hpd, Hd, bd, inv_Hd)


def cauchy_lam(cfg):
    return 1e-4  # fixed LM damping of the sharded single-step path


def optimize_step_sharded(mesh, state, feats, pre, lidar, prior,
                          cfg: ba.BAConfig, lam=1e-4):
    """One sharded GN step, jitted over the mesh. `feats` arrays are sharded
    on their leading (landmark) axis; all other state is replicated.

    Returns (new_state, new_feats, cost)."""

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), jax.tree.map(lambda _: P(AXIS), feats,
                                    is_leaf=lambda x: x is None), P(), P(), P()),
        out_specs=(P(), jax.tree.map(lambda _: P(AXIS), feats,
                                     is_leaf=lambda x: x is None), P()),
        check_vma=False)
    def step(state, feats_shard, pre, lidar, prior):
        H, b, cost, diag_pre, (Hpd, Hd, bd, inv_Hd) = build_system_sharded(
            state, feats_shard, pre, lidar, prior, cfg)
        lam_ = jnp.asarray(lam, state.p.dtype)
        damp = lam_ * (diag_pre + 1.0)
        Hs = H + jnp.diag(damp)
        s = 1.0 / jnp.sqrt(jnp.abs(jnp.diag(Hs)) + 1e-10)
        Hn = Hs * s[:, None] * s[None, :]
        bn = b * s
        y = jnp.linalg.solve(Hn, bn)
        y = y + jnp.linalg.solve(Hn, bn - Hn @ y)
        delta = y * s
        delta_d = (bd - Hpd.T @ delta) * inv_Hd  # local landmark back-subst
        new_state, new_feats = ba._apply(state, feats_shard, delta, delta_d, cfg)
        return new_state, new_feats, cost

    return step(state, feats, pre, lidar, prior)
