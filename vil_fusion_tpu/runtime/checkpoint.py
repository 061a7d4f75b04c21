"""Checkpoint / resume for the whole pipeline state.

The reference checkpoints only the visual pose graph (keyboard 's',
pose_graph.cpp:701-874); estimator and global fusion lose all state on
restart (SURVEY §5 "Checkpoint/resume"). Here every subsystem's state is a
fixed-shape pytree, so checkpointing is one flat npz per subsystem:
estimator window (poses, features, preintegration, prior), LiDAR odometry
maps, global-fusion graph + ScanContext DB, and the visual loop DB (which
has its own save/load in models/visual_loop.py).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if hasattr(tree, "_asdict"):
        tree = tree._asdict()
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten_into(template, flat, prefix=""):
    if hasattr(template, "_asdict"):
        d = template._asdict()
        return type(template)(**{
            k: _unflatten_into(v, flat, f"{prefix}{k}.") for k, v in d.items()})
    if isinstance(template, dict):
        return {k: _unflatten_into(v, flat, f"{prefix}{k}.") for k, v in template.items()}
    arr = flat[prefix[:-1]]
    leaf = template
    return jnp.asarray(arr, getattr(leaf, "dtype", None))


def save_pytree(path: str, tree):
    np.savez_compressed(path, **_flatten(tree))


def load_pytree(path: str, template):
    flat = dict(np.load(path))
    return _unflatten_into(template, flat)


def save_estimator(est, path: str):
    """Persist a VILEstimator's full solver state."""
    save_pytree(path, dict(
        window=est.window, feats=est.feats, pre=est.pre, lidar=est.lidar,
        prior=dict(J=est.prior.J, r0=est.prior.r0,
                   lin=est.prior.lin, valid=est.prior.valid),
        meta=dict(frame_count=np.int64(est.frame_count),
                  initialized=np.bool_(est.initialized)),
    ))


def load_estimator(est, path: str):
    from vil_fusion_tpu.models import factors

    flat = dict(np.load(path))
    est.window = _unflatten_into(est.window, flat, "window.")
    est.feats = _unflatten_into(est.feats, flat, "feats.")
    est.pre = _unflatten_into(est.pre, flat, "pre.")
    est.lidar = _unflatten_into(est.lidar, flat, "lidar.")
    est.prior = factors.MargPrior(
        J=jnp.asarray(flat["prior.J"]), r0=jnp.asarray(flat["prior.r0"]),
        lin=_unflatten_into(est.window, flat, "prior.lin."),
        valid=jnp.asarray(flat["prior.valid"]))
    est.frame_count = int(flat["meta.frame_count"])
    est.initialized = bool(flat["meta.initialized"])
    return est


def save_global_fusion(fusion, path: str):
    save_pytree(path, dict(
        graph=fusion.graph, scdb=fusion.scdb,
        clouds=fusion.clouds, cloud_valid=fusion.cloud_valid,
        kf_q=np.asarray(fusion.kf_q_odom), kf_p=np.asarray(fusion.kf_p_odom),
        kf_ts=np.asarray(fusion.kf_ts),
        loops=np.asarray(fusion.loops_found, np.int64).reshape(-1, 2),
        last_q=np.asarray(fusion.last_q if fusion.last_q is not None else []),
        last_p=np.asarray(fusion.last_p if fusion.last_p is not None else []),
        n_kf=np.int64(fusion.n_kf)))


def load_global_fusion(fusion, path: str):
    flat = dict(np.load(path))
    fusion.graph = _unflatten_into(fusion.graph, flat, "graph.")
    fusion.scdb = _unflatten_into(fusion.scdb, flat, "scdb.")
    fusion.clouds = jnp.asarray(flat["clouds"])
    fusion.cloud_valid = jnp.asarray(flat["cloud_valid"])
    fusion.kf_q_odom = [q for q in flat["kf_q"]]
    fusion.kf_p_odom = [p for p in flat["kf_p"]]
    fusion.kf_ts = [float(t) for t in flat.get("kf_ts", [])]
    fusion.loops_found = [tuple(int(x) for x in row)
                          for row in flat.get("loops", np.zeros((0, 2)))]
    if flat.get("last_q") is not None and flat["last_q"].size:
        fusion.last_q = flat["last_q"]
        fusion.last_p = flat["last_p"]
    fusion.n_kf = int(flat["n_kf"])
    return fusion
