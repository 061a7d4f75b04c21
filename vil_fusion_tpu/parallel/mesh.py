"""Device-mesh helpers for multi-chip scaling.

The reference scales by running 5 ROS processes on one machine (SURVEY.md
§2.3); the TPU-native design scales by sharding the data-parallel axes of the
SLAM workload over a `jax.sharding.Mesh`:

  * landmark/factor blocks of the BA Hessian  -> psum reduction (sharded_ba)
  * LiDAR map points for kNN                  -> per-shard top-k + merge
  * ScanContext database rows                 -> sharded distance matrix
  * keyframe ranges of the global pose graph  -> sharded residual/matvec
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shard"  # single data axis: factors / map points / database rows


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (AXIS,))


def shard_rows(mesh: Mesh):
    return NamedSharding(mesh, P(AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
