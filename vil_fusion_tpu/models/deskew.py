"""Point-cloud deskew (spinning-LiDAR motion compensation).

The reference registers raw scans without undistortion (EstimationMapping
consumes featureExtraction output directly); at 10 Hz spin and vehicle speeds
the intra-scan motion is tens of centimeters. Here: per-point scan time from
azimuth, constant-velocity motion model from the previous frame's relative
pose, se(3)-interpolated correction to the scan-END frame — one fused vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from vil_fusion_tpu.ops import lie


@jax.jit
def deskew_points(points: jnp.ndarray, valid: jnp.ndarray,
                  q_rel: jnp.ndarray, p_rel: jnp.ndarray):
    """Deskew a body-frame scan to its end-of-scan frame.

    Args:
      points: (N, 3) raw points, azimuth encodes capture time (scan sweeps
        azimuth -pi -> pi over the frame period).
      q_rel, p_rel: sensor motion over the scan period (T_{start -> end},
        e.g. the previous frame's relative pose under constant velocity).

    Returns deskewed points (N, 3): p_end = T(s -> 1) p where
    T(s -> 1) = exp((s - 1) * log(T_rel))^{-1} ... equivalently
    exp((1 - s) * xi) applied to the point, xi = log(T_rel) expressed in the
    end frame: a point captured at fraction s needs the remaining motion
    (1 - s) applied inversely.
    """
    az = jnp.arctan2(points[:, 1], points[:, 0])
    s = (az + jnp.pi) / (2.0 * jnp.pi)  # capture-time fraction in [0, 1)
    xi = lie.se3_log(q_rel, p_rel)  # (6,)
    # T_{t -> end} = T_rel(s..1) inverse of the remaining motion:
    # sensor at time s sees point P_s; in end frame: P_end = T_{end<-s} P_s
    # with T_{end<-s} = exp((s - 1) xi)  (moving sensor: end pose relative
    # to time-s pose is exp((1-s) xi); points transform by its inverse)
    frac = (s - 1.0)[:, None]
    q_c, p_c = lie.se3_exp(frac * xi[None, :])
    out = lie.qrot(q_c, points) + p_c
    return jnp.where(valid[:, None], out, points)
