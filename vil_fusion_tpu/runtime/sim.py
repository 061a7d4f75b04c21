"""Synthetic multi-sensor trajectory simulator (ground-truth oracle for tests).

The reference validates only by rosbag replay (README.md:40-48); it ships zero
automated tests. This module replaces dataset replay for CI: an analytic
smooth trajectory generates exact IMU samples (body rates + specific force),
camera feature tracks with known depth, and LiDAR scans of a synthetic world,
all with known ground truth — so every estimator stage can be golden-tested.

Host-side numpy (float64) on purpose: this is test scaffolding, not the
compute path.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

GRAVITY = np.array([0.0, 0.0, 9.81])


def _ypr_to_R(y, p, r):
    cy, sy = np.cos(y), np.sin(y)
    cp, sp = np.cos(p), np.sin(p)
    cr, sr = np.cos(r), np.sin(r)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return Rz @ Ry @ Rx


def R_to_q(R):
    """Rotation matrix -> (w, x, y, z), w >= 0."""
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        q = np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    elif R[0, 0] >= R[1, 1] and R[0, 0] >= R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        q = np.array([(R[2, 1] - R[1, 2]) / s, 0.25 * s, (R[0, 1] + R[1, 0]) / s, (R[0, 2] + R[2, 0]) / s])
    elif R[1, 1] >= R[2, 2]:
        s = np.sqrt(1.0 - R[0, 0] + R[1, 1] - R[2, 2]) * 2
        q = np.array([(R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s, 0.25 * s, (R[1, 2] + R[2, 1]) / s])
    else:
        s = np.sqrt(1.0 - R[0, 0] - R[1, 1] + R[2, 2]) * 2
        q = np.array([(R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s, (R[1, 2] + R[2, 1]) / s, 0.25 * s])
    q /= np.linalg.norm(q)
    return q if q[0] >= 0 else -q


@dataclass
class TrajectoryConfig:
    """Smooth sinusoidal trajectory: forward motion + lateral/vertical sway + yaw."""

    speed: float = 2.0  # m/s forward
    sway_amp: float = 1.0
    sway_freq: float = 0.25  # Hz
    bob_amp: float = 0.3
    bob_freq: float = 0.4
    yaw_amp: float = 0.4  # rad
    yaw_freq: float = 0.1
    pitch_amp: float = 0.08
    pitch_freq: float = 0.3
    roll_amp: float = 0.06
    roll_freq: float = 0.35


class Trajectory:
    """Analytic SE(3) trajectory; derivatives by high-order central differences."""

    def __init__(self, cfg: TrajectoryConfig = TrajectoryConfig()):
        self.cfg = cfg

    def position(self, t):
        c = self.cfg
        t = np.asarray(t, dtype=np.float64)
        x = c.speed * t
        y = c.sway_amp * np.sin(2 * np.pi * c.sway_freq * t)
        z = c.bob_amp * np.sin(2 * np.pi * c.bob_freq * t)
        return np.stack([x, y, z], axis=-1)

    def rotation(self, t):
        c = self.cfg
        y = c.yaw_amp * np.sin(2 * np.pi * c.yaw_freq * t)
        p = c.pitch_amp * np.sin(2 * np.pi * c.pitch_freq * t)
        r = c.roll_amp * np.sin(2 * np.pi * c.roll_freq * t)
        return _ypr_to_R(y, p, r)

    def velocity(self, t, h=1e-5):
        return (self.position(t + h) - self.position(t - h)) / (2 * h)

    def acceleration(self, t, h=1e-4):
        return (self.position(t + h) - 2 * self.position(t) + self.position(t - h)) / (h * h)

    def angular_velocity_body(self, t, h=1e-5):
        """omega such that Rdot = R * skew(omega)."""
        R0 = self.rotation(t - h)
        R1 = self.rotation(t + h)
        Rdot = (R1 - R0) / (2 * h)
        W = self.rotation(t).T @ Rdot
        W = 0.5 * (W - W.T)
        return np.array([W[2, 1], W[0, 2], W[1, 0]])

    def imu_sample(self, t):
        """(acc_body, gyr_body): specific force f = R^T (a_world + G)."""
        R = self.rotation(t)
        acc = R.T @ (self.acceleration(t) + GRAVITY)
        gyr = self.angular_velocity_body(t)
        return acc, gyr

    def pose(self, t):
        """(q wxyz, p) at time t."""
        return R_to_q(self.rotation(t)), self.position(t)


def simulate_imu(traj: Trajectory, t0: float, t1: float, rate: float = 200.0,
                 noise=None, bias_a=None, bias_g=None, seed: int = 0):
    """Sample IMU between t0 and t1 at `rate` Hz (inclusive endpoints).

    Returns (ts, acc (N,3), gyr (N,3)); optionally adds white noise and
    constant biases (ImuNoise-style densities scaled by sqrt(rate)).
    """
    n = int(round((t1 - t0) * rate))
    ts = t0 + np.arange(n + 1) / rate
    acc = np.zeros((n + 1, 3))
    gyr = np.zeros((n + 1, 3))
    for i, t in enumerate(ts):
        acc[i], gyr[i] = traj.imu_sample(t)
    if bias_a is not None:
        acc += bias_a
    if bias_g is not None:
        gyr += bias_g
    if noise is not None:
        rng = np.random.default_rng(seed)
        acc += rng.normal(0, noise.acc_n * np.sqrt(rate), acc.shape)
        gyr += rng.normal(0, noise.gyr_n * np.sqrt(rate), gyr.shape)
    return ts, acc, gyr


@dataclass
class LandmarkWorld:
    """Random 3D landmarks in a corridor around the trajectory, for camera sim."""

    n: int = 500
    x_range: tuple = (-5.0, 120.0)
    y_range: tuple = (-12.0, 12.0)
    z_range: tuple = (-4.0, 8.0)
    seed: int = 0
    points: np.ndarray = field(init=False)

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        self.points = np.stack(
            [
                rng.uniform(*self.x_range, self.n),
                rng.uniform(*self.y_range, self.n),
                rng.uniform(*self.z_range, self.n),
            ],
            axis=-1,
        )


def project_landmarks(world: LandmarkWorld, R_wb, p_wb, R_bc=np.eye(3), p_bc=np.zeros(3),
                      fov_deg: float = 90.0, min_depth: float = 0.5, max_depth: float = 80.0):
    """Project landmarks into a normalized-plane camera at body pose (R_wb, p_wb).

    Returns (ids, xy_normalized (M,2), depth (M,)). Camera frame: z forward.
    """
    R_wc = R_wb @ R_bc
    p_wc = R_wb @ p_bc + p_wb
    pc = (world.points - p_wc) @ R_wc  # (N, 3) in camera frame
    z = pc[:, 2]
    half_tan = np.tan(np.deg2rad(fov_deg) / 2)
    valid = (z > min_depth) & (z < max_depth)
    xy = pc[:, :2] / np.where(valid, z, 1.0)[:, None]
    valid &= (np.abs(xy[:, 0]) < half_tan) & (np.abs(xy[:, 1]) < half_tan)
    ids = np.nonzero(valid)[0]
    return ids, xy[valid], z[valid]


def make_structured_scene(seed: int = 0):
    """Planes + poles world for LiDAR simulation: returns a callable
    raycast-free point sampler: sample_points(n) -> (n, 3) world points lying
    on walls/ground/pillars (gives real planar/edge structure for feature
    extraction and scan matching tests)."""
    rng = np.random.default_rng(seed)

    def sample_points(n):
        kinds = rng.integers(0, 4, n)
        pts = np.zeros((n, 3))
        # ground plane z = 0
        m = kinds == 0
        pts[m] = np.stack([rng.uniform(-10, 120, m.sum()), rng.uniform(-15, 15, m.sum()),
                           np.zeros(m.sum())], axis=-1)
        # left wall y = 12
        m = kinds == 1
        pts[m] = np.stack([rng.uniform(-10, 120, m.sum()), np.full(m.sum(), 12.0),
                           rng.uniform(0, 6, m.sum())], axis=-1)
        # right wall y = -12
        m = kinds == 2
        pts[m] = np.stack([rng.uniform(-10, 120, m.sum()), np.full(m.sum(), -12.0),
                           rng.uniform(0, 6, m.sum())], axis=-1)
        # pillars (vertical edges)
        m = kinds == 3
        k = m.sum()
        centers = np.stack([rng.integers(0, 12, k) * 10.0, rng.choice([-8.0, 8.0], k)], axis=-1)
        ang = rng.uniform(0, 2 * np.pi, k)
        pts[m] = np.stack([centers[:, 0] + 0.15 * np.cos(ang), centers[:, 1] + 0.15 * np.sin(ang),
                           rng.uniform(0, 5, k)], axis=-1)
        return pts

    return sample_points


def simulate_lidar_scan(sample_points, R_wb, p_wb, n_points: int = 8192,
                        max_range: float = 60.0, seed: int = 0):
    """Body-frame LiDAR scan of the structured scene at the given pose."""
    pts_w = sample_points(n_points)
    pts_b = (pts_w - p_wb) @ R_wb
    rng_ok = np.linalg.norm(pts_b, axis=-1) < max_range
    return pts_b[rng_ok]
