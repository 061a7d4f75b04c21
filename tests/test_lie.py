"""Unit tests for vil_fusion_tpu.ops.lie (reference parity: utility.h math)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vil_fusion_tpu.ops import lie


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(np.where(q[:, :1] < 0, -q, q), dtype=jnp.float32)


def test_qmul_vs_matrix():
    q1, q2 = random_quats(16, 1), random_quats(16, 2)
    R = lie.q2R(lie.qmul(q1, q2))
    np.testing.assert_allclose(R, lie.q2R(q1) @ lie.q2R(q2), atol=1e-5)


def test_qrot_matches_matrix():
    q = random_quats(32)
    v = jnp.asarray(np.random.default_rng(3).normal(size=(32, 3)), dtype=jnp.float32)
    np.testing.assert_allclose(
        lie.qrot(q, v), jnp.einsum("nij,nj->ni", lie.q2R(q), v), atol=1e-5
    )


def test_R2q_roundtrip():
    q = random_quats(64)
    q_back = lie.R2q(lie.q2R(q))
    np.testing.assert_allclose(q_back, q, atol=1e-5)


def test_R2q_degenerate_cases():
    # 180-degree rotations about each axis hit each Shepperd branch
    for axis in range(3):
        theta = np.zeros(3)
        theta[axis] = np.pi
        q = lie.so3_exp(jnp.asarray(theta, dtype=jnp.float32))
        R = lie.q2R(q)
        np.testing.assert_allclose(lie.q2R(lie.R2q(R)), R, atol=1e-5)


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(4)
    theta = jnp.asarray(rng.uniform(-2, 2, size=(32, 3)), dtype=jnp.float32)
    np.testing.assert_allclose(lie.so3_log(lie.so3_exp(theta)), theta, atol=1e-4)


def test_so3_exp_small_angle():
    theta = jnp.asarray([[1e-9, -1e-9, 1e-10], [0, 0, 0]], dtype=jnp.float32)
    q = lie.so3_exp(theta)
    assert np.all(np.isfinite(q))
    np.testing.assert_allclose(q[:, 0], 1.0, atol=1e-6)


def test_qleft_qright():
    q, r = random_quats(8, 5), random_quats(8, 6)
    np.testing.assert_allclose(
        jnp.einsum("nij,nj->ni", lie.Qleft(q), r), lie.qmul(q, r), atol=1e-5
    )
    np.testing.assert_allclose(
        jnp.einsum("nij,nj->ni", lie.Qright(q), r), lie.qmul(r, q), atol=1e-5
    )


def test_ypr_roundtrip():
    ypr = jnp.asarray([[30.0, 10.0, -20.0], [-80.0, 5.0, 3.0]], dtype=jnp.float32)
    np.testing.assert_allclose(lie.R2ypr(lie.ypr2R(ypr)), ypr, atol=1e-3)


def test_g2R_aligns_gravity_zero_yaw():
    g = jnp.asarray([0.3, -0.2, 9.7], dtype=jnp.float32)
    R0 = lie.g2R(g)
    aligned = R0 @ (g / jnp.linalg.norm(g))
    np.testing.assert_allclose(aligned, [0.0, 0.0, 1.0], atol=1e-5)
    assert abs(float(lie.R2ypr(R0)[0])) < 1e-3


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(7)
    xi = jnp.asarray(rng.uniform(-1, 1, size=(16, 6)), dtype=jnp.float32)
    q, p = lie.se3_exp(xi)
    np.testing.assert_allclose(lie.se3_log(q, p), xi, atol=1e-4)


def test_pose_algebra():
    q1, q2 = random_quats(8, 8), random_quats(8, 9)
    rng = np.random.default_rng(10)
    p1 = jnp.asarray(rng.normal(size=(8, 3)), dtype=jnp.float32)
    p2 = jnp.asarray(rng.normal(size=(8, 3)), dtype=jnp.float32)
    a, b = (q1, p1), (q2, p2)
    ab = lie.pose_compose(a, b)
    b_back = lie.pose_compose(lie.pose_inverse(a), ab)
    np.testing.assert_allclose(lie.positify(b_back[0]), lie.positify(q2), atol=1e-5)
    np.testing.assert_allclose(b_back[1], p2, atol=1e-5)
    # between
    rel = lie.pose_between(a, ab)
    np.testing.assert_allclose(lie.positify(rel[0]), lie.positify(q2), atol=1e-5)

    x = jnp.asarray(rng.normal(size=(8, 3)), dtype=jnp.float32)
    np.testing.assert_allclose(
        lie.pose_apply(ab, x), lie.pose_apply(a, lie.pose_apply(b, x)), atol=1e-4
    )


def test_retract_local_roundtrip():
    q = random_quats(8, 11)
    p = jnp.asarray(np.random.default_rng(12).normal(size=(8, 3)), dtype=jnp.float32)
    delta = jnp.asarray(np.random.default_rng(13).uniform(-0.3, 0.3, (8, 6)), dtype=jnp.float32)
    pose2 = lie.pose_retract((q, p), delta)
    np.testing.assert_allclose(lie.pose_local((q, p), pose2), delta, atol=1e-4)


def test_left_jacobian_identity():
    """J_l(theta) satisfies exp(theta) ~ I + skew(J_l theta) for small and
    d/dt exp((t+dt)theta)| relation; check against numerical derivative."""
    theta = jnp.asarray([0.3, -0.5, 0.7], dtype=jnp.float32)
    Jl = lie.so3_left_jacobian(theta)
    Jl_inv = lie.so3_left_jacobian_inv(theta)
    np.testing.assert_allclose(Jl @ Jl_inv, np.eye(3), atol=1e-5)
    # exp((theta + J_l^{-1} eps)) ≈ exp(eps_world) * exp(theta) for small eps
    eps = jnp.asarray([1e-3, -2e-3, 1.5e-3], dtype=jnp.float32)
    lhs = lie.so3_exp_matrix(theta + jnp.linalg.solve(Jl, eps))
    rhs = lie.so3_exp_matrix(eps) @ lie.so3_exp_matrix(theta)
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_jit_and_vmap_compatible():
    q = random_quats(4)
    f = jax.jit(jax.vmap(lambda qq: lie.so3_log(qq)))
    out = f(q)
    assert out.shape == (4, 3)
