"""IMU preintegration tests: golden checks vs the analytic simulator.

Replaces the reference's disabled finite-difference checker
(integration_base.h:279-445) with real CI tests.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vil_fusion_tpu.models import imu
from vil_fusion_tpu.ops import lie
from vil_fusion_tpu.runtime import sim

F64 = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32


def _segment(t0=1.0, t1=1.5, rate=200.0, **kw):
    traj = sim.Trajectory()
    ts, acc, gyr = sim.simulate_imu(traj, t0, t1, rate, **kw)
    dt = np.diff(ts)
    return traj, ts, acc, gyr, dt


def test_preintegration_residual_zero_at_truth():
    traj, ts, acc, gyr, dt = _segment()
    pre = imu.preintegrate(
        jnp.asarray(acc, jnp.float32), jnp.asarray(gyr, jnp.float32),
        jnp.asarray(dt, jnp.float32), jnp.zeros(3), jnp.zeros(3),
    )
    q_i, p_i = traj.pose(ts[0])
    q_j, p_j = traj.pose(ts[-1])
    v_i = traj.velocity(ts[0])
    v_j = traj.velocity(ts[-1])
    r = imu.residual(
        pre,
        jnp.asarray(p_i, jnp.float32), jnp.asarray(q_i, jnp.float32),
        jnp.asarray(v_i, jnp.float32), jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(p_j, jnp.float32), jnp.asarray(q_j, jnp.float32),
        jnp.asarray(v_j, jnp.float32), jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(sim.GRAVITY, jnp.float32),
    )
    # midpoint integration at 200 Hz over 0.5 s: sub-mm / sub-milliradian error
    assert float(jnp.max(jnp.abs(r[:3]))) < 2e-3, r[:3]
    assert float(jnp.max(jnp.abs(r[3:6]))) < 2e-4, r[3:6]
    assert float(jnp.max(jnp.abs(r[6:9]))) < 2e-3, r[6:9]


def test_zero_dt_padding_is_identity():
    traj, ts, acc, gyr, dt = _segment()
    pre = imu.preintegrate(
        jnp.asarray(acc, jnp.float32), jnp.asarray(gyr, jnp.float32),
        jnp.asarray(dt, jnp.float32), jnp.zeros(3), jnp.zeros(3),
    )
    # pad with 16 zero-dt steps: result must be bit-identical semantics
    acc_p = np.concatenate([acc, np.repeat(acc[-1:], 16, 0)])
    gyr_p = np.concatenate([gyr, np.repeat(gyr[-1:], 16, 0)])
    dt_p = np.concatenate([dt, np.zeros(16)])
    pre_p = imu.preintegrate(
        jnp.asarray(acc_p, jnp.float32), jnp.asarray(gyr_p, jnp.float32),
        jnp.asarray(dt_p, jnp.float32), jnp.zeros(3), jnp.zeros(3),
    )
    np.testing.assert_allclose(pre_p.dp, pre.dp, atol=1e-6)
    np.testing.assert_allclose(pre_p.dq, pre.dq, atol=1e-7)
    np.testing.assert_allclose(pre_p.dv, pre.dv, atol=1e-6)
    np.testing.assert_allclose(pre_p.cov, pre.cov, atol=1e-9)


def test_bias_jacobian_vs_repropagation():
    """First-order bias correction must match re-integration with shifted bias
    (validates the 15x15 jacobian blocks used by the BA factor)."""
    traj, ts, acc, gyr, dt = _segment()
    accj = jnp.asarray(acc, jnp.float32)
    gyrj = jnp.asarray(gyr, jnp.float32)
    dtj = jnp.asarray(dt, jnp.float32)
    pre = imu.preintegrate(accj, gyrj, dtj, jnp.zeros(3), jnp.zeros(3))
    dba = jnp.asarray([2e-3, -1e-3, 1.5e-3], jnp.float32)
    dbg = jnp.asarray([1e-3, 5e-4, -8e-4], jnp.float32)
    dp_c, dq_c, dv_c = imu.bias_corrected_delta(pre, dba, dbg)
    pre2 = imu.preintegrate(accj, gyrj, dtj, dba, dbg)
    np.testing.assert_allclose(dp_c, pre2.dp, atol=5e-4)
    np.testing.assert_allclose(dv_c, pre2.dv, atol=5e-4)
    ang_err = lie.so3_log(lie.qmul(lie.qconj(dq_c), pre2.dq))
    assert float(jnp.max(jnp.abs(ang_err))) < 5e-4


def test_covariance_psd_and_growth():
    traj, ts, acc, gyr, dt = _segment(noise=imu.ImuNoise(), seed=1)
    pre = imu.preintegrate(
        jnp.asarray(acc, jnp.float32), jnp.asarray(gyr, jnp.float32),
        jnp.asarray(dt, jnp.float32), jnp.zeros(3), jnp.zeros(3),
    )
    cov = np.asarray(pre.cov, dtype=np.float64)
    cov = 0.5 * (cov + cov.T)
    eig = np.linalg.eigvalsh(cov)
    assert eig.min() > -1e-10
    assert eig.max() > 0
    # sqrt information finite
    sqrt_info = imu.sqrt_information(pre)
    assert np.all(np.isfinite(np.asarray(sqrt_info)))


def test_propagate_state_tracks_truth():
    traj, ts, acc, gyr, dt = _segment(t0=0.0, t1=1.0)
    q, p = traj.pose(ts[0])
    v = traj.velocity(ts[0])
    p = jnp.asarray(p, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    g = jnp.asarray(sim.GRAVITY, jnp.float32)
    for i in range(len(dt)):
        p, q, v = imu.propagate_state(
            p, q, v, jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(acc[i], jnp.float32), jnp.asarray(gyr[i], jnp.float32),
            jnp.asarray(acc[i + 1], jnp.float32), jnp.asarray(gyr[i + 1], jnp.float32),
            jnp.float32(dt[i]), g,
        )
    q_t, p_t = traj.pose(ts[-1])
    assert np.linalg.norm(np.asarray(p) - p_t) < 0.05
    ang = lie.so3_log(lie.qmul(lie.qconj(q), jnp.asarray(q_t, jnp.float32)))
    assert float(jnp.linalg.norm(ang)) < 0.01


def test_preintegrate_jit_compiles_once():
    traj, ts, acc, gyr, dt = _segment()
    f = jax.jit(imu.preintegrate, static_argnames=("noise",))
    out = f(jnp.asarray(acc, jnp.float32), jnp.asarray(gyr, jnp.float32),
            jnp.asarray(dt, jnp.float32), jnp.zeros(3), jnp.zeros(3))
    assert out.dp.shape == (3,)


def test_parallel_preintegration_matches_sequential():
    """The log-depth associative-scan preintegration must reproduce the
    sequential lax.scan reference to f32 rounding — deltas, 15x15 bias
    jacobian, AND covariance — including dt==0 padding steps."""
    rng = np.random.default_rng(7)
    n = 64  # imu_cap-shaped segment: 63 steps, last 20 padded with dt=0
    acc = rng.normal([0.2, -0.1, 9.81], 0.4, (n, 3)).astype(np.float32)
    gyr = rng.normal([0.02, 0.3, -0.1], 0.1, (n, 3)).astype(np.float32)
    dt = np.full((n - 1,), 0.005, np.float32)
    dt[-20:] = 0.0
    ba = np.array([0.05, -0.02, 0.01], np.float32)
    bg = np.array([0.002, 0.001, -0.003], np.float32)
    noise = imu.ImuNoise()

    seq = imu.preintegrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dt),
                           jnp.asarray(ba), jnp.asarray(bg), noise,
                           parallel=False)
    par = imu.preintegrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dt),
                           jnp.asarray(ba), jnp.asarray(bg), noise,
                           parallel=True)
    np.testing.assert_allclose(np.asarray(par.dp), np.asarray(seq.dp),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(par.dq), np.asarray(seq.dq),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(par.dv), np.asarray(seq.dv),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(par.jac), np.asarray(seq.jac),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(par.cov), np.asarray(seq.cov),
                               rtol=1e-4, atol=1e-8)
    assert float(par.dt_sum) == float(seq.dt_sum)
