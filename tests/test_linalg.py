"""Closed-form 3x3 eigendecomposition vs jnp.linalg.eigh."""
import jax.numpy as jnp
import numpy as np

from vil_fusion_tpu.ops.linalg import sym3x3_eigvalsh, sym3x3_principal


def test_sym3x3_matches_eigh():
    rng = np.random.default_rng(0)
    B = rng.normal(size=(500, 3, 3)).astype(np.float32)
    A = jnp.asarray(B @ np.swapaxes(B, 1, 2))  # SPD-ish
    lam_ref = np.linalg.eigvalsh(np.asarray(A))
    lam, v = sym3x3_principal(A)
    np.testing.assert_allclose(np.asarray(lam), lam_ref, rtol=2e-4, atol=2e-4)
    # principal eigenvector: A v = lam_max v
    Av = np.einsum("nij,nj->ni", np.asarray(A), np.asarray(v))
    lv = lam_ref[:, 2:3] * np.asarray(v)
    resid = np.linalg.norm(Av - lv, axis=-1) / np.maximum(lam_ref[:, 2], 1e-6)
    assert np.percentile(resid, 99) < 1e-2


def test_sym3x3_degenerate():
    # isotropic and rank-1 cases stay finite
    A = jnp.stack([jnp.eye(3), jnp.zeros((3, 3)),
                   jnp.asarray(np.outer([1., 2, 3], [1., 2, 3]), jnp.float32)])
    lam, v = sym3x3_principal(A)
    assert np.all(np.isfinite(np.asarray(lam)))
    assert np.all(np.isfinite(np.asarray(v)))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1), 1.0, atol=1e-5)


def test_solve_spd_unrolled_matches_library():
    from vil_fusion_tpu.ops.linalg import solve_spd_unrolled

    rng = np.random.default_rng(7)
    for n in (3, 6, 9):
        # batched SPD systems with realistic GN conditioning
        J = rng.normal(size=(64, 2 * n, n)).astype(np.float32)
        A = np.einsum("bki,bkj->bij", J, J) + 1e-3 * np.eye(n, dtype=np.float32)
        b = rng.normal(size=(64, n)).astype(np.float32)
        x = np.asarray(solve_spd_unrolled(jnp.asarray(A), jnp.asarray(b)))
        x_ref = np.linalg.solve(A.astype(np.float64),
                                b.astype(np.float64)[..., None])[..., 0]
        np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=2e-3)
    # single (unbatched) system
    A1 = A[0]
    x1 = np.asarray(solve_spd_unrolled(jnp.asarray(A1), jnp.asarray(b[0])))
    np.testing.assert_allclose(x1, x_ref[0], rtol=2e-3, atol=2e-3)
