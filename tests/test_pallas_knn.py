"""Pallas kNN kernel correctness (interpret mode on CPU; compiled on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from vil_fusion_tpu.ops import knn as knn_xla
from vil_fusion_tpu.ops.pallas.knn_pallas import knn_pallas


def test_pallas_knn_matches_xla():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-20, 20, (300, 3)), jnp.float32)
    db = jnp.asarray(rng.uniform(-20, 20, (3000, 3)), jnp.float32)
    valid = jnp.asarray(rng.random(3000) > 0.1)
    d_ref, i_ref = knn_xla.knn(q, db, valid, k=5)
    d_pl, i_pl = knn_pallas(q, db, valid, k=5, q_tile=128, db_tile=512,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-3)
    # indices resolve to the same distances
    got = ((np.asarray(q)[:, None, :] - np.asarray(db)[np.asarray(i_pl)]) ** 2).sum(-1)
    ref = np.where(np.isfinite(d_ref), d_ref, 0.0)
    got = np.where(np.isfinite(np.asarray(d_pl)), got, 0.0)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


def test_pallas_knn_few_valid():
    q = jnp.zeros((8, 3), jnp.float32)
    db = jnp.ones((600, 3), jnp.float32)
    valid = jnp.zeros(600, bool).at[5].set(True).at[17].set(True)
    d, i = knn_pallas(q, db, valid, k=4, q_tile=8, db_tile=256, interpret=True)
    finite = np.isfinite(np.asarray(d))
    assert (finite.sum(1) == 2).all()
    assert set(np.asarray(i)[0, :2].tolist()) == {5, 17}
