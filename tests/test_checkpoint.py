"""Checkpoint/resume round trips for estimator and global fusion."""
import numpy as np
import jax.numpy as jnp

from vil_fusion_tpu.models import ba, estimator as est_mod, global_fusion as gf
from vil_fusion_tpu.runtime import checkpoint


def test_estimator_checkpoint_roundtrip(tmp_path):
    est = est_mod.VILEstimator(est_mod.EstimatorConfig())
    est.set_initial_state(p=np.array([1.0, 2, 3]), q=np.array([1.0, 0, 0, 0]),
                          v=np.array([0.5, 0, 0]))
    est.frame_count = 4
    path = str(tmp_path / "est.npz")
    checkpoint.save_estimator(est, path)
    est2 = est_mod.VILEstimator(est_mod.EstimatorConfig())
    checkpoint.load_estimator(est2, path)
    assert est2.frame_count == 4
    assert est2.initialized
    np.testing.assert_allclose(est2.window.p[0], [1.0, 2, 3])
    np.testing.assert_allclose(np.asarray(est2.prior.J), np.asarray(est.prior.J))


def test_global_fusion_checkpoint_roundtrip(tmp_path):
    fusion = gf.GlobalFusion(gf.GlobalFusionConfig(node_capacity=64, loop_capacity=8,
                                                   cloud_capacity=128))
    rng = np.random.default_rng(0)
    for i in range(3):
        pts = rng.normal(size=(256, 3)).astype(np.float32) * 10
        fusion.add_frame(np.array([1.0, 0, 0, 0]), np.array([3.0 * i, 0, 0]),
                         pts, np.ones(256, bool))
    path = str(tmp_path / "gf.npz")
    checkpoint.save_global_fusion(fusion, path)
    f2 = gf.GlobalFusion(gf.GlobalFusionConfig(node_capacity=64, loop_capacity=8,
                                               cloud_capacity=128))
    checkpoint.load_global_fusion(f2, path)
    assert f2.n_kf == fusion.n_kf
    assert f2.kf_ts == fusion.kf_ts
    assert f2.loops_found == fusion.loops_found
    np.testing.assert_allclose(np.asarray(f2.last_p), np.asarray(fusion.last_p))
    np.testing.assert_allclose(np.asarray(f2.graph.p), np.asarray(fusion.graph.p))
    np.testing.assert_allclose(np.asarray(f2.scdb.desc), np.asarray(fusion.scdb.desc))
    # resumed instance keeps working (keyframe gate state restored: a frame
    # at the last saved pose is NOT a keyframe)
    pts = rng.normal(size=(256, 3)).astype(np.float32) * 10
    f2.add_frame(np.array([1.0, 0, 0, 0]), np.array([6.0, 0, 0]), pts, np.ones(256, bool))
    assert f2.n_kf == fusion.n_kf
    f2.add_frame(np.array([1.0, 0, 0, 0]), np.array([9.0, 0, 0]), pts, np.ones(256, bool))
    assert f2.n_kf == fusion.n_kf + 1
