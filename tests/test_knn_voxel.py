"""Tests for ops.knn (tiled brute force) and ops.voxel (fixed-capacity grid)."""
import jax.numpy as jnp
import numpy as np

from vil_fusion_tpu.ops import knn as knn_ops
from vil_fusion_tpu.ops import voxel as voxel_ops


def test_knn_matches_numpy_bruteforce():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(100, 3)).astype(np.float32)
    db = rng.normal(size=(500, 3)).astype(np.float32)
    valid = np.ones(500, bool)
    valid[::7] = False
    d2, idx = knn_ops.knn(jnp.asarray(q), jnp.asarray(db), jnp.asarray(valid), k=5, tile=128)
    full = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    full[:, ~valid] = np.inf
    ref_idx = np.argsort(full, axis=1)[:, :5]
    ref_d2 = np.take_along_axis(full, ref_idx, axis=1)
    np.testing.assert_allclose(np.sort(d2, axis=1), np.sort(ref_d2, axis=1), rtol=1e-4, atol=1e-5)
    # indices must refer to points at matching distances
    got = ((q[:, None, :] - db[np.asarray(idx)]) ** 2).sum(-1)
    np.testing.assert_allclose(np.sort(got, 1), np.sort(ref_d2, 1), rtol=1e-4, atol=1e-5)


def test_knn_fewer_valid_than_k():
    q = jnp.zeros((4, 3))
    db = jnp.ones((64, 3))
    valid = jnp.zeros(64, bool).at[3].set(True).at[10].set(True)
    d2, idx = knn_ops.knn(q, db, valid, k=5, tile=32)
    finite = np.isfinite(np.asarray(d2))
    assert finite.sum(axis=1).tolist() == [2, 2, 2, 2]
    assert set(np.asarray(idx)[0, :2].tolist()) == {3, 10}


def test_compact():
    pts = jnp.arange(24, dtype=jnp.float32).reshape(8, 3)
    valid = jnp.asarray([True, False, True, False, False, True, True, False])
    out, ov = voxel_ops.compact(pts, valid, 4)
    assert ov.tolist() == [True] * 4
    np.testing.assert_allclose(out, np.asarray(pts)[[0, 2, 5, 6]])
    # capacity larger than valid count
    out2, ov2 = voxel_ops.compact(pts, valid, 6)
    assert ov2.tolist() == [True] * 4 + [False] * 2


def test_voxel_downsample_centroids():
    pts = np.array(
        [[0.1, 0.1, 0.1], [0.3, 0.3, 0.3],  # voxel (0,0,0) at res 0.5
         [1.1, 0.1, 0.1], [1.3, 0.1, 0.1],  # voxel (2,0,0)
         [5.0, 5.0, 5.0]],  # own voxel
        dtype=np.float32,
    )
    valid = np.ones(5, bool)
    out, ov = voxel_ops.voxel_downsample(
        jnp.asarray(pts), jnp.asarray(valid), 0.5, jnp.zeros(3), capacity=8)
    got = sorted(np.asarray(out)[np.asarray(ov)].tolist())
    want = sorted([[0.2, 0.2, 0.2], [1.2, 0.1, 0.1], [5.0, 5.0, 5.0]])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_voxel_downsample_capacity_overflow():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 50, size=(512, 3)).astype(np.float32)
    out, ov = voxel_ops.voxel_downsample(
        jnp.asarray(pts), jnp.ones(512, bool), 0.1, jnp.zeros(3), capacity=64)
    assert int(np.asarray(ov).sum()) == 64  # filled to capacity, no crash


def test_crop_box():
    pts = jnp.asarray([[0, 0, 0], [10, 0, 0], [0, 3, 0], [-6, 0, 0]], dtype=jnp.float32)
    out, ov = voxel_ops.crop_box(pts, jnp.ones(4, bool), jnp.zeros(3), 5.0, 4)
    assert int(ov.sum()) == 2
    np.testing.assert_allclose(out[:2], [[0, 0, 0], [0, 3, 0]])


def test_voxel_downsample_hash_spacing():
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 20, size=(4000, 3)).astype(np.float32)
    out, ov = voxel_ops.voxel_downsample_hash(
        jnp.asarray(pts), jnp.ones(4000, bool), 0.5, jnp.zeros(3), capacity=8192)
    kept = np.asarray(out)[np.asarray(ov)]
    assert len(kept) > 500  # most voxels survive at 2x headroom
    # at most one representative per voxel
    keys = np.floor(kept / 0.5).astype(int)
    lin = (keys[:, 0] * 1024 + keys[:, 1]) * 1024 + keys[:, 2]
    assert len(np.unique(lin)) == len(lin)
