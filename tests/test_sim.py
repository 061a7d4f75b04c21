"""Parity of the device-vectorized raycast (sim.JaxRaycast) with the numpy
reference path.

JaxRaycast exists because the numpy primitive loop is ~26 s/frame on the
KITTI-scale acceptance scene (~300 primitives) — it is what makes
tools/run_synthetic.py runnable at full scale. These tests pin that the fast
path is the SAME sensor model: identical hit/miss decisions and ranges up to
f32 rounding, and uint8 images that agree within +-1 grey level on >99.5% of
pixels after the replay producers' quantization (the residual pixels are
hit/miss flips at primitive silhouettes, where f32 rounding moves a ray
across an edge).
"""
import numpy as np
import pytest

from vil_fusion_tpu.runtime import sim


def _rays(scene_center, n, seed):
    rng = np.random.default_rng(seed)
    p = np.array([scene_center[0], scene_center[1], 1.4])
    d = rng.normal(size=(n, 3))
    d[:, 2] *= 0.3  # mostly horizontal, like real sensors
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(p, d.shape).copy()
    return o, d


@pytest.mark.parametrize("scene_fn,center", [
    (lambda: sim.RaycastScene(), (30.0, 0.0)),
    (lambda: sim.urban_block_scene(20.0, pillar_step_deg=10.0,
                                   box_step_deg=15.0), (0.0, 2.0)),
])
def test_jax_raycast_parity(scene_fn, center):
    scene = scene_fn()
    jrc = sim.JaxRaycast(scene, chunk=512)
    o, d = _rays(center, 2048, seed=3)
    t_np = scene.raycast(o, d, max_range=80.0)
    t_jx = jrc.raycast(o, d, max_range=80.0)
    hit_np, hit_jx = np.isfinite(t_np), np.isfinite(t_jx)
    # grazing pillar edges may flip under f32; everywhere else must agree
    assert (hit_np == hit_jx).mean() > 0.995
    both = hit_np & hit_jx
    assert both.sum() > 500
    assert np.abs(t_np[both] - t_jx[both]).max() < 1e-3


def test_jax_scan_and_image_match_numpy_path():
    scene = sim.urban_block_scene(20.0, pillar_step_deg=10.0,
                                  box_step_deg=15.0)
    jrc = sim.JaxRaycast(scene, chunk=1024)
    R = sim._ypr_to_R(0.4, 0.02, -0.01)
    p = np.array([2.0, 3.0, 1.5])

    pts_np, val_np = sim.simulate_lidar_scan(
        scene, R, p, n_scan=16, width=300, fov_up_deg=2.0,
        fov_down_deg=-24.8, max_range=60.0)
    pts_jx, val_jx = sim.simulate_lidar_scan(
        jrc, R, p, n_scan=16, width=300, fov_up_deg=2.0,
        fov_down_deg=-24.8, max_range=60.0)
    assert (val_np == val_jx).mean() > 0.995
    both = val_np & val_jx
    assert np.abs(pts_np[both] - pts_jx[both]).max() < 2e-3

    img_np = sim.render_camera_image(scene, R, p, 120.0, 120.0, 80.0, 60.0,
                                     120, 160)
    img_jx = sim.render_camera_image(jrc, R, p, 120.0, 120.0, 80.0, 60.0,
                                     120, 160)
    # the device path quantizes to uint8 on device; after the replay
    # producers' own *255 quantization the two must agree except at
    # hit/miss-flip pixels (bounded, grazing geometry only)
    u_np = np.clip(img_np * 255.0 + 0.5, 0, 255).astype(np.uint8)
    u_jx = np.clip(img_jx * 255.0 + 0.5, 0, 255).astype(np.uint8)
    close = np.abs(u_np.astype(int) - u_jx.astype(int)) <= 1
    assert close.mean() > 0.995
