"""Image operations for the visual front end (pure jnp/lax, TPU-friendly).

Replaces the OpenCV primitives the reference's tracker uses
(feature_tracker.cpp: cv::calcOpticalFlowPyrLK :151, cv::goodFeaturesToTrack
:190, cv::CLAHE :125-131): pyramids via average pooling, gradients via Sobel
convs, patch gathers via vectorized bilinear sampling, NMS via reduce_window —
all static-shape, batched over features.

Convention: grayscale images (H, W) float32; points are (x, y) = (col, row).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray):
    """Sample img (H, W) at xy (..., 2) float positions; clamps to border.

    Returns (values (...,), in_bounds (...,))."""
    H, W = img.shape
    x = xy[..., 0]
    y = xy[..., 1]
    inb = (x >= 0) & (x <= W - 1.001) & (y >= 0) & (y <= H - 1.001)
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    val = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
           + v10 * (1 - fx) * fy + v11 * fx * fy)
    return val, inb


# Image convs explicitly opt OUT of the package-wide float32 matmul
# precision (vil_fusion_tpu/__init__.py): bf16-input convs quantize 0..1
# pixel values at 2^-8 — below the sensor's own 1/255 quantization (the
# reference runs on uint8 images) — and the forced-f32 lowering measured
# 3x slower across the tracker's conv stack on v5e.
_FAST = jax.lax.Precision.DEFAULT


def _conv2(img, kernel):
    return jax.lax.conv_general_dilated(
        img[None, None], kernel[None, None].astype(img.dtype),
        window_strides=(1, 1), padding="SAME", precision=_FAST)[0, 0]


def sobel(img: jnp.ndarray):
    """(Ix, Iy) Sobel gradients, scaled 1/8 (derivative of intensity/px)."""
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], img.dtype) / 8.0
    ky = kx.T
    return _conv2(img, kx), _conv2(img, ky)


def box_filter(img: jnp.ndarray, radius: int):
    """Sum over (2r+1)^2 window via two 1-D convolutions."""
    k = jnp.ones((2 * radius + 1,), img.dtype)
    tmp = jax.lax.conv_general_dilated(
        img[None, None], k[None, None, None, :], (1, 1), "SAME",
        precision=_FAST)[0, 0]
    return jax.lax.conv_general_dilated(
        tmp[None, None], k[None, None, :, None], (1, 1), "SAME",
        precision=_FAST)[0, 0]


def avg_pool2(img: jnp.ndarray):
    """2x2 average pooling (pyramid downsample)."""
    H, W = img.shape
    return img[: H // 2 * 2, : W // 2 * 2].reshape(H // 2, 2, W // 2, 2).mean((1, 3))


def build_pyramid(img: jnp.ndarray, levels: int):
    """[img, img/2, img/4, ...] — cv::buildOpticalFlowPyramid analog."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(avg_pool2(pyr[-1]))
    return pyr


def max_pool_same(img: jnp.ndarray, radius: int):
    """Separable max pool: two 1-D windows instead of one (2r+1)^2 window —
    a 61x61 2-D reduce_window costs ~30x more and dominated feature
    detection at KITTI image sizes."""
    w = 2 * radius + 1
    tmp = jax.lax.reduce_window(img, -jnp.inf, jax.lax.max, (w, 1), (1, 1), "SAME")
    return jax.lax.reduce_window(tmp, -jnp.inf, jax.lax.max, (1, w), (1, 1), "SAME")


def shi_tomasi_response(img: jnp.ndarray, window_radius: int = 1):
    """Min-eigenvalue of the structure tensor (goodFeaturesToTrack score)."""
    ix, iy = sobel(img)
    a = box_filter(ix * ix, window_radius)
    b = box_filter(ix * iy, window_radius)
    c = box_filter(iy * iy, window_radius)
    tr = a + c
    det_part = jnp.sqrt(jnp.maximum((a - c) ** 2 + 4 * b * b, 0.0))
    return 0.5 * (tr - det_part)


def clahe_like(img: jnp.ndarray, grid: int = 8, clip: float = 0.03):
    """Cheap local contrast normalization standing in for cv::CLAHE
    (feature_tracker.cpp:125-131): per-tile mean/std normalization blended
    bilinearly — preserves the tracker-relevant property (gradient
    equalization in dark regions) with pure tensor ops."""
    H, W = img.shape
    th, tw = H // grid, W // grid
    tiles = img[: th * grid, : tw * grid].reshape(grid, th, grid, tw)
    mean = tiles.mean((1, 3))
    std = tiles.std((1, 3)) + clip
    mean_up = jax.image.resize(mean, (H, W), "linear")
    std_up = jax.image.resize(std, (H, W), "linear")
    out = (img - mean_up) / std_up
    return (out - out.min()) / (out.max() - out.min() + 1e-6)


@functools.partial(jax.jit, static_argnames=("max_pts", "min_dist", "block"))
def detect_features(
    img: jnp.ndarray,
    occupied_xy: jnp.ndarray,  # (M, 2) existing feature positions
    occupied_valid: jnp.ndarray,  # (M,)
    max_pts: int,
    min_dist: int = 30,
    quality: float = 0.01,
    block: int = 3,
):
    """Shi-Tomasi corners with min-dist suppression and existing-track masking
    (FeatureTracker::setMask :36-71 + goodFeaturesToTrack :190).

    Returns (xy (max_pts, 2), valid (max_pts,)).
    """
    H, W = img.shape
    resp = shi_tomasi_response(img, block // 2)
    # mask borders (BORDER_SIZE=1 in reference; use min_dist/3 for safety)
    r = jnp.arange(H)[:, None]
    c = jnp.arange(W)[None, :]
    border = 8
    resp = jnp.where((r < border) | (r >= H - border) | (c < border) | (c >= W - border),
                     -1.0, resp)
    # suppress around existing features: splat + dilate
    occ = jnp.zeros((H, W), img.dtype)
    ox = jnp.clip(occupied_xy[:, 0].astype(jnp.int32), 0, W - 1)
    oy = jnp.clip(occupied_xy[:, 1].astype(jnp.int32), 0, H - 1)
    occ = occ.at[oy, ox].max(occupied_valid.astype(img.dtype))
    occ = max_pool_same(occ, min_dist)
    resp = jnp.where(occ > 0, -1.0, resp)
    # quality gate relative to max response
    resp = jnp.where(resp > quality * jnp.max(resp), resp, -1.0)
    # min-dist NMS between new detections: local-max over min_dist window
    nms_r = min_dist // 2
    pooled = max_pool_same(resp, nms_r)
    resp = jnp.where(resp >= pooled, resp, -1.0)
    # top-k via per-tile reduction: NMS suppression is Chebyshev radius
    # nms_r, so two survivors can never share a (nms_r x nms_r) tile
    # (except exact ties) — per-tile max is exact, and the global top_k
    # then runs over ~2k tile maxima instead of H*W pixels (a full-image
    # lax.top_k was ~8 ms of the tracker's budget at KITTI size). Two-stage
    # reduction keeping the wide axis minor — a (H/T, W/T, T, T) transpose
    # measured 3x worse than the original top_k on TPU (T=15 minor dims
    # fight the 8x128 lane layout).
    T = max(nms_r, 1)
    Hp = -(-H // T) * T
    Wp = -(-W // T) * T
    resp_p = jnp.pad(resp, ((0, Hp - H), (0, Wp - W)), constant_values=-1.0)
    # stage 1: reduce rows within each tile-row band -> (Hp/T, Wp)
    band = resp_p.reshape(Hp // T, T, Wp)
    rmax = jnp.max(band, axis=1)
    rarg = jnp.argmax(band, axis=1).astype(jnp.int32)  # row within band
    # stage 2: reduce cols within each tile -> (Hp/T, Wp/T)
    tile = rmax.reshape(Hp // T, Wp // T, T)
    tmax = tile.reshape(Hp // T, Wp // T, T).max(axis=2)
    carg = jnp.argmax(tile, axis=2).astype(jnp.int32)  # col within tile
    gx = jnp.arange(Wp // T, dtype=jnp.int32)[None, :] * T + carg
    gy = (jnp.arange(Hp // T, dtype=jnp.int32)[:, None] * T
          + jnp.take_along_axis(rarg, gx, axis=1))
    n_tiles = tmax.size
    k = min(max_pts, n_tiles)
    vals, sel = jax.lax.top_k(tmax.reshape(-1), k)
    xy = jnp.stack([gx.reshape(-1)[sel].astype(img.dtype),
                    gy.reshape(-1)[sel].astype(img.dtype)], axis=-1)
    if k < max_pts:
        xy = jnp.pad(xy, ((0, max_pts - k), (0, 0)))
        vals = jnp.pad(vals, (0, max_pts - k), constant_values=-1.0)
    return xy, vals > 0
