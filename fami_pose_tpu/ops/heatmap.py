"""Gaussian heatmap targets and sub-pixel decode, fully batched on device.

TPU-native rewrites of the reference's per-joint Python loops
(``datasets/process/heatmaps_process.py:16-203``):

  * target generation exploits the separability of the Gaussian stamp —
    one outer product of two 1-D windows per (sample, joint), broadcast
    over the whole batch; bit-matches the reference's integer-quantized,
    3-sigma-windowed stamp including its out-of-bounds weight zeroing.
  * argmax decode, +/-0.25 gradient-sign refinement, and the DARK
    (blur + log + Taylor) refinement are gather/conv formulations with no
    data-dependent control flow, so everything fuses under jit.

Conventions preserved exactly (they are part of the mAP protocol):
  * ``mu = trunc(x / stride + 0.5)`` integer quantization,
  * invisible iff the 3-sigma window misses the map entirely,
  * the decode back-transform uses the *classic* (non-DARK) inverse affine
    even though crops are DARK-warped (``heatmaps_process.py:78``).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .affine import affine_matrix, apply_affine


# -- target generation ---------------------------------------------------------

@partial(jax.jit, static_argnames=("sigma", "image_size", "heatmap_size"))
def generate_heatmaps(joints, joints_vis, sigma, image_size, heatmap_size):
    """Batched Gaussian target stamping.

    Args:
      joints: (..., J, 2) joint coords in input-image pixels.
      joints_vis: (..., J) visibility (0/1); float or int.
      sigma: static int/float.
      image_size: static (w, h) of the input crop.
      heatmap_size: static (w, h) of the target map.

    Returns:
      target: (..., J, Hh, Hw) float32 heatmaps.
      weight: (..., J, 1) float32 (1 visible, 0 invisible/out-of-window).
    """
    hw, hh = int(heatmap_size[0]), int(heatmap_size[1])
    stride_x = image_size[0] / heatmap_size[0]
    stride_y = image_size[1] / heatmap_size[1]
    t = int(sigma * 3)

    joints = jnp.asarray(joints, jnp.float32)
    vis = jnp.asarray(joints_vis, jnp.float32)

    # integer-quantized centers: int() truncates toward zero
    mu_x = jnp.trunc(joints[..., 0] / stride_x + 0.5)
    mu_y = jnp.trunc(joints[..., 1] / stride_y + 0.5)

    # a joint is droppable iff its 3-sigma window misses the map entirely
    in_window = (
        (mu_x - t < hw) & (mu_y - t < hh) & (mu_x + t + 1 >= 0) & (mu_y + t + 1 >= 0)
    )
    weight = vis * in_window.astype(jnp.float32)
    stamp = (weight > 0.5).astype(jnp.float32)

    xs = jnp.arange(hw, dtype=jnp.float32)
    ys = jnp.arange(hh, dtype=jnp.float32)
    dx = xs - mu_x[..., None]  # (..., J, Hw)
    dy = ys - mu_y[..., None]  # (..., J, Hh)
    inv_two_sigma2 = 1.0 / (2.0 * float(sigma) ** 2)
    gx = jnp.exp(-dx * dx * inv_two_sigma2) * (jnp.abs(dx) <= t)
    gy = jnp.exp(-dy * dy * inv_two_sigma2) * (jnp.abs(dy) <= t)

    target = gy[..., :, None] * gx[..., None, :] * stamp[..., None, None]
    return target, weight[..., None]


# -- decode ---------------------------------------------------------------------

def get_max_preds(heatmaps):
    """Argmax decode: (B, J, H, W) -> coords (B, J, 2) xy, maxvals (B, J, 1)."""
    b, j, h, w = heatmaps.shape
    flat = heatmaps.reshape(b, j, h * w)
    idx = jnp.argmax(flat, axis=-1)
    maxvals = jnp.max(flat, axis=-1, keepdims=True)
    px = (idx % w).astype(jnp.float32)
    py = jnp.floor(idx.astype(jnp.float32) / w)
    coords = jnp.stack([px, py], axis=-1)
    mask = (maxvals > 0.0).astype(jnp.float32)
    return coords * mask, maxvals


def _gather_pixel(heatmaps, px, py):
    """heatmaps (B, J, H, W); px/py (B, J) int -> values (B, J), clipped."""
    b, j, h, w = heatmaps.shape
    px = jnp.clip(px, 0, w - 1)
    py = jnp.clip(py, 0, h - 1)
    flat = heatmaps.reshape(b, j, h * w)
    return jnp.take_along_axis(flat, (py * w + px)[..., None], axis=-1)[..., 0]


def shift_by_gradient_sign(heatmaps, coords):
    """The classic +/-0.25-pixel refinement (``heatmaps_process.py:54-65``)."""
    _, _, h, w = heatmaps.shape
    px = jnp.floor(coords[..., 0] + 0.5).astype(jnp.int32)
    py = jnp.floor(coords[..., 1] + 0.5).astype(jnp.int32)
    interior = (px > 1) & (px < w - 1) & (py > 1) & (py < h - 1)
    dx = _gather_pixel(heatmaps, px + 1, py) - _gather_pixel(heatmaps, px - 1, py)
    dy = _gather_pixel(heatmaps, px, py + 1) - _gather_pixel(heatmaps, px, py - 1)
    delta = jnp.stack([jnp.sign(dx), jnp.sign(dy)], axis=-1) * 0.25
    return coords + delta * interior[..., None].astype(coords.dtype)


def transform_preds(coords, center, scale, heatmap_wh):
    """Map heatmap coords back to source-image pixels (classic inverse affine).

    Args:
      coords: (B, J, 2); center/scale: (B, 2); heatmap_wh: static (w, h).
    """
    inv = affine_matrix(
        center, scale, jnp.zeros(center.shape[:-1], jnp.float32), heatmap_wh, inv=True, dark=False
    )  # (B, 2, 3)
    return apply_affine(coords, inv)


@jax.jit
def get_final_preds(heatmaps, center, scale):
    """Fused decode: argmax + gradient-sign shift + inverse-affine back-transform."""
    coords, maxvals = get_max_preds(heatmaps)
    coords = shift_by_gradient_sign(heatmaps, coords)
    hw = heatmaps.shape[3], heatmaps.shape[2]
    preds = transform_preds(coords, center, scale, hw)
    return preds, maxvals


# -- DARK decode ------------------------------------------------------------------

def _gaussian_kernel1d(ksize: int) -> np.ndarray:
    """OpenCV's default Gaussian kernel for sigma=0: sigma = 0.3*((k-1)/2 - 1) + 0.8."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    half = (ksize - 1) // 2
    x = np.arange(-half, half + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def dark_blur(heatmaps, ksize: int = 11):
    """Max-preserving Gaussian blur on zero-padded maps (``heatmaps_process.py:129-143``)."""
    b, j, h, w = heatmaps.shape
    k1 = jnp.asarray(_gaussian_kernel1d(ksize))
    border = (ksize - 1) // 2
    orig_max = jnp.max(heatmaps, axis=(2, 3), keepdims=True)
    x = jnp.pad(heatmaps, ((0, 0), (0, 0), (border, border), (border, border)))
    x = x.reshape(b * j, 1, h + 2 * border, w + 2 * border)
    # separable depthwise blur, VALID so the zero border is consumed exactly
    x = jax.lax.conv_general_dilated(
        x, k1.reshape(1, 1, ksize, 1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, k1.reshape(1, 1, 1, ksize), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    x = x.reshape(b, j, h, w)
    new_max = jnp.max(x, axis=(2, 3), keepdims=True)
    # ratio first: x * orig_max can overflow f32 when heatmap magnitudes are
    # extreme (e.g. random-weight benches); orig_max/new_max is always ~1
    return x * (orig_max / jnp.maximum(new_max, 1e-20))


def taylor_refine(log_hm, coords):
    """Second-order (Newton) sub-pixel refinement on log heatmaps."""
    _, _, h, w = log_hm.shape
    px = coords[..., 0].astype(jnp.int32)
    py = coords[..., 1].astype(jnp.int32)
    interior = (px > 1) & (px < w - 2) & (py > 1) & (py < h - 2)

    g = lambda dx, dy: _gather_pixel(log_hm, px + dx, py + dy)
    dx = 0.5 * (g(1, 0) - g(-1, 0))
    dy = 0.5 * (g(0, 1) - g(0, -1))
    dxx = 0.25 * (g(2, 0) - 2.0 * g(0, 0) + g(-2, 0))
    dyy = 0.25 * (g(0, 2) - 2.0 * g(0, 0) + g(0, -2))
    dxy = 0.25 * (g(1, 1) - g(-1, 1) - g(1, -1) + g(-1, -1))

    det = dxx * dyy - dxy * dxy
    ok = interior & (det != 0.0)
    safe_det = jnp.where(ok, det, 1.0)
    # offset = -H^{-1} d, H = [[dxx, dxy], [dxy, dyy]]
    off_x = -(dyy * dx - dxy * dy) / safe_det
    off_y = -(-dxy * dx + dxx * dy) / safe_det
    offset = jnp.stack([off_x, off_y], axis=-1) * ok[..., None].astype(log_hm.dtype)
    return coords + offset


@jax.jit
def dark_get_final_preds(heatmaps, center, scale):
    """DARK decode: blur + log + Taylor refinement + inverse affine."""
    coords, maxvals = get_max_preds(heatmaps)
    hm = dark_blur(heatmaps, 11)
    log_hm = jnp.log(jnp.maximum(hm, 1e-10))
    coords = taylor_refine(log_hm, coords)
    hw = heatmaps.shape[3], heatmaps.shape[2]
    preds = transform_preds(coords, center, scale, hw)
    return preds, maxvals
