"""Batched differentiable affine warp (bilinear, zero padding).

TPU-native replacement for the two image/feature warps in the reference:
``cv2.warpAffine`` in the data path (``PoseTrack_Alignment.py:416-423``) and
``kornia.geometry.warp_affine`` in the global alignment head
(``Alignment_V15.py:135``). Destination pixel (x, y) samples the source at
``M^{-1} @ [x, y, 1]`` with bilinear interpolation and zero padding, matching
OpenCV's INTER_LINEAR semantics on integer pixel centers.

Layout is NHWC (TPU-friendly); fully jittable and vmappable; gradients flow
through both the image and the matrix (needed for the learned global offsets).
"""

from functools import partial

import jax
import jax.numpy as jnp

from .affine import invert_affine


def warp_affine(images, mats, out_hw, inverse_given: bool = False):
    """Warp a batch of images by per-image affine matrices.

    Args:
      images: (N, H, W, C) source images/features.
      mats: (N, 2, 3) forward (src->dst) matrices, or dst->src if
        ``inverse_given``.
      out_hw: static (out_h, out_w).
      inverse_given: set True when ``mats`` already maps dst->src.

    Returns:
      (N, out_h, out_w, C) warped output.
    """
    inv = mats if inverse_given else invert_affine(mats)
    out_h, out_w = int(out_hw[0]), int(out_hw[1])

    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (out_h, out_w)

    def one(img, m):
        sx = m[0, 0] * gx + m[0, 1] * gy + m[0, 2]
        sy = m[1, 0] * gx + m[1, 1] * gy + m[1, 2]
        return bilinear_sample(img, sx, sy)

    return jax.vmap(one)(images, inv)


def warp_translate(images, offsets, out_hw=None, max_shift: int = 32):
    """Pure-translation warp: dst(x, y) = src(x - tx, y - ty).

    Equivalent to ``warp_affine`` with matrix [[1,0,tx],[0,1,ty]] — the only
    case the global alignment head uses (``Alignment_V15.py:133-135``) —
    but gather-free: the fractional translation decomposes into one
    per-image integer ``dynamic_slice`` of a zero-padded source plus a
    4-corner bilinear blend (vmapped over the batch). Translations are
    clamped to ``±max_shift`` pixels (alignment translations are local; the
    general ``warp_affine`` keeps unbounded exact semantics).

    Args:
      images: (N, H, W, C).
      offsets: (N, 2) translations (tx, ty) in destination pixels.
    """
    n, h, w, c = images.shape
    if out_hw is not None and tuple(out_hw) != (h, w):
        eye = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (n, 2, 2))
        mats = jnp.concatenate(
            [eye, offsets[:, :, None].astype(jnp.float32)], axis=-1
        )
        return warp_affine(images, mats, out_hw)

    m = int(max_shift) + 1
    pad = jnp.pad(images, ((0, 0), (m, m), (m, m), (0, 0)))

    t = jnp.clip(offsets.astype(jnp.float32), -max_shift, max_shift)
    # dst(x) = src(x - t): slice origin moves by -t
    t0 = jnp.floor(t)
    f = t - t0  # in [0, 1)

    def one(img_pad, ti, fi):
        # integer corner: origin at (m - ty0, m - tx0); the 4 bilinear
        # corners are the 2x2 neighborhood toward -1 (src coords x - t)
        ox = (m - ti[0]).astype(jnp.int32)
        oy = (m - ti[1]).astype(jnp.int32)
        s11 = jax.lax.dynamic_slice(img_pad, (oy, ox, 0), (h, w, c))
        s10 = jax.lax.dynamic_slice(img_pad, (oy, ox - 1, 0), (h, w, c))
        s01 = jax.lax.dynamic_slice(img_pad, (oy - 1, ox, 0), (h, w, c))
        s00 = jax.lax.dynamic_slice(img_pad, (oy - 1, ox - 1, 0), (h, w, c))
        fx = fi[0].astype(img_pad.dtype)
        fy = fi[1].astype(img_pad.dtype)
        top = s00 * fx + s01 * (1 - fx)
        bot = s10 * fx + s11 * (1 - fx)
        return top * fy + bot * (1 - fy)

    return jax.vmap(one)(pad, t0, f)


def warp_translate_matmul(images, offsets, max_shift: int = 32):
    """``warp_translate`` as two batched matmuls on the MXU.

    A pure translation is a separable linear map: ``out = Ry @ X @ Cx^T``
    with per-image bilinear selection matrices (two nonzeros per row,
    built from iota comparisons — no gather, no dynamic slice). This is
    the TPU-native formulation: XLA keeps full layout freedom (the
    vmapped-``dynamic_slice`` form costs ~43 ms/batch-512 in per-image
    while loops; a Pallas kernel matches the matmul op-level but its
    custom-call layout constraint triggers module-wide relayout copies of
    the backbone features — see docs/PERFORMANCE.md round 3).

    Natively differentiable: cotangents flow to ``offsets`` through the
    fractional weights exactly as in ``warp_translate``. f32 inputs use
    HIGHEST-precision matmuls (1 ulp vs ``warp_translate`` — the row/column
    blend order differs); bf16 inputs blend at bf16 like the reference path.

    Args:
      images: (N, H, W, C).
      offsets: (N, 2) translations (tx, ty) in destination pixels,
        clamped to ``±max_shift`` (same clamp as ``warp_translate``).
    """
    n, h, w, c = images.shape
    t = jnp.clip(offsets.astype(jnp.float32), -max_shift, max_shift)

    def sel(out_len, shift):
        # S[n, i, j] = f*(j == i - s0 - 1) + (1 - f)*(j == i - s0):
        # row i picks source i - s0 (weight 1-f) and i - s0 - 1 (weight f);
        # out-of-range sources leave zero rows = zero-padding semantics
        s0 = jnp.floor(shift)
        fr = (shift - s0)[:, None, None]
        i = jax.lax.broadcasted_iota(jnp.int32, (1, out_len, out_len), 1)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, out_len, out_len), 2)
        base = i - s0.astype(jnp.int32)[:, None, None]
        return fr * (j == base - 1) + (1 - fr) * (j == base)

    ry = sel(h, t[:, 1]).astype(images.dtype)
    cx = sel(w, t[:, 0]).astype(images.dtype)
    prec = (
        jax.lax.Precision.HIGHEST
        if images.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    rows = jnp.einsum("nyj,njqc->nyqc", ry, images, precision=prec)
    return jnp.einsum("nyqc,nxq->nyxc", rows, cx, precision=prec)


def bilinear_sample(img, sx, sy):
    """Bilinearly sample (H, W, C) ``img`` at float coords; zeros outside.

    ``sx``/``sy`` may be any matching shape; output is ``sx.shape + (C,)``.
    """
    h, w, c = img.shape
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = img.reshape(h * w, c)
        vals = jnp.take(flat, yi_c * w + xi_c, axis=0)
        return vals * valid[..., None].astype(img.dtype)

    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)

    wx = wx[..., None].astype(img.dtype)
    wy = wy[..., None].astype(img.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


@partial(jax.jit, static_argnames=("out_hw", "dark"))
def crop_and_warp(images, centers, scales, rots, out_hw, dark: bool = True):
    """Batched person-box crop: full frames -> fixed-size crops, on device.

    Args:
      images: (N, H, W, C) frames (uint8 or float).
      centers: (N, 2), scales: (N, 2), rots: (N,) — box parameters.
      out_hw: static (out_h, out_w).
      dark: DARK half-pixel convention (the reference's input-crop choice).
    """
    from .affine import affine_matrix

    out_h, out_w = out_hw
    inv = affine_matrix(centers, scales, rots, (out_w, out_h), inv=True, dark=dark)
    imgs = images.astype(jnp.float32)
    return warp_affine(imgs, inv, (out_h, out_w), inverse_given=True)
