"""Affine crop-warp geometry, in closed form.

The reference builds its person-crop transform by solving a 3-point
correspondence with ``cv2.getAffineTransform``
(``datasets/process/affine_transform.py:13-77``). The three points are
constructed so the transform is always a *uniform-scale similarity*
(rotation + isotropic scale + translation): the scale factor is
``dst_w / src_w`` with ``src_w = scale[0] * 200`` (``scale[1]`` never enters
the matrix), and the third point is a 90-degree rotation of the first two.
We therefore compute the matrix analytically — exact, batched, jittable,
and trivially invertible — instead of solving a linear system per box.

Two pixel conventions exist in the reference and both are kept:
  * classic  (``get_affine_transform``):   extents measured as ``w``
  * DARK     (``dark_get_affine_transform``): extents measured as ``w - 1``
    (half-pixel-correct; used for the input crop, while the decode
    back-transform uses the classic convention — this asymmetry is part of
    the protocol and is reproduced, see ``heatmaps_process.py:78`` vs
    ``PoseTrack_Alignment.py:416``).
"""

import numpy as np

PIXEL_STD = 200.0


def affine_matrix(center, scale, rot_deg, output_size, shift=None, inv=False, dark=False):
    """Closed-form crop transform. Works on numpy or jax.numpy inputs.

    Args:
      center: (..., 2) box centers in source-image pixels.
      scale: (..., 2) box scale in units of 200 px.
      rot_deg: (...,) rotation in degrees.
      output_size: (w, h) of the destination crop (static Python ints).
      shift: optional (..., 2) shift in units of the source box size.
      inv: if True, return the dst->src matrix instead of src->dst.
      dark: use the DARK half-pixel convention (extent = size - 1).

    Returns:
      (..., 2, 3) affine matrices.
    """
    xp = _array_module(center)
    center = xp.asarray(center, dtype=xp.float32)
    scale = xp.asarray(scale, dtype=xp.float32)
    rot = xp.asarray(rot_deg, dtype=xp.float32) * (np.pi / 180.0)

    dst_w, dst_h = float(output_size[0]), float(output_size[1])
    src_w = scale[..., 0] * PIXEL_STD
    if dark:
        s = (dst_w - 1.0) / (src_w - 1.0)
        d0 = xp.stack(
            [xp.full_like(src_w, (dst_w - 1.0) * 0.5), xp.full_like(src_w, (dst_h - 1.0) * 0.5)],
            axis=-1,
        )
    else:
        s = dst_w / src_w
        d0 = xp.stack(
            [xp.full_like(src_w, dst_w * 0.5), xp.full_like(src_w, dst_h * 0.5)], axis=-1
        )

    p0 = center
    if shift is not None:
        p0 = p0 + scale * PIXEL_STD * xp.asarray(shift, dtype=xp.float32)

    cs, sn = xp.cos(rot), xp.sin(rot)
    if inv:
        # src = center + R(rot) @ (dst - d0) / s
        inv_s = 1.0 / s
        lin = xp.stack(
            [
                xp.stack([cs * inv_s, -sn * inv_s], axis=-1),
                xp.stack([sn * inv_s, cs * inv_s], axis=-1),
            ],
            axis=-2,
        )  # (..., 2, 2) = R(rot) / s
        trans = p0 - _matvec(xp, lin, d0)
    else:
        # dst = d0 + s * R(-rot) @ (src - center)
        lin = xp.stack(
            [
                xp.stack([cs * s, sn * s], axis=-1),
                xp.stack([-sn * s, cs * s], axis=-1),
            ],
            axis=-2,
        )  # (..., 2, 2) = s * R(-rot)
        trans = d0 - _matvec(xp, lin, p0)

    return xp.concatenate([lin, trans[..., None]], axis=-1)  # (..., 2, 3)


def apply_affine(points, mat):
    """Apply (..., 2, 3) affine matrices to (..., N, 2) or (..., 2) points.

    Uses explicit multiply-adds rather than a matmul: XLA's default matmul
    precision reduces f32 operands to bf16 on TPU, which is far too coarse
    for pixel coordinates.
    """
    xp = _array_module(points)
    points = xp.asarray(points, dtype=xp.float32)
    mat = xp.asarray(mat, dtype=xp.float32)
    if points.ndim == mat.ndim - 1:  # single point per matrix
        x, y = points[..., 0], points[..., 1]
        m = mat
    else:  # (..., N, 2): batch of points per matrix
        x, y = points[..., 0], points[..., 1]
        m = mat[..., None, :, :]
    ox = m[..., 0, 0] * x + m[..., 0, 1] * y + m[..., 0, 2]
    oy = m[..., 1, 0] * x + m[..., 1, 1] * y + m[..., 1, 2]
    return xp.stack([ox, oy], axis=-1)


def invert_affine(mat):
    """Invert (..., 2, 3) affine matrices analytically."""
    xp = _array_module(mat)
    a, b, tx = mat[..., 0, 0], mat[..., 0, 1], mat[..., 0, 2]
    c, d, ty = mat[..., 1, 0], mat[..., 1, 1], mat[..., 1, 2]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    row0 = xp.stack([ia, ib, itx], axis=-1)
    row1 = xp.stack([ic, id_, ity], axis=-1)
    return xp.stack([row0, row1], axis=-2)


# -- reference-signature host-side wrappers -------------------------------------

def get_affine_transform(center, scale, rot, output_size, shift=np.array([0, 0], np.float32), inv=0):
    """Classic-convention crop matrix, numpy, single box (cf. affine_transform.py:13)."""
    scale = _as_pair(scale)
    m = affine_matrix(
        np.asarray(center, np.float32),
        np.asarray(scale, np.float32),
        float(rot),
        output_size,
        shift=np.asarray(shift, np.float32),
        inv=bool(inv),
        dark=False,
    )
    return np.asarray(m, dtype=np.float64)


def dark_get_affine_transform(center, scale, rot, output_size, shift=np.array([0, 0], np.float32), inv=0):
    """DARK-convention crop matrix (cf. affine_transform.py:45)."""
    scale = _as_pair(scale)
    m = affine_matrix(
        np.asarray(center, np.float32),
        np.asarray(scale, np.float32),
        float(rot),
        output_size,
        shift=np.asarray(shift, np.float32),
        inv=bool(inv),
        dark=True,
    )
    return np.asarray(m, dtype=np.float64)


def exec_affine_transform(pt, t):
    """Warp one 2-D point by a 2x3 matrix (host-side, numpy)."""
    pt = np.asarray(pt, dtype=np.float64)
    return t[:, :2] @ pt[:2] + t[:, 2]


def _as_pair(scale):
    scale = np.asarray(scale, dtype=np.float32)
    if scale.ndim == 0:
        scale = np.array([scale, scale], dtype=np.float32)
    return scale


def _matvec(xp, m, v):
    # explicit 2x2 multiply-add: immune to reduced matmul precision on TPU
    ox = m[..., 0, 0] * v[..., 0] + m[..., 0, 1] * v[..., 1]
    oy = m[..., 1, 0] * v[..., 0] + m[..., 1, 1] * v[..., 1]
    return xp.stack([ox, oy], axis=-1)


def _array_module(x):
    """numpy for numpy inputs, jax.numpy for traced/jax inputs."""
    if isinstance(x, np.ndarray) or np.isscalar(x) or isinstance(x, (list, tuple)):
        return np
    import jax.numpy as jnp

    return jnp
