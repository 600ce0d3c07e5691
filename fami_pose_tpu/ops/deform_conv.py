"""Modulated deformable convolution (DCNv2), TPU-native.

Replaces ``torchvision.ops.DeformConv2d`` used by the reference's hierarchical
alignment head (``Alignment_V15.py:83-101,144-158``; wrapper
``posetimation/layers/basic_model.py:151-184``). The reference computes this
with a CUDA kernel; here it is re-designed for XLA/TPU as *im2col by bilinear
gather*: for each of the K = kh*kw kernel taps (a static, trace-time loop) we
bilinearly sample the input at offset-shifted positions, modulate by the mask,
and stack the taps into a column tensor that feeds a single large matmul —
the FLOPs land on the MXU, and the gathers vectorize on the VPU.

Semantics are torchvision-compatible so weights/offsets port 1:1:
  * ``offset`` channels are ordered ``(dy, dx)`` pairs per (offset_group,
    tap): channel ``2*(g*K + k)`` is the vertical shift for group ``g`` tap
    ``k``; ``2*(g*K+k)+1`` horizontal.
  * ``mask`` channel ``g*K + k`` multiplies the sampled value *before* the
    convolution weight (raw, no sigmoid — matching the reference, which
    feeds the mask conv's raw output straight in, ``Alignment_V15.py:146``).
  * Sampling position for output pixel (i, j), tap (a, b):
    ``y = i*stride - pad + a*dilation + dy``, same for x; bilinear, zeros
    outside the input.

Layout is NHWC (weights HWIO); a Pallas-fused variant lives in
``fami_pose_tpu.ops.pallas.dcn`` and must match this implementation bit-for-bit
in its tests.
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def _bilinear_gather_grouped(x, py, px):
    """Sample grouped features at per-(pixel, group) float coords.

    Args:
      x: (N, H, W, G, Cg) input features, split by offset group.
      py, px: (N, Ho, Wo, G) float sample coordinates.

    Returns:
      (N, Ho, Wo, G, Cg) bilinearly-sampled values; zero outside the image.
    """
    n, h, w, g, cg = x.shape
    _, ho, wo, _ = py.shape

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = (py - y0)[..., None]
    wx = (px - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # (N, G, H*W, Cg) so the gather runs along one flat spatial axis
    xf = x.transpose(0, 3, 1, 2, 4).reshape(n, g, h * w, cg)

    def corner(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        idx = (yc * w + xc).reshape(n, ho * wo, g).transpose(0, 2, 1)  # (N,G,P)
        vals = jnp.take_along_axis(xf, idx[..., None], axis=2)  # (N,G,P,Cg)
        vals = vals.transpose(0, 2, 1, 3).reshape(n, ho, wo, g, cg)
        return vals * valid[..., None].astype(x.dtype)

    v00 = corner(y0i, x0i)
    v01 = corner(y0i, x0i + 1)
    v10 = corner(y0i + 1, x0i)
    v11 = corner(y0i + 1, x0i + 1)

    wy = wy.astype(x.dtype)
    wx = wx.astype(x.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


@partial(
    jax.jit,
    static_argnames=("stride", "padding", "dilation", "offset_groups"),
)
def deform_conv2d(
    x,
    offset,
    mask,
    weight,
    bias=None,
    *,
    stride=1,
    padding=0,
    dilation=1,
    offset_groups: Optional[int] = None,
):
    """Modulated deformable 2-D convolution (NHWC).

    Args:
      x: (N, H, W, C) input.
      offset: (N, Ho, Wo, 2*G*K) sampling offsets, (dy, dx) pairs.
      mask: (N, Ho, Wo, G*K) modulation (applied raw), or None for DCNv1.
      weight: (kh, kw, C, C_out) convolution weights (HWIO).
      bias: (C_out,) or None.
      stride / padding / dilation: int or (h, w) pairs.
      offset_groups: G; inferred from the offset channel count by default.

    Returns:
      (N, Ho, Wo, C_out).
    """
    n, h, w, c = x.shape
    kh, kw, wc, c_out = weight.shape
    if wc != c:
        raise ValueError(f"weight expects {wc} input channels, x has {c}")
    k = kh * kw
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)

    g = offset_groups or offset.shape[-1] // (2 * k)
    if offset.shape[-1] != 2 * g * k:
        raise ValueError(
            f"offset has {offset.shape[-1]} channels, expected {2 * g * k}"
        )
    if c % g != 0:
        raise ValueError(f"channels {c} not divisible by offset groups {g}")
    cg = c // g
    _, ho, wo, _ = offset.shape

    xg = x.reshape(n, h, w, g, cg)
    # offset channels: [g, k, (dy, dx)]
    off = offset.reshape(n, ho, wo, g, k, 2)
    msk = None if mask is None else mask.reshape(n, ho, wo, g, k)

    oy = jnp.arange(ho, dtype=x.dtype)[:, None] * sh - ph  # (Ho, 1)
    ox = jnp.arange(wo, dtype=x.dtype)[None, :] * sw - pw  # (1, Wo)

    cols = []
    for a in range(kh):
        for b in range(kw):
            t = a * kw + b
            py = oy[None, :, :, None] + a * dh + off[..., t, 0]
            px = ox[None, :, :, None] + b * dw + off[..., t, 1]
            v = _bilinear_gather_grouped(xg, py, px)  # (N,Ho,Wo,G,Cg)
            if msk is not None:
                v = v * msk[..., t, None]
            cols.append(v.reshape(n, ho, wo, c))

    # (N*Ho*Wo, K*C) @ (K*C, C_out): one MXU-friendly contraction
    col = jnp.stack(cols, axis=3).reshape(n * ho * wo, k * c)
    wmat = weight.reshape(k * c, c_out)
    out = jnp.dot(col, wmat, preferred_element_type=x.dtype)
    out = out.reshape(n, ho, wo, c_out)
    if bias is not None:
        out = out + bias
    return out


def aux_cf_perms(kernel_taps: int, offset_groups: int):
    """Output-channel permutations for channel-first DCN auxiliaries.

    The offset/mask convs canonically emit torchvision's [g][k][(dy,dx)] /
    [g][k] channel order (what :func:`deform_conv2d` consumes). The Pallas
    kernels stage the kernel-major order [k][(dy,dx)][g] / [k][g]; applying
    these permutations to the producing convs' *output channels* (weight
    columns + bias) makes them emit that order directly, so the DCN prep
    needs no channel transpose. ``perm[new_position] = old_channel``.
    """
    import numpy as np

    k, g = int(kernel_taps), int(offset_groups)
    off = np.arange(g * k * 2).reshape(g, k, 2)
    msk = np.arange(g * k).reshape(g, k)
    return off.transpose(1, 2, 0).reshape(-1), msk.transpose(1, 0).reshape(-1)


def deform_conv2d_output_size(in_size, kernel, stride, padding, dilation):
    """Conv output spatial size (same formula as torch)."""
    return (in_size + 2 * padding - dilation * (kernel - 1) - 1) // stride + 1


def _shift2d(x, dy, dx):
    """x shifted so out(i, j) = x(i + dy, j + dx), zero-padded (NHWC)."""
    n, h, w, c = x.shape
    out = x
    if dy > 0:
        out = jnp.concatenate(
            [out[:, dy:], jnp.zeros((n, dy, w, c), x.dtype)], axis=1
        )
    elif dy < 0:
        out = jnp.concatenate(
            [jnp.zeros((n, -dy, w, c), x.dtype), out[:, :dy]], axis=1
        )
    if dx > 0:
        out = jnp.concatenate(
            [out[:, :, dx:], jnp.zeros((n, h, dx, c), x.dtype)], axis=2
        )
    elif dx < 0:
        out = jnp.concatenate(
            [jnp.zeros((n, h, -dx, c), x.dtype), out[:, :, :dx]], axis=2
        )
    return out


@partial(
    jax.jit,
    static_argnames=("padding", "dilation", "offset_groups", "max_offset"),
)
def deform_conv2d_windowed(
    x,
    offset,
    mask,
    weight,
    bias=None,
    *,
    padding=0,
    dilation=1,
    offset_groups: Optional[int] = None,
    max_offset: int = 6,
):
    """Gather-free modulated deformable conv for bounded offsets (TPU fast path).

    Identical to :func:`deform_conv2d` (stride 1) for offsets within
    ``[-max_offset, max_offset]``; larger offsets are CLAMPED to that range
    (the one documented deviation — alignment offsets are local by
    construction, and the bound is configurable via ``TPU.DCN_MAX_OFFSET``).

    Why: per-pixel bilinear sampling is a gather, and arbitrary gathers do
    not map onto the TPU's dense-tile memory model (measured ~25x slower
    than the whole HRNet backbone). This formulation replaces the gather
    with an exact algebraic identity: bilinear interpolation at position
    ``p + t`` equals ``sum_d hat(t - d) * x[p + d]`` over integer
    displacements ``d``, where ``hat(u) = max(0, 1 - |u|)`` is nonzero for
    at most the two integers flanking ``t``. With ``|t| <= D`` the sum has
    TIGHT static support ``d in [-D, D]``: at ``d = D + 1`` the hat weight
    is identically zero (``t <= D`` puts ``|t - d| >= 1`` on the boundary
    where ``hat`` vanishes), so the kernel becomes ``(2D+1)^2``
    statically-shifted, per-pixel-weighted accumulations (VPU elementwise)
    feeding one im2col matmul (MXU) — no dynamic addressing anywhere, and
    trivially differentiable. (Same proof as the Pallas v3 kernel,
    ops/pallas/dcn.py.)
    """
    n, h, w, c = x.shape
    kh, kw, wc, c_out = weight.shape
    if wc != c:
        raise ValueError(f"weight expects {wc} input channels, x has {c}")
    k = kh * kw
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    d_max = int(max_offset)

    g = offset_groups or offset.shape[-1] // (2 * k)
    cg = c // g
    _, ho, wo, _ = offset.shape
    if (ho, wo) != (h, w):
        raise ValueError("windowed DCN requires stride-1 'same' geometry")

    xg = x.reshape(n, h, w, g, cg)
    off = offset.reshape(n, h, w, g, k, 2)
    ty = jnp.clip(off[..., 0], -d_max, d_max)  # (N,H,W,G,K)
    tx = jnp.clip(off[..., 1], -d_max, d_max)
    msk = None if mask is None else mask.reshape(n, h, w, g, k)

    def hat(u):
        return jnp.maximum(0.0, 1.0 - jnp.abs(u)).astype(x.dtype)

    # window displacements: hat(t - d) with t clamped to [-D, D] is nonzero
    # only for d in the TIGHT window [-D, D] (hat vanishes at d = D + 1;
    # see the docstring proof) -> S = 2D+1 values
    margin = d_max + 1 + max(dh * (kh - 1) - ph, dw * (kw - 1) - pw, ph, pw)
    x_pad = jnp.pad(
        x, ((0, 0), (margin, margin), (margin, margin), (0, 0))
    )

    wx = {
        dx: hat(tx - dx) for dx in range(-d_max, d_max + 1)
    }  # static x-window weights, (N,H,W,G,K) each

    def body(carry, dy):
        cols_acc = carry  # (N, H, W, K, G, Cg)
        wy = hat(ty - dy.astype(ty.dtype))  # (N,H,W,G,K)
        if msk is not None:
            wy = wy * msk
        # one dynamic row slice per kernel row; columns are static slices
        rows = {}
        for a in range(kh):
            rows[a] = jax.lax.dynamic_slice(
                x_pad,
                (0, margin + a * dh - ph + dy, 0, 0),
                (n, h, w + 2 * margin, c),
            )
        terms = []
        for a in range(kh):
            for b in range(kw):
                t = a * kw + b
                base_x = margin + b * dw - pw
                acc_t = None
                for dx in range(-d_max, d_max + 1):
                    xs = jax.lax.slice_in_dim(
                        rows[a], base_x + dx, base_x + dx + w, axis=2
                    )
                    w2 = wy[..., t] * wx[dx][..., t]  # (N,H,W,G)
                    contrib = xs.reshape(n, h, w, g, cg) * w2[..., None]
                    acc_t = contrib if acc_t is None else acc_t + contrib
                terms.append(acc_t)
        term = jnp.stack(terms, axis=3)  # (N,H,W,K,G,Cg)
        return cols_acc + term, None

    init = jnp.zeros((n, h, w, k, g, cg), x.dtype)
    # remat the scan body: the backward then recomputes the per-iteration
    # shifted terms instead of storing s_win stacked (N,H,W,K,G,Cg)
    # residuals (~0.5 GB at FAMI training scale)
    cols, _ = jax.lax.scan(
        jax.checkpoint(body), init,
        jnp.arange(-d_max, d_max + 1, dtype=jnp.int32),
    )
    col = cols.reshape(n * h * w, k * c)
    wmat = weight.reshape(k * c, c_out)
    out = jnp.dot(col, wmat, preferred_element_type=x.dtype).reshape(
        n, h, w, c_out
    )
    if bias is not None:
        out = out + bias
    return out


@partial(
    jax.jit,
    static_argnames=("padding", "dilation", "offset_groups", "max_offset"),
)
def deform_conv2d_static(
    x,
    offset,
    mask,
    weight,
    bias=None,
    *,
    padding=0,
    dilation=1,
    offset_groups: Optional[int] = None,
    max_offset: int = 1,
):
    """Fully-unrolled static-window DCN (serving fast path for small D).

    Same clamped-window semantics as :func:`deform_conv2d_windowed`, with
    two structural differences that matter to XLA:

      * the window uses the TIGHT support ``d in [-D, D]`` (``2D+1`` per
        axis): ``hat(t - d)`` with ``t in [-D, D]`` is zero for ``d = D+1``
        except on the measure-zero edge ``t = D``, where the flanking
        weight is itself 0 — so dropping the extra row/column is exact;
      * no ``lax.scan`` and no ``dynamic_slice``: every shifted view is a
        static slice of one padded input, so the whole ``(2D+1)^2 x K``
        accumulation is one fusible elementwise expression feeding the
        im2col matmul — XLA tiles it with halos instead of materializing
        per-row copies (the scan form pays ``kh`` dynamic whole-row slices
        per window row).

    At D=1 this is 9 static cells per tap; measured on v5e it replaces the
    Pallas kernel as the fastest serving-window implementation (the Pallas
    kernel remains the design point for D >= 2 training; see
    docs/PERFORMANCE.md round-3 notes).
    """
    n, h, w, c = x.shape
    kh, kw, wc, c_out = weight.shape
    if wc != c:
        raise ValueError(f"weight expects {wc} input channels, x has {c}")
    k = kh * kw
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    d_max = int(max_offset)

    g = offset_groups or offset.shape[-1] // (2 * k)
    cg = c // g
    _, ho, wo, _ = offset.shape
    if (ho, wo) != (h, w):
        raise ValueError("static-window DCN requires stride-1 'same' geometry")

    off = offset.reshape(n, h, w, g, k, 2)
    ty = jnp.clip(off[..., 0], -d_max, d_max)  # (N,H,W,G,K)
    tx = jnp.clip(off[..., 1], -d_max, d_max)
    msk = None if mask is None else mask.reshape(n, h, w, g, k)

    def hat(u):
        return jnp.maximum(0.0, 1.0 - jnp.abs(u)).astype(x.dtype)

    margin = d_max + max(dh * (kh - 1) - ph, dw * (kw - 1) - pw, ph, pw)
    x_pad = jnp.pad(
        x, ((0, 0), (margin, margin), (margin, margin), (0, 0))
    )
    # per-axis hat weights over the tight window, mask folded into wy
    wys = {}
    for dy in range(-d_max, d_max + 1):
        wy = hat(ty - dy)
        wys[dy] = wy if msk is None else wy * msk.astype(wy.dtype)
    wxs = {dx: hat(tx - dx) for dx in range(-d_max, d_max + 1)}

    cols = []
    for a in range(kh):
        for b in range(kw):
            t = a * kw + b
            y0 = margin + a * dh - ph
            x0 = margin + b * dw - pw
            acc = None
            for dy in range(-d_max, d_max + 1):
                for dx in range(-d_max, d_max + 1):
                    w2 = wys[dy][..., t] * wxs[dx][..., t]  # (N,H,W,G)
                    xs = x_pad[
                        :, y0 + dy : y0 + dy + h, x0 + dx : x0 + dx + w, :
                    ]
                    contrib = xs.reshape(n, h, w, g, cg) * w2[..., None]
                    acc = contrib if acc is None else acc + contrib
            cols.append(acc.reshape(n, h, w, c))
    col = jnp.stack(cols, axis=3).reshape(n * h * w, k * c)
    out = jnp.dot(
        col, weight.reshape(k * c, c_out), preferred_element_type=x.dtype
    ).reshape(n, h, w, c_out)
    if bias is not None:
        out = out + bias
    return out
