"""Pure-torch stand-ins for torchvision DeformConv2d and kornia warp_affine,
plus the module-loading machinery to import the reference ``Alignment_V15``
without its heavy deps.

These shims implement the *documented* semantics of the originals
independently of the jax implementations under test, so the full-model
differential test cross-validates two independent derivations:

  * torchvision modulated deformable conv: offset channels ``[g][k][dy,dx]``,
    mask ``[g][k]`` applied to the sampled value before the convolution
    weight, bilinear sampling with zeros outside the input.
  * kornia ``warp_affine`` for pure translation ``[[1,0,tx],[0,1,ty]]``:
    content shifts by +t, i.e. ``dst(p) = src(p - t)``, bilinear, zero pad.
"""

import importlib.util
import math
import os
import sys
import types

import torch
import torch.nn as nn

REF = "/root/reference"


def _bilinear_nchw(xg, py, px):
    """xg: (B, G, Cg, H, W); py/px: (B, G, Ho, Wo) float sample coords.
    Returns (B, G, Cg, Ho, Wo), zeros outside."""
    b, g, cg, h, w = xg.shape
    y0 = torch.floor(py)
    x0 = torch.floor(px)
    fy = (py - y0).unsqueeze(2)
    fx = (px - x0).unsqueeze(2)
    y0 = y0.long()
    x0 = x0.long()

    flat = xg.reshape(b * g, cg, h * w)

    def corner(yi, xi):
        valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)).unsqueeze(2)
        yc = yi.clamp(0, h - 1)
        xc = xi.clamp(0, w - 1)
        idx = (yc * w + xc).reshape(b * g, 1, -1).expand(-1, cg, -1)
        vals = torch.gather(flat, 2, idx).reshape(b, g, cg, *yi.shape[2:])
        return vals * valid

    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1)
    v10 = corner(y0 + 1, x0)
    v11 = corner(y0 + 1, x0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def deform_conv2d_reference(x, offset, mask, weight, bias, stride=1,
                            padding=0, dilation=1):
    """Modulated deformable conv, NCHW, torchvision channel layout."""
    b, c, h, w = x.shape
    out_c, in_c, kh, kw = weight.shape
    k = kh * kw
    g = offset.shape[1] // (2 * k)
    cg = c // g
    ho, wo = offset.shape[2], offset.shape[3]

    off = offset.reshape(b, g, k, 2, ho, wo)
    msk = None if mask is None else mask.reshape(b, g, k, ho, wo)
    xg = x.reshape(b, g, cg, h, w)
    ys = torch.arange(ho, dtype=x.dtype) * stride - padding
    xs = torch.arange(wo, dtype=x.dtype) * stride - padding

    cols = []
    for a in range(kh):
        for bb in range(kw):
            t = a * kw + bb
            py = ys.view(1, 1, ho, 1) + a * dilation + off[:, :, t, 0]
            px = xs.view(1, 1, 1, wo) + bb * dilation + off[:, :, t, 1]
            v = _bilinear_nchw(xg, py, px)  # (B,G,Cg,Ho,Wo)
            if msk is not None:
                v = v * msk[:, :, t].unsqueeze(2)
            cols.append(v.reshape(b, c, ho, wo))
    col = torch.stack(cols, dim=1).reshape(b, k * c, ho * wo)
    w_flat = weight.permute(0, 2, 3, 1).reshape(out_c, k * in_c)
    out = torch.einsum("op,bpn->bon", w_flat, col).reshape(b, out_c, ho, wo)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


class ShimDeformConv2d(nn.Module):
    """torchvision.ops.DeformConv2d-compatible module."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias=True):
        super().__init__()
        k = (kernel_size if isinstance(kernel_size, tuple)
             else (kernel_size, kernel_size))
        assert groups == 1
        self.stride, self.padding, self.dilation = stride, padding, dilation
        self.weight = nn.Parameter(torch.empty(out_channels, in_channels, *k))
        nn.init.kaiming_uniform_(self.weight, a=math.sqrt(5))
        if bias:
            self.bias = nn.Parameter(torch.empty(out_channels))
            bound = 1 / math.sqrt(in_channels * k[0] * k[1])
            nn.init.uniform_(self.bias, -bound, bound)
        else:
            self.bias = None

    def forward(self, x, offset, mask=None):
        return deform_conv2d_reference(
            x, offset, mask, self.weight, self.bias,
            stride=self.stride, padding=self.padding, dilation=self.dilation,
        )


def warp_affine_translation(src, mats, dsize):
    """kornia.geometry.warp_affine for the translation-only case."""
    b, c, h, w = src.shape
    oh, ow = dsize
    assert (oh, ow) == (h, w), "shim supports same-size translation warps"
    tx = mats[:, 0, 2]
    ty = mats[:, 1, 2]
    ys = torch.arange(oh, dtype=src.dtype)
    xs = torch.arange(ow, dtype=src.dtype)
    py = ys.view(1, 1, oh, 1) - ty.view(b, 1, 1, 1)
    px = xs.view(1, 1, 1, ow) - tx.view(b, 1, 1, 1)
    py = py.expand(b, 1, oh, ow)
    px = px.expand(b, 1, oh, ow)
    return _bilinear_nchw(src.unsqueeze(1), py, px).squeeze(1)


def load_reference_alignment_v15():
    """Import the reference Alignment_V15 with shimmed deps; returns the
    module. Reuses the HRNet loader stubs from test_reference_parity."""
    from test_reference_parity import _load_reference_hrnet_module

    hrnet_mod = _load_reference_hrnet_module()
    sys.modules["posetimation.backbones"] = types.ModuleType(
        "posetimation.backbones"
    )
    sys.modules["posetimation.backbones.hrnet"] = hrnet_mod

    # torchvision.ops.deform_conv.DeformConv2d -> real shim
    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    tv_ops = getattr(tv, "ops", None) or types.ModuleType("torchvision.ops")
    tv_dc = types.ModuleType("torchvision.ops.deform_conv")
    tv_dc.DeformConv2d = ShimDeformConv2d
    tv_ops.DeformConv2d = ShimDeformConv2d
    tv_ops.deform_conv = tv_dc
    tv.ops = tv_ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tv_ops
    sys.modules["torchvision.ops.deform_conv"] = tv_dc

    # kornia.geometry.warp_affine -> translation shim
    kornia = types.ModuleType("kornia")
    geometry = types.ModuleType("kornia.geometry")
    geometry.warp_affine = warp_affine_translation
    kornia.geometry = geometry
    sys.modules["kornia"] = kornia
    sys.modules["kornia.geometry"] = geometry

    # engine.defaults.TRAIN_PHASE
    eng_d = sys.modules["engine.defaults"]
    eng_d.TRAIN_PHASE = "train"

    path = os.path.join(REF, "posetimation/zoo/Alignment/Alignment_V15.py")
    spec = importlib.util.spec_from_file_location("reference_alignment", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["reference_alignment"] = mod
    spec.loader.exec_module(mod)
    return mod
