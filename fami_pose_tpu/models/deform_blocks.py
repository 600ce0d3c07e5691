"""Deformable residual block variants (reference ``posetimation/layers/
basic_model.py:151-349``): ``DeformableCONV``/``modulated_deform_conv``
(plain offset+mask-driven DCN), ``AdaptBlock`` (affine-matrix-parameterized
offsets), ``AdaptBlockV2`` (+ per-group masks), ``DeformBlock`` (offset-conv
driven). Present-but-unused by the shipped FAMI-Pose model; kept for
experiment-config parity. All use the TPU deformable conv
(``ops.pallas.dcn.make_deform_conv_fn`` fast paths / exact gather)."""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from fami_pose_tpu.ops.deform_conv import deform_conv2d

from .fami_pose import DeformConv
from .layers import BatchNorm, Downsample, activation

# 3x3 grid coordinates, (dy; dx) rows (basic_model.py:193-194)
_REGULAR = np.array(
    [[-1, -1, -1, 0, 0, 0, 1, 1, 1], [-1, 0, 1, -1, 0, 1, -1, 0, 1]],
    np.float32,
)


def _affine_offsets(transform, translation):
    """(N,H,W,4) 2x2 matrices + (N,H,W,2) translations -> (N,H,W,18) offsets
    in (dy, dx) interleaved order (AdaptBlock semantics)."""
    n, h, w, _ = transform.shape
    t = transform.reshape(n, h, w, 2, 2)
    reg = jnp.asarray(_REGULAR)  # (2, 9)
    off = jnp.einsum("nhwij,jk->nhwik", t, reg) - reg  # (N,H,W,2,9)
    off = off + translation[..., None]  # broadcast (dy, dx) translation
    # (N,H,W,2,9) -> (N,H,W,9,2) -> interleaved 18
    return off.transpose(0, 1, 2, 4, 3).reshape(n, h, w, 18)


class AdaptBlock(nn.Module):
    """Affine-parameterized deformable residual block
    (``basic_model.py:187-233``)."""

    features: int
    dilation: int = 1
    act: str = "ReLU"
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        transform = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32, name="transform_matrix_conv")(x)
        translation = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype,
                              param_dtype=jnp.float32, name="translation_conv")(x)
        offset = _affine_offsets(
            transform.astype(jnp.float32), translation.astype(jnp.float32)
        ).astype(x.dtype)
        out = DeformConv(
            self.features, padding=self.dilation, dilation=self.dilation,
            offset_groups=1, max_offset=None, dtype=self.dtype, name="adapt_conv",
        )(x, offset, None)
        out = BatchNorm(dtype=self.dtype, name="norm")(out, train)
        if self.has_downsample:
            residual = Downsample(self.features, dtype=self.dtype,
                                  name="downsample")(x, train)
        return activation(self.act)(out + residual)


class AdaptBlockV2(nn.Module):
    """AdaptBlock + per-group modulation masks (``basic_model.py:236-303``)."""

    features: int
    dilation: int = 1
    deformable_groups: int = 1
    act: str = "ReLU"
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        offsets, masks = [], []
        for i in range(self.deformable_groups):
            transform = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                                param_dtype=jnp.float32,
                                name=f"transform_matrix_conv{i}")(x)
            translation = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype,
                                  param_dtype=jnp.float32,
                                  name=f"translation_conv{i}")(x)
            offsets.append(
                _affine_offsets(
                    transform.astype(jnp.float32),
                    translation.astype(jnp.float32),
                ).astype(x.dtype)
            )
            masks.append(
                nn.Conv(9, (3, 3), padding=1, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"mask_conv{i}")(x)
            )
        offset = jnp.concatenate(offsets, axis=-1)
        mask = jnp.concatenate(masks, axis=-1)
        out = DeformConv(
            self.features, padding=self.dilation, dilation=self.dilation,
            offset_groups=self.deformable_groups, max_offset=None,
            dtype=self.dtype, name="adapt_conv",
        )(x, offset, mask)
        out = BatchNorm(dtype=self.dtype, name="norm")(out, train)
        if self.has_downsample:
            residual = Downsample(self.features, dtype=self.dtype,
                                  name="downsample")(x, train)
        return activation(self.act)(out + residual)


class DeformBlock(nn.Module):
    """Offset-conv-driven deformable residual block
    (``basic_model.py:305-349``)."""

    features: int
    dilation: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        offset = nn.Conv(
            18, (3, 3), padding=self.dilation, kernel_dilation=self.dilation,
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="offset_conv",
        )(x)
        out = DeformConv(
            self.features, padding=self.dilation, dilation=self.dilation,
            offset_groups=1, max_offset=None, dtype=self.dtype, name="adapt_conv",
        )(x, offset, None)
        out = BatchNorm(dtype=self.dtype, name="norm")(out, train)
        if self.has_downsample:
            residual = Downsample(self.features, dtype=self.dtype,
                                  name="downsample")(x, train)
        return nn.relu(out + residual)


def modulated_deform_conv(x, offset, mask, weight, bias=None, *, padding=1,
                          dilation=1, offset_groups=1):
    """Functional wrapper (reference ``modulated_deform_conv``/
    ``DeformableCONV``, ``basic_model.py:151-184``)."""
    return deform_conv2d(
        x, offset, mask, weight, bias, stride=1, padding=padding,
        dilation=dilation, offset_groups=offset_groups,
    )
