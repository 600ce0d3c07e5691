"""NN layer library, TPU-native (flax.linen, NHWC, bf16-friendly).

Functional re-design of the reference layer zoo
(``posetimation/layers/basic_layer.py:13-123`` and ``basic_model.py:25-150``):
same computational graph (conv/BN/act residual blocks) but NHWC layout for XLA
TPU convolution efficiency, explicit BatchNorm state threading, and a
``dtype``/``param_dtype`` split so the backbone runs in bfloat16 on the MXU
while parameters and BN statistics stay float32.

PyTorch parity notes:
  * ``nn.BatchNorm2d(momentum=0.1)`` == linen ``BatchNorm(momentum=0.9)``
    (PyTorch's momentum is the *update* fraction, flax's is the *retain*
    fraction); epsilon 1e-5 in both.
  * Convolutions carry no bias wherever the reference's do not.
  * Weight layouts: torch OIHW -> flax HWIO (see ``torch_remap.py``).
"""

from typing import Any, Callable, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from .quant import conv2d

BN_MOMENTUM = 0.9  # retain fraction == 1 - torch's 0.1
BN_EPS = 1e-5


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def activation(name: str) -> Callable:
    if name == "ReLU":
        return nn.relu
    if name == "LeakyReLU":
        # reference uses negative_slope 0.1 inside BasicBlock
        return lambda x: nn.leaky_relu(x, negative_slope=0.1)
    if name == "SiLU":
        return nn.silu
    raise ValueError(f"Unsupported activation {name!r}")


class BatchNorm(nn.Module):
    """BatchNorm2d equivalent over the channel (last) axis."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)


class ConvBnAct(nn.Module):
    """conv + optional BN + optional activation.

    Mirrors ``conv_bn_relu`` (``basic_layer.py:13-76``): bias on by default
    (the reference's ``has_bias=True`` default), BN momentum 0.1 (torch).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 1
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    has_bias: bool = True
    has_bn: bool = True
    has_act: bool = True
    act: str = "ReLU"
    dtype: Any = jnp.float32
    quant: str = "off"  # int8 eval support, see models/quant.py

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        d = _pair(self.dilation)
        x = conv2d(
            self.quant,
            self.features,
            kernel_size=k,
            strides=s,
            padding=((p[0], p[0]), (p[1], p[1])),
            kernel_dilation=d,
            groups=self.groups,
            use_bias=self.has_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.has_bn:
            x = BatchNorm(dtype=self.dtype, name="norm")(x, train)
        if self.has_act:
            x = activation(self.act)(x)
        return x


class Interpolate(nn.Module):
    """Nearest-neighbor upsample by an integer factor (``basic_model.py:116-126``)."""

    scale_factor: int

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        f = int(self.scale_factor)
        x = jnp.repeat(x, f, axis=1)
        x = jnp.repeat(x, f, axis=2)
        return x


class Downsample(nn.Module):
    """1x1 (or strided) conv + optional BN shortcut used by residual blocks."""

    features: int
    stride: int = 1
    has_bn: bool = True
    kernel_size: int = 1
    dtype: Any = jnp.float32
    quant: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = _pair(self.kernel_size)
        x = conv2d(
            self.quant,
            self.features,
            kernel_size=k,
            strides=_pair(self.stride),
            padding="VALID" if k == (1, 1) else ((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.has_bn:
            x = BatchNorm(dtype=self.dtype, name="norm")(x, train)
        return x


class BasicBlock(nn.Module):
    """Two 3x3 convs + residual (``basic_model.py:25-64``). expansion = 1."""

    features: int
    stride: int = 1
    has_downsample: bool = False
    groups: int = 1
    skip_norm: bool = False
    act: str = "ReLU"
    dtype: Any = jnp.float32
    quant: str = "off"

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = activation(self.act)
        residual = x
        out = conv2d(
            self.quant, self.features, (3, 3), strides=_pair(self.stride),
            padding=((1, 1), (1, 1)), groups=self.groups,
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        if not self.skip_norm:
            out = BatchNorm(dtype=self.dtype, name="norm1")(out, train)
        out = act(out)
        # NOTE: the reference passes `stride` to conv2 as well (basic_model.py:37)
        out = conv2d(
            self.quant, self.features, (3, 3), strides=_pair(self.stride),
            padding=((1, 1), (1, 1)), groups=self.groups,
            use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        if not self.skip_norm:
            out = BatchNorm(dtype=self.dtype, name="norm2")(out, train)
        if self.has_downsample:
            residual = Downsample(
                self.features, stride=self.stride, has_bn=not self.skip_norm,
                dtype=self.dtype, quant=self.quant, name="downsample",
            )(x, train)
        return act(out + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1(x4) + residual (``basic_model.py:66-113``). expansion = 4."""

    features: int  # bottleneck width; output features = features * 4
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32
    quant: str = "off"

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = conv2d(
            self.quant, self.features, (1, 1), use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        out = BatchNorm(dtype=self.dtype, name="norm1")(out, train)
        out = nn.relu(out)
        out = conv2d(
            self.quant, self.features, (3, 3), strides=_pair(self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
            name="conv2",
        )(out)
        out = BatchNorm(dtype=self.dtype, name="norm2")(out, train)
        out = nn.relu(out)
        out = conv2d(
            self.quant, self.features * self.expansion, (1, 1),
            use_bias=False, dtype=self.dtype, name="conv3",
        )(out)
        out = BatchNorm(dtype=self.dtype, name="norm3")(out, train)
        if self.has_downsample:
            residual = Downsample(
                self.features * self.expansion, stride=self.stride,
                dtype=self.dtype, quant=self.quant, name="downsample",
            )(x, train)
        return nn.relu(out + residual)


class ChainOfBasicBlocks(nn.Module):
    """1x1-downsample head + N BasicBlocks (``basic_model.py:128-150``)."""

    features: int
    num_blocks: int = 1
    groups: int = 1
    skip_norm: bool = False
    act: str = "ReLU"
    dtype: Any = jnp.float32
    quant: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicBlock(
            self.features, stride=1, has_downsample=True, groups=self.groups,
            skip_norm=self.skip_norm, act=self.act, dtype=self.dtype,
            quant=self.quant, name="block0",
        )(x, train)
        for i in range(1, self.num_blocks):
            x = BasicBlock(
                self.features, stride=1, has_downsample=False,
                groups=self.groups, skip_norm=self.skip_norm, act=self.act,
                dtype=self.dtype, quant=self.quant, name=f"block{i}",
            )(x, train)
        return x
