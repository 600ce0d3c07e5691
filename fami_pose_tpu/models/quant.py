"""Post-training int8 quantization for the eval path (``TPU.INT8_EVAL``).

The v5e MXU runs s8 x s8 -> s32 at 2x the bf16 rate; measured on the FAMI
backbone conv shapes (batch 160): 66 TOPS at C=48 vs 33.6 TFLOPs bf16, 145 vs
81 at C=96, 151 vs 102 at C=192, 194 vs 131 at C=384 (docs/PERFORMANCE.md,
round 3). The backbone convolutions are the largest bucket of the eval
forward, so a quantized backbone is the identified route past the bf16-parity
ceiling (~250-300 clips/s on v5e) toward the 500 clips/s target.

Scheme (standard per-tensor-activation / per-channel-weight PTQ):

  * **Weights**: symmetric per-output-channel scales computed from the f32
    parameters *at trace time* — no separate quantized checkpoint format; the
    one extra pass over the weights per call is noise next to the conv work.
  * **Activations**: symmetric per-tensor scales from a calibration pass.
    ``quant="calibrate"`` runs the normal f32/bf16 math and records each
    conv input's running absmax into the mutable ``quant_stats`` collection;
    :func:`quant_scales_from_stats` turns that into the ``quant`` collection
    that ``quant="int8"`` mode reads.
  * **Dequant** happens immediately after each conv in f32 (int32 partial
    sums up to 9*C*127^2 are exactly representable in f32, NOT in bf16), so
    BatchNorm/ReLU/residual adds are unchanged — XLA fuses the dequant
    multiply into the conv epilogue it already emits for BN.

This is an explicitly NON-PARITY serving mode: the bf16 path stays the
default and the parity anchor (reference eval forward:
``posetimation/zoo/Alignment/Alignment_V15.py:113-163``). The numerics delta
vs bf16 is measured by ``tools/int8_numerics.py`` and recorded in
docs/PERFORMANCE.md.
"""

from typing import Any, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

QUANT_OFF = "off"
QUANT_CALIBRATE = "calibrate"
QUANT_INT8 = "int8"
QUANT_MODES = (QUANT_OFF, QUANT_CALIBRATE, QUANT_INT8)


class QuantConv(nn.Module):
    """Drop-in for ``nn.Conv`` (NHWC, HWIO) with int8 eval support.

    The parameter tree (``kernel``/``bias`` directly under this module's
    name, lecun-normal / zeros init, f32) is identical to ``nn.Conv``'s, so
    checkpoints and the torch remap are mode-independent; ``quant="off"``
    reproduces ``nn.Conv``'s compute (cast x and params to ``dtype``, conv,
    add bias) exactly.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    kernel_dilation: Tuple[int, int] = (1, 1)
    feature_group_count: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32
    quant: str = QUANT_OFF

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1] // self.feature_group_count, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        padding = self.padding
        if padding == "VALID":
            padding = ((0, 0), (0, 0))

        if self.quant == QUANT_CALIBRATE:
            stat = self.variable(
                "quant_stats", "act_absmax", lambda: jnp.zeros((), jnp.float32)
            )
            stat.value = jnp.maximum(
                stat.value, jnp.max(jnp.abs(x)).astype(jnp.float32)
            )

        if self.quant == QUANT_INT8:
            # requires the 'quant' collection from quant_scales_from_stats;
            # the init default (1.0) only exists so model.init can trace
            act_scale = self.variable(
                "quant", "act_scale", lambda: jnp.ones((), jnp.float32)
            ).value
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) * (1.0 / act_scale)), -127, 127
            ).astype(jnp.int8)
            w_absmax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))  # (features,)
            w_scale = jnp.maximum(w_absmax, 1e-12) * (1.0 / 127.0)
            kq = jnp.round(kernel * (1.0 / w_scale)).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq,
                kq,
                self.strides,
                padding,
                rhs_dilation=self.kernel_dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.feature_group_count,
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * (w_scale * act_scale)
            if bias is not None:
                y = y + bias
            return y.astype(self.dtype)

        # off / calibrate: nn.Conv-equivalent compute
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            self.strides,
            padding,
            rhs_dilation=self.kernel_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
        )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


def conv2d(
    quant: str,
    features: int,
    kernel_size: Union[int, Tuple[int, int]],
    *,
    strides: Union[int, Tuple[int, int]] = 1,
    padding: Any = ((0, 0), (0, 0)),
    kernel_dilation: Union[int, Tuple[int, int]] = 1,
    groups: int = 1,
    use_bias: bool = False,
    dtype: Any = jnp.float32,
    name: str = None,
):
    """Conv factory: plain ``nn.Conv`` when ``quant == "off"`` (exact current
    behavior), :class:`QuantConv` otherwise. Both produce the same parameter
    tree under ``name``."""

    def _pair(v):
        return (int(v[0]), int(v[1])) if isinstance(v, (tuple, list)) else (int(v),) * 2

    ks = _pair(kernel_size)
    st = _pair(strides)
    kd = _pair(kernel_dilation)
    if quant == QUANT_OFF:
        return nn.Conv(
            features,
            kernel_size=ks,
            strides=st,
            padding=padding,
            kernel_dilation=kd,
            feature_group_count=groups,
            use_bias=use_bias,
            dtype=dtype,
            param_dtype=jnp.float32,
            name=name,
        )
    assert quant in QUANT_MODES, quant
    return QuantConv(
        features,
        kernel_size=ks,
        strides=st,
        padding=padding,
        kernel_dilation=kd,
        feature_group_count=groups,
        use_bias=use_bias,
        dtype=dtype,
        quant=quant,
        name=name,
    )


def quant_scales_from_stats(stats, margin: float = 1.0):
    """Convert a ``quant_stats`` collection (running ``act_absmax`` leaves)
    into the ``quant`` collection (``act_scale`` leaves) that int8 mode
    reads. ``margin`` > 1 leaves clipping headroom."""

    def walk(node):
        if not isinstance(node, dict):
            # flax FrozenDict behaves like a dict; anything else is a leaf
            raise TypeError(f"unexpected quant_stats node {type(node)}")
        out = {}
        for k, v in node.items():
            if k == "act_absmax":
                out["act_scale"] = jnp.maximum(
                    jnp.asarray(v, jnp.float32) * margin, 1e-12
                ) * (1.0 / 127.0)
            else:
                out[k] = walk(v)
        return out

    if hasattr(stats, "unfreeze"):
        stats = stats.unfreeze()
    return walk(stats)


def calibrate(model, variables, batches, margin: float = 1.0, **apply_kwargs):
    """Run calibration forwards and return the ``quant`` collection.

    ``model`` must have been constructed with ``quant="calibrate"``;
    ``batches`` is an iterable of argument tuples for ``model.apply``.
    """
    base = dict(variables)
    base.pop("quant_stats", None)
    stats = None
    for args in batches:
        vs = dict(base)
        if stats is not None:
            vs["quant_stats"] = stats
        _, mut = model.apply(vs, *args, mutable=["quant_stats"], **apply_kwargs)
        stats = mut["quant_stats"]
    if stats is None:
        raise ValueError("calibrate() needs at least one batch")
    return quant_scales_from_stats(stats, margin=margin)
