"""HRNet / HRNet-W48 backbone, TPU-native (flax.linen, NHWC).

Re-design of the reference backbone (``posetimation/backbones/hrnet.py:17-869``):
same multi-resolution topology — stem (2x stride-2 3x3 convs to 1/4 res),
``layer1`` of 4 Bottlenecks, stages 2/3/4 of parallel-branch
``HighResolutionModule`` s with sum-fusion (1x1 conv + nearest upsample for
coarse->fine, strided 3x3 conv chains for fine->coarse), transitions that grow
a new branch from the previous stage's coarsest branch, and a 1x1
``final_layer`` to NUM_JOINTS heatmaps — but expressed functionally in NHWC
with static Python loops (unrolled at trace time, so XLA sees one flat conv
graph it can fuse and tile onto the MXU).

The stage topology comes from ``cfg.MODEL.EXTRA`` exactly as in the reference
YAML (``configs/Alignment/Base_PoseTrack17.yaml:45-90``).

Forward contract (matching ``HRNetPlus.forward``, ``hrnet.py:632-684``):
returns ``(heatmaps, feature_list)`` where ``feature_list[0]`` is the
highest-resolution (1/4, 48-channel for W48) fused feature map. ``mode``
selects partial forwards: "full" (default), "features" (no final layer,
returns feature only — the reference's ``heatmap=False``), "stage2"
(stem+layer1+stage2 branch-0 — the reference's ``similar=True``).
"""

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import BasicBlock, BatchNorm, Bottleneck, Interpolate, _pair
from .quant import conv2d

BLOCKS = {"BASIC": BasicBlock, "BOTTLENECK": Bottleneck}


def _conv(features, k, s=1, name=None, dtype=jnp.float32, quant="off"):
    p = (k - 1) // 2
    return conv2d(
        quant, features, (k, k), strides=(s, s), padding=((p, p), (p, p)),
        use_bias=False, dtype=dtype, name=name,
    )


class Branch(nn.Module):
    """A chain of residual blocks at one resolution (``hrnet.py:43-78``)."""

    block: str
    num_blocks: int
    features: int
    in_features: int
    dtype: Any = jnp.float32
    quant: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        blk = BLOCKS[self.block]
        out_feats = self.features * blk.expansion
        x = blk(
            self.features, stride=1,
            has_downsample=(self.in_features != out_feats),
            dtype=self.dtype, quant=self.quant, name="block0",
        )(x, train)
        for i in range(1, self.num_blocks):
            x = blk(
                self.features, dtype=self.dtype, quant=self.quant,
                name=f"block{i}",
            )(x, train)
        return x


class FuseLayer(nn.Module):
    """Resolution converter branch j -> branch i (``hrnet.py:90-146``)."""

    i: int
    j: int
    in_features: Sequence[int]
    dtype: Any = jnp.float32
    quant: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        i, j = self.i, self.j
        if j > i:
            # coarse -> fine: 1x1 conv + BN, then nearest upsample 2^(j-i)
            x = conv2d(
                self.quant, self.in_features[i], (1, 1), use_bias=False,
                dtype=self.dtype, name="conv",
            )(x)
            x = BatchNorm(dtype=self.dtype, name="norm")(x, train)
            x = Interpolate(scale_factor=2 ** (j - i))(x)
            return x
        # fine -> coarse: (i-j) stride-2 3x3 conv+BN, ReLU between (not after last)
        for k in range(i - j):
            last = k == i - j - 1
            feats = self.in_features[i] if last else self.in_features[j]
            x = _conv(
                feats, 3, 2, name=f"conv{k}", dtype=self.dtype,
                quant=self.quant,
            )(x)
            x = BatchNorm(dtype=self.dtype, name=f"norm{k}")(x, train)
            if not last:
                x = nn.relu(x)
        return x


class HighResolutionModule(nn.Module):
    """Parallel branches + all-to-all sum fusion (``hrnet.py:17-175``)."""

    num_branches: int
    block: str
    num_blocks: Sequence[int]
    num_channels: Sequence[int]
    in_features: Sequence[int]
    multi_scale_output: bool = True
    dtype: Any = jnp.float32
    quant: str = "off"

    @nn.compact
    def __call__(self, xs: List, train: bool = False):
        blk = BLOCKS[self.block]
        out_features = [c * blk.expansion for c in self.num_channels]
        xs = [
            Branch(
                self.block, self.num_blocks[i], self.num_channels[i],
                self.in_features[i], dtype=self.dtype, quant=self.quant,
                name=f"branch{i}",
            )(xs[i], train)
            for i in range(self.num_branches)
        ]
        if self.num_branches == 1:
            return xs
        n_out = self.num_branches if self.multi_scale_output else 1
        fused = []
        for i in range(n_out):
            y = None
            for j in range(self.num_branches):
                t = (
                    xs[j]
                    if j == i
                    else FuseLayer(
                        i, j, out_features, dtype=self.dtype,
                        quant=self.quant, name=f"fuse{i}_{j}",
                    )(xs[j], train)
                )
                y = t if y is None else y + t
            fused.append(nn.relu(y))
        # NOTE: the reference's `stage4_module3` aux-feature append
        # (`hrnet.py:169-170`) is dead code — `_make_stage` never passes a
        # module name (`hrnet.py:709-718`) — so it is intentionally omitted.
        return fused


class Transition(nn.Module):
    """Stage transition: channel-adapt existing branches, grow new ones
    from the coarsest previous branch (``hrnet.py:372-410``)."""

    prev_features: Sequence[int]
    new_features: Sequence[int]
    dtype: Any = jnp.float32
    quant: str = "off"

    @nn.compact
    def __call__(self, xs: List, train: bool = False):
        out = []
        for i, feats in enumerate(self.new_features):
            if i < len(self.prev_features):
                if feats != self.prev_features[i]:
                    x = _conv(
                        feats, 3, 1, name=f"adapt{i}", dtype=self.dtype,
                        quant=self.quant,
                    )(xs[i])
                    x = BatchNorm(dtype=self.dtype, name=f"adapt{i}_norm")(x, train)
                    out.append(nn.relu(x))
                else:
                    out.append(xs[i])
            else:
                # new branch: chain of stride-2 convs from the coarsest input
                x = xs[-1]
                for k in range(i + 1 - len(self.prev_features)):
                    last = k == i - len(self.prev_features)
                    f = feats if last else self.prev_features[-1]
                    x = _conv(
                        f, 3, 2, name=f"new{i}_{k}", dtype=self.dtype,
                        quant=self.quant,
                    )(x)
                    x = BatchNorm(dtype=self.dtype, name=f"new{i}_{k}_norm")(x, train)
                    x = nn.relu(x)
                out.append(x)
        return out


class HRNet(nn.Module):
    """Config-driven HRNet with heatmap head.

    ``extra`` is the ``cfg.MODEL.EXTRA`` dict (STAGE2/3/4 sub-trees +
    FINAL_CONV_KERNEL); ``num_joints`` sizes the final 1x1 conv.
    """

    extra: Dict
    num_joints: int = 17
    dtype: Any = jnp.float32
    # int8 eval mode for every backbone conv (NOT final_layer, which feeds
    # the decode path and the MI estimators); see models/quant.py
    quant: str = "off"
    # rematerialize each HighResolutionModule in the backward pass
    # (jax.checkpoint via nn.remat): trades ~30% recompute for dropping the
    # dominant share of training activation memory
    remat: bool = False

    def _stage_cfg(self, name):
        s = self.extra[name]
        return (
            int(s["NUM_MODULES"]), int(s["NUM_BRANCHES"]), str(s["BLOCK"]),
            [int(b) for b in s["NUM_BLOCKS"]], [int(c) for c in s["NUM_CHANNELS"]],
        )

    @nn.compact
    def __call__(self, x, train: bool = False, mode: str = "full"):
        dt = self.dtype
        q = self.quant
        x = x.astype(dt)
        # stem: 1/4 resolution (hrnet.py:581-588)
        x = _conv(64, 3, 2, name="stem_conv1", dtype=dt, quant=q)(x)
        x = BatchNorm(dtype=dt, name="stem_norm1")(x, train)
        x = nn.relu(x)
        x = _conv(64, 3, 2, name="stem_conv2", dtype=dt, quant=q)(x)
        x = BatchNorm(dtype=dt, name="stem_norm2")(x, train)
        x = nn.relu(x)

        # layer1: 4 Bottlenecks 64->256 (hrnet.py:589)
        x = Bottleneck(
            64, has_downsample=True, dtype=dt, quant=q, name="layer1_block0"
        )(x, train)
        for i in range(1, 4):
            x = Bottleneck(64, dtype=dt, quant=q, name=f"layer1_block{i}")(x, train)

        prev_feats = [256]
        xs = [x]
        stages = ["STAGE2", "STAGE3", "STAGE4"]
        for si, sname in enumerate(stages):
            n_mod, n_br, block, n_blocks, n_chans = self._stage_cfg(sname)
            out_feats = [c * BLOCKS[block].expansion for c in n_chans]
            xs = Transition(
                prev_feats, out_feats, dtype=dt, quant=q,
                name=f"transition{si + 1}",
            )(xs, train)
            last_stage = sname == stages[-1]
            mod_cls = (
                nn.remat(HighResolutionModule, static_argnums=(2,))
                if self.remat
                else HighResolutionModule
            )
            for m in range(n_mod):
                multi = True
                if last_stage and m == n_mod - 1 and mode != "multi":
                    multi = False
                xs = mod_cls(
                    n_br, block, n_blocks, n_chans, out_feats,
                    multi_scale_output=multi, dtype=dt, quant=q,
                    name=f"{sname.lower()}_module{m}",
                )(xs, train)
            prev_feats = out_feats
            if sname == "STAGE2" and mode == "stage2":
                return xs[0]

        features = xs
        if mode == "features":
            return features[0]
        heatmaps = self.final_layer(features[0])
        return heatmaps, features

    @nn.compact_name_scope
    def final_layer(self, x):
        """1x1 (or 3x3) conv -> joint heatmaps; exposed separately because the
        MI estimators reuse it on non-backbone features
        (``Alignment_V15.py:258``)."""
        k = int(self.extra.get("FINAL_CONV_KERNEL", 1))
        p = 1 if k == 3 else 0
        return nn.Conv(
            self.num_joints, (k, k), padding=((p, p), (p, p)), use_bias=True,
            dtype=self.dtype, param_dtype=jnp.float32, name="final_conv",
        )(x)


# Standard W48 EXTRA tree (configs/Alignment/Base_PoseTrack17.yaml:45-90) for
# programmatic use without a YAML file.
W48_EXTRA = {
    "FINAL_CONV_KERNEL": 1,
    "STAGE2": {
        "NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
        "NUM_BLOCKS": [4, 4], "NUM_CHANNELS": [48, 96], "FUSE_METHOD": "SUM",
    },
    "STAGE3": {
        "NUM_MODULES": 4, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
        "NUM_BLOCKS": [4, 4, 4], "NUM_CHANNELS": [48, 96, 192],
        "FUSE_METHOD": "SUM",
    },
    "STAGE4": {
        "NUM_MODULES": 3, "NUM_BRANCHES": 4, "BLOCK": "BASIC",
        "NUM_BLOCKS": [4, 4, 4, 4], "NUM_CHANNELS": [48, 96, 192, 384],
        "FUSE_METHOD": "SUM",
    },
}

# A tiny topology for fast CPU tests.
TINY_EXTRA = {
    "FINAL_CONV_KERNEL": 1,
    "STAGE2": {
        "NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
        "NUM_BLOCKS": [1, 1], "NUM_CHANNELS": [8, 16], "FUSE_METHOD": "SUM",
    },
    "STAGE3": {
        "NUM_MODULES": 1, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
        "NUM_BLOCKS": [1, 1, 1], "NUM_CHANNELS": [8, 16, 32],
        "FUSE_METHOD": "SUM",
    },
    "STAGE4": {
        "NUM_MODULES": 1, "NUM_BRANCHES": 4, "BLOCK": "BASIC",
        "NUM_BLOCKS": [1, 1, 1, 1], "NUM_CHANNELS": [8, 16, 32, 64],
        "FUSE_METHOD": "SUM",
    },
}
