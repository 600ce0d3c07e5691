"""FAMIPose: multi-frame pose model with hierarchical feature alignment + MI.

TPU-native re-design of the reference's shipped model ``Alignment_V15``
(``posetimation/zoo/Alignment/Alignment_V15.py:24-301``):

  * N supporting frames are folded into the batch dimension and pushed through
    one shared HRNet pass together with the key frame (``:113-122``) — on TPU
    this is exactly the right shape story: one big NHWC conv batch on the MXU.
  * **Global alignment** per sup frame: a small conv+MLP head on the feature
    difference predicts a 2-D translation, applied with a differentiable
    bilinear warp (``:130-137``; kornia.warp_affine -> ops.warp.warp_translate).
  * **Local alignment**: four stacked modulated deformable-conv stages (3x3,
    dilation 3, 12 offset groups -> 216 offset / 108 mask channels), masks fed
    raw exactly like the reference (``:74-101,143-158``), computed by
    ``ops.deform_conv.deform_conv2d`` (im2col-by-gather + one MXU matmul).
  * Fusion + final 3x3 conv to NUM_JOINTS heatmaps (``:104-106,160-163``).
  * Train mode adds the 6-term mutual-information estimates (softmax-KL with
    temperature 0.05, stop-gradient on the estimator side, ``:250-277``).

Contract fix (SURVEY §2.7): the reference's training loop unpacks FOUR outputs
``(pred, warped_sup_hm_list, kf_bb_hm, mi_list)`` (``alignment_mi_function_
term6_1.py:104``) while Alignment_V15 returns three. Here the intended 4-tuple
is honored: each sup frame's globally-aligned feature is decoded through the
(shared) HRNet final layer into a per-sup warped heatmap for auxiliary
supervision.

``num_sup`` is ``2 * (DISTANCE - 1)`` (two prev + two next at DISTANCE=3 —
see the window logic at ``PoseTrack_Alignment.py:311-359``); the reference
hardcodes the resulting ``48*4`` aggregation width, here it is derived.
"""

import functools
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fami_pose_tpu.ops.deform_conv import deform_conv2d, deform_conv2d_windowed
from fami_pose_tpu.ops.warp import warp_translate
from fami_pose_tpu.utils.registry import MODEL_REGISTRY, TRAIN_PHASE

from .hrnet import HRNet
from .layers import ChainOfBasicBlocks, ConvBnAct

MI_TEMPERATURE = 0.05
DCN_KERNEL = 3
DCN_DILATION = 3
DCN_OFFSET_GROUPS = 12


class _CFConvParams(nn.Module):
    """Conv emitting NCHW with output channels permuted at call time.

    Parameters live under this module's scope as ``kernel``/``bias`` with
    the CANONICAL ([g][k][(dy,dx)]) output order — identical tree and init
    to the ``nn.Conv`` inside :class:`ConvBnAct`, so checkpoints and the
    reference remap are layout-independent of ``aux_channel_first``."""

    features: int
    kernel_size: int
    padding: int
    dilation: int
    perm: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        # keep the permutation a STATIC numpy index: under jit,
        # jnp.asarray(np_array) is a tracer (constant tracing), and indexing
        # a closed-over numpy param (e.g. checkpoint-loaded variables) with a
        # tracer raises TracerArrayConversionError; static fancy-indexing
        # works for numpy and tracer kernels alike and lets XLA fold the
        # gather into the conv weight constant
        perm = np.asarray(self.perm)
        p, d = self.padding, self.dilation
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel[..., perm].astype(self.dtype),
            (1, 1), [(p, p), (p, p)], rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NCHW"),
        )
        return y + bias[perm][None, :, None, None].astype(self.dtype)


class ChannelFirstAuxConv(nn.Module):
    """Wrapper giving the ``<name>/conv/{kernel,bias}`` param path that
    ``ConvBnAct`` produces (``has_bn=False, has_act=False`` case)."""

    features: int
    kernel_size: int
    padding: int
    dilation: int
    perm: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return _CFConvParams(
            self.features, self.kernel_size, self.padding, self.dilation,
            self.perm, dtype=self.dtype, name="conv",
        )(x)


class DeformConv(nn.Module):
    """Learnable-weight modulated deformable conv (torchvision
    ``DeformConv2d`` equivalent: weight + bias; offsets/mask are inputs)."""

    features: int
    kernel_size: int = DCN_KERNEL
    padding: int = DCN_DILATION
    dilation: int = DCN_DILATION
    offset_groups: int = DCN_OFFSET_GROUPS
    # bounded-offset TPU fast path (ops.deform_conv.deform_conv2d_windowed,
    # or the fused Pallas kernel when use_pallas); None selects the exact
    # gather-based implementation
    max_offset: Any = 6
    use_pallas: bool = False
    # offsets/mask arrive (N, 2GK/GK, H, W) kernel-major (Pallas-staging
    # layout; skips the 6-D transpose relayouts in the DCN prep)
    aux_channel_first: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, offset, mask):
        # <=0 means "exact gather path", same as None (mirrors
        # FAMIPose.from_config so direct construction can't select a
        # degenerate d_max=0 window — ADVICE r2)
        max_offset = self.max_offset
        if max_offset is not None and int(max_offset) <= 0:
            max_offset = None
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        args = (
            x.astype(self.dtype),
            offset.astype(self.dtype),
            mask.astype(self.dtype) if mask is not None else None,
            kernel.astype(self.dtype),
            bias.astype(self.dtype),
        )
        if max_offset is not None:
            from fami_pose_tpu.ops.pallas.dcn import make_deform_conv_fn

            fn = make_deform_conv_fn(
                padding=self.padding,
                dilation=self.dilation,
                offset_groups=self.offset_groups,
                max_offset=int(max_offset),
                use_pallas=self.use_pallas,
                aux_channel_first=self.aux_channel_first,
            )
            return fn(*args)
        assert not self.aux_channel_first
        return deform_conv2d(
            *args,
            stride=1,
            padding=self.padding,
            dilation=self.dilation,
            offset_groups=self.offset_groups,
        )


class GlobalOffsetHead(nn.Module):
    """Feature-difference -> 2-D translation (``Alignment_V15.py:61-72``).

    ChainOfBasicBlocks(48->16) + 5 stride-2 convs + 3 linear layers (no
    activations between the linears, matching the reference)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ChainOfBasicBlocks(16, num_blocks=1, dtype=self.dtype, name="chain")(
            x, train
        )
        for i in range(5):
            x = ConvBnAct(
                16, kernel_size=3, stride=2, padding=1, dtype=self.dtype,
                name=f"down{i}",
            )(x, train)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(64, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        x = nn.Dense(64, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(x)
        x = nn.Dense(2, dtype=self.dtype, param_dtype=jnp.float32, name="fc3")(x)
        return x


class FAMIPose(nn.Module):
    """The flagship model. Inputs are NHWC: key frame (B, H, W, 3) and
    supporting frames (B, H, W, 3*N) channel-stacked like the reference's
    CHW concat (``PoseTrack_Alignment.py:116-126``)."""

    extra: Dict
    num_joints: int = 17
    dtype: Any = jnp.float32
    feat_channels: int = 48
    dcn_offset_groups: int = DCN_OFFSET_GROUPS
    dcn_max_offset: Any = 6
    use_pallas_dcn: bool = False
    # emit offset/mask convs in the Pallas kernel-major NCHW layout
    # (skips the DCN prep's 6-D transpose relayouts; fast path only)
    dcn_aux_channel_first: bool = True
    # jax.checkpoint each backbone stage module: the (N+1)-frame HRNet
    # activations dominate training HBM (29.5 GB unrematted at batch 8)
    remat_backbone: bool = False
    # int8 serving mode for the backbone convs ("off" | "calibrate" | "int8");
    # non-parity eval fast path, see models/quant.py + TPU.INT8_EVAL
    backbone_quant: str = "off"
    # global-alignment warp implementation: "slice" (vmapped dynamic_slice,
    # the parity reference), "matmul" (MXU selection-matrix form — 5.6x on
    # chip, identical semantics; see ops.warp.warp_translate_matmul), or
    # "pallas" (fused kernel, ops/pallas/warp.py — matches matmul op-level
    # but its custom-call layout constraint is slower in-graph)
    warp_impl: str = "matmul"
    # clamp for translations under matmul/pallas ("slice" clamps at 32)
    warp_max_shift: int = 26

    @classmethod
    def from_config(cls, cfg, phase: str = TRAIN_PHASE, **kwargs):
        dtype = (
            jnp.bfloat16
            if str(cfg.TPU.COMPUTE_DTYPE) in ("bfloat16", "bf16")
            else jnp.float32
        )
        extra = cfg.MODEL.EXTRA
        if hasattr(extra, "to_dict"):
            extra = extra.to_dict()
        if "STAGE2" not in extra:
            # YAMLs that omit EXTRA get the standard W48 topology
            from .hrnet import W48_EXTRA

            extra = dict(W48_EXTRA)
        stage2 = extra["STAGE2"]["NUM_CHANNELS"][0]
        max_off = cfg.TPU.DCN_MAX_OFFSET if hasattr(cfg.TPU, "DCN_MAX_OFFSET") else 6
        # DCN_MAX_OFFSET <= 0 (or null) selects the exact unbounded gather
        # implementation — torchvision-bit-faithful parity mode, slow on TPU
        # (docs/DCN_OFFSET_BOUND.md)
        if max_off is not None and int(max_off) <= 0:
            max_off = None
        groups = (
            int(cfg.TPU.DCN_OFFSET_GROUPS)
            if hasattr(cfg.TPU, "DCN_OFFSET_GROUPS")
            else DCN_OFFSET_GROUPS
        )
        # int8 serving mode: eval phases only (training stays bf16/f32)
        backbone_quant = "off"
        if bool(getattr(cfg.TPU, "INT8_EVAL", False)) and phase != TRAIN_PHASE:
            backbone_quant = "int8"
        return cls(
            extra=extra,
            num_joints=int(cfg.MODEL.NUM_JOINTS),
            dtype=dtype,
            feat_channels=int(stage2),
            dcn_offset_groups=groups,
            dcn_max_offset=max_off,
            use_pallas_dcn=bool(cfg.TPU.USE_PALLAS_DCN),
            dcn_aux_channel_first=bool(
                getattr(cfg.TPU, "DCN_AUX_CHANNEL_FIRST", True)
            ),
            remat_backbone=bool(cfg.TPU.REMAT_BACKBONE),
            backbone_quant=backbone_quant,
            warp_impl=str(getattr(cfg.TPU, "WARP_IMPL", "matmul")),
            warp_max_shift=int(getattr(cfg.TPU, "WARP_MAX_SHIFT", 26)),
        )

    @staticmethod
    def get_model_hyper_parameters(cfg) -> str:
        """Output-dir identity string (``Alignment_V15.py:27-45``)."""
        bbox_factor = cfg.DATASET.BBOX_ENLARGE_FACTOR
        rot_factor = cfg.TRAIN.ROT_FACTOR
        sf = cfg.TRAIN.SCALE_FACTOR
        if not isinstance(sf, (list, tuple)):
            sf = [sf, sf]
        param = f"bbox_{bbox_factor}_rot_{rot_factor}_scale_{1 - sf[0]}-{1 + sf[1]}"
        if cfg.LOSS.HEATMAP_MSE.USE:
            param += f"_MseLoss_{cfg.LOSS.HEATMAP_MSE.WEIGHT}"
        return param

    @nn.compact
    def __call__(self, kf_x, sup_x, train: bool = False, mode: str = "full"):
        """``mode`` selects the serving split (streaming feature cache):

          * ``"full"`` — the reference contract: ``(kf_x, sup_x)`` images in,
            heatmaps out. Internally = ``features`` on the folded frame batch
            followed by ``head`` (exact composition, tested bitwise).
          * ``"features"`` — ``kf_x`` is a flat frame batch ``(M, H, W, 3)``
            (``sup_x`` ignored, pass ``None``); returns the per-frame backbone
            outputs ``(bb_hm, feat)``. In video serving these are computed
            ONCE per frame and cached across the ~(1+num_sup) sliding windows
            each frame appears in (engine/streaming.py) — the reference
            recomputes them per keyframe (``Alignment_V15.py:113-122``).
          * ``"head"`` — eval-only: ``kf_x`` is the folded feature array
            ``((1+num_sup)*B, Hf, Wf, C)`` laid out ``[key, sup1, ...]`` like
            the full path's fold; ``sup_x`` is the key frame's backbone
            heatmap ``(B, Hh, Wh, J)``. Returns ``(final_hm, kf_bb_hm)``.
        """
        if mode == "features":
            hrnet = HRNet(
                extra=self.extra, num_joints=self.num_joints,
                dtype=self.dtype, remat=self.remat_backbone,
                quant=self.backbone_quant, name="hrnet",
            )
            bb_hm, bb_feats = hrnet(kf_x, train)
            return bb_hm, bb_feats[0]
        if mode == "head":
            assert not train, "head mode is a serving (eval-only) path"
            feat = kf_x
            kf_bb_hm = sup_x
            b = kf_bb_hm.shape[0]
            num_sup = feat.shape[0] // b - 1
            return self._head(feat, kf_bb_hm, b, num_sup, False, None)
        assert mode == "full", mode
        b = kf_x.shape[0]
        num_sup = sup_x.shape[-1] // 3
        hrnet = HRNet(
            extra=self.extra, num_joints=self.num_joints, dtype=self.dtype,
            remat=self.remat_backbone, quant=self.backbone_quant, name="hrnet",
        )

        # fold sup frames into the batch: one shared backbone pass
        sups = jnp.split(sup_x, num_sup, axis=-1)
        x = jnp.concatenate([kf_x] + list(sups), axis=0)
        bb_hm, bb_feats = hrnet(x, train)
        feat = bb_feats[0]
        kf_bb_hm = bb_hm[:b]
        return self._head(feat, kf_bb_hm, b, num_sup, train, hrnet)

    def _head(self, feat, kf_bb_hm, b, num_sup, train, hrnet):
        """Everything after the backbone (global + local alignment, fusion,
        final heatmap, train-mode MI terms). Called from the compact
        ``__call__`` only; submodule names are unchanged from round 1/2 so
        checkpoints and the torch remap are unaffected."""
        c = self.feat_channels
        # normalize <=0 -> None (exact gather path) here as well as in
        # from_config, so direct construction behaves identically (ADVICE r2)
        dcn_max_offset = self.dcn_max_offset
        if dcn_max_offset is not None and int(dcn_max_offset) <= 0:
            dcn_max_offset = None
        kf_feat = feat[:b]
        sup_feats = [feat[(i + 1) * b : (i + 2) * b] for i in range(num_sup)]

        offset_head = GlobalOffsetHead(dtype=self.dtype, name="global_offset")
        if self.warp_impl == "matmul":
            from fami_pose_tpu.ops.warp import warp_translate_matmul

            warp_fn = functools.partial(
                warp_translate_matmul, max_shift=self.warp_max_shift
            )
        elif self.warp_impl == "pallas":
            from fami_pose_tpu.ops.pallas.warp import make_warp_translate_fn

            warp_fn = make_warp_translate_fn(max_shift=self.warp_max_shift)
        else:
            assert self.warp_impl == "slice", self.warp_impl
            warp_fn = warp_translate
        sup_warped_hms = []
        if train:
            # per-sup calls, like the reference loop (Alignment_V15.py:127-141):
            # BatchNorm batch statistics are computed per sup frame
            aligned = []
            for i in range(num_sup):
                off = offset_head(sup_feats[i] - kf_feat, train)  # (B, 2)
                ga = warp_fn(sup_feats[i], off)
                aligned.append(ga)
                # per-sup auxiliary heatmap through the shared final layer
                # (4-output contract, alignment_mi_function_term6_1.py:104,112-116)
                sup_warped_hms.append(hrnet.final_layer(ga))
        else:
            # eval: BN uses running averages, so folding the sup frames into
            # one (num_sup*B) batch is bit-equivalent — one offset-head graph
            # and one warp instead of num_sup of each
            all_sup = feat[b:]  # sup features are contiguous after kf
            diffs = all_sup - jnp.tile(kf_feat, (num_sup, 1, 1, 1))
            offs = offset_head(diffs, train)  # (num_sup*B, 2)
            ga_all = warp_fn(all_sup, offs)
            aligned = [ga_all[i * b : (i + 1) * b] for i in range(num_sup)]

        # the head chains share the backbone's int8 serving mode (their
        # BasicBlocks run at the same 1/4-res widths as the stage-2 branch)
        agg_sup = ChainOfBasicBlocks(
            c, num_blocks=2, dtype=self.dtype, quant=self.backbone_quant,
            name="sup_agg_block"
        )(jnp.concatenate(aligned, axis=-1), train)

        combined = ChainOfBasicBlocks(
            c, num_blocks=1, dtype=self.dtype, quant=self.backbone_quant,
            name="combined_feat_layers"
        )(jnp.concatenate([agg_sup, kf_feat], axis=-1), train)

        # channel-first auxiliaries: the offset/mask convs emit the Pallas
        # staging layout directly (valid only on the fused-kernel fast path)
        aux_cf = bool(
            self.use_pallas_dcn
            and self.dcn_aux_channel_first
            and dcn_max_offset is not None
        )
        if aux_cf:
            from fami_pose_tpu.ops.deform_conv import aux_cf_perms

            off_perm, msk_perm = aux_cf_perms(
                DCN_KERNEL * DCN_KERNEL, self.dcn_offset_groups
            )

        def dcn_stage(idx, feat_in, target):
            n_off = 2 * DCN_KERNEL * DCN_KERNEL * self.dcn_offset_groups
            n_mask = DCN_KERNEL * DCN_KERNEL * self.dcn_offset_groups
            if aux_cf:
                off = ChannelFirstAuxConv(
                    n_off, kernel_size=3, padding=DCN_DILATION,
                    dilation=DCN_DILATION, perm=off_perm, dtype=self.dtype,
                    name=f"dcn_offset_{idx}",
                )(feat_in)
                msk = ChannelFirstAuxConv(
                    n_mask, kernel_size=3, padding=DCN_DILATION,
                    dilation=DCN_DILATION, perm=msk_perm, dtype=self.dtype,
                    name=f"dcn_mask_{idx}",
                )(feat_in)
            else:
                off = ConvBnAct(
                    n_off, kernel_size=3, stride=1, padding=DCN_DILATION,
                    dilation=DCN_DILATION, has_bn=False, has_act=False,
                    dtype=self.dtype, name=f"dcn_offset_{idx}",
                )(feat_in, train)
                msk = ConvBnAct(
                    n_mask, kernel_size=3, stride=1, padding=DCN_DILATION,
                    dilation=DCN_DILATION, has_bn=False, has_act=False,
                    dtype=self.dtype, name=f"dcn_mask_{idx}",
                )(feat_in, train)
            return DeformConv(
                c, offset_groups=self.dcn_offset_groups,
                max_offset=dcn_max_offset,
                use_pallas=self.use_pallas_dcn,
                aux_channel_first=aux_cf, dtype=self.dtype,
                name=f"dcn_{idx}",
            )(target, off, msk)

        # stages 1-2 refine the combined features; stages 3-4 warp the
        # aggregated sup features conditioned on them (Alignment_V15.py:143-158)
        combined = dcn_stage(1, combined, combined)
        combined = dcn_stage(2, combined, combined)
        aligned_sup = dcn_stage(3, combined, agg_sup)
        aligned_sup = dcn_stage(4, aligned_sup, aligned_sup)

        fused = ChainOfBasicBlocks(
            c, num_blocks=3, dtype=self.dtype, quant=self.backbone_quant,
            name="init_feature_agg_block"
        )(jnp.concatenate([kf_feat, aligned_sup], axis=-1), train)

        final_hm = nn.Conv(
            self.num_joints, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
            dtype=self.dtype, param_dtype=jnp.float32, name="agg_final_layer",
        )(fused)

        if not train:
            return final_hm, kf_bb_hm

        def feat_label_mi(feat_in, y):
            """I(feat; labels) softmax-KL estimate (Alignment_V15.py:250-262).
            The estimator side is stop-gradiented; gradient flows through the
            *target* (y) side — reproducing the reference's (nonstandard)
            ``kl_div(input=softmax(pred.detach()/T), target=softmax(y/T))``."""
            pred_y = hrnet.final_layer(feat_in)
            logits_p = jax.lax.stop_gradient(pred_y).astype(jnp.float32).reshape(
                b * self.num_joints, -1
            ) / MI_TEMPERATURE
            logits_q = (
                y.astype(jnp.float32).reshape(b * self.num_joints, -1)
                / MI_TEMPERATURE
            )
            p = jax.nn.softmax(logits_p, axis=1)
            q = jax.nn.softmax(logits_q, axis=1)
            # q*log(q) via log_softmax: stable where q underflows to 0
            # (torch's kl_div computes xlogy(target, target) - target*input)
            log_q = jax.nn.log_softmax(logits_q, axis=1)
            return jnp.mean(q * log_q - q * p)

        def feat_feat_mi(f1, f2):
            """I(feat; feat) estimate (Alignment_V15.py:264-277)."""
            logits_p = (
                jax.lax.stop_gradient(f1).astype(jnp.float32)
                .transpose(0, 3, 1, 2).reshape(b * c, -1) / MI_TEMPERATURE
            )
            logits_q = (
                f2.astype(jnp.float32).transpose(0, 3, 1, 2).reshape(b * c, -1)
                / MI_TEMPERATURE
            )
            p = jax.nn.softmax(logits_p, axis=1)
            q = jax.nn.softmax(logits_q, axis=1)
            log_q = jax.nn.log_softmax(logits_q, axis=1)
            return jnp.mean(q * log_q - q * p)

        mi = [
            feat_label_mi(fused, final_hm),            # I(y_t ; z~)
            feat_feat_mi(kf_feat, fused),              # I(z_t ; z~)
            feat_label_mi(agg_sup, final_hm),          # I(y_t ; z_sup)
            feat_feat_mi(agg_sup, fused),              # I(z_sup ; z~)
            feat_label_mi(kf_feat, final_hm),          # I(y_t ; z_t)
            feat_feat_mi(kf_feat, fused),              # I(z_t ; z~)
        ]
        return final_hm, sup_warped_hms, kf_bb_hm, mi


def init_weights_reference(params, rng, std: float = 0.001):
    """Re-sample head conv/linear kernels ~ N(0, std) and zero biases, like
    ``Alignment_V15.init_weights`` (``:185-214``). HRNet params ("hrnet" and
    the deform-conv kernels, which the reference's loop misses due to its
    ``'weights'`` typo at ``:212``) are left untouched.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    keys = jax.random.split(rng, len(flat))
    new_leaves = []
    for (path, leaf), key in zip(flat, keys):
        names = [getattr(p, "key", str(p)) for p in path]
        leafname = names[-1]
        in_hrnet = names[0] == "hrnet"
        in_dcn = any(n.startswith("dcn_") and "offset" not in n and "mask" not in n
                     for n in names[:-1])
        if in_hrnet:
            new_leaves.append(leaf)
        elif leafname == "bias":
            new_leaves.append(jnp.zeros_like(leaf))
        elif leafname == "kernel" and not in_dcn:
            new_leaves.append(std * jax.random.normal(key, leaf.shape, leaf.dtype))
        elif leafname == "scale":
            new_leaves.append(jnp.ones_like(leaf))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


MODEL_REGISTRY.register(FAMIPose, name="FAMIPose")
MODEL_REGISTRY.register(FAMIPose, name="Alignment_V15")
