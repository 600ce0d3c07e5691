"""FULL-MODEL differential parity: flax FAMIPose vs reference Alignment_V15.

The strongest available mAP-parity evidence without PoseTrack data: run the
reference model itself (torch-CPU, with independent pure-torch shims for
torchvision's DeformConv2d and kornia's warp_affine — see torch_shims.py),
remap its complete state dict into the flax tree, and assert the eval
forward (final heatmaps AND backbone heatmaps) agrees. This exercises the
entire alignment head end-to-end: global offset tower + translation warp,
DCN offset/mask channel ordering, the 4 deformable stages, aggregation
chains and final layer — the places where a silent mismatch would destroy
mAP while every unit test stays green.

Input must be 384x288 (the reference hardcodes ``Linear(16*3*3, 64)`` for
that geometry, ``Alignment_V15.py:61-72``). W48 on CPU: marked slow.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import os

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir("/root/reference/posetimation"),
        reason="reference checkout not present",
    ),
]


def _ref_cfg(num_joints=17):
    from fami_pose_tpu.config.node import CfgNode
    from fami_pose_tpu.models.hrnet import W48_EXTRA

    def to_node(d):
        n = CfgNode()
        for k, v in d.items():
            n[k] = to_node(v) if isinstance(v, dict) else v
        return n

    cfg = CfgNode()
    cfg["MODEL"] = to_node(
        {
            "EXTRA": W48_EXTRA,
            "BACKBONE_PRETRAINED": "",
            "PRETRAINED": "",
            "FREEZE_HRNET_WEIGHTS": False,
            "NUM_JOINTS": num_joints,
        }
    )
    cfg["DATASET"] = to_node({"BBOX_ENLARGE_FACTOR": 1.25})
    cfg["TRAIN"] = to_node({"ROT_FACTOR": 45, "SCALE_FACTOR": 0.35})
    return cfg


def test_fami_pose_matches_reference_alignment_v15(rng):
    import jax
    import jax.numpy as jnp

    from torch_shims import load_reference_alignment_v15
    from fami_pose_tpu.models.fami_pose import FAMIPose
    from fami_pose_tpu.models.hrnet import W48_EXTRA
    from fami_pose_tpu.models.torch_remap import (
        merge_into_variables,
        remap_fami_pose_state_dict,
    )

    ref_mod = load_reference_alignment_v15()
    torch.manual_seed(19970808)
    ref = ref_mod.Alignment_V15(_ref_cfg(), is_train="validate")

    b, num_sup = 1, 4
    kf = rng.rand(b, 3, 384, 288).astype(np.float32)
    sup = rng.rand(b, 3 * num_sup, 384, 288).astype(np.float32)

    # one train-mode forward populates BatchNorm running stats
    ref.train()
    ref.is_train = True
    with torch.no_grad():
        ref(torch.from_numpy(kf), torch.from_numpy(sup))
    ref.eval()
    ref.is_train = False
    with torch.no_grad():
        ref_final, ref_kf_bb = ref(torch.from_numpy(kf), torch.from_numpy(sup))
    ref_final = ref_final.numpy()
    ref_kf_bb = ref_kf_bb.numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, batch_stats, unmapped = remap_fami_pose_state_dict(sd)
    assert unmapped == [], f"unmapped: {unmapped[:10]}"

    # exact gather DCN (max_offset=None): bit-faithful torchvision semantics
    model = FAMIPose(
        extra=W48_EXTRA, num_joints=17, dtype=jnp.float32,
        dcn_max_offset=None, use_pallas_dcn=False,
    )
    kf_nhwc = jnp.asarray(np.transpose(kf, (0, 2, 3, 1)))
    sup_nhwc = jnp.asarray(np.transpose(sup, (0, 2, 3, 1)))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), kf_nhwc, sup_nhwc, train=False)
    )
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    variables = merge_into_variables(variables, params, batch_stats)

    final, kf_bb = model.apply(variables, kf_nhwc, sup_nhwc, train=False)
    got_final = np.transpose(np.asarray(final), (0, 3, 1, 2))
    got_kf_bb = np.transpose(np.asarray(kf_bb), (0, 3, 1, 2))

    np.testing.assert_allclose(got_kf_bb, ref_kf_bb, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got_final, ref_final, rtol=1e-3, atol=1e-3)


def test_shim_dcn_matches_jax_exact_gather(rng):
    """Cross-validate the two independent DCN derivations on random inputs."""
    import jax.numpy as jnp

    from torch_shims import deform_conv2d_reference
    from fami_pose_tpu.ops.deform_conv import deform_conv2d

    n, h, w, c, g, k = 2, 10, 9, 8, 2, 9
    c_out = 6
    x = rng.randn(n, c, h, w).astype(np.float32)
    off = (rng.rand(n, 2 * g * k, h, w) * 6 - 3).astype(np.float32)
    msk = rng.rand(n, g * k, h, w).astype(np.float32)
    wgt = (rng.randn(c_out, c, 3, 3) * 0.2).astype(np.float32)
    bias = rng.randn(c_out).astype(np.float32)

    with torch.no_grad():
        ref = deform_conv2d_reference(
            torch.from_numpy(x), torch.from_numpy(off), torch.from_numpy(msk),
            torch.from_numpy(wgt), torch.from_numpy(bias),
            padding=3, dilation=3,
        ).numpy()

    got = deform_conv2d(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(off, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(msk, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(wgt, (2, 3, 1, 0))),
        jnp.asarray(bias),
        padding=3, dilation=3, offset_groups=g,
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
