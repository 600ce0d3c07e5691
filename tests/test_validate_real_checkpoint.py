"""Turn-key real-checkpoint validation tool (tools/validate_real_checkpoint.py).

The environment has no released FAMI-Pose checkpoints (zero egress), so the
tool's load half is exercised against a REAL reference ``Alignment_V15``
state dict produced in-process and saved as a .pth — exactly the artifact a
user would pass — plus a backbone-only dict. The eval half (Evaluator ->
decode -> poseval) is covered by the fixture e2e tests.
"""

import os.path as osp
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not osp.isdir("/root/reference/posetimation"),
        reason="reference checkout not present",
    ),
]

sys.path.insert(0, osp.dirname(__file__))
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools"))


def test_load_and_remap_full_and_backbone(tmp_path):
    import jax.numpy as jnp

    from test_full_model_parity import _ref_cfg
    from torch_shims import load_reference_alignment_v15
    from validate_real_checkpoint import load_and_remap

    from fami_pose_tpu.models.fami_pose import FAMIPose
    from fami_pose_tpu.models.hrnet import W48_EXTRA

    ref_mod = load_reference_alignment_v15()
    torch.manual_seed(7)
    ref = ref_mod.Alignment_V15(_ref_cfg(), is_train="validate")

    # the artifact a user passes: the reference's torch.save checkpoint
    full_path = str(tmp_path / "epoch_20_state.pth")
    torch.save(ref.state_dict(), full_path)
    bb_path = str(tmp_path / "pose_hrnet_w48.pth")
    torch.save(ref.hrnet.state_dict(), bb_path)

    model = FAMIPose(
        extra=W48_EXTRA, num_joints=17, dtype=jnp.float32,
        dcn_max_offset=None, use_pallas_dcn=False,
    )
    example = (
        jnp.zeros((1, 384, 288, 3), jnp.float32),
        jnp.zeros((1, 384, 288, 12), jnp.float32),
    )

    variables, kind, unmapped = load_and_remap(full_path, model, example)
    assert kind == "full"
    assert unmapped == [], unmapped[:5]
    # a real leaf landed (not the zero template): final-layer conv kernel
    k = np.asarray(
        variables["params"]["agg_final_layer"]["kernel"]
    )
    ref_k = ref.agg_final_layer.weight.detach().numpy()
    assert np.abs(k).sum() > 0
    np.testing.assert_allclose(
        k, np.transpose(ref_k, (2, 3, 1, 0)), rtol=1e-6
    )

    variables_bb, kind_bb, unmapped_bb = load_and_remap(bb_path, model, example)
    assert kind_bb == "backbone"
    assert unmapped_bb == [], unmapped_bb[:5]
    stem = np.asarray(
        variables_bb["params"]["hrnet"]["stem_conv1"]["kernel"]
    )
    ref_stem = ref.hrnet.conv1.weight.detach().numpy()
    np.testing.assert_allclose(
        stem, np.transpose(ref_stem, (2, 3, 1, 0)), rtol=1e-6
    )
