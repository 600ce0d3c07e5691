"""Real-weight parity: flax HRNet vs the reference PyTorch HRNetPlus.

VERDICT round-1 item 4: the round-1 remap tests only exercised synthetic
state dicts. No pretrained ``pose_hrnet_w48.pth`` can be downloaded in this
environment (zero egress), so the strongest available evidence is a
*differential* test against the reference implementation itself: instantiate
the reference's ``HRNetPlus`` (``/root/reference/posetimation/backbones/
hrnet.py:521-684``) in-process with torch-CPU, let torch's default
initializers produce a realistic state dict, run a couple of *train-mode*
forwards so the BatchNorm running statistics become non-trivial, then assert

  * every state-dict entry remaps into the flax tree (no unmapped keys),
  * the flax HRNet in eval mode reproduces the torch eval-mode forward
    (heatmaps AND the 1/4-res feature map) to float32 precision —
    which includes bit-faithful use of the loaded BN running stats.

The reference package pulls in yacs / pycocotools / torchvision at import
time; those are stubbed below (the HRNet code paths never touch them).
Skipped when /root/reference or torch is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "posetimation")),
        reason="reference checkout not present",
    ),
]


def _load_reference_hrnet_module():
    """Import the reference hrnet.py with surgical stubs for its unused deps."""
    import importlib.util

    from fami_pose_tpu.config.node import CfgNode

    # yacs -> our API-compatible CfgNode
    yacs = types.ModuleType("yacs")
    yacs_config = types.ModuleType("yacs.config")
    yacs_config.CfgNode = CfgNode
    yacs.config = yacs_config
    sys.modules.setdefault("yacs", yacs)
    sys.modules.setdefault("yacs.config", yacs_config)

    # torchvision.ops.DeformConv2d: referenced by basic_model.py but never
    # constructed by HRNet
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")

        class _StubDeformConv2d:  # pragma: no cover - never instantiated
            def __init__(self, *a, **k):
                raise RuntimeError("stub")

        tv_ops.DeformConv2d = _StubDeformConv2d
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops

    # engine.defaults.constant.MODEL_REGISTRY: decorator-only usage
    class _Reg:
        def register(self, *a, **k):
            def deco(cls):
                return cls

            return deco

    eng = types.ModuleType("engine")
    eng_d = types.ModuleType("engine.defaults")
    eng_c = types.ModuleType("engine.defaults.constant")
    eng_c.MODEL_REGISTRY = _Reg()
    sys.modules.setdefault("engine", eng)
    sys.modules.setdefault("engine.defaults", eng_d)
    sys.modules.setdefault("engine.defaults.constant", eng_c)

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    if "posetimation" not in sys.modules:
        pkg = types.ModuleType("posetimation")
        pkg.__path__ = []
        sys.modules["posetimation"] = pkg
    basic_layer = load(
        "posetimation.layers.basic_layer",
        os.path.join(REF, "posetimation/layers/basic_layer.py"),
    )
    basic_model = load(
        "posetimation.layers.basic_model",
        os.path.join(REF, "posetimation/layers/basic_model.py"),
    )
    layers_pkg = types.ModuleType("posetimation.layers")
    for n in ("BasicBlock", "Bottleneck", "Interpolate", "ChainOfBasicBlocks"):
        setattr(layers_pkg, n, getattr(basic_model, n))
    layers_pkg.conv_bn_relu = basic_layer.conv_bn_relu
    sys.modules["posetimation.layers"] = layers_pkg

    return load(
        "reference_hrnet", os.path.join(REF, "posetimation/backbones/hrnet.py")
    )


def _ref_cfg(extra, num_joints):
    from fami_pose_tpu.config.node import CfgNode

    def to_node(d):
        n = CfgNode()
        for k, v in d.items():
            n[k] = to_node(v) if isinstance(v, dict) else v
        return n

    cfg = CfgNode()
    cfg["MODEL"] = to_node(
        {
            "EXTRA": extra,
            "BACKBONE_PRETRAINED": "",
            "FREEZE_HRNET_WEIGHTS": False,
            "NUM_JOINTS": num_joints,
        }
    )
    return cfg


@pytest.mark.parametrize("topology", ["tiny", "w48"])
def test_flax_hrnet_matches_reference_torch(rng, topology):
    import jax
    import jax.numpy as jnp

    from fami_pose_tpu.models.hrnet import HRNet, TINY_EXTRA, W48_EXTRA
    from fami_pose_tpu.models.torch_remap import (
        merge_into_variables,
        remap_hrnet_state_dict,
    )

    extra = {"tiny": TINY_EXTRA, "w48": W48_EXTRA}[topology]
    num_joints = 17
    ref_mod = _load_reference_hrnet_module()
    torch.manual_seed(19970808)
    ref = ref_mod.HRNetPlus(_ref_cfg(extra, num_joints), is_train=False)

    # realistic BN running stats: a couple of train-mode forwards
    ref.train()
    with torch.no_grad():
        for _ in range(2):
            ref(torch.randn(2, 3, 96, 64))
    ref.eval()

    x = rng.randn(2, 3, 96, 64).astype(np.float32)
    with torch.no_grad():
        ref_hm, ref_feats = ref(torch.from_numpy(x))
    ref_hm = ref_hm.numpy()
    ref_feat0 = ref_feats[0].numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, batch_stats, unmapped = remap_hrnet_state_dict(sd)
    assert unmapped == [], f"unmapped reference keys: {unmapped[:8]}"

    model = HRNet(extra=extra, num_joints=num_joints, dtype=jnp.float32)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = model.init(jax.random.PRNGKey(0), x_nhwc, train=False)
    variables = merge_into_variables(variables, params, batch_stats)

    hm, feats = model.apply(variables, x_nhwc, train=False)
    got_hm = np.transpose(np.asarray(hm), (0, 3, 1, 2))
    got_feat0 = np.transpose(np.asarray(feats[0]), (0, 3, 1, 2))

    np.testing.assert_allclose(got_feat0, ref_feat0, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_hm, ref_hm, rtol=1e-4, atol=1e-4)
