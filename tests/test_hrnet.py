"""HRNet backbone tests: shapes, modes, topology anchors, torch remap."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fami_pose_tpu.models.hrnet import HRNet, TINY_EXTRA, W48_EXTRA
from fami_pose_tpu.models.torch_remap import (
    merge_into_variables,
    remap_hrnet_state_dict,
)


@pytest.fixture(scope="module")
def tiny():
    m = HRNet(extra=TINY_EXTRA, num_joints=17)
    x = jnp.zeros((2, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    return m, variables


def test_forward_shapes(tiny):
    m, variables = tiny
    x = jnp.ones((2, 64, 64, 3))
    hm, feats = m.apply(variables, x, train=False)
    assert hm.shape == (2, 16, 16, 17)
    assert len(feats) == 1 and feats[0].shape == (2, 16, 16, 8)


def test_partial_modes(tiny):
    m, variables = tiny
    x = jnp.ones((2, 64, 64, 3))
    f = m.apply(variables, x, train=False, mode="features")
    assert f.shape == (2, 16, 16, 8)
    s2 = m.apply(variables, x, train=False, mode="stage2")
    assert s2.shape == (2, 16, 16, 8)


def test_train_mode_updates_batch_stats(tiny):
    m, variables = tiny
    x = jnp.ones((2, 64, 64, 3))
    (hm, _), updated = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert hm.shape == (2, 16, 16, 17)
    a = variables["batch_stats"]["stem_norm1"]["bn"]["mean"]
    b = updated["batch_stats"]["stem_norm1"]["bn"]["mean"]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_w48_param_count():
    """Anchors the full W48 topology: 63.6M params (known HRNet-W48 size)."""
    m = HRNet(extra=W48_EXTRA, num_joints=17)
    variables = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 384, 288, 3)), train=False)
    )
    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(variables["params"]))
    assert n == 63_595_745


def test_final_layer_reuse(tiny):
    """final_layer must be callable on arbitrary 8-channel features (the MI
    estimators reuse it; ``Alignment_V15.py:258``)."""
    m, variables = tiny
    feat = jnp.ones((3, 16, 16, 8))
    hm = m.apply(variables, feat, method=m.final_layer)
    assert hm.shape == (3, 16, 16, 17)


# ---------------------------------------------------------------------------
# torch state_dict remapping
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def test_remap_known_keys(tiny):
    m, variables = tiny
    rng = np.random.RandomState(0)
    flat = _flatten(variables["params"])

    def shp(path):
        return tuple(flat[path].shape)

    # a representative set of torch names covering every mapping rule
    sd = {
        "conv1.weight": rng.randn(64, 3, 3, 3).astype(np.float32),
        "bn1.weight": rng.randn(64).astype(np.float32),
        "bn1.running_mean": rng.randn(64).astype(np.float32),
        "layer1.0.conv2.weight": rng.randn(64, 64, 3, 3).astype(np.float32),
        "layer1.0.downsample.0.weight": rng.randn(256, 64, 1, 1).astype(np.float32),
        "layer1.0.downsample.1.running_var": np.abs(rng.randn(256)).astype(np.float32),
        "transition1.0.0.weight": np.zeros((8, 256, 3, 3), np.float32),
        "transition1.1.0.0.weight": np.zeros((16, 256, 3, 3), np.float32),
        "transition1.1.0.1.weight": np.zeros((16,), np.float32),
        "stage2.0.branches.1.0.conv1.weight": np.zeros((16, 16, 3, 3), np.float32),
        "stage2.0.branches.1.0.bn1.running_mean": np.zeros((16,), np.float32),
        "stage2.0.fuse_layers.0.1.0.weight": np.zeros((8, 16, 1, 1), np.float32),
        "stage2.0.fuse_layers.1.0.0.0.weight": np.zeros((16, 8, 3, 3), np.float32),
        "stage2.0.fuse_layers.1.0.0.1.bias": np.zeros((16,), np.float32),
        "final_layer.weight": np.zeros((17, 8, 1, 1), np.float32),
        "final_layer.bias": np.zeros((17,), np.float32),
        "bn1.num_batches_tracked": np.zeros((), np.int64),
    }
    params, stats, unmapped = remap_hrnet_state_dict(sd)
    assert unmapped == []
    fp = _flatten(params)
    fs = _flatten(stats)
    # conv weights transposed OIHW->HWIO
    assert fp[("stem_conv1", "kernel")].shape == (3, 3, 3, 64)
    assert fp[("layer1_block0", "conv2", "kernel")].shape == (3, 3, 64, 64)
    assert fp[("layer1_block0", "downsample", "conv", "kernel")].shape == (1, 1, 64, 256)
    assert fp[("transition1", "adapt0", "kernel")].shape == (3, 3, 256, 8)
    assert fp[("transition1", "new1_0", "kernel")].shape == (3, 3, 256, 16)
    assert fp[("transition1", "new1_0_norm", "bn", "scale")].shape == (16,)
    assert fp[("stage2_module0", "branch1", "block0", "conv1", "kernel")].shape == (3, 3, 16, 16)
    assert fp[("stage2_module0", "fuse0_1", "conv", "kernel")].shape == (1, 1, 16, 8)
    assert fp[("stage2_module0", "fuse1_0", "conv0", "kernel")].shape == (3, 3, 8, 16)
    assert fp[("stage2_module0", "fuse1_0", "norm0", "bn", "bias")].shape == (16,)
    assert fp[("final_layer", "final_conv", "kernel")].shape == (1, 1, 8, 17)
    assert fs[("stem_norm1", "bn", "mean")].shape == (64,)
    assert fs[("stage2_module0", "branch1", "block0", "norm1", "bn", "mean")].shape == (16,)
    # every produced path exists in the real variable tree with matching shape
    for path, v in fp.items():
        assert path in flat, path
        assert tuple(flat[path].shape) == tuple(v.shape), path


def test_remap_merge_roundtrip(tiny):
    m, variables = tiny
    sd = {"final_layer.bias": np.full((17,), 3.25, np.float32)}
    params, stats, unmapped = remap_hrnet_state_dict(sd)
    new_vars = merge_into_variables(variables, params, stats)
    got = np.asarray(new_vars["params"]["final_layer"]["final_conv"]["bias"])
    np.testing.assert_allclose(got, 3.25)
    # untouched params preserved
    a = variables["params"]["stem_conv1"]["kernel"]
    b = new_vars["params"]["stem_conv1"]["kernel"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_remap_hrnet_prefix(tiny):
    _, variables = tiny
    sd = {"hrnet.final_layer.bias": np.zeros((17,), np.float32)}
    params, _, unmapped = remap_hrnet_state_dict(sd)
    assert unmapped == []
    assert "final_layer" in params
