"""Layer-library parity tests vs inline PyTorch golden modules.

The golden models here are built from stock ``torch.nn`` primitives inside the
tests (they are specs, not code taken from the reference). Layout: torch is
NCHW / OIHW, ours is NHWC / HWIO.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fami_pose_tpu.models.layers import (  # noqa: E402
    BasicBlock,
    Bottleneck,
    ChainOfBasicBlocks,
    ConvBnAct,
)


def to_nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def from_nhwc(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def conv_w(t):
    return jnp.asarray(np.transpose(t.detach().numpy(), (2, 3, 1, 0)))


def bn_vars(bn):
    return (
        {"scale": jnp.asarray(bn.weight.detach().numpy()),
         "bias": jnp.asarray(bn.bias.detach().numpy())},
        {"mean": jnp.asarray(bn.running_mean.numpy()),
         "var": jnp.asarray(bn.running_var.numpy())},
    )


def randomize_bn(bn, rng):
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, bn.weight.shape).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(rng.uniform(-0.5, 0.5, bn.bias.shape).astype(np.float32)))
        bn.running_mean.copy_(torch.from_numpy(rng.uniform(-1, 1, bn.running_mean.shape).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(rng.uniform(0.5, 2.0, bn.running_var.shape).astype(np.float32)))


def test_conv_bn_act_parity(rng):
    x = rng.randn(2, 6, 11, 9).astype(np.float32)
    tconv = tnn.Conv2d(6, 8, 3, stride=2, padding=3, dilation=3, bias=True)
    tbn = tnn.BatchNorm2d(8)
    randomize_bn(tbn, rng)
    tmod = tnn.Sequential(tconv, tbn, tnn.ReLU()).eval()
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()

    mod = ConvBnAct(8, kernel_size=3, stride=2, padding=3, dilation=3)
    bn_p, bn_s = bn_vars(tbn)
    variables = {
        "params": {
            "conv": {"kernel": conv_w(tconv.weight),
                     "bias": jnp.asarray(tconv.bias.detach().numpy())},
            "norm": {"bn": bn_p},
        },
        "batch_stats": {"norm": {"bn": bn_s}},
    }
    out = mod.apply(variables, to_nhwc(x), train=False)
    np.testing.assert_allclose(from_nhwc(out), ref, rtol=1e-5, atol=1e-5)


def test_basic_block_parity(rng):
    """BasicBlock == conv3x3/bn/relu/conv3x3/bn + 1x1-downsample residual."""
    cin, cout = 5, 7
    x = rng.randn(2, cin, 12, 10).astype(np.float32)

    c1 = tnn.Conv2d(cin, cout, 3, padding=1, bias=False)
    b1 = tnn.BatchNorm2d(cout)
    c2 = tnn.Conv2d(cout, cout, 3, padding=1, bias=False)
    b2 = tnn.BatchNorm2d(cout)
    dc = tnn.Conv2d(cin, cout, 1, bias=False)
    db = tnn.BatchNorm2d(cout)
    for bn in (b1, b2, db):
        randomize_bn(bn, rng)

    def torch_forward(t):
        r = db(dc(t))
        y = torch.relu(b1(c1(t)))
        y = b2(c2(y))
        return torch.relu(y + r)

    with torch.no_grad():
        for m in (c1, b1, c2, b2, dc, db):
            m.eval()
        ref = torch_forward(torch.from_numpy(x)).numpy()

    mod = BasicBlock(cout, has_downsample=True)
    b1p, b1s = bn_vars(b1)
    b2p, b2s = bn_vars(b2)
    dbp, dbs = bn_vars(db)
    variables = {
        "params": {
            "conv1": {"kernel": conv_w(c1.weight)},
            "norm1": {"bn": b1p},
            "conv2": {"kernel": conv_w(c2.weight)},
            "norm2": {"bn": b2p},
            "downsample": {"conv": {"kernel": conv_w(dc.weight)}, "norm": {"bn": dbp}},
        },
        "batch_stats": {
            "norm1": {"bn": b1s},
            "norm2": {"bn": b2s},
            "downsample": {"norm": {"bn": dbs}},
        },
    }
    out = mod.apply(variables, to_nhwc(x), train=False)
    np.testing.assert_allclose(from_nhwc(out), ref, rtol=1e-5, atol=1e-5)


def test_bottleneck_parity(rng):
    cin, width = 16, 4  # out = width * 4
    x = rng.randn(2, cin, 8, 8).astype(np.float32)
    c1 = tnn.Conv2d(cin, width, 1, bias=False)
    b1 = tnn.BatchNorm2d(width)
    c2 = tnn.Conv2d(width, width, 3, padding=1, bias=False)
    b2 = tnn.BatchNorm2d(width)
    c3 = tnn.Conv2d(width, width * 4, 1, bias=False)
    b3 = tnn.BatchNorm2d(width * 4)
    for bn in (b1, b2, b3):
        randomize_bn(bn, rng)

    with torch.no_grad():
        for m in (c1, b1, c2, b2, c3, b3):
            m.eval()
        t = torch.from_numpy(x)
        y = torch.relu(b1(c1(t)))
        y = torch.relu(b2(c2(y)))
        y = b3(c3(y))
        ref = torch.relu(y + t).numpy()

    mod = Bottleneck(width, has_downsample=False)
    ps = {}
    ss = {}
    for i, (c, b) in enumerate([(c1, b1), (c2, b2), (c3, b3)], start=1):
        bp, bs = bn_vars(b)
        ps[f"conv{i}"] = {"kernel": conv_w(c.weight)}
        ps[f"norm{i}"] = {"bn": bp}
        ss[f"norm{i}"] = {"bn": bs}
    out = mod.apply({"params": ps, "batch_stats": ss}, to_nhwc(x), train=False)
    np.testing.assert_allclose(from_nhwc(out), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_chain_of_basic_blocks_shapes(rng):
    mod = ChainOfBasicBlocks(12, num_blocks=3)
    x = jnp.asarray(rng.randn(2, 9, 7, 30).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    out = mod.apply(variables, x, train=False)
    assert out.shape == (2, 9, 7, 12)
    blocks = set(variables["params"].keys())
    assert blocks == {"block0", "block1", "block2"}
    assert "downsample" in variables["params"]["block0"]
    assert "downsample" not in variables["params"]["block1"]


def test_batchnorm_training_updates_stats(rng):
    mod = ConvBnAct(4, kernel_size=1, padding=0)
    x = jnp.asarray(rng.randn(8, 5, 5, 3).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    _, updated = mod.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["norm"]["bn"]["mean"]
    after = updated["batch_stats"]["norm"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
