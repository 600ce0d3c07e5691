"""FAMIPose model and loss tests (tiny topology for CPU speed)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fami_pose_tpu.losses import fami_total_loss, joint_mse_loss
from fami_pose_tpu.models.fami_pose import (
    FAMIPose,
    MI_TEMPERATURE,
    init_weights_reference,
)
from fami_pose_tpu.models.hrnet import TINY_EXTRA


@pytest.fixture(scope="module")
def model_and_vars():
    m = FAMIPose(extra=TINY_EXTRA, num_joints=17, feat_channels=8, dcn_offset_groups=4)
    kf = jnp.zeros((2, 64, 64, 3))
    sup = jnp.zeros((2, 64, 64, 12))
    v = m.init(jax.random.PRNGKey(0), kf, sup, train=False)
    return m, v


def _rand_inputs(rng, b=2, n=4):
    kf = jnp.asarray(rng.rand(b, 64, 64, 3).astype(np.float32))
    sup = jnp.asarray(rng.rand(b, 64, 64, 3 * n).astype(np.float32))
    return kf, sup


def test_eval_contract(model_and_vars, rng):
    m, v = model_and_vars
    kf, sup = _rand_inputs(rng)
    hm, kf_bb = m.apply(v, kf, sup, train=False)
    assert hm.shape == (2, 16, 16, 17)
    assert kf_bb.shape == (2, 16, 16, 17)


def test_train_contract_four_outputs(model_and_vars, rng):
    m, v = model_and_vars
    kf, sup = _rand_inputs(rng)
    (final, sup_hms, kf_bb, mi), _ = m.apply(
        v, kf, sup, train=True, mutable=["batch_stats"]
    )
    assert final.shape == (2, 16, 16, 17)
    assert len(sup_hms) == 4 and sup_hms[0].shape == (2, 16, 16, 17)
    assert kf_bb.shape == (2, 16, 16, 17)
    assert len(mi) == 6
    for t in mi:
        assert np.isfinite(float(t))


def test_num_sup_is_dynamic(model_and_vars, rng):
    """The head must adapt to any number of sup frames (2*(DISTANCE-1))."""
    m = FAMIPose(extra=TINY_EXTRA, num_joints=17, feat_channels=8, dcn_offset_groups=4)
    kf = jnp.zeros((1, 64, 64, 3))
    sup2 = jnp.zeros((1, 64, 64, 6))
    v2 = m.init(jax.random.PRNGKey(0), kf, sup2, train=False)
    hm, _ = m.apply(v2, kf, sup2, train=False)
    assert hm.shape == (1, 16, 16, 17)


def test_mi_terms_match_torch_kl_div(model_and_vars, rng):
    """The MI estimate must equal torch's kl_div(input=softmax(x.detach()/T),
    target=softmax(y/T), reduction='mean') — probabilities (not log-probs)
    passed as `input`, reproducing the reference (Alignment_V15.py:260-277)."""
    torch = pytest.importorskip("torch")
    b, hw = 3, 20
    x = rng.randn(b, hw).astype(np.float32)
    y = rng.randn(b, hw).astype(np.float32)

    tx = torch.nn.functional.softmax(torch.from_numpy(x) / MI_TEMPERATURE, dim=1)
    ty = torch.nn.functional.softmax(torch.from_numpy(y) / MI_TEMPERATURE, dim=1)
    ref = torch.nn.functional.kl_div(input=tx, target=ty, reduction="mean").item()

    p = jax.nn.softmax(jnp.asarray(x) / MI_TEMPERATURE, axis=1)
    q = jax.nn.softmax(jnp.asarray(y) / MI_TEMPERATURE, axis=1)
    got = float(jnp.mean(q * (jnp.log(q) - p)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)


def test_joint_mse_matches_torch(rng):
    torch = pytest.importorskip("torch")
    b, h, w, j = 2, 8, 6, 5
    pred = rng.randn(b, h, w, j).astype(np.float32)
    target = rng.randn(b, h, w, j).astype(np.float32)
    tw = rng.rand(b, j).astype(np.float32)

    # torch-side golden (reference semantics, NCHW)
    tp = torch.from_numpy(np.transpose(pred, (0, 3, 1, 2))).reshape(b, j, -1)
    tt = torch.from_numpy(np.transpose(target, (0, 3, 1, 2))).reshape(b, j, -1)
    tww = torch.from_numpy(tw)
    loss = 0
    for idx in range(j):
        p = tp[:, idx] * tww[:, idx : idx + 1]
        t = tt[:, idx] * tww[:, idx : idx + 1]
        loss = loss + torch.mean((p - t) ** 2)
    ref = (loss / j).item()

    got = float(
        joint_mse_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(tw))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_total_loss_signs():
    """Verify the documented +/- pattern: alpha*(-b*m1 + b*m2 + m3 - m4 + m5 - m6)."""
    z = jnp.zeros((1, 4, 4, 2))
    mi = [jnp.asarray(float(i + 1)) for i in range(6)]
    total, aux = fami_total_loss(z, [], mi, z, None)
    expect = 0.5 * (-0.1 * 1 + 0.1 * 2 + 3 - 4 + 5 - 6)
    np.testing.assert_allclose(float(aux["loss_mi"]), expect, rtol=1e-6)
    np.testing.assert_allclose(float(total), expect, rtol=1e-6)


@pytest.mark.slow
def test_grad_flows_through_model(model_and_vars, rng):
    m, v = model_and_vars
    kf, sup = _rand_inputs(rng, b=1)
    target = jnp.asarray(rng.rand(1, 16, 16, 17).astype(np.float32))
    tw = jnp.ones((1, 17))

    def loss_fn(params):
        (final, sup_hms, kf_bb, mi), _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            kf, sup, train=True, mutable=["batch_stats"],
        )
        total, _ = fami_total_loss(final, sup_hms, mi, target, tw)
        return total

    grads = jax.grad(loss_fn)(v["params"])
    gmax = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gmax) and gmax > 0
    # grads reach the alignment head (dcn offsets) and the backbone
    assert float(jnp.abs(grads["dcn_offset_1"]["conv"]["kernel"]).max()) > 0
    assert float(jnp.abs(grads["hrnet"]["stem_conv1"]["kernel"]).max()) > 0


@pytest.mark.slow
def test_init_weights_reference(model_and_vars):
    m, v = model_and_vars
    p2 = init_weights_reference(v["params"], jax.random.PRNGKey(7))
    std = float(jnp.std(p2["agg_final_layer"]["kernel"]))
    assert 0.0005 < std < 0.002  # ~N(0, 0.001)
    assert bool(
        jnp.array_equal(
            p2["hrnet"]["stem_conv1"]["kernel"], v["params"]["hrnet"]["stem_conv1"]["kernel"]
        )
    )
    assert bool(jnp.array_equal(p2["dcn_1"]["kernel"], v["params"]["dcn_1"]["kernel"]))
    assert float(jnp.abs(p2["agg_final_layer"]["bias"]).max()) == 0.0


def test_aux_channel_first_model_equivalence(rng):
    """FAMIPose with channel-first DCN auxiliaries computes the same eval
    function as the NHWC layout (same canonical params, different staging)."""
    import jax
    import jax.numpy as jnp

    from fami_pose_tpu.models.fami_pose import FAMIPose
    from fami_pose_tpu.models.hrnet import TINY_EXTRA

    kw = dict(
        extra=TINY_EXTRA, num_joints=17, feat_channels=8,
        dcn_offset_groups=4, dcn_max_offset=2, use_pallas_dcn=True,
    )
    m_cf = FAMIPose(dcn_aux_channel_first=True, **kw)
    m_ref = FAMIPose(dcn_aux_channel_first=False, **kw)
    kf = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    sup = jnp.asarray(rng.rand(2, 64, 64, 12), jnp.float32)
    v = m_cf.init(jax.random.PRNGKey(3), kf, sup, train=False)
    # identical param trees: canonical layout is shared
    v2 = m_ref.init(jax.random.PRNGKey(3), kf, sup, train=False)
    assert jax.tree.structure(v) == jax.tree.structure(v2)

    f_cf, bb_cf = m_cf.apply(v, kf, sup, train=False)
    f_ref, bb_ref = m_ref.apply(v, kf, sup, train=False)
    np.testing.assert_allclose(
        np.asarray(f_cf), np.asarray(f_ref), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(bb_cf), np.asarray(bb_ref))


def test_aux_channel_first_numpy_variables_under_jit(rng):
    """Checkpoint-loaded variables are host numpy arrays; a serving step that
    CLOSES OVER them (engine/streaming.make_step) must still trace. Under
    constant-tracing JAX, jnp.asarray(perm) inside the trace is a tracer, and
    numpy-kernel[..., tracer] raises TracerArrayConversionError — the perm
    must stay a static numpy index (regression: tools/streaming_ab crash)."""
    import jax
    import jax.numpy as jnp

    from fami_pose_tpu.models.fami_pose import FAMIPose
    from fami_pose_tpu.models.hrnet import TINY_EXTRA

    m = FAMIPose(
        extra=TINY_EXTRA, num_joints=17, feat_channels=8,
        dcn_offset_groups=4, dcn_max_offset=2, use_pallas_dcn=True,
        dcn_aux_channel_first=True,
    )
    kf = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    sup = jnp.asarray(rng.rand(1, 64, 64, 12), jnp.float32)
    v = m.init(jax.random.PRNGKey(3), kf, sup, train=False)
    v_np = jax.tree.map(lambda a: np.asarray(a), v)  # like load_variables

    @jax.jit
    def step(kf, sup):
        return m.apply(v_np, kf, sup, train=False)

    f_jit, _ = step(kf, sup)
    f_ref, _ = m.apply(v, kf, sup, train=False)
    np.testing.assert_allclose(
        np.asarray(f_jit), np.asarray(f_ref), rtol=2e-5, atol=2e-5
    )


def test_direct_construction_zero_max_offset_selects_exact_path(rng):
    """dcn_max_offset=0 passed directly (not via from_config) must select the
    exact gather path, matching dcn_max_offset=None bit-for-bit — not a
    degenerate d_max=0 bounded window (ADVICE r2)."""
    kf = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    sup = jnp.asarray(rng.rand(1, 64, 64, 6).astype(np.float32))
    outs = []
    for max_off in (0, None):
        m = FAMIPose(
            extra=TINY_EXTRA, num_joints=17, feat_channels=8,
            dcn_offset_groups=4, dcn_max_offset=max_off,
        )
        v = m.init(jax.random.PRNGKey(0), kf, sup, train=False)
        hm, _ = m.apply(v, kf, sup, train=False)
        outs.append(np.asarray(hm))
    np.testing.assert_array_equal(outs[0], outs[1])
