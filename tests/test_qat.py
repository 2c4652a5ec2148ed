"""Quantization-aware training (--qat): the training graph fake-quantizes
the packed conv pairs with the EXACT int8 serving scheme
(ops/packed_trunk.qat_pair vs make_pair_runner.pair_int8), so serving a
QAT-trained checkpoint with --int8_trunk costs ~0 dB.

Pins:
  * scheme parity — the QAT forward on a batch equals the real int8
    forward calibrated on that same batch (same scales by construction;
    float-emulated int arithmetic matches to conv-accumulation tolerance);
  * the STE gradient is finite, nonzero, and flows to every trunk param;
  * train_step runs under --qat for every wired family and actually
    reduces the fake-quant loss;
  * --qat without --packed_trunk / on unsupported families raises.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from larvanet_tpu.core.registry import get_model


def _rand_batch(rng, n=2, h=12, w=12):
    return jnp.asarray(rng.uniform(0, 255, size=(n, h, w, 3)), jnp.float32)


def _prep(name, model_args, training=True):
    model = get_model(name)
    model.parse_args(model_args)
    model.prepare(is_training=training, scales=[4])
    return model


# ---------------------------------------------------------------------------
# scheme parity: qat forward == int8 forward when calibrated on the same batch
# ---------------------------------------------------------------------------

def test_qat_matches_int8_serving_edsr():
    from larvanet_tpu.ops.packed_trunk import (
        _edsr_walk,
        make_int8_edsr_forward,
        qat_pair,
    )

    model = _prep("edsr", ["--edsr_res_blocks", "3", "--edsr_conv_features", "8"],
                  training=False)
    rng = np.random.default_rng(0)
    x = _rand_batch(rng)

    int8_fwd = make_int8_edsr_forward(model, x, dtype=jnp.float32)
    walk = _edsr_walk(model, jnp.float32, "live_plain")
    qat_out = walk(model.params, x, qat_pair(jnp.float32))
    int8_out = int8_fwd(model.params, x)

    # live_plain vs the int8 walk's baked tail differ only in tail
    # composition order (float-exact); the trunks must agree to int-vs-
    # float accumulation tolerance. Compare through the SAME walk:
    walk2 = _edsr_walk(model, jnp.float32, "live_plain")
    from larvanet_tpu.ops.packed_trunk import _make_int8
    from flax import serialization

    sp0 = serialization.to_state_dict(model.params)
    pairs = [(sp0["res_block_%d" % i]["conv1"], sp0["res_block_%d" % i]["conv2"])
             for i in range(3)]
    int8_same_walk = _make_int8(model, x, jnp.float32, walk2, pairs)
    int8_out_same = int8_same_walk(model.params, x)

    err = float(jnp.max(jnp.abs(qat_out - int8_out_same)))
    scale = float(jnp.max(jnp.abs(int8_out_same)))
    assert err <= 2e-2 * max(scale, 1.0), err

    # and the baked-tail int8 serving path stays close too (same trunk)
    err2 = float(jnp.max(jnp.abs(qat_out - int8_out)))
    assert err2 <= 3e-2 * max(scale, 1.0), err2


def test_qat_differs_from_exact():
    """Fake-quant must actually quantize (guard against a silent no-op)."""
    from larvanet_tpu.ops.packed_trunk import _edsr_walk, exact_pair, qat_pair

    model = _prep("edsr", ["--edsr_res_blocks", "2", "--edsr_conv_features", "8"],
                  training=False)
    x = _rand_batch(np.random.default_rng(1))
    walk = _edsr_walk(model, jnp.float32, "live_plain")
    exact = walk(model.params, x, exact_pair(jnp.float32))
    quant = walk(model.params, x, qat_pair(jnp.float32))
    assert float(jnp.max(jnp.abs(exact - quant))) > 1e-4


# ---------------------------------------------------------------------------
# gradients
# ---------------------------------------------------------------------------

def test_qat_gradients_flow_everywhere():
    model = _prep("edsr", ["--edsr_res_blocks", "2", "--edsr_conv_features", "8",
                           "--qat", "1"])
    rng = np.random.default_rng(2)
    x = _rand_batch(rng, h=16, w=16)
    y = _rand_batch(rng, h=64, w=64)

    grads = jax.grad(model._compute_loss)(model.params, x, y)
    flat, _ = jax.tree_util.tree_flatten(grads)
    for g in flat:
        assert bool(jnp.all(jnp.isfinite(g)))
    # every trunk conv must receive a nonzero gradient through the STE
    from flax import serialization

    sg = serialization.to_state_dict(grads)
    for i in range(2):
        for conv in ("conv1", "conv2"):
            gk = sg["res_block_%d" % i][conv]["kernel"]
            assert float(jnp.max(jnp.abs(gk))) > 0.0, (i, conv)


# ---------------------------------------------------------------------------
# train_step per wired family
# ---------------------------------------------------------------------------

FAMILIES = [
    ("edsr", ["--edsr_res_blocks", "2", "--edsr_conv_features", "8"]),
    ("LarvaNet", ["--num_blocks", "2,2"]),
    ("TreeNet", ["--num_common_blocks", "2", "--num_branches", "2",
                 "--num_branch_blocks", "1"]),
    ("msrr_reduced", ["--num_blocks", "2"]),
    ("hrsr_c3", ["--num_lr_blocks", "2", "--num_hr_blocks", "0"]),
    ("REGO-Net", ["--len_side", "2"]),
    ("ebrn_rm", ["--num_brms", "2", "--num_filters", "8"]),
]


@pytest.mark.parametrize("name,extra", FAMILIES, ids=[f[0] for f in FAMILIES])
def test_qat_train_step_learns(name, extra):
    model = _prep(name, extra + ["--qat", "1"])
    rng = np.random.default_rng(3)
    x = np.asarray(rng.uniform(0, 255, size=(2, 8, 8, 3)), np.float32)
    # a learnable target: bicubic-ish smooth upsample of x
    y = np.kron(x, np.ones((1, 4, 4, 1), np.float32))

    losses = []
    for _ in range(8):
        chw_x = [im.transpose(2, 0, 1) for im in x]
        chw_y = [im.transpose(2, 0, 1) for im in y]
        losses.append(float(model.train_step(chw_x, 4, chw_y, summary=None)))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


# ---------------------------------------------------------------------------
# guards
# ---------------------------------------------------------------------------

def test_qat_requires_packed_trunk():
    model = get_model("edsr")
    model.parse_args(["--qat", "1", "--packed_trunk", "0"])
    with pytest.raises(ValueError, match="packed_trunk"):
        model.prepare(is_training=True, scales=[4])


def test_qat_rejects_depthwise():
    model = _prep("dwsr_reduced", ["--num_blocks", "2", "--qat", "1"])
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 255, size=(1, 8, 8, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 255, size=(1, 32, 32, 3)), jnp.float32)
    with pytest.raises(ValueError, match="depthwise"):
        model._compute_loss(model.params, x, y)


def test_qat_rejects_full_ebrn():
    model = _prep("ebrn", ["--num_brms", "2", "--num_filters", "8", "--qat", "1"])
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, 255, size=(1, 8, 8, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 255, size=(1, 32, 32, 3)), jnp.float32)
    with pytest.raises(ValueError, match="ebrn_rm"):
        model._compute_loss(model.params, x, y)


def test_qat_rejects_odd_patch_width():
    model = _prep("edsr", ["--edsr_res_blocks", "2", "--edsr_conv_features", "8",
                           "--qat", "1"])
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.uniform(0, 255, size=(1, 8, 9, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 255, size=(1, 32, 36, 3)), jnp.float32)
    with pytest.raises(ValueError, match="even"):
        model._compute_loss(model.params, x, y)
