"""Channel-sharded (tensor parallel) conv equivalence on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from larvanet_tpu.parallel.mesh import make_mesh
from larvanet_tpu.parallel.tp import make_tp_forward, tp_conv3x3


def test_tp_two_layer_conv_matches_single_device(rng):
    mesh = make_mesh((8,), ("model",))
    C, F = 16, 32
    x = jnp.asarray(rng.standard_normal((2, 8, 8, C)).astype(np.float32))
    k1 = jnp.asarray(rng.standard_normal((3, 3, C, F)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal((F,)).astype(np.float32))
    k2 = jnp.asarray(rng.standard_normal((3, 3, F, F)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal((F,)).astype(np.float32))
    params = {"k1": k1, "b1": b1, "k2": k2, "b2": b2}

    def local_fwd(p, x):
        h = tp_conv3x3(x, p["k1"], p["b1"])
        h = jax.nn.relu(h)
        return tp_conv3x3(h, p["k2"], p["b2"])

    f = make_tp_forward(local_fwd, mesh)
    got = np.asarray(f(params, x))

    def ref_conv(x, k, b):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    want = np.asarray(ref_conv(jax.nn.relu(ref_conv(x, k1, b1)), k2, b2))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_tp_spatial_2d_composition_matches_single_device(rng):
    """The ('spatial','model') 2-D composition (VERDICT r1 #6), 4-way
    spatial x 2-way model: a 4-conv
    + PixelShuffle-tail stack with H sharded over 'spatial' (halo
    exchange) and output channels sharded over 'model' (per-layer
    all_gather) matches the plain single-device forward — bit-parity in
    the interior, SAME-padding-class divergence only within the
    receptive radius of the outer H borders (quantified in dB by
    tests/test_parallel.py for the halo path)."""
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle
    from larvanet_tpu.parallel.tp import make_tp_spatial_forward

    mesh = make_mesh((4, 2), ("spatial", "model"))
    C, scale, n_layers = 16, 4, 4
    chans = [3] + [C] * (n_layers - 1) + [3 * scale ** 2]
    params = {}
    for i in range(n_layers):
        params["conv%d" % i] = {
            "kernel": jnp.asarray(
                rng.standard_normal((3, 3, chans[i], chans[i + 1])).astype(np.float32) * 0.1),
            "bias": jnp.asarray(rng.standard_normal((chans[i + 1],)).astype(np.float32) * 0.1),
        }
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 12, 3)).astype(np.float32))

    halo = n_layers  # receptive radius of n_layers 3x3 convs
    f = make_tp_spatial_forward(mesh, halo=halo, scale=scale)
    got = np.asarray(f(params, x))

    def ref_conv(h, p):
        return jax.lax.conv_general_dilated(
            h, p["kernel"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]

    h = x
    for i in range(n_layers):
        h = ref_conv(h, params["conv%d" % i])
        if i < n_layers - 1:
            h = jax.nn.relu(h)
    want = np.asarray(pixel_shuffle(h, scale))

    assert got.shape == want.shape
    # interior strips: exact (float tolerance)
    b = halo * scale
    np.testing.assert_allclose(got[:, b:-b], want[:, b:-b], atol=1e-4)
    # outer borders: bounded divergence (zero-filled halo vs progressive
    # SAME padding)
    assert np.max(np.abs(got - want)) < np.max(np.abs(want))
