"""Channel-sharded (tensor parallel) conv equivalence on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

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
