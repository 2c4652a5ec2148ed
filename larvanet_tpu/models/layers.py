"""Shared Flax building blocks for the SR model zoo.

The reference re-declares these blocks in every model file (SURVEY.md
§2.3); here they live once. All modules are NHWC (TPU-native layout).

Blocks and their reference counterparts:
  * MeanShift        — frozen 1x1 RGB affine (reference models/edsr.py:129-136).
                       NOTE: the reference assigns `self.weight_data` /
                       `self.bias_data`, which are dead attributes — its
                       MeanShift actually applies a *random frozen* conv.
                       We implement the evident intent: out = x + sign*mean.
  * ResBlock         — conv3x3 -> act -> conv3x3 + identity, optional
                       residual scaling (reference models/edsr.py:139-153)
                       and optional 0.1-scaled Kaiming init used by the
                       MSRR/Larva family (models/LarvaNet.py:22-39).
  * UpsampleBlock    — [conv3x3 -> PixelShuffle(2)] x log2(scale) for
                       scales 2/4/8, or one x3 stage (models/edsr.py:156-173),
                       optionally with an activation between stages
                       (models/msrr.py:188-211).
  * interpolated base — torch-parity bicubic/bilinear upsample
                       (ops/resize.py), added to network outputs.

Initialization parity: PyTorch's Conv2d default init is
kaiming_uniform_(a=sqrt(5)) for weights and U(-1/sqrt(fan_in),
1/sqrt(fan_in)) for bias; `torch_conv_init` replicates it so that
freshly-initialized models are statistically identical to the reference.
`kaiming_normal_scaled(s)` replicates initialize_weights(..., scale=s)
(kaiming_normal_ fan_in + weight *= s, zero bias).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle
from larvanet_tpu.ops.resize import upsample

# RGB mean used by every MeanShift in the zoo (reference models/edsr.py:181).
DIV2K_RGB_MEAN = (114.4, 111.5, 103.0)


# ---------------------------------------------------------------------------
# Initializers (torch parity)
# ---------------------------------------------------------------------------

def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch Conv2d default: kaiming_uniform_(a=sqrt(5)) == U(-b, b) with
    b = sqrt(6 / ((1 + a^2) * fan_in)) = 1/sqrt(fan_in) for HWIO kernels."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_scaled(scale: float = 0.1, nonlinearity_gain: float = math.sqrt(2.0)):
    """initialize_weights parity (reference models/LarvaNet.py:22-39):
    kaiming_normal_(a=0, mode='fan_in') then weight *= scale, bias zero."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] * shape[1] * shape[2]
        std = nonlinearity_gain / math.sqrt(fan_in)
        return scale * std * jax.random.normal(key, shape, dtype)

    return init


def conv3x3(
    features: int,
    name: Optional[str] = None,
    kernel_init=None,
    in_features: Optional[int] = None,
    kernel_size: int = 3,
    feature_group_count: int = 1,
) -> nn.Conv:
    """3x3 same-padded conv with torch-parity default init.

    `in_features` is only needed to compute the torch bias bound; when
    omitted, flax's default (zeros bias) would diverge from torch, so we
    require callers pass it (or rely on kernel_init-supplied schemes
    that zero the bias anyway).
    """
    if kernel_init is None:
        kernel_init = torch_conv_kernel_init
        if in_features is None:
            raise ValueError("in_features required for torch default init")
        bias_init = torch_conv_bias_init(
            in_features // feature_group_count * kernel_size * kernel_size
        )
    else:
        bias_init = nn.initializers.zeros
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        padding="SAME",
        kernel_init=kernel_init,
        bias_init=bias_init,
        feature_group_count=feature_group_count,
        name=name,
    )


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def get_activation(name: str, slope: float = 0.1) -> Callable:
    if name == "relu":
        return jax.nn.relu
    if name == "relu6":
        return lambda x: jnp.clip(x, 0.0, 6.0)
    if name == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)
    if name == "linear" or name is None or name == "none":
        return lambda x: x
    raise ValueError("unknown activation %r" % (name,))


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

class MeanShift(nn.Module):
    """Frozen RGB mean add/subtract: out = x + sign * mean.

    The reference implements this as a frozen 1x1 conv
    (models/edsr.py:129-136); since it is a constant affine map we fold
    it to a vector add — zero FLOPs, fuses into the adjacent conv.

    `affine`: optional static 3x4 nested tuple (matrix | bias) that
    REPLACES the intended shift with the full affine out = M x + b.
    The reference's MeanShift constructor bug (edsr.py:131-133 assigns
    `weight_data`, never `weight.data`) leaves its frozen 1x1 convs at
    RANDOM init, so genuinely trained reference checkpoints were trained
    around arbitrary affines; restoring such a checkpoint installs them
    here (utils/torch_convert.extract_meanshift_overrides) — at this
    exact pre-padding graph position, which no params-level fold can
    reproduce at image borders.
    """

    sign: float = 1.0
    rgb_mean: Sequence[float] = DIV2K_RGB_MEAN
    affine: Optional[Tuple[Tuple[float, ...], ...]] = None

    @nn.compact
    def __call__(self, x):
        if self.affine is not None:
            mb = jnp.asarray(self.affine, dtype=x.dtype)  # (3, 4)
            return jnp.einsum("...i,ji->...j", x, mb[:, :3]) + mb[:, 3]
        mean = jnp.asarray(self.rgb_mean, dtype=x.dtype)
        return x + self.sign * mean


class ResBlock(nn.Module):
    """conv3x3 -> act -> conv3x3, residual add, optional scaling.

    Reference models/edsr.py:139-153 (weight=res_weight) and the
    0.1-Kaiming-init variant models/LarvaNet.py:205-220.
    """

    features: int
    res_weight: float = 1.0
    activation: str = "relu"
    slope: float = 0.1
    init_scale: Optional[float] = None  # None => torch default init
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation, self.slope)
        if self.init_scale is not None:
            kinit = kaiming_normal_scaled(self.init_scale)
            conv = lambda name: conv3x3(self.features, name=name, kernel_init=kinit,
                                        kernel_size=self.kernel_size)
        else:
            conv = lambda name: conv3x3(self.features, name=name, in_features=self.features,
                                        kernel_size=self.kernel_size)
        res = conv("conv1")(x)
        res = act(res)
        res = conv("conv2")(res)
        if self.res_weight != 1.0:
            res = res * self.res_weight
        return x + res


class DepthwiseSeparableResBlock(nn.Module):
    """dw3x3 -> pw1x1 -> act -> dw3x3 -> pw1x1, residual add
    (reference models/dwsr_reduced.py DepthWiseResidualBlock)."""

    features: int
    activation: str = "relu"
    init_scale: Optional[float] = 0.1

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        kinit = kaiming_normal_scaled(self.init_scale) if self.init_scale else None

        def dw(name):
            return conv3x3(
                self.features, name=name, kernel_init=kinit,
                in_features=self.features, feature_group_count=self.features,
            )

        def pw(name):
            return conv3x3(
                self.features, name=name, kernel_init=kinit,
                in_features=self.features, kernel_size=1,
            )

        res = pw("pw1")(dw("dw1")(x))
        res = act(res)
        res = pw("pw2")(dw("dw2")(res))
        return x + res


class UpsampleBlock(nn.Module):
    """conv3x3(C -> C*r^2) + PixelShuffle stages (reference models/edsr.py:156-173).

    scale 2/4/8 -> log2(scale) x2 stages; scale 3 -> one x3 stage.
    `activation` between stages reproduces the MSRR variant
    (models/msrr.py:188-211, LeakyReLU between shuffles).
    """

    features: int
    scale: int
    activation: Optional[str] = None
    slope: float = 0.1
    init_scale: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation, self.slope) if self.activation else None

        def make_conv(out_feats, name):
            if self.init_scale is not None:
                return conv3x3(out_feats, name=name, kernel_init=kaiming_normal_scaled(self.init_scale))
            return conv3x3(out_feats, name=name, in_features=self.features)

        if self.scale in (2, 4, 8):
            stages = int(math.log2(self.scale))
            for i in range(stages):
                x = make_conv(4 * self.features, "conv%d" % i)(x)
                x = pixel_shuffle(x, 2)
                if act is not None and i < stages - 1:
                    x = act(x)
        elif self.scale == 3:
            x = make_conv(9 * self.features, "conv0")(x)
            x = pixel_shuffle(x, 3)
        else:
            raise ValueError("unsupported scale %d" % (self.scale,))
        return x


class PReLU(nn.Module):
    """Per-channel PReLU, torch parity (nn.PReLU(C), slopes init 0.25)."""

    features: int

    @nn.compact
    def __call__(self, x):
        slope = self.param("slope", nn.initializers.constant(0.25), (self.features,))
        return jnp.where(x >= 0, x, x * slope)


class ConvTranspose2dTorch(nn.Module):
    """Transposed conv with torch ConvTranspose2d(k, s, p) geometry:
    out = (in-1)*s - 2p + k (reference models/ebrn.py:138-144 uses
    k/s/p = 8/4/2, 7/3/2, 6/2/2 per scale). Implemented as input-dilated
    conv with symmetric padding k-1-p."""

    features: int
    kernel_size: int
    stride: int
    padding: int

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            torch_conv_kernel_init,
            (k, k, in_features, self.features),
        )
        bias = self.param(
            "bias", torch_conv_bias_init(in_features * k * k), (self.features,)
        )
        pad = k - 1 - p
        out = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias


def interpolated_base(x: jax.Array, scale: int, method: str = "bicubic") -> jax.Array:
    """The residual 'base' image: F.interpolate(x, scale, align_corners=False)
    (reference models/LarvaNet.py:283-285). NHWC."""
    return upsample(x, scale, method)
