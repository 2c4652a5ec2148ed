"""Legacy import surface for the width-packed trunk (now ops/packed/).

The 1,900-line monolith this module used to be was split into the
ops/packed package (core / pairs / one module per family — see
ops/packed/__init__.py for the layout). Every public name keeps working
from here; new code should import from larvanet_tpu.ops.packed.
"""

from larvanet_tpu.ops.packed import *  # noqa: F401,F403
from larvanet_tpu.ops.packed.core import (  # noqa: F401
    _even_calib,
    _grid1_to_grid0_identity,
    _route,
)
from larvanet_tpu.ops.packed.pairs import (  # noqa: F401
    _fake_quant,
    _make_int8,
    _quantize_pair_weights,
    _remat_requested,
    _ste_round,
    _training_pair,
)
from larvanet_tpu.ops.packed.edsr import _edsr_walk  # noqa: F401
from larvanet_tpu.ops.packed.branchy import (  # noqa: F401
    _ebrn_rm_walk,
    _hrsr_walk,
    _rego_walk,
    _treenet_walk,
)
from larvanet_tpu.ops.packed.mamnet import (  # noqa: F401
    _mamnet_fast_tail,
    _mamnet_walk,
)
from larvanet_tpu.ops.packed.msrr import _msrr_walk  # noqa: F401
from larvanet_tpu.ops.packed.larvanet import _larvanet_walk  # noqa: F401
