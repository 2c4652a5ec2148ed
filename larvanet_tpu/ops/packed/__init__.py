"""Width-packed trunk package (formerly the ops/packed_trunk.py monolith).

Layout:
  core.py    — the packing math: grids, kernel routing, masks, packed
               conv/resblock primitives, depthwise/pointwise packings.
  pairs.py   — conv-pair runners: exact, QAT fake-quant, remat wrapper,
               the int8 calibrate/serve runner.
  edsr.py, branchy.py (treenet/hrsr/rego/ebrn_rm), light.py (ebrn/imdn),
  mamnet.py, msrr.py, larvanet.py — one topology walk per family plus
  its exact / int8 / training forward makers.

Public API is re-exported here AND by the legacy ops.packed_trunk shim;
ops/fastpath.py centralizes model-side routing.
"""

from larvanet_tpu.ops.packed.core import (  # noqa: F401
    concat_packed_perm,
    conv_a,
    conv_b,
    conv_plain,
    conv_same,
    depthwise_packed,
    grid0_mask,
    grid1_mask,
    pack_bias,
    pack_kernel_a,
    pack_kernel_b,
    pack_kernel_same,
    pack_w,
    packed_block,
    packed_dw_resblock,
    packed_entry,
    packed_entry_head,
    packed_exit,
    packed_prelu,
    packed_resblock,
    pointwise_packed,
    single_same,
    unpack_w,
)
from larvanet_tpu.ops.packed.pairs import (  # noqa: F401
    exact_pair,
    make_pair_runner,
    qat_pair,
    remat_pair,
)
from larvanet_tpu.ops.packed.edsr import (  # noqa: F401
    make_int8_edsr_forward,
    make_packed_collapsed_edsr_train_forward,
    make_packed_edsr_forward,
    make_packed_edsr_train_forward,
)
from larvanet_tpu.ops.packed.branchy import (  # noqa: F401
    make_int8_ebrn_rm_forward,
    make_int8_hrsr_forward,
    make_int8_rego_forward,
    make_int8_treenet_forward,
    make_packed_ebrn_rm_forward,
    make_packed_hrsr_forward,
    make_packed_rego_forward,
    make_packed_treenet_forward,
)
from larvanet_tpu.ops.packed.light import (  # noqa: F401
    make_packed_ebrn_forward,
    make_packed_imdn_forward,
)
from larvanet_tpu.ops.packed.mamnet import (  # noqa: F401
    make_collapsed_mamnet_train_forward,
    make_int8_mamnet_forward,
    make_packed_collapsed_mamnet_train_forward,
    make_packed_mamnet_forward,
    packed_mam_gate,
)
from larvanet_tpu.ops.packed.msrr import (  # noqa: F401
    make_int8_msrr_forward,
    make_packed_msrr_forward,
)
from larvanet_tpu.ops.packed.larvanet import (  # noqa: F401
    make_int8_larvanet_forward,
    make_packed_larvanet_forward,
)
