"""Reference `.pth` checkpoint converter: torch state_dict -> flax params.

Lets users of the reference workbench bring their trained weights: conv
kernels transpose OIHW -> HWIO; our PixelShuffle keeps torch channel
ordering (ops/pixel_shuffle.py) so no channel permutation is needed.
The reference's MeanShift convs are dead parameters (they assign
`weight_data`, never `weight.data` — reference models/edsr.py:132-133 —
so they apply a *random frozen* conv at runtime); we fold the intended
identity+bias meanshift into a parameter-free op and skip those keys.
NOTE: because of that reference bug, converted-EDSR outputs match the
*intended* semantics, not the reference's accidental random meanshift.

Name maps are provided for the model families whose checkpoints are
worth porting (edsr/mamnet/msrr*/LarvaNet family/TreeNet/IMDN/hrsr);
`convert_state_dict` reports any unmapped keys loudly.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _conv(w, b) -> Dict[str, np.ndarray]:
    out = {"kernel": np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def _conv_transpose(w, b) -> Dict[str, np.ndarray]:
    """torch ConvTranspose2d (Cin, Cout, kH, kW) -> our input-dilated
    correlation kernel: HWIO with the spatial axes flipped (a transposed
    convolution equals correlation-with-dilated-input by the flipped
    kernel)."""
    k = np.transpose(np.asarray(w), (2, 3, 0, 1))[::-1, ::-1]
    out = {"kernel": np.ascontiguousarray(k)}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def _prelu(w) -> Dict[str, np.ndarray]:
    return {"slope": np.asarray(w)}


def _rules_edsr(key: str):
    m = re.match(r"res_blocks\.(\d+)\.body\.(0|2)", key)
    if m:
        return "res_block_%s/conv%d" % (m.group(1), 1 if m.group(2) == "0" else 2)
    for name in ("first_conv", "after_res_conv", "final_conv"):
        if key.startswith(name):
            return name
    m = re.match(r"upsample\.body\.(\d+)", key)
    if m:
        # torch Sequential indices 0, 2, ... are the convs (shuffles own no params)
        return "upsample/conv%d" % (int(m.group(1)) // 2)
    if key.startswith("mean_shift") or key.startswith("mean_inverse_shift"):
        return None  # folded (and dead in the reference anyway)
    raise KeyError(key)


def _rules_larvanet(key: str):
    if key.startswith("head.feature_extraction"):
        return "head"
    m = re.match(r"body_(\d+)\.res_blocks\.(\d+)\.body\.(0|2)", key)
    if m:
        return "body_%s/block_%s/conv%d" % (
            m.group(1), m.group(2), 1 if m.group(3) == "0" else 2)
    # _1c variant: leg recon is a ResidualBlock (recon_block.body.{0,2})
    m = re.match(r"body_(\d+)\.leg\.recon_block\.body\.(0|2)", key)
    if m:
        return "leg_%s/recon/conv%d" % (m.group(1), 1 if m.group(2) == "0" else 2)
    m = re.match(r"body_(\d+)\.leg\.recon_block\.(0|2)", key)
    if m:
        return "leg_%s/recon%d" % (m.group(1), 1 if m.group(2) == "0" else 2)
    m = re.match(r"tail\.merge_conv", key)
    if m:
        return "tail_merge"
    m = re.match(r"tail\.recon_block\.(0|2)", key)
    if m:
        return "tail_recon%d" % (1 if m.group(1) == "0" else 2)
    raise KeyError(key)


def _rules_msrr_reduced(key: str):
    m = re.match(r"res_blocks\.(\d+)\.body\.(0|2)", key)
    if m:
        return "res_block_%s/conv%d" % (m.group(1), 1 if m.group(2) == "0" else 2)
    if key.startswith("first_conv"):
        return "first_conv"
    if key.startswith("mean_shift") or key.startswith("mean_inverse_shift"):
        return None
    raise KeyError(key)


def _rules_imdn(key: str):
    m = re.match(r"res_blocks\.(\d+)\.conv([1-4])\.0", key)
    if m:
        return "imd_block_%s/conv%s" % (m.group(1), m.group(2))
    m = re.match(r"res_blocks\.(\d+)\.conv5", key)
    if m:
        return "imd_block_%s/conv5" % (m.group(1),)
    for name in ("first_conv", "after_res_conv"):
        if key.startswith(name):
            return name
    if key.startswith("upsample.body.0"):
        return "upsample_conv"
    if key.startswith("mean_shift") or key.startswith("mean_inverse_shift"):
        return None
    raise KeyError(key)


def _rules_treenet(key: str):
    if key.startswith("common_parts.0"):
        return "first_conv"
    m = re.match(r"common_parts\.2\.(\d+)\.body\.(0|2)", key)
    if m:
        return "common_block_%s/conv%d" % (m.group(1), 1 if m.group(2) == "0" else 2)
    m = re.match(r"branch_(\d+)\.(\d+)\.body\.(0|2)", key)
    if m:
        return "branch_%s_block_%s/conv%d" % (
            m.group(1), m.group(2), 1 if m.group(3) == "0" else 2)
    raise KeyError(key)


def _rules_mamnet(key: str):
    m = re.match(r"res_blocks\.(\d+)\.body\.3\.conv_du\.(0|2)", key)
    if m:
        return "mam_block_%s/mam/du%d" % (m.group(1), 1 if m.group(2) == "0" else 2)
    m = re.match(r"res_blocks\.(\d+)\.body\.3\.depthwise_conv2d", key)
    if m:
        return "mam_block_%s/mam/depthwise" % (m.group(1),)
    m = re.match(r"res_blocks\.(\d+)\.body\.(0|2)", key)
    if m:
        return "mam_block_%s/conv%d" % (m.group(1), 1 if m.group(2) == "0" else 2)
    return _rules_edsr(key)


def _rules_msrr(key: str):
    m = re.match(r"res_blocks\.(\d+)\.body\.(0|2)", key)
    if m:
        return "res_block_%s/conv%d" % (m.group(1), 1 if m.group(2) == "0" else 2)
    m = re.match(r"upsample\.body\.(\d+)", key)
    if m:
        # Sequential [conv, PS, LReLU] repeated: convs at 0, 3, 6, ...
        return "upsample/conv%d" % (int(m.group(1)) // 3,)
    for name in ("first_conv", "HR_conv", "final_conv"):
        if key.startswith(name):
            return name
    if key.startswith("mean_shift") or key.startswith("mean_inverse_shift"):
        return None
    raise KeyError(key)


def _rules_ebrn_rm(key: str):
    m = re.match(r"brms\.(\d+)\.body\.(0|2)", key)
    if m:
        return "brm_%s_conv%d" % (m.group(1), 1 if m.group(2) == "0" else 2)
    m = re.match(r"fusion_layers\.(\d+)", key)
    if m:
        return "fusion_%s" % (m.group(1),)
    if key.startswith("upsample.body.0"):
        return "upsample_conv"
    if key.startswith("first_conv"):
        return "first_conv"
    if key.startswith("mean_shift") or key.startswith("mean_inverse_shift"):
        return None
    raise KeyError(key)


def _rules_hrsr(key: str):
    m = re.match(r"(lr|hr)_res_blocks\.(\d+)\.body\.(0|2)", key)
    if m:
        return "%s_block_%s/conv%d" % (m.group(1), m.group(2), 1 if m.group(3) == "0" else 2)
    for name in ("first_conv", "middle_conv", "final_conv"):
        if key.startswith(name):
            return name
    raise KeyError(key)


def _rules_rego(key: str):
    m = re.match(r"RESB_(\d+)_(\d+)_(\d+)\.body\.(0|2)", key)
    if m:  # REGO-serial keys already carry the repeat index k
        return "RESB_%s_%s_%s/conv%d" % (
            m.group(1), m.group(2), m.group(3), 1 if m.group(4) == "0" else 2)
    m = re.match(r"RESB_(\d+)_(\d+)\.body\.(0|2)", key)
    if m:  # REGO-Net: single triangle => our repeat index 0
        return "RESB_0_%s_%s/conv%d" % (
            m.group(1), m.group(2), 1 if m.group(3) == "0" else 2)
    m = re.match(r"conv_(\d+)", key)
    if m:
        return "conv_%s" % (m.group(1),)
    if key.startswith("feature_extraction"):
        return "feature_extraction"
    if key.startswith("SRrecon.body.0"):
        return "SRrecon"
    if key.startswith("mean_shift") or key.startswith("mean_inverse_shift"):
        return None
    raise KeyError(key)


def _rules_ebrn(key: str):
    m = re.match(r"feature_extract\.(\d+)", key)
    if m:
        idx = int(m.group(1))
        if idx % 2 == 0:
            return "fe%d" % (idx // 2,)
        return ("fe_prelu%d" % (idx // 2,), "prelu")
    m = re.match(r"brms\.(\d+)\.up_block", key)
    if m:
        return ("brm_%s/up_block" % (m.group(1),), "convT")
    m = re.match(r"brms\.(\d+)\.down_block", key)
    if m:
        return "brm_%s/down_block" % (m.group(1),)
    m = re.match(r"brms\.(\d+)\.(sr|bp)_flow\.(\d+)", key)
    if m:
        idx = int(m.group(3))
        base = "brm_%s/%s_flow" % (m.group(1), m.group(2))
        if idx % 2 == 0:
            return "%s/conv%d" % (base, idx // 2)
        return ("%s/prelu%d" % (base, idx // 2), "prelu")
    m = re.match(r"fusion_layers\.(\d+)", key)
    if m:
        return "fusion_%s" % (m.group(1),)
    if key.startswith("recon_layer"):
        return "recon"
    if key.startswith("mean_shift") or key.startswith("mean_inverse_shift"):
        return None
    raise KeyError(key)


def _rules_msrr_test(key: str):
    m = re.match(r"recon_trunk\.(\d+)\.conv(1|2)", key)
    if m:
        return "res_block_%s/conv%s" % (m.group(1), m.group(2))
    for name in ("conv_first", "upconv1", "upconv2", "HRconv", "conv_last"):
        if key.startswith(name):
            return name
    raise KeyError(key)


def _rules_dwsr(key: str):
    m = re.match(r"res_blocks\.(\d+)\.body\.(0|1|3|4)", key)
    if m:
        part = {"0": "dw1", "1": "pw1", "3": "dw2", "4": "pw2"}[m.group(2)]
        return "res_block_%s/%s" % (m.group(1), part)
    if key.startswith("first_conv"):
        return "first_conv"
    raise KeyError(key)


RULES = {
    "edsr": _rules_edsr,
    "edsr_loss": _rules_edsr,
    "ebrn": _rules_ebrn,
    "msrr_test": _rules_msrr_test,
    "dwsr_reduced": _rules_dwsr,
    "mamnet": _rules_mamnet,
    "msrr": _rules_msrr,
    "ebrn_rm": _rules_ebrn_rm,
    "hrsr": _rules_hrsr,
    "hrsr_": _rules_hrsr,
    "hrsr_c3": _rules_hrsr,
    "REGO-Net": _rules_rego,
    "REGO-serial": _rules_rego,
    "LarvaNet": _rules_larvanet,
    "LarvaNetV2": _rules_larvanet,
    "LarvaLeg": _rules_larvanet,
    "LarvaLegV2": _rules_larvanet,
    "LarvaNet_0c": _rules_larvanet,
    "LarvaNet_1c": _rules_larvanet,
    "LarvaNet_4c": _rules_larvanet,
    "LarvaNet_skip": _rules_larvanet,
    "LarvaNet_res": _rules_larvanet,
    "msrr_reduced": _rules_msrr_reduced,
    "msrr_reduced_def_init": _rules_msrr_reduced,
    "msrr_reduced_NI": _rules_msrr_reduced,
    "msrr_reduced_linear": _rules_msrr_reduced,
    "msrr_reduced_relu6": _rules_msrr_reduced,
    "msrr_reduced_leaky": _rules_msrr_reduced,
    "msrr_reduced_meanshift": _rules_msrr_reduced,
    "imdn_aim2019": _rules_imdn,
    "TreeNet": _rules_treenet,
}


def convert_state_dict(torch_state: Dict, model_name: str) -> Tuple[Dict, list]:
    """torch state_dict (tensors or arrays) -> nested flax param dict.

    Returns (params_dict, skipped_keys). Raises KeyError on keys the
    model's rule set cannot place. Rules return a path string (plain
    conv), a (path, kind) tuple with kind in {'conv', 'convT', 'prelu'},
    or None to skip the key.
    """
    rules = RULES[model_name]
    flat: Dict[str, Dict[str, np.ndarray]] = {}
    skipped = []
    items = {k: v for k, v in torch_state.items()}
    for key in list(items):
        if not key.endswith(".weight"):
            continue
        stem = key[: -len(".weight")]
        spec = rules(stem)
        if spec is None:
            skipped.append(stem)
            continue
        path, kind = spec if isinstance(spec, tuple) else (spec, "conv")
        bias = items.get(stem + ".bias")
        if kind == "convT":
            flat[path] = _conv_transpose(items[key], bias)
        elif kind == "prelu":
            flat[path] = _prelu(items[key])
        else:
            flat[path] = _conv(items[key], bias)

    nested: Dict = {}
    for path, leaves in flat.items():
        node = nested
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaves
    return nested, skipped


def load_pth(path: str, model_name: str) -> Tuple[Dict, list]:
    """Load a reference .pth checkpoint into flax param form."""
    import torch

    state = torch.load(path, map_location="cpu")
    state = {k: v.numpy() for k, v in state.items()}
    return convert_state_dict(state, model_name)
