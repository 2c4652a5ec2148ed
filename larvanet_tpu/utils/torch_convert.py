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


# ---------------------------------------------------------------------------
# Trained-MeanShift extraction (advisor r2, medium).
#
# The reference MeanShift constructor assigns `weight_data`, never
# `weight.data` (reference models/edsr.py:131-133), so its 1x1 convs stay
# at their RANDOM Kaiming init, frozen. A genuinely trained reference
# checkpoint was trained AROUND those random convs and carries them in
# its state_dict; silently dropping them changes the computed function
# everywhere. Folding them into adjacent conv *params* cannot be exact
# either: the reference applies the affine BEFORE zero-padding, so a
# kernel-level fold also transforms the padding and the error ring grows
# one pixel per subsequent conv (measured: whole-frame contamination on
# deep trunks). The exact mechanism is a module-level override — our
# layers.MeanShift accepts a static `affine` field applying the
# checkpoint's actual 3x3+bias map at the same pre-padding graph
# position the reference does. extract_meanshift_overrides() returns
# those fields; models/base.py._restore_pth rebuilds the module with
# them (dataclasses.replace) when they deviate from the intended values.
#
# Families: both shifts applied in forward — edsr/edsr_loss/mamnet/
# imdn_aim2019/ebrn/ebrn_rm/msrr_reduced_meanshift; forward-only —
# REGO-Net/REGO-serial; constructed but DEAD in forward — msrr
# (reference models/msrr.py:218 vs :239-248).
# ---------------------------------------------------------------------------

_MEANSHIFT_ATOL = 1e-4
_MEANSHIFT_APPLIED = {
    "edsr": ("mean_shift", "mean_inverse_shift"),
    "edsr_loss": ("mean_shift", "mean_inverse_shift"),
    "mamnet": ("mean_shift", "mean_inverse_shift"),
    "imdn_aim2019": ("mean_shift", "mean_inverse_shift"),
    "ebrn": ("mean_shift", "mean_inverse_shift"),
    "ebrn_rm": ("mean_shift", "mean_inverse_shift"),
    "msrr_reduced_meanshift": ("mean_shift", "mean_inverse_shift"),
    "REGO-Net": ("mean_shift",),
    "REGO-serial": ("mean_shift",),
    "msrr": (),  # dead in forward: values are irrelevant
}


def _meanshift_affines(torch_state) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    out = {}
    for name in ("mean_shift", "mean_inverse_shift"):
        w = torch_state.get(name + ".weight")
        if w is None:
            continue
        M = np.asarray(w, dtype=np.float64).reshape(3, 3)
        b = np.asarray(torch_state.get(name + ".bias",
                                       np.zeros(3)), dtype=np.float64).reshape(3)
        out[name] = (M, b)
    return out


def _meanshift_is_intended(name: str, M: np.ndarray, b: np.ndarray) -> bool:
    sign = 1.0 if name == "mean_shift" else -1.0
    return (np.allclose(M, np.eye(3), atol=_MEANSHIFT_ATOL)
            and np.allclose(b, sign * np.asarray(_RGB_MEAN), atol=_MEANSHIFT_ATOL))


def extract_meanshift_overrides(torch_state: Dict, model_name: str) -> Dict[str, tuple]:
    """Detect trained (non-intended) MeanShift convs in a reference
    checkpoint and return module override fields for them.

    Returns {} when the shifts carry the intended identity+bias values
    (or the family never applies them in forward). Otherwise returns
    {'ms_affine': ..., 'mis_affine': ...} (only the deviating ones),
    each a static 3x4 nested tuple (matrix | bias) for
    layers.MeanShift's `affine` field.
    """
    applied = _MEANSHIFT_APPLIED.get(model_name, ())
    affines = _meanshift_affines(torch_state)
    out: Dict[str, tuple] = {}
    field = {"mean_shift": "ms_affine", "mean_inverse_shift": "mis_affine"}
    for name in applied:
        if name not in affines:
            continue
        M, b = affines[name]
        if _meanshift_is_intended(name, M, b):
            continue
        Mb = np.concatenate([M, b[:, None]], axis=1)
        out[field[name]] = tuple(tuple(float(v) for v in row) for row in Mb)
    return out


def convert_state_dict(torch_state: Dict, model_name: str) -> Tuple[Dict, list]:
    """torch state_dict (tensors or arrays) -> nested flax param dict.

    Returns (params_dict, skipped_keys). Raises KeyError on keys the
    model's rule set cannot place. Rules return a path string (plain
    conv), a (path, kind) tuple with kind in {'conv', 'convT', 'prelu'},
    or None to skip the key. MeanShift keys are always skipped here —
    callers that need the reference's trained (random frozen) shift
    values must pair this with extract_meanshift_overrides().
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


def load_pth(path: str, model_name: str) -> Tuple[Dict, list, Dict[str, tuple]]:
    """Load a reference .pth checkpoint into flax param form.

    Returns (params, skipped_keys, meanshift_overrides) — the overrides
    (see extract_meanshift_overrides) are non-empty iff the checkpoint
    carries trained/random frozen MeanShift convs that deviate from the
    intended identity+bias, in which case the caller must install them
    on the module for function parity with the trained reference model.

    weights_only=True: a state dict is plain tensors, and torch.load
    without it executes arbitrary pickled code on torch<2.6 — every CLI
    reaches here via --restore_path (advisor r2). Falls back for torch
    versions predating the kwarg.
    """
    import torch

    try:
        state = torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:  # torch < 1.13: no weights_only kwarg
        state = torch.load(path, map_location="cpu")
    state = {k: v.numpy() for k, v in state.items()}
    params, skipped = convert_state_dict(state, model_name)
    return params, skipped, extract_meanshift_overrides(state, model_name)


# ---------------------------------------------------------------------------
# Export: flax params -> reference torch state_dict (the inverse direction,
# so models trained here deploy through the reference's own restore flow —
# `load_state_dict(torch.load(path))`, reference models/base.py:66 — which
# is strict, so the export must be key-complete including MeanShift).
# ---------------------------------------------------------------------------


def _inv_conv(leaves) -> Dict[str, np.ndarray]:
    out = {"weight": np.ascontiguousarray(
        np.transpose(np.asarray(leaves["kernel"]), (3, 2, 0, 1)))}
    if "bias" in leaves:
        out["bias"] = np.asarray(leaves["bias"])
    return out


def _inv_conv_transpose(leaves) -> Dict[str, np.ndarray]:
    """Inverse of _conv_transpose: unflip the spatial axes, then the
    (2,3,0,1) transpose is an involution back to (Cin, Cout, kH, kW)."""
    k = np.asarray(leaves["kernel"])[::-1, ::-1]
    out = {"weight": np.ascontiguousarray(np.transpose(k, (2, 3, 0, 1)))}
    if "bias" in leaves:
        out["bias"] = np.asarray(leaves["bias"])
    return out


def _inv_prelu(leaves) -> Dict[str, np.ndarray]:
    return {"weight": np.asarray(leaves["slope"])}


def _exp_edsr(path: str):
    m = re.match(r"res_block_(\d+)/conv([12])$", path)
    if m:
        return "res_blocks.%s.body.%d" % (m.group(1), 0 if m.group(2) == "1" else 2)
    if path in ("first_conv", "after_res_conv", "final_conv"):
        return path
    m = re.match(r"upsample/conv(\d+)$", path)
    if m:
        return "upsample.body.%d" % (2 * int(m.group(1)))
    raise KeyError(path)


def _exp_larvanet(path: str):
    if path == "head":
        return "head.feature_extraction"
    m = re.match(r"body_(\d+)/block_(\d+)/conv([12])$", path)
    if m:
        return "body_%s.res_blocks.%s.body.%d" % (
            m.group(1), m.group(2), 0 if m.group(3) == "1" else 2)
    m = re.match(r"leg_(\d+)/recon/conv([12])$", path)  # _1c residual leg
    if m:
        return "body_%s.leg.recon_block.body.%d" % (
            m.group(1), 0 if m.group(2) == "1" else 2)
    m = re.match(r"leg_(\d+)/recon([12])$", path)
    if m:
        return "body_%s.leg.recon_block.%d" % (
            m.group(1), 0 if m.group(2) == "1" else 2)
    if path == "tail_merge":
        return "tail.merge_conv"
    m = re.match(r"tail_recon([12])$", path)
    if m:
        return "tail.recon_block.%d" % (0 if m.group(1) == "1" else 2)
    raise KeyError(path)


def _exp_msrr_reduced(path: str):
    m = re.match(r"res_block_(\d+)/conv([12])$", path)
    if m:
        return "res_blocks.%s.body.%d" % (m.group(1), 0 if m.group(2) == "1" else 2)
    if path == "first_conv":
        return path
    raise KeyError(path)


def _exp_imdn(path: str):
    m = re.match(r"imd_block_(\d+)/conv([1-4])$", path)
    if m:
        return "res_blocks.%s.conv%s.0" % (m.group(1), m.group(2))
    m = re.match(r"imd_block_(\d+)/conv5$", path)
    if m:
        return "res_blocks.%s.conv5" % (m.group(1),)
    if path in ("first_conv", "after_res_conv"):
        return path
    if path == "upsample_conv":
        return "upsample.body.0"
    raise KeyError(path)


def _exp_treenet(path: str):
    if path == "first_conv":
        return "common_parts.0"
    m = re.match(r"common_block_(\d+)/conv([12])$", path)
    if m:
        return "common_parts.2.%s.body.%d" % (m.group(1), 0 if m.group(2) == "1" else 2)
    m = re.match(r"branch_(\d+)_block_(\d+)/conv([12])$", path)
    if m:
        return "branch_%s.%s.body.%d" % (
            m.group(1), m.group(2), 0 if m.group(3) == "1" else 2)
    raise KeyError(path)


def _exp_mamnet(path: str):
    m = re.match(r"mam_block_(\d+)/mam/du([12])$", path)
    if m:
        return "res_blocks.%s.body.3.conv_du.%d" % (
            m.group(1), 0 if m.group(2) == "1" else 2)
    m = re.match(r"mam_block_(\d+)/mam/depthwise$", path)
    if m:
        return "res_blocks.%s.body.3.depthwise_conv2d" % (m.group(1),)
    m = re.match(r"mam_block_(\d+)/conv([12])$", path)
    if m:
        return "res_blocks.%s.body.%d" % (m.group(1), 0 if m.group(2) == "1" else 2)
    return _exp_edsr(path)


def _exp_msrr(path: str):
    m = re.match(r"res_block_(\d+)/conv([12])$", path)
    if m:
        return "res_blocks.%s.body.%d" % (m.group(1), 0 if m.group(2) == "1" else 2)
    m = re.match(r"upsample/conv(\d+)$", path)
    if m:
        return "upsample.body.%d" % (3 * int(m.group(1)))
    if path in ("first_conv", "HR_conv", "final_conv"):
        return path
    raise KeyError(path)


def _exp_ebrn_rm(path: str):
    m = re.match(r"brm_(\d+)_conv([12])$", path)
    if m:
        return "brms.%s.body.%d" % (m.group(1), 0 if m.group(2) == "1" else 2)
    m = re.match(r"fusion_(\d+)$", path)
    if m:
        return "fusion_layers.%s" % (m.group(1),)
    if path == "upsample_conv":
        return "upsample.body.0"
    if path == "first_conv":
        return path
    raise KeyError(path)


def _exp_hrsr(path: str):
    m = re.match(r"(lr|hr)_block_(\d+)/conv([12])$", path)
    if m:
        return "%s_res_blocks.%s.body.%d" % (
            m.group(1), m.group(2), 0 if m.group(3) == "1" else 2)
    if path in ("first_conv", "middle_conv", "final_conv"):
        return path
    raise KeyError(path)


def _make_exp_rego(serial: bool):
    def rule(path: str):
        m = re.match(r"RESB_(\d+)_(\d+)_(\d+)/conv([12])$", path)
        if m:
            body = 0 if m.group(4) == "1" else 2
            if serial:
                return "RESB_%s_%s_%s.body.%d" % (
                    m.group(1), m.group(2), m.group(3), body)
            # REGO-Net keys carry no repeat index (always our k=0)
            return "RESB_%s_%s.body.%d" % (m.group(2), m.group(3), body)
        m = re.match(r"conv_(\d+)$", path)
        if m:
            return path.replace("/", ".")
        if path == "feature_extraction":
            return path
        if path == "SRrecon":
            return "SRrecon.body.0"
        raise KeyError(path)
    return rule


def _exp_ebrn(path: str):
    m = re.match(r"fe(\d+)$", path)
    if m:
        return "feature_extract.%d" % (2 * int(m.group(1)))
    m = re.match(r"fe_prelu(\d+)$", path)
    if m:
        return ("feature_extract.%d" % (2 * int(m.group(1)) + 1), "prelu")
    m = re.match(r"brm_(\d+)/up_block$", path)
    if m:
        return ("brms.%s.up_block" % (m.group(1),), "convT")
    m = re.match(r"brm_(\d+)/down_block$", path)
    if m:
        return "brms.%s.down_block" % (m.group(1),)
    m = re.match(r"brm_(\d+)/(sr|bp)_flow/conv(\d+)$", path)
    if m:
        return "brms.%s.%s_flow.%d" % (m.group(1), m.group(2), 2 * int(m.group(3)))
    m = re.match(r"brm_(\d+)/(sr|bp)_flow/prelu(\d+)$", path)
    if m:
        return ("brms.%s.%s_flow.%d" % (m.group(1), m.group(2), 2 * int(m.group(3)) + 1),
                "prelu")
    m = re.match(r"fusion_(\d+)$", path)
    if m:
        return "fusion_layers.%s" % (m.group(1),)
    if path == "recon":
        return "recon_layer"
    raise KeyError(path)


def _exp_msrr_test(path: str):
    m = re.match(r"res_block_(\d+)/conv([12])$", path)
    if m:
        return "recon_trunk.%s.conv%s" % (m.group(1), m.group(2))
    if path in ("conv_first", "upconv1", "upconv2", "HRconv", "conv_last"):
        return path
    raise KeyError(path)


def _exp_dwsr(path: str):
    m = re.match(r"res_block_(\d+)/(dw1|pw1|dw2|pw2)$", path)
    if m:
        body = {"dw1": 0, "pw1": 1, "dw2": 3, "pw2": 4}[m.group(2)]
        return "res_blocks.%s.body.%d" % (m.group(1), body)
    if path == "first_conv":
        return path
    raise KeyError(path)


EXPORT_RULES = {
    "edsr": _exp_edsr,
    "edsr_loss": _exp_edsr,
    "ebrn": _exp_ebrn,
    "msrr_test": _exp_msrr_test,
    "dwsr_reduced": _exp_dwsr,
    "mamnet": _exp_mamnet,
    "msrr": _exp_msrr,
    "ebrn_rm": _exp_ebrn_rm,
    "hrsr": _exp_hrsr,
    "hrsr_": _exp_hrsr,
    "hrsr_c3": _exp_hrsr,
    "REGO-Net": _make_exp_rego(serial=False),
    "REGO-serial": _make_exp_rego(serial=True),
    "LarvaNet": _exp_larvanet,
    "LarvaNetV2": _exp_larvanet,
    "LarvaLeg": _exp_larvanet,
    "LarvaLegV2": _exp_larvanet,
    "LarvaNet_0c": _exp_larvanet,
    "LarvaNet_1c": _exp_larvanet,
    "LarvaNet_4c": _exp_larvanet,
    "LarvaNet_skip": _exp_larvanet,
    "LarvaNet_res": _exp_larvanet,
    "msrr_reduced": _exp_msrr_reduced,
    "msrr_reduced_def_init": _exp_msrr_reduced,
    "msrr_reduced_NI": _exp_msrr_reduced,
    "msrr_reduced_linear": _exp_msrr_reduced,
    "msrr_reduced_relu6": _exp_msrr_reduced,
    "msrr_reduced_leaky": _exp_msrr_reduced,
    "msrr_reduced_meanshift": _exp_msrr_reduced,
    "imdn_aim2019": _exp_imdn,
    "TreeNet": _exp_treenet,
}

# Reference modules whose state dicts carry MeanShift parameters (grep of
# /root/reference/models: self.mean_shift at edsr.py:181, mamnet.py:200,
# imdn_aim2019.py:195, msrr.py:218, msrr_reduced_meanshift.py:179,
# ebrn.py:189, ebrn_rm.py:178, REGO-Net.py:175 / REGO-serial.py:195 —
# the REGOs have no inverse shift). The reference constructor bug
# (edsr.py:132-133 assigns `weight_data`, never `weight.data`) leaves
# those convs RANDOM at construction; since the reference restore sets
# them from the checkpoint, we export the INTENDED identity+bias so the
# deployed torch model computes the same function this framework trained.
_RGB_MEAN = (114.4, 111.5, 103.0)
_MEANSHIFT_BOTH = {"edsr", "edsr_loss", "mamnet", "imdn_aim2019", "msrr",
                   "msrr_reduced_meanshift", "ebrn", "ebrn_rm"}
_MEANSHIFT_FWD_ONLY = {"REGO-Net", "REGO-serial"}


def _meanshift_entries(model_name: str) -> Dict[str, np.ndarray]:
    names = []
    if model_name in _MEANSHIFT_BOTH:
        names = [("mean_shift", 1.0), ("mean_inverse_shift", -1.0)]
    elif model_name in _MEANSHIFT_FWD_ONLY:
        names = [("mean_shift", 1.0)]
    out = {}
    for name, sign in names:
        out[name + ".weight"] = np.eye(3, dtype=np.float32).reshape(3, 3, 1, 1)
        out[name + ".bias"] = sign * np.asarray(_RGB_MEAN, dtype=np.float32)
    return out


def _flatten_param_groups(params: Dict, prefix: str = ""):
    """Yield (path, leaves) for each dict holding kernel/bias/slope arrays."""
    if any(k in params for k in ("kernel", "slope")):
        yield prefix, params
        return
    for key, val in params.items():
        sub = prefix + "/" + str(key) if prefix else str(key)
        if isinstance(val, dict) or hasattr(val, "items"):
            yield from _flatten_param_groups(dict(val), sub)
        else:
            raise KeyError("unexpected bare leaf at %s" % sub)


def export_state_dict(params: Dict, model_name: str) -> Dict[str, np.ndarray]:
    """flax param dict -> reference torch state_dict (numpy values).

    Key-complete for the reference's strict `load_state_dict`, including
    synthesized MeanShift entries. Raises KeyError on any param path the
    family's export rules cannot place (loud, like convert_state_dict).
    """
    rules = EXPORT_RULES[model_name]
    state: Dict[str, np.ndarray] = {}
    for path, leaves in _flatten_param_groups(dict(params)):
        spec = rules(path)
        stem, kind = spec if isinstance(spec, tuple) else (spec, "conv")
        if kind == "convT":
            tensors = _inv_conv_transpose(leaves)
        elif kind == "prelu":
            tensors = _inv_prelu(leaves)
        else:
            tensors = _inv_conv(leaves)
        for suffix, value in tensors.items():
            state[stem + "." + suffix] = value
    state.update(_meanshift_entries(model_name))
    if model_name == "ebrn":
        _synthesize_dead_brm(state)
    return state


def _synthesize_dead_brm(state: Dict[str, np.ndarray]) -> None:
    """Full EBRN: the reference's LAST BRM is built with back_project=False
    yet its constructor still creates down_block + bp_flow (reference
    models/ebrn.py:156-166); forward (:171-176) never touches them, but
    strict load_state_dict demands the keys. Our model rightly owns no
    such params — synthesize zero-valued dead entries."""
    n = 1 + max(int(re.match(r"brms\.(\d+)\.", k).group(1))
                for k in state if k.startswith("brms."))
    last = "brms.%d." % (n - 1)
    if last + "down_block.weight" in state:
        return  # params already carried them (e.g. converted-from-reference)
    up = state[last + "up_block.weight"]  # ConvTranspose (C, C, kH, kW)
    c, k = up.shape[0], up.shape[2]
    state[last + "down_block.weight"] = np.zeros((c, c, k, k), np.float32)
    state[last + "down_block.bias"] = np.zeros((c,), np.float32)
    for i in (0, 2, 4):
        state[last + "bp_flow.%d.weight" % i] = np.zeros((c, c, 3, 3), np.float32)
        state[last + "bp_flow.%d.bias" % i] = np.zeros((c,), np.float32)
    for i in (1, 3, 5):
        state[last + "bp_flow.%d.weight" % i] = np.full((c,), 0.25, np.float32)


def save_pth(params: Dict, model_name: str, path: str) -> str:
    """Write a reference-loadable .pth checkpoint from flax params."""
    import torch

    # np.array(copy=True): from_numpy refuses non-writable views (jax
    # arrays expose read-only buffers)
    state = {k: torch.from_numpy(np.array(v))
             for k, v in export_state_dict(params, model_name).items()}
    torch.save(state, path)
    return path
