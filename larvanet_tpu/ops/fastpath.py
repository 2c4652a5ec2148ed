"""The ONE fast-path routing table: model family -> optimized forward.

bench.py, tools/trace_train.py --infer, and the serving CLIs previously
each carried their own copy of the "which packed/int8 builder applies to
this model" chain; a trace taken through a stale copy silently measured
a different graph than bench.py shipped (advisor finding r1). This
module is now the single source of truth.

`build_fast_forward` mirrors bench.py's routing exactly, including the
documented negative-result gates (packed IMDN only when packed_trunk is
explicitly on, full-EBRN HR flows only via packed_full_ebrn — both
measured slower, BASELINE.md). Returns (forward, description) or
(None, None) when the model runs the plain module graph.
"""

from __future__ import annotations

from typing import Optional, Tuple

# LR pixels/frame above which the PLAIN module graph beats the packed
# trunk on the v5e for trunks that UNDERFILL the 128-lane packed tile
# (measured crossover, BASELINE.md round-4 "full-frame routing" /
# XOVER_BENCH.json: at monolithic frame shapes XLA stops fusing the
# packed pairs' mask/residual/relu epilogues — each becomes a
# standalone frame-sized memory pass — while the plain graph's
# epilogues fuse at every shape; the 48ch flagship measures packed
# 16.2 vs plain 11.2 LR-MP/s at 0.13 MP but 5.7 vs 8.9 at 1080p, tie
# at 704x396 = 0.28 MP). Patch/tile serving stays packed.
PLAIN_FRAME_CROSSOVER_PX = 704 * 396  # the measured tie point


def plain_frame_crossover_px(model) -> int:
    """Family-aware default for the full-frame plain-graph dispatch
    (cli/common.maybe_plain_full_frame): the measured crossover for
    trunks that underfill the packed 128-lane MXU tile (2*features <
    128 — the flagship's 48ch trunk packs to 96 lanes), 0 (= never
    route) for full-tile trunks: LarvaNet_w64's packed graph measured
    faster-or-tied at EVERY frame size up to 1080p (15.25 vs 15.02
    LR-MP/s there — XOVER_BENCH.json), so plain routing has nothing to
    offer it."""
    feats = getattr(getattr(model, "module", None), "features", None)
    if feats is not None and int(feats) * 2 >= 128:
        return 0
    return PLAIN_FRAME_CROSSOVER_PX


def make_plain_forward(model, dtype):
    """The UNPACKED module graph in the serving dtype — the measured
    winner at monolithic full-frame shapes (>= PLAIN_FRAME_CROSSOVER_PX
    LR pixels). Honors --leg early exits like the model's own
    _forward_impl (models/larvanet.py)."""
    import jax

    module = model.module
    exits = (getattr(model.args, "leg", None)
             if getattr(model, "has_early_exit", False) else None)

    def fwd(params, x):
        p = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
        xd = x.astype(dtype)
        if exits is not None:
            return module.apply({"params": p}, xd, exits=int(exits))
        return module.apply({"params": p}, xd)

    return fwd


def build_fast_forward(model, dtype, packed_trunk: bool = True,
                       collapsed_tail: bool = True, int8_trunk: bool = False,
                       calib=None, packed_full_ebrn: bool = False,
                       ) -> Tuple[Optional[object], Optional[str]]:
    from larvanet_tpu.ops import packed_trunk as pt

    name = getattr(model, "registry_name", "") or ""

    module = getattr(model, "module", None)
    if (getattr(module, "ms_affine", None) is not None
            or getattr(module, "mis_affine", None) is not None):
        # A restored reference checkpoint installed its trained (random
        # frozen) MeanShift affines on the module (models/base.py); the
        # packed/int8 builders bake the INTENDED +/-mean shifts into
        # their fused graphs, so routing them would silently change the
        # computed function. Run the exact module graph instead.
        return None, None

    if int8_trunk:
        if calib is None:
            raise ValueError("int8_trunk requires a calibration batch")
        int8_table = [
            (lambda n: n in ("edsr", "edsr_loss"), pt.make_int8_edsr_forward,
             "int8 (W8A8) packed trunk + collapsed tail"),
            (lambda n: n.startswith("REGO"), pt.make_int8_rego_forward,
             "int8 (W8A8) packed trunk"),
            (lambda n: n == "TreeNet", pt.make_int8_treenet_forward,
             "int8 (W8A8) packed trunk"),
            (lambda n: n == "mamnet", pt.make_int8_mamnet_forward,
             "int8 (W8A8) packed trunk + collapsed tail"),
            (lambda n: n.startswith("hrsr"), pt.make_int8_hrsr_forward,
             "int8 (W8A8) packed trunk"),
            (lambda n: n.startswith("ebrn_rm"), pt.make_int8_ebrn_rm_forward,
             "int8 (W8A8) packed trunk"),
            (lambda n: n.startswith(("msrr", "dwsr")), pt.make_int8_msrr_forward,
             "int8 (W8A8) packed trunk"),
            (lambda n: n.startswith(("LarvaNet", "LarvaLeg")),
             pt.make_int8_larvanet_forward, "int8 (W8A8) packed trunk"),
        ]
        for match, build, desc in int8_table:
            if match(name):
                return build(model, calib, dtype=dtype), desc

    if packed_trunk and name.startswith(("LarvaNet", "LarvaLeg")):
        return pt.make_packed_larvanet_forward(model, dtype=dtype), "width-packed trunk"
    if packed_trunk and name == "imdn_aim2019":
        # negative result as a default CLI path (BASELINE.md) — routed
        # only when the caller explicitly asks for the packed trunk
        return pt.make_packed_imdn_forward(model, dtype=dtype), "width-packed trunk"
    if packed_trunk and name == "mamnet":
        return (pt.make_packed_mamnet_forward(model, dtype=dtype),
                "width-packed trunk + collapsed tail")
    if packed_trunk and name.startswith("ebrn_rm"):
        return pt.make_packed_ebrn_rm_forward(model, dtype=dtype), "width-packed trunk"
    if packed_full_ebrn and name == "ebrn":
        # documented negative result (18% slower; BASELINE.md) — opt-in
        return pt.make_packed_ebrn_forward(model, dtype=dtype), "width-packed HR flows"
    if packed_trunk and name.startswith("REGO"):
        return pt.make_packed_rego_forward(model, dtype=dtype), "width-packed trunk"
    if packed_trunk and name == "TreeNet":
        return pt.make_packed_treenet_forward(model, dtype=dtype), "width-packed trunk"
    if packed_trunk and name.startswith("hrsr"):
        return pt.make_packed_hrsr_forward(model, dtype=dtype), "width-packed trunk"
    if packed_trunk and name.startswith(("msrr", "dwsr")):
        try:
            return pt.make_packed_msrr_forward(model, dtype=dtype), "width-packed trunk"
        except ValueError:
            return None, None  # depthwise: plain graph
    if packed_trunk and collapsed_tail and name in ("edsr", "edsr_loss"):
        return (pt.make_packed_edsr_forward(model, dtype=dtype),
                "width-packed trunk + collapsed linear tail")
    if collapsed_tail and name in ("edsr", "edsr_loss"):
        from larvanet_tpu.ops.collapsed_tail import make_collapsed_edsr_forward

        return make_collapsed_edsr_forward(model, dtype=dtype), "collapsed linear tail"
    return None, None
