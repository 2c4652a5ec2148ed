"""Per-family A/B sweep for --lr_domain_loss (TPU measurement driver).

The LR-domain training loss (models/base.add_lr_domain_flag) computes the
mean-L1 against pixel-unshuffled targets BEFORE the trailing
depth-to-space, removing the output PixelShuffle from fwd+bwd — measured
+13% on EDSR-b (BASELINE.md round-3 anatomy). Round 3 rolled the option
out to every family whose training graph ends in a trailing shuffle
(TreeNet / REGO-Net / ebrn_rm / msrr_reduced / mamnet); this driver runs
the chained-fori train-step microbench (tools/train_microbench.py — the
only trustworthy timing methodology on this tunnel, CLAUDE.md) for both
arms of each family and writes LR_DOMAIN_SWEEP.json so the per-family
defaults are set from measurements, not analogy to EDSR.

Resilience contract (ADVICE r3): every arm runs through
tools/resilience.run_measured — bounded timeout (a TimeoutExpired used
to abort the whole sweep mid-family), one retry (tunnel INTERNAL errors
are frequently transient; the round-3 REGO-Net arm died on one), and
structured {"ok": False, "error": ...} records instead of tracebacks.
Recommendations carry a noise band: measured deltas on this tunnel are
the same order as run-to-run noise (~1%), so within the band the
family's SHIPPED default is kept rather than flipped on noise.

Usage (repo root):  python -m tools.lr_domain_sweep [--families a,b,...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

from tools.resilience import REPO, run_measured

# (family, extra model flags) — configs match BASELINE.md's training table.
CONFIGS = [
    ("TreeNet", []),
    ("REGO-Net", []),
    ("ebrn_rm", []),
    ("msrr_reduced", ["--num_blocks", "32"]),
    ("mamnet", []),
]

NOISE_BAND = 0.01  # |speedup - 1| below this: keep the shipped default

_LINE = re.compile(
    r"model=\S+\s+([\d.]+) ms/step\s+([\d.]+) steps/s\s+([\d.]+) LR-MP/s")


def _parse_microbench(stdout):
    m = _LINE.search(stdout)
    if not m:
        raise ValueError("no microbench line in: " + stdout[-300:])
    return {"ms_step": float(m.group(1)), "steps_s": float(m.group(2)),
            "lr_mps": float(m.group(3))}


def run_arm(family, extra, lr_domain, timeout, retries=1):
    cmd = [sys.executable, "-m", "tools.train_microbench",
           "--model", family, "--",
           "--lr_domain_loss", str(lr_domain)] + list(extra)
    return run_measured(cmd, timeout=timeout, retries=retries,
                        parse=_parse_microbench)


def shipped_default(family):
    """The family's shipped --lr_domain_loss default, read from its own
    parser (the value under audit — ADVICE r3 #1 flagged REGO's)."""
    from larvanet_tpu.core.registry import get_model

    model = get_model(family)
    model.parse_args([])
    return int(getattr(model.args, "lr_domain_loss", 0))


def recommend(speedup, current_default, band=NOISE_BAND):
    """Flip the default only on a measured win outside the noise band."""
    if speedup is None:
        return {"recommend_default": current_default,
                "reason": "unmeasured (arm failed); keeping shipped default"}
    if abs(speedup - 1.0) < band:
        return {"recommend_default": current_default, "within_noise": True,
                "reason": "|speedup-1| < %.0f%% noise band" % (band * 100)}
    return {"recommend_default": 1 if speedup > 1.0 else 0}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", type=str, default="",
                    help="Comma list; default = all rolled-out families.")
    ap.add_argument("--timeout", type=int, default=2400,
                    help="Per-arm subprocess timeout (remote AOT compiles "
                         "run 1-6 min per graph; each arm compiles two).")
    ap.add_argument("--retries", type=int, default=1)
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "LR_DOMAIN_SWEEP.json"))
    args = ap.parse_args(argv)

    want = [f.strip() for f in args.families.split(",") if f.strip()]
    configs = [(f, e) for f, e in CONFIGS if not want or f in want]

    # Partial runs (--families) merge into the existing report instead of
    # clobbering the other families' measured rows (ADVICE r3: re-capturing
    # one datapoint must not discard the rest of the artifact).
    results = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                results = json.load(f)
        except (ValueError, OSError):
            results = {}
    for family, extra in configs:
        row = {"shipped_default": shipped_default(family)}
        for arm in (0, 1):
            r = run_arm(family, extra, arm, args.timeout, args.retries)
            row["lr_domain_%d" % arm] = r
            tag = ("%.1f steps/s (attempt %d)" % (r["steps_s"], r["attempts"])
                   if r["ok"] else "ERROR: " + r["error"][:120])
            print("%-14s lr_domain=%d  %s" % (family, arm, tag), flush=True)
        a, b = row["lr_domain_0"], row["lr_domain_1"]
        speedup = (round(b["steps_s"] / a["steps_s"], 4)
                   if a["ok"] and b["ok"] else None)
        if speedup is not None:
            row["speedup"] = speedup
        row.update(recommend(speedup, row["shipped_default"]))
        results[family] = row
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
            f.write("\n")
    # rows merged from a pre-round-4 report may lack "ok" keys — .get()
    # so a legacy row can't KeyError the summary after all arms measured
    summary = {f: (r.get("speedup") if "speedup" in r
                   else "ERROR(arm %s)" % ",".join(
                       str(i) for i in (0, 1)
                       if not r.get("lr_domain_%d" % i, {}).get("ok")))
               for f, r in results.items()}
    print(json.dumps(summary))
    return results


if __name__ == "__main__":
    main()
