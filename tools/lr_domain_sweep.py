"""Per-family A/B sweep for --lr_domain_loss (TPU measurement driver).

The LR-domain training loss (models/base.add_lr_domain_flag) computes the
mean-L1 against pixel-unshuffled targets BEFORE the trailing
depth-to-space, removing the output PixelShuffle from fwd+bwd — measured
+13% on EDSR-b (BASELINE.md round-3 anatomy). Session 3 rolled the option
out to every family whose training graph ends in a trailing shuffle
(TreeNet / REGO-Net / ebrn_rm / msrr_reduced / mamnet); this driver runs
the chained-fori train-step microbench (tools/train_microbench.py — the
only trustworthy timing methodology on this tunnel, CLAUDE.md) for both
arms of each family and writes LR_DOMAIN_SWEEP.json so the per-family
defaults are set from measurements, not analogy to EDSR.

Usage (repo root):  python -m tools.lr_domain_sweep [--families a,b,...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (family, extra model flags) — configs match BASELINE.md's training table.
CONFIGS = [
    ("TreeNet", []),
    ("REGO-Net", []),
    ("ebrn_rm", []),
    ("msrr_reduced", ["--num_blocks", "32"]),
    ("mamnet", []),
]

_LINE = re.compile(
    r"model=\S+\s+([\d.]+) ms/step\s+([\d.]+) steps/s\s+([\d.]+) LR-MP/s")


def run_arm(family, extra, lr_domain, timeout):
    cmd = [sys.executable, "-m", "tools.train_microbench",
           "--model", family, "--",
           "--lr_domain_loss", str(lr_domain)] + list(extra)
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                          timeout=timeout)
    if proc.returncode != 0:
        return {"error": (proc.stderr or proc.stdout)[-800:]}
    m = _LINE.search(proc.stdout)
    if not m:
        return {"error": "unparsed: " + proc.stdout[-300:]}
    return {"ms_step": float(m.group(1)), "steps_s": float(m.group(2)),
            "lr_mps": float(m.group(3))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", type=str, default="",
                    help="Comma list; default = all rolled-out families.")
    ap.add_argument("--timeout", type=int, default=1500,
                    help="Per-arm subprocess timeout (remote AOT compiles).")
    ap.add_argument("--out", type=str, default=os.path.join(REPO, "LR_DOMAIN_SWEEP.json"))
    args = ap.parse_args()

    want = [f.strip() for f in args.families.split(",") if f.strip()]
    configs = [(f, e) for f, e in CONFIGS if not want or f in want]

    results = {}
    for family, extra in configs:
        row = {}
        for arm in (0, 1):
            r = run_arm(family, extra, arm, args.timeout)
            row["lr_domain_%d" % arm] = r
            tag = ("%.1f steps/s" % r["steps_s"]) if "steps_s" in r else "ERROR"
            print("%-14s lr_domain=%d  %s" % (family, arm, tag), flush=True)
        a, b = row.get("lr_domain_0", {}), row.get("lr_domain_1", {})
        if "steps_s" in a and "steps_s" in b:
            row["speedup"] = round(b["steps_s"] / a["steps_s"], 4)
            row["recommend_default"] = 1 if row["speedup"] >= 1.0 else 0
        results[family] = row
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps({f: r.get("speedup") for f, r in results.items()}))


if __name__ == "__main__":
    main()
