"""Measured torch-CPU anchor for the reference's latency protocol.

BASELINE.md's `vs_baseline` denominator is a *derived* V100 estimate
(no GPU exists here). This tool freezes the one measurement that IS
possible on this host: the reference's own forward-latency protocol
(reference runtime.py:61-73 — per-image `model.fwd_runtime`,
sync-bracketed, no_grad) run with torch CPU on the frozen fixture,
plus the same protocol through our framework on the same CPU — giving
a measured same-host, same-protocol throughput ratio to publish next
to the estimated GPU figure (VERDICT round 1 item 10).

Output: one JSON dict with LR-megapixels/sec for both frameworks.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from tools import protocol_parity as pp


def _fixture_inputs(fixture_root: str, scale: int):
    from larvanet_tpu.data import io

    input_dir = os.path.join(fixture_root, "x%d" % scale, "input")
    return [io.load_image_chw(os.path.join(input_dir, f))
            for f in sorted(os.listdir(input_dir)) if f.endswith(".png")]


def reference_runtime(model_name: str, model_flags, fixture_root: str,
                      scale: int = 4, repeats: int = 3):
    """Reference runtime.py:61-73 semantics on torch CPU (sync is a no-op)."""
    import torch

    pp.setup_reference()
    wrapper = pp.make_reference_model(model_name, model_flags, scale)
    inputs = _fixture_inputs(fixture_root, scale)

    runtimes, pixels = [], []
    with torch.no_grad():
        for r in range(repeats + 1):
            for img in inputs:
                t = torch.tensor(np.asarray([img]), dtype=torch.float32)
                start = time.perf_counter()
                wrapper.fwd_runtime(input_tensor=t)
                dur = time.perf_counter() - start
                if r > 0:  # skip warmup sweep
                    runtimes.append(dur)
                    pixels.append(img.shape[1] * img.shape[2])
    return float(np.sum(pixels) / np.sum(runtimes) / 1e6)


def ours_runtime(model_name: str, model_flags, fixture_root: str,
                 scale: int = 4, repeats: int = 3, extra_flags=()):
    """The same per-image protocol through our model on the same CPU
    (cli/runtime.py semantics: fwd_runtime + block_until_ready)."""
    pp.force_cpu()
    from larvanet_tpu.cli import common

    model, _, _ = common.setup_model(
        model_name, list(model_flags) + list(extra_flags), [scale], is_training=False)

    class _A:  # the flag surface common.maybe_collapse_tail expects
        model = model_name
        collapsed_tail = 1
        packed_trunk = 1
        int8_trunk = 0

    common.maybe_collapse_tail(model, _A)
    inputs = _fixture_inputs(fixture_root, scale)

    runtimes, pixels = [], []
    for r in range(repeats + 1):
        for img in inputs:
            x = np.ascontiguousarray(img.transpose(1, 2, 0))[None].astype(np.float32)
            start = time.perf_counter()
            out = model.fwd_runtime(x)
            np.asarray(out)  # block
            dur = time.perf_counter() - start
            if r > 0:
                runtimes.append(dur)
                pixels.append(img.shape[1] * img.shape[2])
    return float(np.sum(pixels) / np.sum(runtimes) / 1e6)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--fixture", default="data/fixture")
    parser.add_argument("--scale", type=int, default=4)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--out", default="ANCHOR.json")
    args = parser.parse_args(argv)

    from larvanet_tpu.data import fixture as fx

    fx.ensure(args.fixture)

    ref_mps = reference_runtime("edsr", [], args.fixture, args.scale, args.repeats)
    ours_mps = ours_runtime("edsr", [], args.fixture, args.scale, args.repeats)
    result = {
        "protocol": "reference runtime.py:61-73, torch CPU vs ours CPU, EDSR-b x%d" % args.scale,
        "host": os.uname().nodename,
        "ref_torch_cpu_mps": ref_mps,
        "ours_jax_cpu_mps": ours_mps,
        "ratio": ours_mps / ref_mps,
    }
    print(json.dumps(result, indent=1))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    main()
