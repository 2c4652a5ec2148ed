"""Capture and aggregate a device trace of N train steps.

Runs the model's jitted train step in a chained fori_loop under
jax.profiler.trace, then aggregates the xplane events by op category /
name (duration + bytes_accessed where present) — the workflow behind
BASELINE.md's tail-anatomy tables, packaged as a tool.

Usage:
  python tools/trace_train.py --model LarvaNet -- --num_blocks 16,16
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def aggregate_trace_json(trace_dir):
    """Aggregate device op durations from the trace-viewer JSON export
    (newest <trace_dir>/plugins/profile/*/...trace.json.gz)."""
    import gzip
    import json

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise RuntimeError("no trace.json.gz under %s" % trace_dir)
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device track pids: trace-viewer labels them via process_name metadata
    dev_pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "/device" in name.lower():
                dev_pids.add(ev.get("pid"))
    # device thread (tid) names to skip: step/module grouping lines
    skip_tids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tname = ev.get("args", {}).get("name", "").lower()
            if ev.get("pid") in dev_pids and (
                    "step" in tname or "module" in tname or "scope" in tname):
                skip_tids.add((ev.get("pid"), ev.get("tid")))
    totals = defaultdict(float)  # name -> total ms
    counts = defaultdict(int)
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        if (ev.get("pid"), ev.get("tid")) in skip_tids:
            continue
        name = ev["name"]
        if name.startswith(("while", "condition", "body")):
            continue  # loop wrappers enclose (double-count) their bodies
        totals[name] += ev.get("dur", 0) / 1e3  # us -> ms
        counts[name] += 1
    return totals, counts


def group_by_class(totals, counts):
    """Collapse op names to their class: strip trailing .N / _N indices."""
    import re

    g_tot, g_cnt = defaultdict(float), defaultdict(int)
    for name, ms in totals.items():
        cls = re.sub(r"[._]\d+$", "", name)
        g_tot[cls] += ms
        g_cnt[cls] += counts[name]
    return g_tot, g_cnt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="LarvaNet")
    parser.add_argument("--scale", type=int, default=4)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--input_patch_size", type=int, default=48)
    parser.add_argument("--input_height", type=int, default=0,
                        help="non-square input rows (0 = --input_patch_size); "
                             "for full-frame anatomy, e.g. 1080x1920")
    parser.add_argument("--input_width", type=int, default=0,
                        help="non-square input cols (0 = --input_patch_size)")
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--out", type=str, default="/tmp/lvt_trace")
    parser.add_argument("--top", type=int, default=25)
    parser.add_argument("--infer", action="store_true",
                        help="Trace the inference forward (the bench.py fast path: "
                             "model._fwd_jit after CLI-style fast-path routing) instead "
                             "of the training step.")
    parser.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    parser.add_argument("--int8", action="store_true",
                        help="With --infer: trace the int8 (W8A8) serving forward "
                             "(random-calibrated) instead of the exact packed one.")
    parser.add_argument("--plain", action="store_true",
                        help="With --infer: bypass the fast-path routing and trace "
                             "the plain module graph — the monolithic-frame winner "
                             "(BASELINE.md round-4 full-frame anatomy).")
    args, remaining = parser.parse_known_args()
    if remaining and remaining[0] == "--":
        remaining = remaining[1:]

    import jax
    import jax.numpy as jnp

    from larvanet_tpu.core.registry import get_model

    model = get_model(args.model)
    model.parse_args(remaining)
    model.prepare(is_training=not args.infer, scales=[args.scale])

    p = args.input_patch_size
    ih = args.input_height or p
    iw = args.input_width or p
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (args.batch_size, ih, iw, 3)).astype(np.float32))

    if args.infer:
        # bench.py's fast path, via the SHARED routing table
        # (ops/fastpath.py) so the traced graph IS the benched graph
        dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
        params = jax.tree_util.tree_map(lambda a: a.astype(dtype), model.params)
        from larvanet_tpu.ops.fastpath import build_fast_forward

        calib = None
        if args.plain:
            from larvanet_tpu.ops.fastpath import make_plain_forward

            fwd, desc = make_plain_forward(model, dtype), "plain module graph"
        else:
            if args.int8:
                calib = rng.uniform(0, 255, (4, p, p, 3)).astype(np.float32)
            fwd, desc = build_fast_forward(model, dtype, int8_trunk=args.int8,
                                           calib=calib)
        if fwd is None:
            fwd = model._forward_impl
            print("TRACING the PLAIN module graph (no fast path routes for "
                  "%r — this is also what bench.py measures)" % (args.model,))
        elif args.plain:
            print("TRACING the plain module graph (--plain)")
        else:
            print("TRACING the %s forward (bench.py's fast path)" % (desc,))
        xd = x.astype(dtype)

        def body(_, acc):
            xi = jnp.maximum(xd, (acc * jnp.float32(1e-35)).astype(dtype)
                             - jnp.asarray(3e4, dtype))
            return acc + jnp.mean(fwd(params, xi)).astype(jnp.float32)

        @jax.jit
        def run(params_):
            return jax.lax.fori_loop(0, args.steps, body, jnp.float32(0))

        float(run(params))
        with jax.profiler.trace(args.out):
            float(run(params))
    else:
        t = jnp.asarray(rng.uniform(
            0, 255, (args.batch_size, ih * args.scale, iw * args.scale, 3)
        ).astype(np.float32))
        lr = jnp.asarray(model.get_learning_rate(), jnp.float32)

        def body(_, carry):
            params, opt_state, _loss = carry
            return model._train_step_impl(params, opt_state, lr, x, t)

        @jax.jit
        def run(params, opt_state):
            return jax.lax.fori_loop(0, args.steps, body,
                                     (params, opt_state, jnp.float32(0)))[2]

        float(run(model.params, model.opt_state))  # compile + warm
        with jax.profiler.trace(args.out):
            float(run(model.params, model.opt_state))

    totals, counts = aggregate_trace_json(args.out)
    total_ms = sum(totals.values())
    print("total device time: %.2f ms over %d steps -> %.3f ms/step"
          % (total_ms, args.steps, total_ms / args.steps))
    print("-- by op class --")
    g_tot, g_cnt = group_by_class(totals, counts)
    for name, ms in sorted(g_tot.items(), key=lambda kv: -kv[1])[:args.top]:
        print("%8.3f ms  %5.1f%%  x%-5d %s"
              % (ms, 100 * ms / total_ms, g_cnt[name], name[:110]))
    print("-- top individual ops --")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:args.top]:
        print("%8.3f ms  %5.1f%%  x%-5d %s"
              % (ms, 100 * ms / total_ms, counts[name], name[:110]))


if __name__ == "__main__":
    main()
