"""Full reference-recipe runs through the REAL training CLIs.

VERDICT r3 next#1: BASELINE.md computes that the reference recipes fit
in ~21-37 min on one chip, but no run had ever gone past 6k steps, and
the round-3 realistic soak drove a bespoke loop instead of the flagship
CLI. This tool runs both recipes end-to-end on the TPU, through the
shipped CLIs, and records the evidence:

Phase A — the EDSR-b x4 reference recipe (reference README.md:30-37,
  train.py:20-29: batch 16, patch 48, 300k steps, Adam 1e-4 halved
  every 200k, L1) via cli/train.py with --device_pipeline (the dataset
  lives in HBM; the host loop is transfer-bound on this tunnel,
  CLAUDE.md) on the realistic fixture. The run is SIGKILLed mid-recipe
  and resumed with `--restore_path latest` — the full crash/resume
  flow, exercising the async checkpoint chain and the fold_in(step)
  exact-resume sample stream on the real recipe.

Phase B — the flagship volume-driven recipe (reference
  train_larva.py:108-141, models/LarvaNet.py:119-124): LarvaNet 2x16
  through cli/train_larva.py, where every --val_volume bytes of
  consumed input a REAL validation fires through
  model.validate_for_train -> ReduceLROnPlateau -> checkpoint save.
  Runs until >= --want_vals validations AND >= --want_drops genuine
  plateau LR drops have been observed (then stops; checkpoint chain,
  PSNR staircase and plateau bookkeeping all recorded).

The validation set is a uniform-shape crop of the realistic fixture
(ONE image shape -> one remote TPU compile for the whole val loop;
fixture_real's 48 distinct shapes would each cost a multi-minute remote
AOT compile, CLAUDE.md). Both phases measure machinery + data fit on
the pinned synthetic fixture — no real DIV2K exists in this
environment (BASELINE.md) — so absolute PSNRs rank fit, not paper
quality; the recipe mechanics (cadence, staircase, resume, chain) are
the claim.

Usage (repo root, on the TPU):
  python -m tools.recipe_full [--phase a|b|all] [--out RECIPE_FULL.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

import numpy as np

from tools.resilience import REPO, run_measured

FIXTURE = "data/fixture_real"
VAL_DIR = "data/fixture_real_val"

_RATE_SUFFIX = r"(?: avg ([0-9.]+) steps/s)?( \[untrusted\])?"
_STEP_TRAIN = re.compile(
    r"^step (\d+), lr ([0-9.eE+-]+), mean loss ([0-9.eE+-]+) \(([0-9.]+) steps/s\)"
    + _RATE_SUFFIX)
_STEP_LARVA = re.compile(
    r"^step (\d+), mean loss ([0-9.eE+-]+), lr ([0-9.eE+-]+) \(([0-9.]+) steps/s\)"
    + _RATE_SUFFIX)


def _rate_fields(m, base):
    """Fold the ChunkRateMeter suffix (cli/common.py) into a chunk dict:
    `avg` is the differenced post-compile rate (authoritative); chunks
    whose instantaneous rate the meter flagged carry timing=untrusted."""
    if m.group(5) is not None:
        base["avg_steps_s"] = float(m.group(5))
    if m.group(6) is not None:
        base["timing"] = "untrusted"
    return base
_VALIDATION = re.compile(
    r"^step (\d+), volume ([0-9.]+)G, psnr=([0-9.]+), lr = ([0-9.eE+-]+)")
_SAVED = re.compile(r"^saved a model checkpoint at (step (\d+)|volume ([0-9.]+)G)")


def ensure_uniform_val(src_root=FIXTURE, out_root=VAL_DIR, n=16,
                       lh=72, lw=110, scale=4):
    """Materialize n uniform-shape LR/HR crop pairs of the realistic
    fixture into the basic_loader flat-dir contract (input/, truth/).

    Crops are origin-anchored so SR(LR crop) and the HR crop describe
    the same scene window; every pair shares one LR shape (lh, lw)."""
    from larvanet_tpu.data import fixture, io

    fixture.ensure_realistic(src_root)
    in_dir = os.path.join(out_root, "input")
    tr_dir = os.path.join(out_root, "truth")
    names = sorted(os.listdir(os.path.join(src_root, "x%d" % scale, "input")))[:n]
    # idempotence must cover the crop GEOMETRY, not just the file names —
    # a reuse after lh/lw/scale changed would validate against stale
    # wrong-geometry crops with no error (round-4 review finding)
    geom_path = os.path.join(out_root, "geometry.json")
    geom = {"n": n, "lh": lh, "lw": lw, "scale": scale, "names": names}
    if (os.path.isdir(in_dir)
            and sorted(os.listdir(in_dir)) == names
            and os.path.isdir(tr_dir)
            and sorted(os.listdir(tr_dir)) == names
            and os.path.isfile(geom_path)):
        with open(geom_path) as f:
            if json.load(f) == geom:
                return out_root
    os.makedirs(in_dir, exist_ok=True)
    os.makedirs(tr_dir, exist_ok=True)
    for f in names:
        lr = io.load_image_u8(os.path.join(src_root, "x%d" % scale, "input", f))
        hr = io.load_image_u8(os.path.join(src_root, "x%d" % scale, "truth", f))
        assert lr.shape[0] >= lh and lr.shape[1] >= lw, (f, lr.shape)
        io.save_image_hwc(lr[:lh, :lw], os.path.join(in_dir, f))
        io.save_image_hwc(hr[: lh * scale, : lw * scale], os.path.join(tr_dir, f))
    with open(geom_path, "w") as f:
        json.dump(geom, f)
    return out_root


def stream_cli(argv, log_path, kill_at_step=None, stop_when=None,
               timeout=7200.0):
    """Run a training CLI as a subprocess, streaming + parsing stdout.

    kill_at_step: SIGKILL the process once a parsed step >= this
      (simulates a crash mid-recipe).
    stop_when(events) -> bool: checked after each parsed validation;
      True => SIGTERM (success criteria met, run recorded as stopped).
    Returns a dict of parsed series; never raises on CLI failure —
    failures come back structured ({"ok": False, ...}), matching the
    tools/resilience contract.
    """
    events = {"chunks": [], "validations": [], "saves": [],
              "killed_at": None, "stopped_early": False}
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    t0 = time.time()
    try:
        proc = subprocess.Popen(
            [sys.executable, "-u", "-m"] + list(argv), cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    except OSError as exc:
        return {"ok": False, "error": "spawn failed: %s" % exc, **events}
    deadline = t0 + timeout

    # read stdout on a side thread so the deadline is enforced even when
    # the CLI wedges SILENTLY (hung remote AOT compile / tunnel outage):
    # a plain `for line in proc.stdout` blocks on readline and would never
    # reach a time check (round-4 review finding)
    import queue as _queue
    import threading

    lines: _queue.Queue = _queue.Queue()

    def _reader():
        for ln in proc.stdout:
            lines.put(ln)
        lines.put(None)

    threading.Thread(target=_reader, daemon=True).start()

    def _iter_lines():
        while True:
            try:
                ln = lines.get(timeout=max(0.1, deadline - time.time()))
            except _queue.Empty:
                return  # deadline passed with no output
            if ln is None:
                return
            yield ln

    with open(log_path, "a") as log:
        log.write("=== %s ===\n" % " ".join(argv))
        for line in _iter_lines():
            log.write(line)
            log.flush()
            line = line.rstrip("\n")
            if time.time() > deadline:
                proc.kill()
                proc.wait()
                return {"ok": False, "error": "timeout after %.0fs" % timeout,
                        "wall_seconds": round(time.time() - t0, 1), **events}
            m = _STEP_TRAIN.match(line)
            if m:
                events["chunks"].append(_rate_fields(m, {
                    "step": int(m.group(1)), "lr": float(m.group(2)),
                    "loss": float(m.group(3)), "steps_s": float(m.group(4))}))
            else:
                m = _STEP_LARVA.match(line)
                if m:
                    events["chunks"].append(_rate_fields(m, {
                        "step": int(m.group(1)), "loss": float(m.group(2)),
                        "lr": float(m.group(3)), "steps_s": float(m.group(4))}))
            m = _VALIDATION.match(line)
            if m:
                events["validations"].append({
                    "step": int(m.group(1)), "volume_gb": float(m.group(2)),
                    "psnr": float(m.group(3)), "lr": float(m.group(4))})
                if stop_when is not None and stop_when(events):
                    events["stopped_early"] = True
                    proc.send_signal(signal.SIGTERM)
                    break
            m = _SAVED.match(line)
            if m:
                events["saves"].append(line)
            step = events["chunks"][-1]["step"] if events["chunks"] else 0
            if kill_at_step is not None and step >= kill_at_step:
                events["killed_at"] = step
                proc.kill()
                break
    if proc.poll() is None and time.time() > deadline:
        # silent wedge: the reader saw no output past the deadline
        proc.kill()
        proc.wait()
        return {"ok": False, "error": "timeout after %.0fs (no output)" % timeout,
                "wall_seconds": round(time.time() - t0, 1), **events}
    proc.wait()
    out = {"wall_seconds": round(time.time() - t0, 1), **events}
    expected_death = events["killed_at"] is not None or events["stopped_early"]
    out["ok"] = proc.returncode == 0 or expected_death
    if not out["ok"]:
        out["error"] = "cli rc=%d (see %s)" % (proc.returncode, log_path)
    return out


def _eval_ckpt(model, model_flags, ckpt, val_dir, scale=4, ema=False):
    """Challenge-protocol PSNR of a checkpoint on the uniform val set,
    through cli/validate.py in a bounded, retried subprocess."""
    rj = os.path.join(REPO, "runs", "recipe_eval_report.json")
    if os.path.exists(rj):
        os.unlink(rj)
    cmd = [sys.executable, "-m", "larvanet_tpu.cli.validate",
           "--dataloader", "basic_loader", "--model", model,
           "--restore_path", ckpt, "--scales", str(scale),
           "--data_input_path", os.path.join(val_dir, "input"),
           "--data_truth_path", os.path.join(val_dir, "truth"),
           "--report_json", rj] + list(model_flags) + (
               ["--ema", "1"] if ema else [])
    r = run_measured(cmd, timeout=1800, retries=1)
    if not r["ok"]:
        return r
    with open(rj) as f:
        rep = json.load(f)
    sc = rep["scales"][str(scale)]
    return {"ok": True, "mean_psnr": sc["mean_psnr"]}


def _bicubic_baseline(val_dir, scale=4):
    cmd = [sys.executable, "-m", "larvanet_tpu.cli.validate_interpol",
           "--dataloader", "basic_loader", "--scales", str(scale),
           "--data_input_path", os.path.join(val_dir, "input"),
           "--data_truth_path", os.path.join(val_dir, "truth"),
           "--interpolate", "bicubic"]

    def parse(stdout):
        # summary line: "x4, psnr=NN.NN, duration=..." (cli/validate_interpol)
        ms = re.findall(r"^x\d+, psnr=([0-9.]+), duration", stdout, re.M)
        if not ms:
            raise ValueError("no summary psnr line in output")
        return {"mean_psnr": float(ms[-1])}

    return run_measured(cmd, timeout=900, retries=1, parse=parse)


def _subsample(series, keep=60):
    if len(series) <= keep:
        return series
    idx = np.linspace(0, len(series) - 1, keep).astype(int)
    return [series[i] for i in idx]


def phase_a(args):
    """EDSR-b x4, 300k steps, killed at ~--kill_at and resumed."""
    train_path = os.path.join(REPO, "runs", "recipe_edsr")
    log = os.path.join(REPO, "runs", "recipe_edsr.log")
    os.makedirs(train_path, exist_ok=True)
    base = ["larvanet_tpu.cli.train",
            "--dataloader", "basic_loader", "--scales", "4",
            "--data_input_path", os.path.join(FIXTURE, "x4", "input"),
            "--data_truth_path", os.path.join(FIXTURE, "x4", "truth"),
            "--train_path", train_path, "--model", "edsr",
            "--device_pipeline", str(args.chunk),
            "--save_freq", str(args.save_freq),
            "--async_checkpoint", "1",
            "--max_steps", str(args.max_steps)]

    print("[phase A] run 1 (to be killed at step >= %d)" % args.kill_at)
    run1 = stream_cli(base, log, kill_at_step=args.kill_at, timeout=args.timeout)
    ckpts_after_kill = sorted(os.listdir(train_path))
    print("[phase A] killed at %s; checkpoints on disk: %s"
          % (run1.get("killed_at"), ckpts_after_kill))

    print("[phase A] run 2 (--restore_path latest)")
    run2 = stream_cli(base + ["--restore_path", "latest"], log,
                      timeout=args.timeout)

    resumed_from = None
    if run2["chunks"]:
        resumed_from = run2["chunks"][0]["step"] - args.chunk

    final_ckpt = os.path.join(train_path, "model_%d.ckpt" % args.max_steps)
    result = {
        "config": {"model": "edsr", "batch": 16, "patch": 48,
                   "max_steps": args.max_steps, "chunk": args.chunk,
                   "save_freq": args.save_freq,
                   "recipe": "reference README.md:30-37 / train.py:20-29"},
        "run1": {k: v for k, v in run1.items() if k != "chunks"},
        "run2": {k: v for k, v in run2.items() if k != "chunks"},
        "killed_at_step": run1.get("killed_at"),
        "resumed_from_step": resumed_from,
        "loss_series": _subsample(run1["chunks"] + run2["chunks"]),
        "lr_staircase": _lr_staircase(run1["chunks"] + run2["chunks"]),
        "steps_per_sec": _rate_summary(run1["chunks"], run2["chunks"]),
        "checkpoints": sorted(os.listdir(train_path)),
        "ok": run1["ok"] and run2["ok"] and os.path.exists(final_ckpt),
    }
    if os.path.exists(final_ckpt):
        result["final_eval"] = _eval_ckpt("edsr", [], final_ckpt, VAL_DIR)
        result["bicubic_baseline"] = _bicubic_baseline(VAL_DIR)
    return result


def _rate_summary(*runs_chunks):
    """Authoritative steps/s with explicit provenance. The differenced
    final `avg` of each run is the trustworthy figure (ChunkRateMeter,
    cli/common.py); the per-chunk median is computed over TRUSTED
    instantaneous readings only, and the number of untrusted (early-ack)
    chunks is reported rather than silently dropped (VERDICT r4 weak#3)."""
    trusted = [c["steps_s"] for run in runs_chunks for c in run
               if c.get("timing") != "untrusted"]
    untrusted = sum(1 for run in runs_chunks for c in run
                    if c.get("timing") == "untrusted")
    final_avgs = [run[-1]["avg_steps_s"] for run in runs_chunks
                  if run and "avg_steps_s" in run[-1]]
    return {
        "differenced_avg_per_run": [round(a, 2) for a in final_avgs],
        "trusted_inst_median": float(np.median(trusted)) if trusted else None,
        "n_chunks_untrusted": untrusted,
        "n_chunks_total": sum(len(run) for run in runs_chunks),
        "provenance": "differenced_avg_per_run = (steps since first post-"
                      "compile chunk)/(wall clock) per run — authoritative; "
                      "trusted_inst_median excludes early-ack chunks flagged "
                      "by ChunkRateMeter (dispatch-ack noise on this tunnel)",
    }


def _lr_staircase(chunks):
    stair, last = [], None
    for c in chunks:
        if c["lr"] != last:
            stair.append({"step": c["step"], "lr": c["lr"]})
            last = c["lr"]
    return stair


def phase_b(args):
    """Flagship LarvaNet 2x16 volume-driven recipe until the plateau
    staircase has fired >= want_drops genuine LR reductions."""
    train_path = os.path.join(REPO, "runs", "recipe_larva")
    log = os.path.join(REPO, "runs", "recipe_larva.log")
    os.makedirs(train_path, exist_ok=True)
    val_volume = args.val_every * 110592  # volume_per_step at 48/16
    argv = ["larvanet_tpu.cli.train_larva",
            "--dataloader", "basic_loader",
            "--data_input_path", os.path.join(FIXTURE, "x4", "input"),
            "--data_truth_path", os.path.join(FIXTURE, "x4", "truth"),
            "--val_dataloader", "basic_loader",
            "--val_data_input_path", os.path.join(VAL_DIR, "input"),
            "--val_data_truth_path", os.path.join(VAL_DIR, "truth"),
            "--train_path", train_path,
            "--model", "LarvaNet", "--num_modules", "2",
            "--num_blocks", "16,16",
            "--device_pipeline", str(args.val_every),
            "--val_volume", str(val_volume),
            "--async_checkpoint", "1",
            "--max_steps", str(args.b_max_steps)]

    def drops_of(vals):
        return sum(1 for a, b in zip(vals, vals[1:]) if b["lr"] < a["lr"])

    def stop_when(events):
        v = events["validations"]
        return len(v) >= args.want_vals and drops_of(v) >= args.want_drops

    print("[phase B] flagship LarvaNet 2x16, validation every %d steps "
          "(val_volume=%d)" % (args.val_every, val_volume))
    run = stream_cli(argv, log, stop_when=stop_when, timeout=args.timeout)
    vals = run["validations"]
    ckpts = sorted(os.listdir(train_path))
    result = {
        "config": {"model": "LarvaNet", "num_blocks": "16,16",
                   "batch": 16, "patch": 48, "val_volume": val_volume,
                   "val_every_steps": args.val_every,
                   "recipe": "reference train_larva.py:108-141 / "
                             "models/LarvaNet.py:119-124 (val_volume "
                             "scaled to the fixture; default 30e9)"},
        "run": {k: v for k, v in run.items()
                if k not in ("chunks", "validations")},
        "validations": vals,
        "n_validations": len(vals),
        "lr_drops": drops_of(vals),
        "loss_series": _subsample(run["chunks"]),
        "steps_per_sec": _rate_summary(run["chunks"]),
        "checkpoints": [c for c in ckpts if c.endswith(".ckpt")],
        "met_criteria": stop_when({"validations": vals}),
        "ok": run["ok"],
    }
    # final eval through cli/validate on the newest checkpoint
    ckpt_files = [c for c in ckpts if c.endswith(".ckpt")]
    if ckpt_files:
        def step_of(name):
            m = re.match(r"model_step(\d+)_", name)
            return int(m.group(1)) if m else -1
        newest = max(ckpt_files, key=step_of)
        result["final_eval"] = _eval_ckpt(
            "LarvaNet", ["--num_modules", "2", "--num_blocks", "16,16"],
            os.path.join(train_path, newest), VAL_DIR)
        result["final_ckpt"] = newest
    return result


def phase_v2(args):
    """LarvaNetV2 at recipe scale through cli/train_larvaV2 (VERDICT r4
    missing#3 / next#4): the epoch-steps injection (reference
    train_larvaV2.py:74-81), the V2 tail exit (LarvaNetV2.py:108-118)
    and the volume-driven validation staircase all exercised on-device,
    with >= --want_vals genuine validations."""
    train_path = os.path.join(REPO, "runs", "recipe_larvaV2")
    log = os.path.join(REPO, "runs", "recipe_larvaV2.log")
    os.makedirs(train_path, exist_ok=True)
    val_volume = args.val_every * 110592
    argv = ["larvanet_tpu.cli.train_larvaV2",
            "--dataloader", "basic_loader",
            "--data_input_path", os.path.join(FIXTURE, "x4", "input"),
            "--data_truth_path", os.path.join(FIXTURE, "x4", "truth"),
            "--val_dataloader", "basic_loader",
            "--val_data_input_path", os.path.join(VAL_DIR, "input"),
            "--val_data_truth_path", os.path.join(VAL_DIR, "truth"),
            "--train_path", train_path,
            "--model", "LarvaNetV2", "--num_modules", "2",
            "--num_blocks", "16,16",
            "--device_pipeline", str(args.val_every),
            "--val_volume", str(val_volume),
            "--async_checkpoint", "1",
            "--max_steps", str(args.b_max_steps)]

    def stop_when(events):
        return len(events["validations"]) >= args.want_vals

    print("[phase V2] LarvaNetV2 2x16 via train_larvaV2, validation every "
          "%d steps" % args.val_every)
    run = stream_cli(argv, log, stop_when=stop_when, timeout=args.timeout)
    vals = run["validations"]
    ckpts = [c for c in sorted(os.listdir(train_path)) if c.endswith(".ckpt")]
    result = {
        "config": {"model": "LarvaNetV2", "num_blocks": "16,16",
                   "batch": 16, "patch": 48, "val_volume": val_volume,
                   "recipe": "reference train_larvaV2.py:74-81 (epoch "
                             "injection) + LarvaNetV2.py:108-118 (tail "
                             "exit); volume scaled to the fixture"},
        "run": {k: v for k, v in run.items()
                if k not in ("chunks", "validations")},
        "validations": vals,
        "n_validations": len(vals),
        "loss_series": _subsample(run["chunks"]),
        "steps_per_sec": _rate_summary(run["chunks"]),
        "checkpoints": ckpts,
        "ok": run["ok"] and len(vals) >= args.want_vals,
    }
    if ckpts:
        def step_of(name):
            m = re.match(r"model_step(\d+)_", name)
            return int(m.group(1)) if m else -1
        newest = max(ckpts, key=step_of)
        result["final_eval"] = _eval_ckpt(
            "LarvaNetV2", ["--num_modules", "2", "--num_blocks", "16,16"],
            os.path.join(train_path, newest), VAL_DIR)
        result["final_ckpt"] = newest
    return result


# short-budget recipe checkpoints for the paper-table matrix (VERDICT r4
# next#9): (model, model_flags, steps, train_flags). Budgets are
def _newest_any_ckpt(train_path, names):
    """Newest checkpoint by embedded step, across both naming schemes."""
    def step_of(name):
        m = re.search(r"model_(?:step)?(\d+)", name)
        return int(m.group(1)) if m else -1

    return os.path.join(train_path, max(names, key=step_of))


# deliberately smaller than phase A's 300k and labeled as such in the
# artifact. train_flags go only to the training CLI (e.g. --ema_decay,
# which gives paper_table's --ema column a real EMA state to restore).
EXTRA_MODELS = [
    ("msrr_reduced", [], 50000, ["--ema_decay", "0.999"]),
    ("TreeNet", [], 50000, []),
    ("LarvaNet_w64", ["--num_blocks", "9,9"], 50000,
     ["--ema_decay", "0.999"]),
]


def phase_extra(args):
    """Short-budget recipe checkpoints for msrr_reduced / TreeNet /
    LarvaNet_w64 through cli/train.py so tools/paper_table.py can score
    a >=5-model matrix (VERDICT r4 next#9)."""
    want = {m for m in args.extra_models.split(",") if m}
    out = {}
    for name, flags, steps, train_flags in EXTRA_MODELS:
        if want and name not in want:
            continue
        steps = args.extra_steps or steps
        train_path = os.path.join(REPO, "runs", "recipe_%s" % name)
        log = os.path.join(REPO, "runs", "recipe_%s.log" % name)
        os.makedirs(train_path, exist_ok=True)
        argv = ["larvanet_tpu.cli.train",
                "--dataloader", "basic_loader", "--scales", "4",
                "--data_input_path", os.path.join(FIXTURE, "x4", "input"),
                "--data_truth_path", os.path.join(FIXTURE, "x4", "truth"),
                "--train_path", train_path, "--model", name,
                "--device_pipeline", str(args.chunk),
                "--save_freq", str(steps),
                "--async_checkpoint", "1",
                "--max_steps", str(steps)] + flags + train_flags
        print("[phase extra] %s, %d steps (short budget)" % (name, steps))
        run = stream_cli(argv, log, timeout=args.timeout)
        # LarvaNet-family models name checkpoints by volume
        # (model_step<N>_vol<V>G.ckpt — larvanet.py:checkpoint_name);
        # the rest use cli/train's model_<step>.ckpt. Accept either.
        final_ckpt = os.path.join(train_path, "model_%d.ckpt" % steps)
        if not os.path.exists(final_ckpt):
            cands = [c for c in os.listdir(train_path) if c.endswith(".ckpt")]
            if cands:
                final_ckpt = _newest_any_ckpt(train_path, cands)
        res = {
            "config": {"model": name, "flags": flags,
                       "train_flags": train_flags, "steps": steps,
                       "budget": "short (paper-table matrix breadth; "
                                 "phase A is the full 300k recipe)"},
            "run": {k: v for k, v in run.items() if k != "chunks"},
            "loss_series": _subsample(run["chunks"], keep=20),
            "steps_per_sec": _rate_summary(run["chunks"]),
            "ok": run["ok"] and os.path.exists(final_ckpt),
        }
        if os.path.exists(final_ckpt):
            res["final_eval"] = _eval_ckpt(name, flags, final_ckpt, VAL_DIR)
        out[name] = res
    out["ok"] = all(v["ok"] for k, v in out.items() if k != "ok")
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--phase", choices=("a", "b", "v2", "extra", "all"),
                    default="all")
    ap.add_argument("--out", default=os.path.join(REPO, "RECIPE_FULL.json"))
    ap.add_argument("--max_steps", type=int, default=300000)
    ap.add_argument("--chunk", type=int, default=1000,
                    help="--device_pipeline steps per fused call (phase A).")
    ap.add_argument("--save_freq", type=int, default=50000)
    ap.add_argument("--kill_at", type=int, default=179000,
                    help="SIGKILL run 1 at this step (past a save_freq "
                    "boundary + async-writer drain, so 'latest' resolves "
                    "to the 150k checkpoint).")
    ap.add_argument("--val_every", type=int, default=2000,
                    help="Phase B validation cadence in steps (sets "
                    "--val_volume = this * 110592).")
    ap.add_argument("--want_vals", type=int, default=5)
    ap.add_argument("--want_drops", type=int, default=2)
    ap.add_argument("--b_max_steps", type=int, default=120000)
    ap.add_argument("--timeout", type=float, default=7200.0,
                    help="Per-CLI-run wall timeout.")
    ap.add_argument("--extra_steps", type=int, default=0,
                    help="Override the per-model step budget in phase "
                         "extra (0 = per-model default).")
    ap.add_argument("--extra_models", default="",
                    help="Comma filter of phase-extra model names "
                         "(default: all).")
    args = ap.parse_args(argv)

    os.makedirs(os.path.join(REPO, "runs"), exist_ok=True)
    ensure_uniform_val()

    report = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            report = json.load(f)
    t0 = time.time()
    phases = []
    if args.phase in ("a", "all"):
        phases.append(("edsr_recipe", phase_a))
    if args.phase in ("b", "all"):
        phases.append(("larva_recipe", phase_b))
    if args.phase in ("v2", "all"):
        phases.append(("larvaV2_recipe", phase_v2))
    if args.phase in ("extra", "all"):
        phases.append(("extra_recipes", phase_extra))
    for key, fn in phases:
        result = fn(args)
        if key == "extra_recipes" and isinstance(report.get(key), dict):
            # a filtered re-run (--extra_models) must not drop the other
            # models' previously recorded entries
            merged = dict(report[key])
            merged.update(result)
            merged["ok"] = all(v.get("ok") for k, v in merged.items()
                               if k != "ok" and isinstance(v, dict))
            result = merged
        report[key] = result
        report["total_wall_seconds"] = round(time.time() - t0, 1)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
            f.write("\n")
    print("wrote %s" % args.out)
    ok = all(report[key].get("ok") for key, _ in phases)
    print("RECIPE_FULL ok=%s" % ok)
    return report


if __name__ == "__main__":
    main()
