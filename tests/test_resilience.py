"""The shared measurement-resilience contract (tools/resilience.py).

VERDICT r3 next#6 / ADVICE r3: bench.py survived the tunnel outage but
the other instruments didn't — LR_DOMAIN_SWEEP.json shipped with a raw
JaxRuntimeError inside. These tests pin the shared contract: a crashed,
hung, or garbage-emitting worker subprocess yields structured JSON
({"ok": False, "error": ...}), never a traceback; successes report
their attempt count; recommendations carry the noise band.
"""

import json
import sys

from tools import resilience
from tools.lr_domain_sweep import NOISE_BAND, recommend
from tools.recipe_full import _STEP_LARVA, _STEP_TRAIN, _VALIDATION, _lr_staircase


PY = [sys.executable, "-c"]


def test_worker_crash_is_structured():
    r = resilience.run_measured(PY + ["import sys; sys.exit(3)"],
                                timeout=30, retries=1)
    assert r["ok"] is False
    assert "rc=3" in r["error"]
    assert r["attempts"] == 2  # retried once
    json.dumps(r)  # artifact-safe


def test_worker_stderr_tail_in_error():
    r = resilience.run_measured(
        PY + ["import sys; print('boom diagnostics', file=sys.stderr); sys.exit(1)"],
        timeout=30, retries=0)
    assert r["ok"] is False and "boom diagnostics" in r["error"]


def test_worker_timeout_is_structured():
    r = resilience.run_measured(
        PY + ["import time; time.sleep(30)"], timeout=1, retries=0)
    assert r["ok"] is False and "timeout" in r["error"]
    json.dumps(r)


def test_unparseable_output_is_structured():
    def parse(stdout):
        raise ValueError("nothing usable")

    r = resilience.run_measured(PY + ["print('hi')"], timeout=30,
                                retries=0, parse=parse)
    assert r["ok"] is False and "unparsed" in r["error"]


def test_success_reports_attempts_and_measurements():
    def parse(stdout):
        return {"value": float(stdout.strip())}

    r = resilience.run_measured(PY + ["print(42.5)"], timeout=30, parse=parse)
    assert r == {"ok": True, "attempts": 1, "value": 42.5}


def test_spawn_failure_is_structured():
    r = resilience.run_measured(["/nonexistent/binary"], timeout=5, retries=0)
    assert r["ok"] is False and "spawn failed" in r["error"]


# ---- sweep recommendation noise band (ADVICE r3 #3) -----------------------

def test_recommend_keeps_default_within_noise():
    assert recommend(1.0 + NOISE_BAND / 2, 1)["recommend_default"] == 1
    assert recommend(1.0 - NOISE_BAND / 2, 1)["recommend_default"] == 1
    assert recommend(1.0 - NOISE_BAND / 2, 0)["recommend_default"] == 0


def test_recommend_flips_outside_noise():
    assert recommend(1.10, 0)["recommend_default"] == 1
    assert recommend(0.90, 1)["recommend_default"] == 0


def test_recommend_unmeasured_keeps_default():
    r = recommend(None, 1)
    assert r["recommend_default"] == 1 and "unmeasured" in r["reason"]


# ---- recipe_full log parsing ----------------------------------------------

def test_recipe_log_regexes():
    m = _STEP_TRAIN.match("step 1000, lr 0.000100, mean loss 12.345678 (266.3 steps/s)")
    assert m and int(m.group(1)) == 1000 and float(m.group(4)) == 266.3
    m = _STEP_LARVA.match("step 2000, mean loss 9.876543, lr 0.00040000 (208.8 steps/s)")
    assert m and float(m.group(3)) == 4e-4
    m = _VALIDATION.match("step 2000, volume 0G, psnr=22.83461912, lr = 0.00040000")
    assert m and float(m.group(3)) == 22.83461912


def test_lr_staircase_records_transitions_only():
    chunks = [{"step": s, "lr": 1e-4 if s <= 200 else 5e-5} for s in (100, 200, 300, 400)]
    stair = _lr_staircase(chunks)
    assert stair == [{"step": 100, "lr": 1e-4}, {"step": 300, "lr": 5e-5}]


def test_partial_sweep_merges_into_existing_report(tmp_path, monkeypatch):
    """--families re-capture must not clobber other families' rows (ADVICE r3)."""
    from tools import lr_domain_sweep as sweep

    out = tmp_path / "LR_DOMAIN_SWEEP.json"
    out.write_text(json.dumps(
        {"TreeNet": {"shipped_default": 1, "speedup": 1.05,
                     "lr_domain_0": {"ok": True}, "lr_domain_1": {"ok": True},
                     "recommend_default": 1}}))

    monkeypatch.setattr(
        sweep, "run_arm",
        lambda family, extra, arm, timeout, retries=1:
            {"ok": True, "attempts": 1, "steps_s": 100.0 + arm,
             "ms_step": 10.0, "lr_mps": 1.0})
    results = sweep.main(["--families", "REGO-Net", "--out", str(out)])
    assert set(results) == {"TreeNet", "REGO-Net"}
    on_disk = json.loads(out.read_text())
    assert on_disk["TreeNet"]["speedup"] == 1.05  # preserved
    assert on_disk["REGO-Net"]["lr_domain_1"]["ok"] is True
