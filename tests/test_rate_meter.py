"""ChunkRateMeter (cli/common.py) + recipe_full parsing of its suffix —
the guard against shipping dispatch-ack steps/s readings (VERDICT r4
weak#3: RECIPE_FULL run 1 carried 322k 'steps/s' chunks unannotated)."""

import time

from larvanet_tpu.cli.common import ChunkRateMeter
from tools.recipe_full import _STEP_LARVA, _STEP_TRAIN, _rate_fields, _rate_summary


def _drive(meter, entries):
    """entries: [(n_steps, dt)] with real sleeps so the differenced wall
    clock is meaningful. Returns list of (inst, avg, trusted)."""
    out = []
    step = 0
    for n, dt in entries:
        time.sleep(dt)
        step += n
        out.append(meter.update(step, n, dt))
    return out


def test_flags_early_ack_chunks():
    meter = ChunkRateMeter()
    # chunk 1: compile (slow, trusted, starts the clock); then honest
    # ~100 steps/s chunks; then an early-ack chunk claiming 10k steps/s
    res = _drive(meter, [(100, 0.05), (100, 0.9), (100, 1.1), (100, 0.01)])
    assert res[0][1] is None and res[0][2] is True
    assert res[1][2] and res[2][2], "honest chunks must stay trusted"
    inst, avg, trusted = res[3]
    assert inst > 5000 and not trusted, (inst, avg, trusted)
    assert avg is not None and avg < 500  # differenced rate stays honest


def test_suffix_grammar_roundtrips_through_recipe_parser():
    meter = ChunkRateMeter()
    line = ("step 6000, lr 0.0001, mean loss 14.701595 (198031.4 steps/s)"
            + meter.suffix(151.2, False))
    m = _STEP_TRAIN.match(line)
    assert m, line
    chunk = _rate_fields(m, {"step": int(m.group(1)), "steps_s": float(m.group(4))})
    assert chunk["timing"] == "untrusted"
    assert chunk["avg_steps_s"] == 151.2

    # larva grammar + trusted chunk: no marker, no avg
    line2 = "step 2000, mean loss 13.5, lr 0.00010000 (205.3 steps/s)"
    m2 = _STEP_LARVA.match(line2)
    assert m2
    chunk2 = _rate_fields(m2, {"steps_s": float(m2.group(4))})
    assert "timing" not in chunk2 and "avg_steps_s" not in chunk2


def test_rate_summary_provenance():
    run1 = [
        {"steps_s": 3.4},  # compile chunk
        {"steps_s": 198031.4, "avg_steps_s": 150.0, "timing": "untrusted"},
        {"steps_s": 205.0, "avg_steps_s": 151.0},
    ]
    run2 = [{"steps_s": 204.0}, {"steps_s": 206.0, "avg_steps_s": 205.5}]
    s = _rate_summary(run1, run2)
    assert s["n_chunks_untrusted"] == 1
    assert s["n_chunks_total"] == 5
    assert s["differenced_avg_per_run"] == [151.0, 205.5]
    # median excludes the 198k reading
    assert s["trusted_inst_median"] < 300
    assert "authoritative" in s["provenance"]
