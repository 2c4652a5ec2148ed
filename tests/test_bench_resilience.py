"""bench.py outage resilience (VERDICT r2 #1).

Round 2's official bench artifact was a traceback because the axon TPU
tunnel wedged mid-round and bench.py made one unguarded jax.devices()
call. The orchestrator layer added in round 3 must print exactly ONE
JSON line and exit 0 no matter how the backend fails:

  * init probe fails fast        -> {"error": "backend unavailable ..."}
  * init probe hangs             -> probe subprocess killed, same error
  * worker crashes after a good  -> bounded retries, then structured
    probe                           error JSON (never a traceback)
  * healthy backend              -> the worker's real JSON line relayed

The probe command is overridable via $LVT_BENCH_PROBE_CMD and the worker
is forced onto CPU via $LVT_BENCH_FORCE_CPU so these run hermetically.
"""

import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py")


def _run_bench(extra_env, args=(), timeout=300):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(extra_env)
    r = subprocess.run([sys.executable, BENCH, *args],
                       capture_output=True, text=True, timeout=timeout, env=env)
    return r


def _single_json_line(stdout):
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, "expected exactly one stdout line, got: %r" % lines
    return json.loads(lines[0])


def test_probe_failure_emits_structured_json():
    r = _run_bench({
        "LVT_BENCH_PROBE_CMD": "import sys; sys.exit(3)",
        "LVT_BENCH_INIT_WAIT": "3",
    })
    assert r.returncode == 0, r.stderr[-2000:]
    payload = _single_json_line(r.stdout)
    assert payload["value"] == 0.0
    assert payload["vs_baseline"] == 0.0
    assert "backend unavailable" in payload["error"]
    assert payload["metric"] == "edsr_x4_inference_throughput"
    assert payload["unit"] == "LR_megapixels/sec/chip"


def test_probe_hang_is_bounded():
    r = _run_bench({
        "LVT_BENCH_PROBE_CMD": "import time; time.sleep(600)",
        "LVT_BENCH_INIT_WAIT": "4",
        "LVT_BENCH_PROBE_TIMEOUT": "2",
    }, timeout=120)
    assert r.returncode == 0
    payload = _single_json_line(r.stdout)
    assert "backend unavailable" in payload["error"]


@pytest.mark.slow
def test_worker_crash_emits_structured_json():
    r = _run_bench({
        "LVT_BENCH_PROBE_CMD": "print('cpu 1')",
        "LVT_BENCH_FORCE_CPU": "1",
        "LVT_BENCH_TOTAL_TIMEOUT": "240",
    }, args=["--model", "no_such_model"], timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    payload = _single_json_line(r.stdout)
    assert payload["value"] == 0.0
    assert "worker rc=" in payload["error"]
    assert payload["metric"] == "no_such_model_x4_inference_throughput"


@pytest.mark.slow
def test_success_path_relays_worker_json():
    r = _run_bench({
        "LVT_BENCH_PROBE_CMD": "print('cpu 1')",
        "LVT_BENCH_FORCE_CPU": "1",
        "LVT_COMPILE_CACHE": "",
    }, args=["--model", "edsr", "--batch", "1", "--tile", "24",
             "--iters", "3", "--base_iters", "1", "--repeats", "1",
             "--packed_trunk", "0", "--collapsed_tail", "0",
             "--edsr_res_blocks", "1", "--edsr_conv_features", "8"],
        timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    payload = _single_json_line(r.stdout)
    assert "error" not in payload
    assert payload["value"] > 0
    assert payload["metric"] == "edsr_x4_inference_throughput"
