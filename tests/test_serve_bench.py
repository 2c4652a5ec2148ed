"""tools/serve_bench.py — the serving-latency measurement tool.

Slow tier: drives the smoke_tiny config end-to-end on forced CPU
($LVT_PLATFORM, cli/common) — real cli/serve.py subprocess, real HTTP
offered-load levels, real /info harvest — and pins the report shape:
per-level client percentiles, device percentiles, and (max_queue=1,
offered 4) a non-zero shed count. Fast tier: frame generation and the
structured-failure path for a server that cannot start.
"""

import json
import os

import numpy as np
import pytest

from tools import serve_bench


def test_make_frame_png_decodes_to_frame():
    from PIL import Image
    import io

    png = serve_bench.make_frame_png(64, 96)
    with Image.open(io.BytesIO(png)) as im:
        assert im.size == (96, 64)


def test_pcts_empty_and_values():
    assert serve_bench._pcts([])["p50"] is None
    p = serve_bench._pcts([1.0, 2.0, 3.0])
    assert p["p50"] == 2.0 and p["p99"] >= p["p50"]


def test_bad_ckpt_is_structured(tmp_path, monkeypatch):
    monkeypatch.setenv("LVT_PLATFORM", "cpu")
    r = serve_bench.build_ckpt("no_such_model", [], str(tmp_path))
    assert r["ok"] is False and "error" in r
    json.dumps(r)


@pytest.mark.slow
def test_smoke_config_end_to_end(tmp_path, monkeypatch):
    monkeypatch.setenv("LVT_PLATFORM", "cpu")
    out = str(tmp_path / "SERVE_BENCH.json")
    report = serve_bench.main(["--configs", "smoke_tiny",
                               "--workdir", str(tmp_path / "wd"),
                               "--out", out,
                               "--startup_timeout", "600"])
    row = report["configs"]["smoke_tiny"]
    assert row["ok"], row.get("error")
    levels = {l["offered_concurrency"]: l for l in row["levels"]}
    assert levels[1]["ok"] >= 1
    assert levels[1]["client_e2e_seconds"]["p50"] > 0
    assert levels[1]["info_after"]["device_seconds"]["p50"] > 0
    # max_queue=1, offered 4: the server must have shed at least once
    assert levels[4]["shed_503"] >= 1
    assert levels[4]["ok"] >= 1
    with open(out) as f:
        assert json.load(f)["configs"]["smoke_tiny"]["ok"]
