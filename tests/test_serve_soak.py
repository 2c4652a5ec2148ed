"""tools/serve_soak.py — the serving endurance-soak tool (VERDICT r4
next#7). Slow tier: drives the smoke_tiny segment end-to-end on forced
CPU — real cli/serve.py subprocess, sustained closed-loop load, window
sampling, /metrics counter-consistency check, and the SIGTERM
drain-under-load — and pins the report shape."""

import json

import pytest

from tools import serve_soak


def test_segments_have_unique_names():
    names = [s[0] for s in serve_soak.SEGMENTS]
    assert len(names) == len(set(names))


@pytest.mark.slow
def test_smoke_segment_end_to_end(tmp_path, monkeypatch):
    monkeypatch.setenv("LVT_PLATFORM", "cpu")
    out = str(tmp_path / "SERVE_SOAK.json")
    report = serve_soak.main([
        "--segments", "smoke_tiny", "--seg_seconds", "20",
        "--window_seconds", "8", "--workdir", str(tmp_path / "wd"),
        "--out", out, "--startup_timeout", "600"])
    seg = report["segments"]["smoke_tiny"]
    assert seg["ok"], seg.get("error")
    assert seg["total_requests_200"] >= 2
    assert len(seg["windows"]) >= 2
    assert seg["windows"][0]["latency_s"]["p50"] > 0
    assert seg["windows"][0]["host_rss_mb"] is None \
        or seg["windows"][0]["host_rss_mb"] > 0
    cons = seg["metrics_consistency"]
    assert cons["requests_match"], cons
    assert cons["rejected_match"], cons
    # drain under load: clean exit, no errors; in-flight 200s + any
    # post-signal shed both acceptable
    assert seg["drain"]["clean"], seg["drain"]
    with open(out) as f:
        assert json.load(f)["segments"]["smoke_tiny"]["ok"]
