"""bench.py parent orchestration: budget, retries, guaranteed JSON line.

The driver gate parses bench.py's single stdout JSON line; these tests pin
the parent's hostile-environment behavior (round-1 postmortem: rc=124 with
no output) without touching a TPU: the measurement child is stubbed.
"""

import json

import bench


def _run_main(monkeypatch, capsys, child_results, budget="420",
              retry_fraction="0"):
    calls = []

    def fake_run_child(deadline_s, init_budget_s):
        calls.append((deadline_s, init_budget_s))
        r = child_results[min(len(calls) - 1, len(child_results) - 1)]
        return dict(r) if r is not None else None

    monkeypatch.setattr(bench, "_run_child", fake_run_child)
    monkeypatch.setenv("RS_OV_BENCH_BUDGET", budget)
    # fraction 0 disables the degraded-phase re-measure (these tests pin
    # the orchestration, not the committed-artifact comparison; the stub
    # values are far below any real committed headline)
    monkeypatch.setenv("RS_OV_BENCH_RETRY_FRACTION", retry_fraction)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "_T0", __import__("time").time())
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out), calls


def _ok(value):
    return {"metric": bench.METRIC, "value": value, "unit": "tiles/s",
            "vs_baseline": 0.0}


def test_success_first_try(monkeypatch, capsys):
    parsed, calls = _run_main(monkeypatch, capsys, [_ok(16.5)])
    assert parsed["value"] == 16.5 and len(calls) == 1


def test_retries_on_zero_value_then_succeeds(monkeypatch, capsys):
    hung = {"metric": bench.METRIC, "value": 0.0, "unit": "tiles/s",
            "vs_baseline": 0.0, "error": "backend init did not complete"}
    parsed, calls = _run_main(monkeypatch, capsys, [hung, _ok(12.0)])
    assert parsed["value"] == 12.0 and len(calls) == 2


def test_always_emits_json_when_all_children_fail(monkeypatch, capsys):
    parsed, calls = _run_main(monkeypatch, capsys, [None, None, None])
    assert parsed["metric"] == bench.METRIC
    assert parsed["value"] == 0.0 and "error" in parsed
    assert len(calls) == 3  # bounded retries


def test_cache_clear_retry_does_not_lose_budget_retries(monkeypatch, capsys, tmp_path):
    monkeypatch.setenv("RS_OV_COMPILE_CACHE", str(tmp_path / "cache"))
    stale = {"metric": bench.METRIC, "value": 0.0, "unit": "tiles/s",
             "vs_baseline": 0.0, "error": "libtpu version mismatch",
             "retry_after_cache_clear": True}
    parsed, calls = _run_main(monkeypatch, capsys, [stale, _ok(9.0)])
    assert parsed["value"] == 9.0 and len(calls) == 2


def test_budget_exhausted_still_prints_json(monkeypatch, capsys):
    parsed, calls = _run_main(monkeypatch, capsys, [_ok(1.0)], budget="10")
    assert parsed["metric"] == bench.METRIC
    assert calls == []  # no child launched under a 10s budget


def test_degraded_phase_retry(monkeypatch, capsys, tmp_path):
    """A median far below the last committed artifact triggers one
    cooldown + re-measure; the best child result wins and the retry is
    reported (round-5: the relative probe cannot see a session-wide
    degraded chip phase)."""
    (tmp_path / "benchmarks").mkdir()
    (tmp_path / "benchmarks" / "bench_r1.json").write_text(
        json.dumps({"value": 30.0}))
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    parsed, calls = _run_main(monkeypatch, capsys, [_ok(10.0), _ok(25.0)],
                              retry_fraction="0.6")
    assert len(calls) == 2          # 10.0 < 0.6*30 -> re-measured once
    assert parsed["value"] == 25.0  # best child kept
    assert parsed["degraded_phase_retries"] == 1


def test_first_attempt_gets_one_long_init_window(monkeypatch, capsys):
    """Round-2 postmortem: 3 short init windows (150/124/62s) all lost to a
    slow-recovering tunnel. Attempt 1 must get ~300s; retries get the rest."""
    parsed, calls = _run_main(monkeypatch, capsys, [None, None, None])
    assert len(calls) == 3
    (d1, i1), (d2, i2), (d3, i3) = calls
    assert i1 >= 290  # one long window first (300s default, 420s budget)
    assert i1 <= d1 - 85  # still leaves measurement time
    # retries take whatever budget remains at that point (shrinks in real
    # time; the stubbed children return instantly so only pin the formula)
    assert i2 == max(d2 - 60, 45) and i3 == max(d3 - 60, 45)


def test_failure_attaches_last_committed_artifact(monkeypatch, capsys):
    parsed, _ = _run_main(monkeypatch, capsys, [None, None, None])
    assert parsed["value"] == 0.0
    lg = parsed.get("last_good_committed")
    assert lg and lg["value"] > 0  # newest benchmarks/bench_r*.json
