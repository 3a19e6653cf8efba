"""bench.py orchestrator scheduling policy (no jax, no subprocesses).

Round-2 postmortem (VERDICT.md): a blind once-retry of a section that had
already timed out at its full cap starved the last mandatory section, and
two of three driver metrics came out null. These tests pin the round-3
policy: first pass over every section before any retry, no retry of a
full-cap timeout unless everything else is served AND a whole extra cap
fits, and persisted same-round results folding in for failed sections.
"""
import importlib
import json
import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


@pytest.fixture()
def harness(monkeypatch, tmp_path, capsys):
    """Patch bench's subprocess runner + results file; returns a driver."""
    monkeypatch.setattr(bench, "_RESULTS_FILE", str(tmp_path / "res.json"))

    calls = []

    def install(behaviors):
        """behaviors: section -> callable(attempt_idx) -> (result, status, dt)."""
        counts = {}

        def fake_run_child(section, deadline, timeout, extra_args):
            i = counts.get(section, 0)
            counts[section] = i + 1
            calls.append(section)
            if section == "probe":
                return {"ok": True, "platform": "fake"}, "ok", 1.0
            return behaviors[section](i)

        monkeypatch.setattr(bench, "_run_child", fake_run_child)

    def run(budget="3000", argv=("bench.py",)):
        monkeypatch.setenv("BENCH_BUDGET_S", budget)
        monkeypatch.setattr(sys, "argv", list(argv))
        bench.main()
        out = capsys.readouterr().out
        final = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
        return final, out

    return install, run, calls


def ok(**kv):
    return lambda i: (dict(kv), "ok", 5.0)


def timeout(tmo=540.0):
    return lambda i: (None, "timeout", tmo)


def test_all_sections_live_and_persisted(harness):
    install, run, calls = harness
    install({
        "rollout": ok(rollout_fps=50.0),
        "tokenizer": ok(tokenizer_roundtrip_fps=200.0),
        "tokenizer_train": ok(tokenizer_train_fps=60.0),
        "serve": ok(serve_ms_p50=20.0, serve_ms_p95=25.0),
    })
    final, _ = run()
    assert final["value"] == 50.0
    assert final["extra"]["tokenizer_roundtrip_fps"] == 200.0
    assert final["extra"]["tokenizer_train_fps"] == 60.0
    assert final["extra"]["serve_ms_p50"] == 20.0
    assert final["extra"]["cached_sections"] is None
    # every section persisted for the next run
    saved = json.load(open(bench._RESULTS_FILE))
    assert set(saved) >= {"rollout", "tokenizer", "tokenizer_train", "serve"}


def test_timeout_not_retried_before_later_sections(harness):
    """A full-cap timeout must not steal the later sections' first pass."""
    install, run, calls = harness
    install({
        "rollout": ok(rollout_fps=50.0),
        "tokenizer": timeout(),
        "tokenizer_train": ok(tokenizer_train_fps=60.0),
        "serve": ok(serve_ms_p50=20.0, serve_ms_p95=25.0),
    })
    final, _ = run()
    # train ran (and reported) despite the earlier tokenizer timeout
    assert final["extra"]["tokenizer_train_fps"] == 60.0
    first_train = calls.index("tokenizer_train")
    # tokenizer attempted exactly once before train's first attempt
    assert calls[:first_train].count("tokenizer") == 1


def test_timeout_retry_only_with_full_extra_cap(harness):
    install, run, calls = harness
    install({
        "rollout": ok(rollout_fps=50.0),
        "tokenizer": timeout(),
        "tokenizer_train": ok(tokenizer_train_fps=60.0),
        "serve": ok(serve_ms_p50=20.0, serve_ms_p95=25.0),
    })
    # Plenty of budget -> one retry of the timed-out section is allowed.
    final, _ = run(budget="5000")
    assert calls.count("tokenizer") == 2
    calls.clear()
    # Tight budget (< cap + 60 left after first pass) -> no retry.
    final, _ = run(budget="590")
    assert calls.count("tokenizer") == 1


def test_fast_failure_gets_one_retry(harness):
    install, run, calls = harness
    seen = {}

    def flaky(i):
        if i == 0:
            return None, "fail", 3.0  # transient tunnel error
        return {"tokenizer_roundtrip_fps": 180.0}, "ok", 5.0

    install({
        "rollout": ok(rollout_fps=50.0),
        "tokenizer": flaky,
        "tokenizer_train": ok(tokenizer_train_fps=60.0),
        "serve": ok(serve_ms_p50=20.0, serve_ms_p95=25.0),
    })
    final, _ = run()
    assert final["extra"]["tokenizer_roundtrip_fps"] == 180.0
    assert calls.count("tokenizer") == 2


def test_transient_failure_retried_regardless_of_duration(harness):
    """Round-5 extras lost the rollout section to a remote-compile 500
    surfacing at ~140s -- over the fast-fail wall-clock line. A failure
    classified `transient` must get its retry regardless of duration."""
    install, run, calls = harness

    def flaky(i):
        if i == 0:
            return None, "transient", 140.0
        return {"rollout_fps": 58.0}, "ok", 5.0

    install({
        "rollout": flaky,
        "tokenizer": ok(tokenizer_roundtrip_fps=210.0),
        "tokenizer_train": ok(tokenizer_train_fps=60.0),
        "serve": ok(serve_ms_p50=20.0, serve_ms_p95=25.0),
    })
    final, _ = run()
    assert final["value"] == 58.0
    assert calls.count("rollout") == 2


def test_run_child_classifies_tunnel_errors_transient(harness, monkeypatch):
    """The real subprocess wrapper must label tunnel/compile-helper drops
    transient (retryable) and genuine program errors as plain failures."""
    class P:
        returncode = 1
        stdout = ""
        stderr = ("jax.errors.JaxRuntimeError: INTERNAL: "
                  "http://127.0.0.1:8103/remote_compile: read body: "
                  "response body closed before all bytes were read")

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: P())
    r, kind, _ = bench._run_child(
        "rollout", time.monotonic() + 1000, 480.0, [])
    assert r is None and kind == "transient"

    P.stderr = "ValueError: shapes do not match"
    r, kind, _ = bench._run_child(
        "rollout", time.monotonic() + 1000, 480.0, [])
    assert r is None and kind == "fail"


def test_headline_rollout_gets_last_chance_attempts(harness):
    """With no rollout backstop, a persistently-dropped rollout compile
    gets extra attempts while the budget holds -- a null headline value is
    the worst artifact. Bounded: at most first pass + retry + 3 extra."""
    install, run, calls = harness

    def flaky(i):
        if i < 3:
            return None, "transient", 100.0
        return {"rollout_fps": 57.0}, "ok", 5.0

    install({
        "rollout": flaky,
        "tokenizer": ok(tokenizer_roundtrip_fps=210.0),
        "tokenizer_train": ok(tokenizer_train_fps=60.0),
        "serve": ok(serve_ms_p50=20.0, serve_ms_p95=25.0),
    })
    final, _ = run(budget="5000")
    assert final["value"] == 57.0
    assert calls.count("rollout") == 4  # first pass + retry + 2 extra


def test_headline_attempts_bounded_when_always_failing(harness):
    install, run, calls = harness
    install({
        "rollout": lambda i: (None, "transient", 100.0),
        "tokenizer": ok(tokenizer_roundtrip_fps=210.0),
        "tokenizer_train": ok(tokenizer_train_fps=60.0),
        "serve": ok(serve_ms_p50=20.0, serve_ms_p95=25.0),
    })
    final, _ = run(budget="5000")
    assert final["value"] is None
    assert calls.count("rollout") == 5  # first pass + retry + 3 extra


def test_saved_results_fold_in_on_timeout(harness):
    install, run, calls = harness
    # Seed the persisted file with a fresh same-round tokenizer result.
    with open(bench._RESULTS_FILE, "w") as f:
        json.dump({
            "tokenizer": {"ts": time.time() - 600,
                          "result": {"tokenizer_roundtrip_fps": 205.0}},
            "stale": {"ts": time.time() - 48 * 3600,
                      "result": {"rollout_fps": 1.0}},
        }, f)
    install({
        "rollout": ok(rollout_fps=50.0),
        "tokenizer": timeout(),
        "tokenizer_train": ok(tokenizer_train_fps=60.0),
        "serve": ok(serve_ms_p50=20.0, serve_ms_p95=25.0),
    })
    final, out = run(budget="590")  # no retry budget
    assert final["extra"]["tokenizer_roundtrip_fps"] == 205.0
    assert "tokenizer" in final["extra"]["cached_sections"]
    # stale (>12h) entries are ignored; live rollout wins regardless
    assert final["value"] == 50.0


def test_sections_without_saved_backstop_run_first(harness):
    install, run, calls = harness
    with open(bench._RESULTS_FILE, "w") as f:
        json.dump({
            "rollout": {"ts": time.time(), "result": {"rollout_fps": 49.0}},
            "tokenizer": {"ts": time.time(),
                          "result": {"tokenizer_roundtrip_fps": 205.0}},
        }, f)
    install({
        "rollout": ok(rollout_fps=50.0),
        "tokenizer": ok(tokenizer_roundtrip_fps=210.0),
        "tokenizer_train": ok(tokenizer_train_fps=60.0),
        "serve": ok(serve_ms_p50=20.0, serve_ms_p95=25.0),
    })
    final, _ = run()
    # tokenizer_train has no backstop -> scheduled before the backed-up two
    mand = [c for c in calls if c in ("rollout", "tokenizer", "tokenizer_train")]
    assert mand[0] == "tokenizer_train"
    # live results override saved ones
    assert final["value"] == 50.0
    assert final["extra"]["tokenizer_roundtrip_fps"] == 210.0


def test_quick_mode_skips_persistence(harness):
    install, run, calls = harness
    install({
        "rollout": ok(rollout_fps=5.0),
        "tokenizer": ok(tokenizer_roundtrip_fps=20.0),
        "tokenizer_train": ok(tokenizer_train_fps=6.0),
        "serve": ok(serve_ms_p50=20.0, serve_ms_p95=25.0),
    })
    final, _ = run(argv=("bench.py", "--quick"))
    assert not os.path.exists(bench._RESULTS_FILE)
    assert "serve" not in calls  # optional section skipped in quick mode


def test_stalest_saved_section_runs_first(harness):
    install, run, calls = harness
    now = time.time()
    with open(bench._RESULTS_FILE, "w") as f:
        json.dump({
            "rollout": {"ts": now - 600, "result": {"rollout_fps": 49.0}},
            "tokenizer": {"ts": now - 7200,
                          "result": {"tokenizer_roundtrip_fps": 205.0}},
            "tokenizer_train": {"ts": now - 3600,
                                "result": {"tokenizer_train_fps": 55.0}},
            "serve": {"ts": now - 11 * 3600,
                      "result": {"serve_ms_p50": 48.0, "serve_ms_p95": 60.0}},
        }, f)
    install({
        "rollout": ok(rollout_fps=50.0),
        "tokenizer": ok(tokenizer_roundtrip_fps=210.0),
        "tokenizer_train": ok(tokenizer_train_fps=60.0),
        "serve": ok(serve_ms_p50=20.0, serve_ms_p95=25.0),
    })
    run()
    mand = [c for c in calls if c != "probe"][:4]  # bonus attempts follow
    # oldest backstop first: serve (11h) > tokenizer (2h) > train (1h) > rollout
    assert mand == ["serve", "tokenizer", "tokenizer_train", "rollout"]


def test_serve_is_mandatory_in_first_pass(harness):
    install, run, calls = harness
    # Budget only covers the first pass; serve must still get its slot.
    install({
        "rollout": ok(rollout_fps=50.0),
        "tokenizer": timeout(),
        "tokenizer_train": timeout(560.0),
        "serve": ok(serve_ms_p50=20.0, serve_ms_p95=25.0),
    })
    final, _ = run(budget="1300")
    assert "serve" in calls
    assert final["extra"]["serve_ms_p50"] == 20.0


def test_section_run_persists_canonical_result(harness, monkeypatch):
    monkeypatch.setitem(
        bench.SECTIONS, "rollout", lambda a: {"rollout_fps": 58.0, "spf": 25}
    )
    monkeypatch.setattr(sys, "argv", ["bench.py", "--section", "rollout"])
    bench.main()
    saved = json.load(open(bench._RESULTS_FILE))
    assert saved["rollout"]["result"]["rollout_fps"] == 58.0
    # non-canonical shapes must NOT overwrite the saved entry
    monkeypatch.setitem(
        bench.SECTIONS, "rollout", lambda a: {"rollout_fps": 99.0, "spf": 4}
    )
    monkeypatch.setattr(
        sys, "argv", ["bench.py", "--section", "rollout", "--frames", "4"]
    )
    bench.main()
    saved = json.load(open(bench._RESULTS_FILE))
    assert saved["rollout"]["result"]["rollout_fps"] == 58.0


def test_section_train_bonus_shapes_do_not_overwrite_backstop(
    harness, monkeypatch
):
    """A child `--section tokenizer_train` at non-canonical shapes (ad-hoc
    sweeps, or the b2f4 fallback shape) must not overwrite the canonical
    b4f8 backstop — the orchestrator saves the fallback under its own key."""
    monkeypatch.setitem(
        bench.SECTIONS,
        "tokenizer_train",
        lambda a: {"tokenizer_train_fps": 95.0, "train_shape": "b4f8"},
    )
    monkeypatch.setattr(
        sys, "argv", ["bench.py", "--section", "tokenizer_train"]
    )
    bench.main()
    saved = json.load(open(bench._RESULTS_FILE))
    assert saved["tokenizer_train"]["result"]["tokenizer_train_fps"] == 95.0

    monkeypatch.setitem(
        bench.SECTIONS,
        "tokenizer_train",
        lambda a: {"tokenizer_train_fps": 55.0, "train_shape": "b2f4"},
    )
    monkeypatch.setattr(
        sys,
        "argv",
        ["bench.py", "--section", "tokenizer_train",
         "--train-batch", "2", "--train-frames", "4"],
    )
    bench.main()
    saved = json.load(open(bench._RESULTS_FILE))
    assert saved["tokenizer_train"]["result"]["tokenizer_train_fps"] == 95.0


def test_orchestrator_noncanonical_shapes_do_not_save(harness):
    """A FULL orchestrator run started with explicit non-canonical shapes
    (ad-hoc sweeps) must not overwrite the canonical saved backstops
    (advisor round-3 finding: only the child path guarded shapes)."""
    install, run, calls = harness
    with open(bench._RESULTS_FILE, "w") as f:
        json.dump({
            "rollout": {"ts": time.time() - 600,
                        "result": {"rollout_fps": 66.0, "spf": 25}},
            "tokenizer_train": {
                "ts": time.time() - 600,
                "result": {"tokenizer_train_fps": 95.0,
                           "train_shape": "b4f8"}},
        }, f)
    install({
        "rollout": ok(rollout_fps=200.0),  # cheap 4-frame shape
        "tokenizer": ok(tokenizer_roundtrip_fps=210.0),
        "tokenizer_train": ok(tokenizer_train_fps=55.0),
        "serve": ok(serve_ms_p50=20.0, serve_ms_p95=25.0),
    })
    run(argv=("bench.py", "--frames", "4",
              "--train-batch", "2", "--train-frames", "4"))
    saved = json.load(open(bench._RESULTS_FILE))
    assert saved["rollout"]["result"]["rollout_fps"] == 66.0
    assert saved["tokenizer_train"]["result"]["tokenizer_train_fps"] == 95.0
    # canonical sections from the same run still refresh
    assert saved["tokenizer"]["result"]["tokenizer_roundtrip_fps"] == 210.0


def test_train_fallback_shape_on_big_compile_failure(harness):
    """When the mandatory b4f8 train step fails (remote compile helper),
    the orchestrator falls back to b2f4, reports it live with its shape
    label, and saves it under its own key (never the canonical one)."""
    install, run, calls = harness

    def train(i):
        if i < 2:  # first pass + full-cap retry both fail
            return None, "timeout", 560.0
        return ({"tokenizer_train_fps": 57.0, "train_shape": "b2f4"},
                "ok", 5.0)

    install({
        "rollout": ok(rollout_fps=50.0),
        "tokenizer": ok(tokenizer_roundtrip_fps=210.0),
        "tokenizer_train": train,
        "serve": ok(serve_ms_p50=20.0, serve_ms_p95=25.0),
    })
    final, _ = run(budget="5000")
    assert final["extra"]["tokenizer_train_fps"] == 57.0
    assert final["extra"]["tokenizer_train_shape"] == "b2f4"
    saved = json.load(open(bench._RESULTS_FILE))
    assert "tokenizer_train" not in saved
    assert saved["tokenizer_train_b2f4"]["result"]["tokenizer_train_fps"] == 57.0
