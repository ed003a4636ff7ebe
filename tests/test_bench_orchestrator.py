"""Regression tests for bench.py's worker multiplexer.

Round 3's driver bench lost the CPU-toy result to an exit race: the
orchestrator saw poll() != None and unregistered the worker WITHOUT a
final pipe drain, dropping a milestone written immediately before exit.
These tests drive _multiplex with real subprocesses reproducing that
pattern (print-then-exit, hang-past-deadline, garbage interleaved with
JSON) so the orchestrator's contract — every milestone printed by a
finished worker lands in the state — is pinned.
"""
import os
import subprocess
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench


def _worker(code: str) -> subprocess.Popen:
    return subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL)


def test_exit_race_final_milestone_lands():
    """A worker that writes its milestone and exits instantly (the round-3
    loss mode) must still have the milestone folded into state."""
    code = ("import json,sys;"
            "print(json.dumps({'milestone':'tts','tts_s':12.5}), flush=True)")
    state = {"platform": "cpu"}
    bench._multiplex([("fixture", _worker(code))],
                     time.time() + 20, state)
    assert state["fixture"]["tts_s"] == 12.5


def test_hung_worker_killed_at_deadline_with_error():
    code = ("import json,time;"
            "print(json.dumps({'milestone':'it_per_s','it_per_s':2.0}),"
            "flush=True); time.sleep(120)")
    state = {"platform": "cpu"}
    t0 = time.time()
    # 10 s deadline: generous headroom for interpreter startup on a loaded
    # single-core box (3 s flaked when a background compile held the CPU)
    bench._multiplex([("fixture", _worker(code))], time.time() + 10, state)
    assert time.time() - t0 < 60
    assert state["fixture"]["it_per_s"] == 2.0
    assert "fixture" in state.get("error", "")


def test_worker_namespacing_no_cross_contamination():
    """Concurrent workers sharing key names (compile_s, iterations) must
    not overwrite each other: the toy worker finishing LAST must not leak
    its stats into the fixture headline."""
    fx = ("import json;"
          "print(json.dumps({'milestone':'tts','tts_s':50.0,"
          "'compile_s':1.0,'iterations':84}), flush=True)")
    toy = ("import json,time; time.sleep(1);"
           "print(json.dumps({'milestone':'toy_tts','toy_tts_s':9.0,"
           "'compile_s':99.0,'iterations':7}), flush=True)")
    state = {"platform": "tpu"}
    bench._multiplex([("fixture", _worker(fx)), ("toy", _worker(toy))],
                     time.time() + 20, state)
    rec = bench._headline(state)
    assert rec["metric"].startswith("nmax6_time_to_solution")
    assert rec["value"] == 50.0
    assert rec["iterations"] == 84      # fixture's, not the toy's 7
    assert rec["compile_s"] == 1.0      # fixture's, not the toy's 99


def test_garbage_lines_skipped():
    code = ("import json;"
            "print('XLA WARNING: something', flush=True);"
            "print(json.dumps({'milestone':'it_per_s','it_per_s':0.4}),"
            "flush=True)")
    state = {"platform": "tpu"}
    bench._multiplex([("fixture", _worker(code))], time.time() + 20, state)
    assert state["fixture"]["it_per_s"] == 0.4


def test_headline_priority_and_fallback():
    # nothing landed -> bench_failed
    assert bench._headline({"platform": "?"})["metric"] == "bench_failed"
    # toy only -> toy metric
    rec = bench._headline({"platform": "cpu",
                           "toy": {"toy_tts_s": 8.0, "iterations": 40}})
    assert rec["metric"] == "toy_time_to_solution[cpu]"
    assert rec["value"] == 8.0
    # fixture it/s outranks toy; fixture tts outranks both
    st = {"platform": "tpu", "toy": {"toy_tts_s": 8.0},
          "fixture": {"it_per_s": 0.5, "precision_bits": 144}}
    assert bench._headline(st)["metric"] == "nmax6_ipm_iterations_per_s[tpu]"
    st["fixture"]["tts_s"] = 100.0
    rec = bench._headline(st)
    assert rec["metric"] == "nmax6_time_to_solution[tpu]"
    assert rec["vs_baseline"] == pytest.approx(0.39)


def _toy_decide_at(t_toy):
    """Mirror of main()'s toy-insurance decision."""
    def decide(st, now, exited, live):
        if "fixture" in st:
            return "drop"
        if "fixture" in exited:
            return "spawn"
        return "spawn" if now >= t_toy else "wait"
    return decide


def test_deferred_insurance_skipped_when_primary_lands():
    """The deferred toy must NOT spawn once the fixture milestone landed
    (single-core contention protection), and MUST spawn when the fixture
    stays silent past its trigger time."""
    fx = ("import json;"
          "print(json.dumps({'milestone':'tts','tts_s':5.0}), flush=True)")
    spawned = []

    def spawn_toy():
        spawned.append(1)
        return _worker("import json;"
                       "print(json.dumps({'milestone':'toy_tts',"
                       "'toy_tts_s':1.0}), flush=True)")

    state = {"platform": "tpu"}
    bench._multiplex([("fixture", _worker(fx))], time.time() + 25, state,
                     deferred=[("toy", _toy_decide_at(time.time() + 12),
                                spawn_toy)])
    assert state["fixture"]["tts_s"] == 5.0
    assert not spawned

    # silent fixture -> insurance fires and its milestone lands
    silent = "import time; time.sleep(120)"
    state = {"platform": "tpu"}
    t0 = time.time()
    bench._multiplex([("fixture", _worker(silent))], time.time() + 30, state,
                     deferred=[("toy", _toy_decide_at(time.time() + 2),
                                spawn_toy)])
    assert spawned
    assert state["toy"]["toy_tts_s"] == 1.0
    assert time.time() - t0 < 60


def test_deferred_insurance_fires_on_primary_crash():
    """A fixture worker that dies WITHOUT a milestone must trigger the
    insurance immediately (not after the 150 s trigger time)."""
    spawned = []

    def spawn_toy():
        spawned.append(1)
        return _worker("import json;"
                       "print(json.dumps({'milestone':'toy_tts',"
                       "'toy_tts_s':1.0}), flush=True)")

    state = {"platform": "tpu"}
    t0 = time.time()
    bench._multiplex([("fixture", _worker("raise SystemExit(1)"))],
                     time.time() + 60, state,
                     deferred=[("toy", _toy_decide_at(time.time() + 55),
                                spawn_toy)])
    assert spawned
    assert state["toy"]["toy_tts_s"] == 1.0
    assert time.time() - t0 < 30      # far before the 55 s trigger


def test_wide_contract_milestone_after_fixture_tts():
    """The wide worker spawns only after the fixture full solve lands; a
    contract-satisfying wide result (gap <= 1e-30) BECOMES the headline
    (round 5), with the 144-bit fields riding along."""
    deadline = time.time() + 40

    def wide_decide(st, now, exited, live):
        fx = st.get("fixture", {})
        if "tts_s" not in fx:
            return "drop" if "fixture" in exited else "wait"
        return "spawn" if (deadline - now) > 5 else "drop"

    fx = ("import json;"
          "print(json.dumps({'milestone':'tts','tts_s':3.3,"
          "'precision_bits':144}), flush=True)")
    wide = ("import json;"
            "print(json.dumps({'milestone':'wide_contract',"
            "'wide_tts_s':120.0,'wide_gap':5e-31,"
            "'wide_precision_bits':432}), flush=True)")
    state = {"platform": "tpu"}
    bench._multiplex([("fixture", _worker(fx))], deadline, state,
                     deferred=[("wide", wide_decide,
                                lambda: _worker(wide))])
    rec = bench._headline(state)
    assert rec["metric"] == "nmax6_time_to_solution_wide[tpu]"
    assert rec["value"] == 120.0
    assert rec["vs_baseline"] == round(39.0 / 120.0, 3)
    assert rec["tts_s"] == 3.3          # the 144-bit fields ride along
    assert "contract-matched" in rec["caveat"]
    assert "not matched" not in rec["caveat"]


def test_wide_dropped_when_fixture_dies():
    """No wide attempt when the fixture worker dies without a full solve."""
    spawned = []

    def wide_decide(st, now, exited, live):
        fx = st.get("fixture", {})
        if "tts_s" not in fx:
            return "drop" if "fixture" in exited else "wait"
        return "spawn"

    state = {"platform": "tpu"}
    bench._multiplex([("fixture", _worker("raise SystemExit(1)"))],
                     time.time() + 30, state,
                     deferred=[("wide", wide_decide,
                                lambda: spawned.append(1) or _worker("pass"))])
    assert not spawned


def test_hung_wide_worker_is_note_not_error():
    """An unfinished OPTIONAL wide worker must annotate, not error, the
    record (the headline metric already landed)."""
    state = {"platform": "tpu",
             "fixture": {"tts_s": 3.3, "precision_bits": 144}}
    bench._multiplex([("wide", _worker("import time; time.sleep(120)"))],
                     time.time() + 3, state)
    assert "error" not in state
    assert "wide_note" in state["wide"]
    rec = bench._headline(state)
    assert rec["metric"] == "nmax6_time_to_solution[tpu]"
    assert "error" not in rec
