#!/usr/bin/env python
"""Benchmark: real-fixture iterations/s and time-to-solution on the chip.

DESIGN CONTRACT (hard-learned): the driver runs `python bench.py` under an
external timeout and parses the LAST complete JSON line it sees.  So this
script (a) prints a full headline record IMMEDIATELY after every finished
measurement (flushed) and upgrades it as later parts land, (b) runs the
cheapest honest measurement first, (c) budgets itself (default 520 s,
SDPB_BENCH_BUDGET_S to override) and kills its own subprocess workers
before the external timeout can, and (d) measures the PRODUCTION numerics
(scaled exponent-tracked f32 limbs on TPU, classic f64 on CPU).

Workload: the reference's own CI fixture SingletScalar_cT_test_nmax6
(11 blocks, N=20; anchor: 39 s wall on 6 MPI ranks at 768 bits,
/root/reference/test/data/end-to-end_tests/.../out/out.txt:1-7 and
BASELINE.md).  Milestones, each upgrading the headline:

  1. it_per_s  — steady-state IPM iterations/s of the jitted production
     iteration on the fixture (per-iteration host sync, compile excluded
     like the reference's anchor excludes its C++ build).
  2. tts       — full solve wall-clock to primal-dual optimality at
     gap <= 1e-10, vs the 39 s anchor.

Compiles ride the on-disk EXECUTABLE cache (ops/compile_cache): axon
remote compiles are not covered by the jax persistent cache, so without it
every bench run would re-pay tens of minutes of server-side compile.  A
cold cache is survivable: the worker gets the whole remaining budget and
whatever milestones it reaches are the record.

If the TPU platform is unreachable (the axon tunnel hangs on init some
days), the probe times out and the bench falls back to a CPU toy-fixture
solve so the driver always captures a number.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
FIXTURE = ("/root/reference/test/data/end-to-end_tests/"
           "SingletScalar_cT_test_nmax6/primal_dual_optimal/sdp.orig.zip")
TOY = "/root/reference/test/data/sdp.zip"
BASELINE_S = 39.0       # SDPB CI: 6 MPI ranks, 768 bits (BASELINE.md)
BASELINE_ITS = 110      # estimated iterations of that run (the reference
                        # does not publish the count; 110 matches our own
                        # 212-bit solve of the same SDP at Omega=1e10)
ORACLE = "-0.283884666328349913107791200043437245362902095745491"
TOY_ORACLE = "1.84026576313204924668804017173055"


def _setup(platform: str):
    sys.path.insert(0, REPO)
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        flags = os.environ.get("XLA_FLAGS", "")
        if "--xla_cpu_use_fusion_emitters=false" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_cpu_use_fusion_emitters=false").strip()
            os.execv(sys.executable, [sys.executable] + sys.argv)
        jax.config.update("jax_enable_x64", True)
    cache = os.environ.get("SDPB_TPU_CACHE",
                           os.path.expanduser("~/.cache/sdpb_tpu/xla"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return jax.devices()[0].platform


def _emit(rec):
    print(json.dumps(rec), flush=True)


def part_fixture(platform: str, budget_s: float):
    """TPU (or CPU-f64) nmax6 fixture: it/s milestone, then full TTS."""
    import mpmath
    import numpy as np
    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.solver.params import SolverParameters
    from sdpb_tpu.solver.solve import TerminateReason, run_solver

    t_start = time.time()
    if platform == "cpu":
        K, bits, scaled = 4, 212, 0
        gap, omega = "1e-12", "1e10"
        host = read_sdp(FIXTURE, K, np.float64)
        sdp = build_device_sdp(host, quant=32)
    else:
        # 144 bits: measured floor for this fixture at gap 1e-10 — the
        # 120-bit (scaled=5) config diverges mid-solve around iteration 43
        # (non-finite at full factor precision -> maxComplementarity)
        scaled, bits = 6, 144
        gap, omega = "1e-10", "1e6"
        K64 = -(-(24 * scaled) // 53) + 1
        host = read_sdp(FIXTURE, K64, np.float64)
        sdp = build_device_sdp(host, quant=32, scaled_limbs=scaled)

    base = dict(
        precision=bits, duality_gap_threshold=gap,
        primal_error_threshold=gap, dual_error_threshold=gap,
        initial_matrix_scale_primal=omega, initial_matrix_scale_dual=omega)
    if platform != "cpu":
        # pin the factor at full working precision: the auto model picks 4
        # limbs for gap 1e-10, whose range exhausts near mu ~2e-4 on this
        # fixture (measured round 4) — each mid-solve heal is a recompile
        # the bench budget cannot afford
        base["factor_limbs"] = scaled

    # milestone 1: ONE run capped at 31 iterations = four 8-iteration
    # chunks of the device-resident run loop (solver/solve.py
    # _solve_chunked).  run_solver records per-iteration wall seconds
    # (chunk time / iterations executed); the steady-state rate is the
    # median of the second chunk, and "compile" = everything outside the
    # iteration loop (executable-cache load when warm, full remote compile
    # when cold).  max_iterations is a dynamic arg of the chunked
    # executable, so milestone 2 reuses it via the in-process memo.
    p31 = SolverParameters(**base, max_iterations=31)
    t0 = time.time()
    r_warm = run_solver(sdp, p31, verbosity=0, use_compile_cache=True)
    total_31 = time.time() - t0
    ts = r_warm.iteration_seconds
    tail = sorted(ts[len(ts) // 2:]) or ts
    s_it = tail[len(tail) // 2]
    _emit({"milestone": "it_per_s", "it_per_s": round(1.0 / s_it, 3),
           "compile_s": round(total_31 - sum(ts), 1),
           "precision_bits": bits, "platform": platform})

    # milestone 2: full solve, only if the estimate fits what remains.
    # The measured 144-bit solve takes 84 iterations to gap 1e-10 (probed
    # on a real v5e); 100 covers it with slack.  The executable is shared
    # with milestone 1 via the in-process memo (max_iterations is a
    # dynamic arg of the chunked executable), so no second load/compile.
    remaining = budget_s - (time.time() - t_start)
    est = 100 * s_it + 15
    if est > remaining:
        _emit({"milestone": "skip_tts",
               "why": f"estimated {est:.0f}s full solve > {remaining:.0f}s "
                      "remaining budget"})
        return
    pf = SolverParameters(**base, max_iterations=300)
    t0 = time.time()
    res = run_solver(sdp, pf, verbosity=0, use_compile_cache=True)
    tts = time.time() - t0
    with mpmath.workprec(300):
        digits = -float(mpmath.log10(
            abs(res.primal_objective - mpmath.mpf(ORACLE)) + mpmath.mpf(10) ** -60))
    _emit({"milestone": "tts", "tts_s": round(tts, 1),
           "iterations": res.iterations,
           "terminate": str(res.terminate_reason),
           "gap": float(res.duality_gap),
           "objective_digits": round(digits, 1)})


def part_wide(platform: str, budget_s: float):
    """Optional third milestone: the reference's DEFAULT precision contract
    (>= 400 bits to duality gap 1e-30, Solver_Parameters.cxx:18,59-64) on
    the same nmax6 fixture, at 432-bit WIDE scaled-f32 arithmetic (wide
    matmuls run in the Pallas two-word kernel since round 5).

    A successful run WRITES the warm-marker file (measured est_s + config)
    so later bench runs can budget the milestone; with no marker the run
    is attempted anyway when the budget is generous (a warm executable
    cache finishes in minutes; a cold one times out as a note)."""
    import mpmath
    import numpy as np
    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.solver.params import SolverParameters
    from sdpb_tpu.solver.solve import run_solver

    marker = _read_wide_marker()
    if "est_s" in marker and float(marker["est_s"]) + 60 > budget_s:
        _emit({"milestone": "skip_wide",
               "why": f"marker est {marker['est_s']}s + 60 > {budget_s:.0f}s "
                      "worker budget"})
        return
    K32 = 18
    K64 = -(-(24 * K32) // 53) + 1
    host = read_sdp(FIXTURE, K64, np.float64)
    sdp = build_device_sdp(host, quant=32, scaled_limbs=K32)
    omega = marker.get("omega", "1e6")
    chunk = int(marker.get("chunk", 4))
    params = SolverParameters(
        precision=432, duality_gap_threshold="1e-30",
        primal_error_threshold="1e-30", dual_error_threshold="1e-30",
        initial_matrix_scale_primal=omega,
        initial_matrix_scale_dual=omega,
        max_iterations=300)
    t0 = time.time()
    res = run_solver(sdp, params, verbosity=0, use_compile_cache=True,
                     chunk_iterations=chunk)
    tts = time.time() - t0
    with mpmath.workprec(600):
        digits = -float(mpmath.log10(
            abs(res.primal_objective - mpmath.mpf(ORACLE))
            + mpmath.mpf(10) ** -60))
    gap = float(res.duality_gap)
    _emit({"milestone": "wide_contract", "wide_tts_s": round(tts, 1),
           "wide_iterations": res.iterations,
           "wide_terminate": str(res.terminate_reason),
           "wide_gap": gap,
           "wide_objective_digits": round(digits, 1),
           "wide_precision_bits": 432})
    if gap <= 1e-30:
        # leave the warm marker so the next bench run can budget (and the
        # deferred-spawn logic can rely on) a measured estimate — this
        # write is what makes the milestone self-sustaining (round-4
        # VERDICT: the marker previously had no writer at all)
        try:
            with open(_wide_marker_path(), "w") as f:
                json.dump({"est_s": round(tts, 1), "omega": omega,
                           "chunk": chunk}, f)
        except OSError:
            pass


LADDER = os.path.join(REPO, "fixtures", "ising_ladder_120", "sdp.zip")


def part_ladder(platform: str, budget_s: float):
    """Optional BASELINE-ladder milestone: the 120-block Ising-class SDP
    (fixtures/ising_ladder_120, generated by tools/gen_pmp.py --solvable)
    solved on one chip at 216 bits to duality gap 1e-20 — the north-star
    metric's "hundreds of blocks / time-to-1e-20" rung (BASELINE.json
    configs[2]).  Budgeted by the ladder warm-marker like the wide
    milestone; a successful run writes it."""
    import mpmath
    import numpy as np
    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.solver.params import SolverParameters
    from sdpb_tpu.solver.solve import run_solver

    marker = _read_marker("ladder_120_warm.json")
    if "est_s" in marker and float(marker["est_s"]) + 60 > budget_s:
        _emit({"milestone": "skip_ladder",
               "why": f"marker est {marker['est_s']}s + 60 > "
                      f"{budget_s:.0f}s worker budget"})
        return
    scaled = 9
    K64 = -(-(24 * scaled) // 53) + 1
    host = read_sdp(LADDER, K64, np.float64)
    sdp = build_device_sdp(host, quant=32, scaled_limbs=scaled)
    omega = marker.get("omega", "1e4")
    params = SolverParameters(
        precision=216, duality_gap_threshold="1e-20",
        primal_error_threshold="1e-20", dual_error_threshold="1e-20",
        initial_matrix_scale_primal=omega, initial_matrix_scale_dual=omega,
        max_iterations=300)
    t0 = time.time()
    res = run_solver(sdp, params, verbosity=0, use_compile_cache=True)
    tts = time.time() - t0
    ts = res.iteration_seconds or [tts]
    tail = sorted(ts[len(ts) // 2:]) or ts
    gap = float(res.duality_gap)
    _emit({"milestone": "ladder", "ladder_tts_s": round(tts, 1),
           "ladder_iterations": res.iterations,
           "ladder_terminate": str(res.terminate_reason),
           "ladder_gap": gap,
           "ladder_it_per_s": round(1.0 / tail[len(tail) // 2], 3),
           "ladder_blocks": 120, "ladder_precision_bits": 216})
    if gap <= 1e-20:
        try:
            with open(_marker_path("ladder_120_warm.json"), "w") as f:
                json.dump({"est_s": round(tts, 1), "omega": omega}, f)
        except OSError:
            pass


def _marker_path(name: str):
    cache = os.environ.get("SDPB_TPU_CACHE",
                           os.path.expanduser("~/.cache/sdpb_tpu/xla"))
    return os.path.join(cache, name)


def _read_marker(name: str) -> dict:
    try:
        with open(_marker_path(name)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _wide_marker_path():
    cache = os.environ.get("SDPB_TPU_CACHE",
                           os.path.expanduser("~/.cache/sdpb_tpu/xla"))
    return os.path.join(cache, "wide_nmax6_warm.json")


def _read_wide_marker() -> dict:
    try:
        with open(_wide_marker_path()) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def part_toy_cpu(budget_s: float):
    """CPU fallback: toy SDP end-to-end (the reference's unit-test problem,
    test/data/sdp.zip) — always lands a number even with the TPU down."""
    import mpmath
    import numpy as np
    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.solver.params import SolverParameters
    from sdpb_tpu.solver.solve import run_solver

    K = 3
    host = read_sdp(TOY, K, np.float64)
    sdp = build_device_sdp(host)
    params = SolverParameters(
        precision=159, duality_gap_threshold="1e-15",
        primal_error_threshold="1e-15", dual_error_threshold="1e-15",
        initial_matrix_scale_primal="1e2", initial_matrix_scale_dual="1e2",
        max_iterations=100)
    t0 = time.time()
    run_solver(sdp, SolverParameters(**{**params.to_dict(),
                                        "max_iterations": 1}),
               verbosity=0, use_compile_cache=True)
    compile_s = time.time() - t0
    t0 = time.time()
    res = run_solver(sdp, params, verbosity=0, use_compile_cache=True)
    tts = time.time() - t0
    with mpmath.workprec(200):
        digits = -float(mpmath.log10(
            abs(res.primal_objective - mpmath.mpf(TOY_ORACLE))
            + mpmath.mpf(10) ** -40))
    _emit({"milestone": "toy_tts", "toy_tts_s": round(tts, 1),
           "compile_s": round(compile_s, 1),
           "iterations": res.iterations,
           "terminate": str(res.terminate_reason),
           "objective_digits": round(digits, 1)})


# ---------------------------------------------------------------------------
# Orchestrator


def _probe() -> str:
    """Discover the default platform in a subprocess: axon tunnel init can
    hang for minutes when the TPU is unreachable."""
    try:
        res = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=75, cwd=REPO)
        p = res.stdout.strip().splitlines()[-1] if res.stdout.strip() else ""
        return p or "cpu"
    except (subprocess.TimeoutExpired, OSError):
        return "cpu"


def _profile_fields() -> dict:
    """Per-phase device profile of the committed round profile JSON
    (tools/profile_phases.py --json), folded into the headline so the
    record carries a utilization number next to the wall-clock one
    (reference timing-run analog: src/sdpb/write_timing.cxx:17-31)."""
    cands = [os.path.join(
        os.environ.get("SDPB_TPU_CACHE",
                       os.path.expanduser("~/.cache/sdpb_tpu/xla")),
        "phases_nmax6.json")]
    import glob
    cands += sorted(glob.glob(os.path.join(REPO, "PHASES_r*.json")),
                    reverse=True)
    for p in cands:
        try:
            with open(p) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        rows = [r for r in rec.get("phases", [])
                if r.get("pct_of_peak") is not None]
        if not rows:
            continue
        ms = sum(r["ms"] for r in rows)
        agg = sum(r["ms"] * r["pct_of_peak"] for r in rows) / ms if ms else 0
        return {"profile_device_ms_per_iter": rec.get("iteration_ms"),
                "profile_pct_vpu_peak": round(agg, 1),
                "profile_vpu_peak_gflops": rec.get(
                    "vpu_peak_gflops_measured"),
                "profile_source": os.path.basename(p)}
    return {}


def _headline(state: dict, pending: bool = False) -> dict:
    """Best available headline from accumulated milestones.  Milestones are
    namespaced per worker (state['fixture'] / state['toy']) so a toy
    milestone landing after a fixture one cannot contaminate the nmax6
    headline (or vice versa).  `pending=True` marks the opening
    placeholder (no milestone yet, not a failure): the final empty-handed
    record keeps the bench_failed metric."""
    plat = state.get("platform", "?")
    fx = state.get("fixture", {})
    toy = state.get("toy", {})
    wide = state.get("wide", {})
    ladder = state.get("ladder", {})
    bits = fx.get("precision_bits", "?")
    caveat_prec = (
        f"reference anchor is 39 s / 6 MPI ranks / 768 bits / gap 9e-31; "
        f"this run solves the same SDP at {bits} bits to gap 1e-10 on one "
        f"device (precision contract not matched; more limbs available at "
        f"higher cost)")
    if wide.get("wide_gap", 1.0) <= 1e-30:
        # the wide run satisfies the reference's DEFAULT contract
        # (--precision 400 / thresholds 1e-30, Solver_Parameters.cxx:18,
        # 59-64): it IS the headline; the narrow fixture fields ride along
        rec = {"metric": f"nmax6_time_to_solution_wide[{plat}]",
               "value": wide["wide_tts_s"], "unit": "s",
               "vs_baseline": round(BASELINE_S / wide["wide_tts_s"], 3),
               "caveat": (
                   "contract-matched headline: same nmax6 SDP at 432 bits "
                   "to duality gap <= 1e-30 on ONE chip vs the reference "
                   "anchor 39 s / 6 MPI ranks / 768 bits / gap 9e-31 "
                   "(432 >= the 400-bit default --precision; anchor ran "
                   "768).  The *_s/it_per_s fields are the faster 144-bit "
                   "/ gap 1e-10 configuration of the same SDP")}
        rec.update({k: v for k, v in wide.items() if k not in rec})
        rec.update({k: v for k, v in fx.items() if k not in rec})
        rec.update({k: v for k, v in ladder.items() if k not in rec})
        rec.update(_profile_fields())
        rec["platform"] = plat
        if "error" in state:
            rec["error"] = state["error"]
        rec.pop("milestone", None)
        return rec
    if "tts_s" in fx:
        rec = {"metric": f"nmax6_time_to_solution[{plat}]",
               "value": fx["tts_s"], "unit": "s",
               "vs_baseline": round(BASELINE_S / fx["tts_s"], 3),
               "caveat": caveat_prec}
        rec.update({k: v for k, v in fx.items() if k not in rec})
        rec.update({k: v for k, v in wide.items() if k not in rec})
        rec.update({k: v for k, v in ladder.items() if k not in rec})
        rec.update(_profile_fields())
    elif "it_per_s" in fx:
        anchor = BASELINE_ITS / BASELINE_S  # ~2.9 it/s, 6 ranks, 768 bits
        rec = {"metric": f"nmax6_ipm_iterations_per_s[{plat}]",
               "value": fx["it_per_s"], "unit": "iterations/s",
               "vs_baseline": round(fx["it_per_s"] / anchor, 3),
               "caveat": caveat_prec + "; rate metric (full-solve milestone "
                                       "did not land this run)"}
        rec.update({k: v for k, v in fx.items() if k not in rec})
    elif "toy_tts_s" in toy:
        rec = {"metric": "toy_time_to_solution[cpu]",
               "value": toy["toy_tts_s"], "unit": "s",
               "vs_baseline": 0.0,
               "caveat": "CPU toy solve (no comparable reference anchor); "
                         "nmax6 fixture milestones did not land this run "
                         "(TPU unreachable or compile cache cold)"}
        rec.update({k: v for k, v in toy.items() if k not in rec})
    else:
        rec = {"metric": "bench_pending" if pending else "bench_failed",
               "value": -1, "unit": "s", "vs_baseline": 0.0}
    rec["platform"] = plat
    if "error" in state:
        rec["error"] = state["error"]
    rec.pop("milestone", None)
    return rec


def _spawn(args, budget_s: float):
    """Start a worker subprocess (never blocks the orchestrator).
    SDPB_BENCH_DEBUG=1 tees worker stderr to /tmp/bench_worker_<part>.log
    instead of devnull (post-mortem for silent worker stalls)."""
    stderr = subprocess.DEVNULL
    if os.environ.get("SDPB_BENCH_DEBUG"):
        part = args[args.index("--part") + 1] if "--part" in args else "x"
        stderr = open(f"/tmp/bench_worker_{part}.log", "wb")
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)] + args
        + ["--budget", str(int(budget_s))],
        stdout=subprocess.PIPE, stderr=stderr, cwd=REPO)


def _multiplex(workers, deadline: float, state: dict, deferred=None,
               optional=("wide",)):
    """Relay worker milestones into upgraded headline lines the moment they
    appear.  NON-BLOCKING: a worker stuck in a cold compile that never
    prints must not stall the orchestrator past its deadline (that is
    exactly how round 2's bench produced nothing under the driver's
    timeout — a blocking readline defeated every budget check).

    `deferred`: [(name, decide_fn, spawn_fn)] — decide_fn(state, now,
    exited, live) -> "wait" | "spawn" | "drop", polled each loop (`exited`
    = names of workers that have terminated, `live` = names currently
    running, so a decision can distinguish "no milestone yet" from "died
    without one" and avoid spawning against a still-running sibling).
    `optional`: worker names whose non-completion is a note, not an error.  Used for (a) the CPU-toy
    insurance worker, spawned only once 150 s pass with no fixture
    milestone (the machine has ONE core: round 4 measured the concurrent
    CPU-toy compile starving the fixture worker's executable-cache load —
    8+ min under contention vs 27 s solo), and (b) the optional wide
    432-bit contract milestone, spawned only after the fixture full solve
    lands (one chip: never two device workloads at once)."""
    import selectors

    sel = selectors.DefaultSelector()
    live = {}
    bufs = {}
    exited = set()

    def register(name, proc):
        os.set_blocking(proc.stdout.fileno(), False)
        sel.register(proc.stdout, selectors.EVENT_READ, (name, proc))
        live[name] = proc
        bufs[name] = b""

    for name, proc in workers:
        register(name, proc)
    deferred = list(deferred or [])

    def _drain(name, proc):
        """Read whatever is available on the worker's pipe (binary,
        non-blocking: a text-mode read() raises TypeError on empty) and
        fold complete JSON lines into the worker's namespaced state."""
        try:
            chunk = proc.stdout.read()
        except (OSError, ValueError, TypeError, BlockingIOError):
            chunk = None
        if not chunk:
            return
        bufs[name] += chunk
        while b"\n" in bufs[name]:
            line, bufs[name] = bufs[name].split(b"\n", 1)
            try:
                rec = json.loads(line.decode("utf-8", "replace"))
            except json.JSONDecodeError:
                continue
            state.setdefault(name, {}).update(rec)
            _emit(_headline(state))

    while (live or deferred) and time.time() < deadline:
        for entry in list(deferred):
            name, decide_fn, spawn_fn = entry
            verdict = decide_fn(state, time.time(), exited, set(live))
            if verdict == "drop":
                deferred.remove(entry)
            elif verdict == "spawn":
                deferred.remove(entry)
                register(name, spawn_fn())
        for key, _ in sel.select(timeout=1.0):
            name, proc = key.data
            _drain(name, proc)
        for name, proc in list(live.items()):
            if proc.poll() is not None:
                # final drain BEFORE unregistering: the worker's last
                # milestone (e.g. the full-solve tts headline, written
                # immediately before exit) can land between select() and
                # the poll check — round 3 lost the toy result this way
                _drain(name, proc)
                try:
                    sel.unregister(proc.stdout)
                except (KeyError, ValueError):
                    pass
                del live[name]
                exited.add(name)
    for name, proc in live.items():
        _drain(name, proc)
        if name in optional:
            # optional extra milestone: not finishing is not a failure
            state.setdefault(name, {})[f"{name}_note"] = (
                f"optional '{name}' milestone did not finish "
                "within the bench budget")
        else:
            state["error"] = state.get("error", "") + f"[{name}] timed out; "
        try:
            proc.kill()
        except OSError:
            pass


def main():
    if "--part" in sys.argv:
        import signal

        part = sys.argv[sys.argv.index("--part") + 1]
        platform = sys.argv[sys.argv.index("--platform") + 1]
        budget = float(sys.argv[sys.argv.index("--budget") + 1])
        # hard backstop: if the part wedges inside a device call the
        # orchestrator's kill handles it, but make the worker self-limit
        # too so an orphan can't squat on the chip (clamped positive — a
        # zero/negative alarm would silently DISABLE the backstop)
        signal.alarm(max(60, int(budget) + 90))
        if part == "wide":
            # the 432-bit program's composite (non-kernel) wide ops must
            # lower with the O(1)-graph scan renorms: the TPU-default
            # unrolled sweeps put ~140 MB of elementwise MLIR into the
            # program and the remote compile helper is SIGKILLed (round-5
            # measurement).  K=6 (144-bit) configs are unaffected.
            os.environ.setdefault("SDPB_TPU_SCAN_RENORM_MIN_K_SCALED", "9")
        got = _setup(platform)
        if part == "fixture":
            part_fixture(got, budget)
        elif part == "wide":
            part_wide(got, budget)
        elif part == "ladder":
            part_ladder(got, budget)
        else:
            part_toy_cpu(budget)
        return

    budget = float(os.environ.get("SDPB_BENCH_BUDGET_S", "520"))
    deadline = time.time() + budget
    state = {}
    platform = _probe()
    state["platform"] = platform
    # a complete (if empty-handed) headline FIRST: whatever happens later,
    # the driver's last-JSON-line parse never comes up empty
    _emit(_headline(state, pending=True))

    workers = []
    deferred = []
    if platform != "cpu" and os.path.exists(FIXTURE):
        workers.append(("fixture", _spawn(
            ["--part", "fixture", "--platform", platform],
            deadline - time.time() - 20)))

        # CPU toy insurance is DEFERRED: it only starts if the fixture
        # worker has produced no milestone after 150 s (cold server-side
        # compile or an unreachable chip).  Running it concurrently from
        # t=0 starves the fixture's executable-cache load on this
        # single-core host (measured: 27 s solo -> 8+ min contended).
        t_toy = time.time() + 150

        def _toy_decide(st, now, exited, live):
            if "fixture" in st:
                return "drop"
            if "fixture" in exited:    # died without a milestone: insure NOW
                return "spawn"
            return "spawn" if now >= t_toy else "wait"

        deferred.append(("toy", _toy_decide,
                         lambda: _spawn(["--part", "toy", "--platform",
                                         "cpu"],
                                        deadline - time.time() - 20)))

        # wide 432-bit contract milestone: only after the fixture full
        # solve has landed (one chip — never two device workloads at
        # once) and the CPU toy insurance (if spawned) has exited (one
        # core — its compile would starve the wide executable-cache
        # load), and only if the remaining budget plausibly covers it:
        # the warm-marker's measured estimate when present (written by
        # every successful wide run), a conservative default otherwise.
        marker = _read_wide_marker()

        def _wide_decide(st, now, exited, live):
            fx = st.get("fixture", {})
            if "tts_s" not in fx:
                # keep waiting while the fixture worker is alive; if it
                # died without a full solve, the budget belongs to it, not
                # an extra milestone
                return "drop" if "fixture" in exited else "wait"
            if "toy" in live:
                return "wait"
            est = float(marker.get("est_s", 300)) + 60
            return "spawn" if (deadline - now) > est else "drop"

        deferred.append(("wide", _wide_decide,
                         lambda: _spawn(["--part", "wide", "--platform",
                                         platform],
                                        deadline - time.time() - 20)))

        # BASELINE-ladder milestone (120-block / gap 1e-20): after the
        # wide worker is done with the chip (or was dropped), if the
        # fixture landed and the remaining budget covers the marker's
        # measured estimate (no marker: only with a generous budget).
        lad_marker = _read_marker("ladder_120_warm.json")

        def _ladder_decide(st, now, exited, live):
            fx = st.get("fixture", {})
            if "tts_s" not in fx:
                return "drop" if "fixture" in exited else "wait"
            if "toy" in live or "wide" in live:
                return "wait"
            est = float(lad_marker.get("est_s", 400)) + 60
            return "spawn" if (deadline - now) > est else "drop"

        if os.path.exists(LADDER):
            deferred.append(("ladder", _ladder_decide,
                             lambda: _spawn(["--part", "ladder",
                                             "--platform", platform],
                                            deadline - time.time() - 20)))
    else:
        workers.append(("toy", _spawn(
            ["--part", "toy", "--platform", "cpu"],
            deadline - time.time() - 20)))
    _multiplex(workers, deadline - 10, state, deferred=deferred,
               optional=("wide", "ladder"))
    _emit(_headline(state))


if __name__ == "__main__":
    main()
