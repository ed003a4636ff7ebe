"""The solver run loop: host-side driver around the jitted iteration.

Mirrors SDP_Solver::run (/root/reference/src/sdp_solve/SDP_Solver/run/run.cxx:61-184)
and the ordered termination logic of compute_feasible_and_termination.cxx:20-70.
All device work happens inside one compiled iteration; the host only reads
back small per-iteration stats, decides termination/checkpointing, and logs.
"""
from __future__ import annotations

import enum
import time
from dataclasses import dataclass
from typing import Callable, List, Optional

import jax
import mpmath
import numpy as np

from ..models.sdp import DeviceSDP
from ..utils.strings import (limbs_to_mpf, mp_host_to_mpf, str_to_limbs,
                             str_to_scaled_limbs)
from ..utils.timers import Timers
from .params import SolverParameters
from .state import SolverState, initial_state
from .step import (REASON_MAX_COMPLEMENTARITY, REASON_MAX_ITER, REASON_NONE,
                   REASON_RETRY, ChunkCarry, StepConfig,
                   make_chunked_iteration, make_iteration)


class TerminateReason(enum.Enum):
    PrimalDualOptimal = "found primal-dual optimal solution"
    PrimalFeasible = "found primal feasible solution"
    DualFeasible = "found dual feasible solution"
    PrimalFeasibleJumpDetected = "primal feasible jump detected"
    DualFeasibleJumpDetected = "dual feasible jump detected"
    MaxComplementarityExceeded = "maxComplementarity exceeded"
    MaxIterationsExceeded = "maxIterations exceeded"
    MaxRuntimeExceeded = "maxRuntime exceeded"
    PrimalStepTooSmall = "primal step too small"
    DualStepTooSmall = "dual step too small"

    def __str__(self):
        return self.value


@dataclass
class SolveResult:
    terminate_reason: TerminateReason
    state: SolverState
    primal_objective: mpmath.mpf
    dual_objective: mpmath.mpf
    duality_gap: mpmath.mpf
    primal_error_P: float
    primal_error_p: float
    dual_error: float
    iterations: int
    runtime: float
    # wall seconds of each iteration(sdp, state) call incl. the host sync
    # (the bench derives steady-state iterations/s from the tail of this
    # without needing a second compile-free run)
    iteration_seconds: list = None

    @property
    def primal_error(self) -> float:
        return max(self.primal_error_P, self.primal_error_p)


def _np_dtype(dtype):
    import jax.numpy as jnp

    return np.float32 if dtype == jnp.float32 else np.float64


def initial_factor_limbs(params: SolverParameters, K: int, scaled: bool,
                         npdt) -> tuple:
    """(factor_limbs, factor_cap) of the mixed-precision solve scheme.

    The factor must out-range the IPM's worst conditioning — roughly
    max(Omega^2, 1/gap^2) along the trajectory — so the auto choice covers
    the DECLARED part (Omega and the requested gap, with margin) and the
    run loops self-heal the trajectory-dependent part: a non-finite stat
    or an exploding corrector beta bumps factor_limbs by one (up to the
    cap), recompiles, and replays from a pre-corruption state.  (Scaled
    f32 arithmetic saturates instead of producing NaN, so the beta trigger
    is load-bearing there.)

    params.factor_limbs > 0 pins the choice (clamped).

    The auto model is EMPIRICAL, fit on nmax6/144-bit runs (round 4):
    bits >= max(4*log2(Omega), 2*(log2(Omega) + log2(1/gap))) + 30.
    The first term is the early-phase wall (X ~ Omega^2 makes cond(S)
    scale like Omega^4 before feasibility): 96 bits at Omega=1e6
    (4*20+30 = 110 needed) produced a silently degraded trajectory from
    ~iteration 30 — all stats finite, feasible-capped beta, NO trigger
    fires — while 120 bits was clean.  The second is the endgame wall:
    120 bits exhausted at gap ~5e-9 (125 needed), 144 bits reached
    6e-14.  Under-sizing the early term is UNRECOVERABLE (the damage has
    no local signal); under-sizing the endgame self-heals (gradual p-err
    growth trips the retry)."""
    p_bits = 24 if npdt == np.float32 else 53
    # wide (>216-bit) runs cap the factor at 9 base limbs: factorization
    # loops stay on the base scaled representation (Pallas-eligible); the
    # refinement matmuls recover the wide precision (ops.mpwide docstring)
    factor_cap = 9 if (scaled and K > 9) else K
    if params.factor_limbs > 0:
        return min(factor_cap, max(2, params.factor_limbs)), factor_cap
    with mpmath.workprec(64):
        log2_omega = float(mpmath.log(max(
            abs(mpmath.mpf(params.initial_matrix_scale_primal)),
            abs(mpmath.mpf(params.initial_matrix_scale_dual)), 2), 2))
        gap_thr = mpmath.mpf(params.duality_gap_threshold)
        log2_gap_inv = float(-mpmath.log(gap_thr, 2)) if gap_thr > 0 else 0.0
    bits = max(4 * log2_omega, 2 * (log2_omega + log2_gap_inv)) + 30
    cond_limbs = -(-int(bits) // p_bits)
    return min(factor_cap, max(2, (K + 2) // 2, cond_limbs)), factor_cap


def run_solver(
    sdp: DeviceSDP,
    params: SolverParameters,
    verbosity: int = 1,
    axis: Optional[str] = None,
    initial: Optional[SolverState] = None,
    checkpoint_fn: Optional[Callable] = None,
    timers: Optional[Timers] = None,
    print_fn: Callable = print,
    mesh=None,
    mesh_mode: str = "shard_map",
    big_bytes: int = 1 << 30,
    use_compile_cache: bool = False,
    chunk_iterations: int = 0,
) -> SolveResult:
    K = sdp.b.K
    dtype = sdp.b.dtype
    scaled = sdp.b.scaled
    npdt = _np_dtype(dtype)
    timers = timers if timers is not None else Timers()

    def parse(s: str):
        """Decimal string -> host MP parts in the problem's representation."""
        return str_to_scaled_limbs(s, K) if scaled else str_to_limbs(s, K, npdt)

    omega_p = parse(params.initial_matrix_scale_primal)
    omega_d = parse(params.initial_matrix_scale_dual)
    state = initial if initial is not None else initial_state(sdp, omega_p, omega_d)

    if mesh is not None and axis is None:
        axis = mesh.axis_names[0]
    if mesh is not None and mesh_mode == "shard_map":
        # explicit placement: required for multi-process meshes (host-local
        # arrays cannot enter a globally-sharded jit), free otherwise
        from ..parallel.mesh import shard_state

        state = shard_state(state, mesh)
    elif mesh is not None and mesh_mode == "gspmd":
        # same requirement for the GSPMD path: host-local state arrays
        # cannot enter a jit whose in_shardings span a multi-process mesh,
        # so stage them per the gspmd state specs (single-process too:
        # avoids a layout transfer on the first call)
        from ..parallel.mesh import _device_put_tree, gspmd_pspecs

        _, state_specs = gspmd_pspecs(sdp, axis, big_bytes, mesh.size)
        state = _device_put_tree(state, state_specs, mesh)
    # mixed-precision scheme: factor at reduced limbs (refinement passes
    # recover the full K).  The factor must out-range the IPM's worst
    # conditioning — roughly max(Omega^2, 1/gap^2) along the trajectory —
    # so the initial choice covers the KNOWN part (Omega^2, with margin)
    # and the run loop SELF-HEALS the trajectory-dependent part: a
    # non-finite stat or an exploding corrector beta bumps factor_limbs by
    # one (up to K), recompiles, and retries from the last good state.
    # (Scaled f32 arithmetic saturates instead of producing NaN, so the
    # beta trigger is load-bearing there.)
    factor_limbs, factor_cap = initial_factor_limbs(params, K, scaled, npdt)

    def make_cfg(kf: int) -> StepConfig:
        # KKT solve-residual guard: below the factor cap a trip self-heals
        # (REASON_RETRY); at the cap it is measured but only warned about
        # (see StepConfig.kkt_heal)
        return StepConfig(
            kkt_residual_threshold=float(
                mpmath.mpf(params.kkt_residual_threshold)),
            kkt_heal=kf < factor_cap,
            total_psd_rows=sdp.total_psd_rows,
            axis=axis if (mesh is not None and mesh_mode == "shard_map") else None,
            factor_limbs=kf,
            n_refine=0 if K <= kf else -(-K // kf),
            gamma=float(mpmath.mpf(params.step_length_reduction)),
            feasible_beta_limbs=parse(params.feasible_centering_parameter),
            infeasible_beta_limbs=parse(params.infeasible_centering_parameter),
            primal_error_threshold=float(mpmath.mpf(params.primal_error_threshold)),
            dual_error_threshold=float(mpmath.mpf(params.dual_error_threshold)),
            max_complementarity=float(mpmath.mpf(params.max_complementarity)),
            # device-side termination inputs (make_chunked_iteration)
            duality_gap_threshold_limbs=parse(params.duality_gap_threshold),
            find_primal_feasible=params.find_primal_feasible,
            find_dual_feasible=params.find_dual_feasible,
            detect_primal_feasible_jump=params.detect_primal_feasible_jump,
            detect_dual_feasible_jump=params.detect_dual_feasible_jump,
            min_primal_step=float(mpmath.mpf(params.min_primal_step)),
            min_dual_step=float(mpmath.mpf(params.min_dual_step)),
        )

    def build_iteration(cfg: StepConfig):
        if mesh is not None and mesh_mode == "gspmd":
            from ..parallel.mesh import make_gspmd_iteration

            fn, _ = make_gspmd_iteration(sdp, cfg, mesh, axis,
                                         big_bytes=big_bytes)
            return fn
        if mesh is not None:
            from ..parallel.mesh import make_sharded_iteration

            return make_sharded_iteration(sdp, state, cfg, mesh, axis)
        fn = jax.jit(make_iteration(cfg))
        if use_compile_cache:
            # on-disk executable cache: remote (axon) TPU compiles are not
            # covered by the jax persistent cache, so fresh processes would
            # re-pay the full server-side compile every run
            from ..ops.compile_cache import cached_compile, config_key

            return cached_compile(fn, sdp, state, verbose=verbosity >= 2,
                                  key_extra=config_key(cfg))
        return fn

    if mesh is None and chunk_iterations != 1:
        # device-resident chunked driver: up to `chunk` iterations per
        # dispatch with on-device termination — one host sync per chunk
        # instead of per iteration (see step.make_chunked_iteration)
        # default chunk 8: host-sync amortization is already negligible
        # there (~0.8 ms/iteration) while the compiled program — and with
        # it cold-compile time and the executable-cache load the bench
        # pays — is half of chunk 16's
        return _solve_chunked(
            sdp, params, state, make_cfg, factor_limbs, factor_cap,
            chunk_iterations if chunk_iterations > 0 else 8,
            verbosity, checkpoint_fn, timers, print_fn, use_compile_cache)

    cfg = make_cfg(factor_limbs)
    with timers.scope("run.initialize"):
        iteration = build_iteration(cfg)

    gap_threshold = mpmath.mpf(params.duality_gap_threshold)
    primal_thr = mpmath.mpf(params.primal_error_threshold)
    dual_thr = mpmath.mpf(params.dual_error_threshold)
    min_p_step = mpmath.mpf(params.min_primal_step)
    min_d_step = mpmath.mpf(params.min_dual_step)

    start = time.time()
    last_checkpoint = start
    prev_p_step, prev_d_step = 0.0, 0.0
    reason = TerminateReason.MaxIterationsExceeded
    stats_host = None
    # defaults so a first-iteration failure (non-finite at full factor
    # precision) still yields a well-formed SolveResult instead of NameError
    _nan = mpmath.mpf("nan")
    p_obj = d_obj = gap = _nan
    perr_P = perr_p = derr = float("nan")
    iteration_seconds = []

    if verbosity >= 1:
        print_fn("\n          time    mu     P-obj       D-obj      gap     "
                 "    P-err       p-err       D-err      P-step   D-step  beta")

    it = 1
    kkt_warned = False
    # lagged retry snapshot: a poisoned direction corrupts the state one
    # iteration before any stat shows it, so self-heal retries must rewind
    # PAST the tripping iteration's input (see _solve_chunked's
    # chunk-restart; here a rolling 8-iteration snapshot plays that role)
    snap = (state, it, prev_p_step, prev_d_step)
    while True:
        if checkpoint_fn is not None and (time.time() - last_checkpoint) >= params.checkpoint_interval:
            checkpoint_fn(state, it)
            last_checkpoint = time.time()

        with timers.scope("run.iteration"):
            t_it = time.time()
            stats, new_state = iteration(sdp, state)
            # device_get overlaps all leaf transfers (copy_to_host_async
            # first, then gather) — one tunnel round trip instead of ~20
            # sequential ones on remote (axon) devices
            stats_host = jax.device_get(stats)
            t_it = time.time() - t_it
            iteration_seconds.append(t_it)
        if verbosity >= 2:
            # debug observability (the reference's -v2 timer tree +
            # /proc/self/statm dumps, src/Timers.hxx:73-172)
            rss_mb = 0.0
            try:
                with open("/proc/self/statm") as f:
                    rss_mb = int(f.read().split()[1]) * 4096 / 1e6
            except OSError:
                pass
            print_fn(f"  -- iteration {it}: {t_it:.3f} s device+sync; "
                     f"host RSS {rss_mb:.0f} MB")

        # self-healing: NaN anywhere in the stats means the low-precision
        # factors ran out of range for the current conditioning.  The input
        # state is still finite (its own stats were checked last round), so
        # bump the factor precision and retry the same state.
        def _finite(v):
            if hasattr(v, "words"):
                return all(np.all(np.isfinite(w.limbs)) for w in v.words)
            arr = v.limbs if hasattr(v, "limbs") else v
            return np.all(np.isfinite(arr))

        finite = all(
            _finite(getattr(stats_host, name))
            for name in ("primal_objective", "dual_objective", "duality_gap",
                         "mu", "primal_error_P", "primal_error_p",
                         "dual_error", "primal_step", "dual_step"))
        # corrector beta ~ Tr((X+dX)(Y+dY))/(mu K) explodes when the factors
        # are out of range but the arithmetic saturates instead of NaN-ing
        # (scaled f32): treat it as the same conditioning failure.  Loose
        # bound on purpose — post-heal recovery passes through betas of
        # 3e2-5e3 legitimately (see step._stats_finite).
        if finite and float(stats_host.beta_corrector) > 1e4:
            finite = False
        # tripped KKT solve-residual guard: the silent factor under-range
        # mode (all stats finite) — same cure as a non-finite stat while
        # a factor bump is possible; at the cap, warn loudly instead of
        # wandering silently (the round-4 96-bit episode)
        if finite and cfg.kkt_residual_threshold > 0 and \
                float(stats_host.kkt_residual) > cfg.kkt_residual_threshold:
            if cfg.kkt_heal:
                finite = False
            elif not kkt_warned:
                kkt_warned = True
                if verbosity >= 1:
                    print_fn(
                        f"WARNING: KKT solve residual "
                        f"{float(stats_host.kkt_residual):.2e} exceeds "
                        f"{cfg.kkt_residual_threshold:.0e} at full factor "
                        f"precision — results may be degraded; increase "
                        f"--precision")
        if not finite:
            if factor_limbs >= factor_cap:
                reason = TerminateReason.MaxComplementarityExceeded
                if verbosity >= 1:
                    print_fn("non-finite iteration at full factor precision; "
                             "increase --precision")
                break
            factor_limbs += 1
            state, it, prev_p_step, prev_d_step = snap
            if verbosity >= 1:
                print_fn(f"conditioning exceeded factor range; increasing "
                         f"factor precision to {factor_limbs} limbs "
                         f"(replaying from iteration {it})")
            cfg = make_cfg(factor_limbs)
            with timers.scope("run.initialize"):
                iteration = build_iteration(cfg)
            continue

        p_obj = mp_host_to_mpf(stats_host.primal_objective)
        d_obj = mp_host_to_mpf(stats_host.dual_objective)
        gap = mp_host_to_mpf(stats_host.duality_gap)
        perr_P = float(stats_host.primal_error_P)
        perr_p = float(stats_host.primal_error_p)
        derr = float(stats_host.dual_error)
        primal_error = max(perr_P, perr_p)

        # ordered termination checks (compute_feasible_and_termination.cxx:20-65)
        is_dual_feasible = derr < dual_thr
        is_primal_feasible = primal_error < primal_thr
        is_optimal = gap < gap_threshold
        terminate = True
        if is_primal_feasible and is_dual_feasible and is_optimal:
            reason = TerminateReason.PrimalDualOptimal
        elif is_dual_feasible and params.find_dual_feasible:
            reason = TerminateReason.DualFeasible
        elif is_primal_feasible and params.find_primal_feasible:
            reason = TerminateReason.PrimalFeasible
        elif prev_d_step == 1.0 and params.detect_dual_feasible_jump:
            reason = TerminateReason.DualFeasibleJumpDetected
        elif prev_p_step == 1.0 and params.detect_primal_feasible_jump:
            reason = TerminateReason.PrimalFeasibleJumpDetected
        elif it > params.max_iterations:
            reason = TerminateReason.MaxIterationsExceeded
        elif (time.time() - start) >= params.max_runtime:
            reason = TerminateReason.MaxRuntimeExceeded
        elif it > 1 and prev_p_step < min_p_step:
            reason = TerminateReason.PrimalStepTooSmall
        elif it > 1 and prev_d_step < min_d_step:
            reason = TerminateReason.DualStepTooSmall
        else:
            terminate = False

        if terminate:
            break

        if bool(stats_host.max_complementarity_exceeded):
            reason = TerminateReason.MaxComplementarityExceeded
            break

        p_step = float(stats_host.primal_step)
        d_step = float(stats_host.dual_step)
        if verbosity >= 1:
            mu = mp_host_to_mpf(stats_host.mu)
            print_fn(
                f"{it:<4d} {int(time.time()-start):>8d} "
                f"{mpmath.nstr(mu, 2, min_fixed=1, max_fixed=0):<8s} "
                f"{float(p_obj):+.3e} {float(d_obj):+.3e} {float(gap):.3e} "
                f"{perr_P:+.3e} {perr_p:+.3e} {derr:+.3e} "
                f"{min(p_step, 1.0):.3g}    {min(d_step, 1.0):.3g}    "
                f"{float(stats_host.beta_corrector):.3g}"
            )

        state = new_state
        prev_p_step, prev_d_step = p_step, d_step
        it += 1
        if it % 8 == 0:
            snap = (state, it, prev_p_step, prev_d_step)

    return SolveResult(
        terminate_reason=reason,
        state=state,
        primal_objective=p_obj,
        dual_objective=d_obj,
        duality_gap=gap,
        primal_error_P=perr_P,
        primal_error_p=perr_p,
        dual_error=derr,
        iterations=it,
        runtime=time.time() - start,
        iteration_seconds=iteration_seconds,
    )


# ---------------------------------------------------------------------------
# Device-resident chunked run loop (single-process path)

_REASON_MAP = {
    1: TerminateReason.PrimalDualOptimal,
    2: TerminateReason.DualFeasible,
    3: TerminateReason.PrimalFeasible,
    4: TerminateReason.DualFeasibleJumpDetected,
    5: TerminateReason.PrimalFeasibleJumpDetected,
    6: TerminateReason.MaxIterationsExceeded,
    8: TerminateReason.PrimalStepTooSmall,
    9: TerminateReason.DualStepTooSmall,
    10: TerminateReason.MaxComplementarityExceeded,
}


def _stats_row(stats_seq_host, i: int):
    """Row i of scan-stacked host stats (every leaf gained a leading chunk
    axis)."""
    return jax.tree.map(lambda a: a[i], stats_seq_host)


def _print_iteration_line(print_fn, it: int, elapsed: float, st) -> None:
    """One iteration line in the reference table format
    (run/print_iteration.cxx:16-56)."""
    mu = mp_host_to_mpf(st.mu)
    p_obj = mp_host_to_mpf(st.primal_objective)
    d_obj = mp_host_to_mpf(st.dual_objective)
    gap = mp_host_to_mpf(st.duality_gap)
    print_fn(
        f"{it:<4d} {int(elapsed):>8d} "
        f"{mpmath.nstr(mu, 2, min_fixed=1, max_fixed=0):<8s} "
        f"{float(p_obj):+.3e} {float(d_obj):+.3e} {float(gap):.3e} "
        f"{float(st.primal_error_P):+.3e} {float(st.primal_error_p):+.3e} "
        f"{float(st.dual_error):+.3e} "
        f"{min(float(st.primal_step), 1.0):.3g}    "
        f"{min(float(st.dual_step), 1.0):.3g}    "
        f"{float(st.beta_corrector):.3g}"
    )


def _solve_chunked(sdp, params, state, make_cfg, factor_limbs, factor_cap,
                   chunk, verbosity, checkpoint_fn, timers, print_fn,
                   use_compile_cache) -> SolveResult:
    """Chunked driver: up to `chunk` device iterations per dispatch, one
    host sync per chunk.  Termination (all 10 ordered reasons of
    compute_feasible_and_termination.cxx) is decided on device; the host
    handles what needs a clock or a recompile — maxRuntime (checked at
    chunk boundaries), checkpoint cadence, and the self-healing
    factor-precision bump on non-finite iterations."""
    import jax.numpy as jnp

    def build(cfg: StepConfig):
        fn = jax.jit(make_chunked_iteration(cfg, chunk))
        if use_compile_cache:
            from ..ops.compile_cache import cached_compile, config_key

            return cached_compile(
                fn, sdp, state, carry0, jnp.int32(0),
                verbose=verbosity >= 2,
                key_extra=config_key(cfg) + f";chunk={chunk}")
        return fn

    carry0 = ChunkCarry(
        it=jnp.int32(1),
        prev_p_step=jnp.zeros((), _np_dtype(sdp.b.dtype)),
        prev_d_step=jnp.zeros((), _np_dtype(sdp.b.dtype)),
        done=jnp.zeros((), jnp.bool_),
        reason=jnp.int32(REASON_NONE),
    )

    cfg = make_cfg(factor_limbs)
    with timers.scope("run.initialize"):
        chunk_fn = build(cfg)

    start = time.time()
    last_checkpoint = start
    iteration_seconds = []
    reason = TerminateReason.MaxIterationsExceeded
    _nan = mpmath.mpf("nan")
    p_obj = d_obj = gap = _nan
    perr_P = perr_p = derr = float("nan")
    final_row = None
    kkt_warned = False
    it_global = 1
    carry = carry0
    max_it = jnp.int32(params.max_iterations)

    if verbosity >= 1:
        print_fn("\n          time    mu     P-obj       D-obj      gap     "
                 "    P-err       p-err       D-err      P-step   D-step  beta")

    while True:
        if checkpoint_fn is not None and (
                time.time() - last_checkpoint) >= params.checkpoint_interval:
            checkpoint_fn(state, it_global)
            last_checkpoint = time.time()

        with timers.scope("run.chunk"):
            t0 = time.time()
            state2, carry2, stats_seq, executed = chunk_fn(
                sdp, state, carry, max_it)
            # fetch ONLY the tiny carry each chunk; the stacked stats are
            # pulled lazily (printing or stopping) — on remote devices the
            # sync cost tracks the number of fetched leaves, and at
            # verbosity 0 a cruising chunk needs none of them
            carry_h = jax.device_get(carry2)
            dt = time.time() - t0

        reason_code = int(carry_h.reason)
        stopped = reason_code != REASON_NONE
        n_advanced = int(carry_h.it) - it_global
        n_exec = n_advanced + (1 if stopped else 0)

        if stopped and reason_code == REASON_RETRY:
            if factor_limbs >= factor_cap:
                reason = TerminateReason.MaxComplementarityExceeded
                if verbosity >= 1:
                    print_fn("non-finite iteration at full factor "
                             "precision; increase --precision")
                state = state2
                it_global = int(carry_h.it)
                stats_h = jax.device_get(stats_seq)
                final_row = _stats_row(stats_h, max(n_exec - 1, 0))
                break
            factor_limbs += 1
            if verbosity >= 1:
                print_fn(f"conditioning exceeded factor range; increasing "
                         f"factor precision to {factor_limbs} limbs "
                         f"(replaying from iteration {it_global})")
            cfg = make_cfg(factor_limbs)
            with timers.scope("run.initialize"):
                chunk_fn = build(cfg)
            # Retry from the CHUNK-START state, not the tripping
            # iteration's input: a poisoned search direction corrupts the
            # state one iteration BEFORE its stats can show it (iteration
            # t's stats describe t's INPUT state, run.cxx:134-160), so the
            # stopping iteration's input may already be lost.  The chunk
            # input predates everything this chunk did, at most `chunk`
            # iterations of (cheap, deterministic) replay.  `state` and
            # `carry` still hold the chunk inputs — just don't advance.
            continue

        iteration_seconds.extend([dt / max(n_exec, 1)] * n_exec)
        if verbosity >= 2:
            print_fn(f"  -- chunk: {n_exec} iterations in {dt:.3f} s "
                     f"device+sync ({dt / max(n_exec, 1):.4f} s/it)")

        stats_h = None
        if verbosity >= 1 or stopped:
            stats_h = jax.device_get(stats_seq)
        elapsed = time.time() - start
        if stats_h is not None:
            for i in range(n_advanced):
                row = _stats_row(stats_h, i)
                if verbosity >= 1:
                    _print_iteration_line(print_fn, it_global + i, elapsed,
                                          row)
                final_row = row
            if (cfg.kkt_residual_threshold > 0 and not cfg.kkt_heal
                    and not kkt_warned and n_exec > 0 and verbosity >= 1):
                worst = float(np.max(
                    np.asarray(stats_h.kkt_residual)[:n_exec]))
                if worst > cfg.kkt_residual_threshold:
                    kkt_warned = True
                    print_fn(
                        f"WARNING: KKT solve residual {worst:.2e} exceeds "
                        f"{cfg.kkt_residual_threshold:.0e} at full factor "
                        f"precision — results may be degraded; increase "
                        f"--precision")
        it_global = int(carry_h.it)

        if stopped:
            # normal termination: the stopping row's stats describe the
            # kept (input) state — same as the legacy loop's break-before-
            # update semantics
            final_row = _stats_row(stats_h, n_exec - 1)
            reason = _REASON_MAP[reason_code]
            state = state2
            break

        state = state2
        carry = carry2
        if (time.time() - start) >= params.max_runtime:
            reason = TerminateReason.MaxRuntimeExceeded
            if stats_h is None and n_exec > 0:     # verbosity-0 cruise:
                stats_h = jax.device_get(stats_seq)  # fetch for the result
                final_row = _stats_row(stats_h, n_exec - 1)
            break

    if final_row is not None:
        p_obj = mp_host_to_mpf(final_row.primal_objective)
        d_obj = mp_host_to_mpf(final_row.dual_objective)
        gap = mp_host_to_mpf(final_row.duality_gap)
        perr_P = float(final_row.primal_error_P)
        perr_p = float(final_row.primal_error_p)
        derr = float(final_row.dual_error)

    return SolveResult(
        terminate_reason=reason,
        state=state,
        primal_objective=p_obj,
        dual_objective=d_obj,
        duality_gap=gap,
        primal_error_P=perr_P,
        primal_error_p=perr_p,
        dual_error=derr,
        iterations=it_global,
        runtime=time.time() - start,
        iteration_seconds=iteration_seconds,
    )
