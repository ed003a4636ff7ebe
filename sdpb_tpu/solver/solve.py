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
from .step import StepConfig, make_iteration


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

    @property
    def primal_error(self) -> float:
        return max(self.primal_error_P, self.primal_error_p)


def _np_dtype(dtype):
    import jax.numpy as jnp

    return np.float32 if dtype == jnp.float32 else np.float64


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
    p_bits = 24 if npdt == np.float32 else 53
    with mpmath.workprec(64):
        log2_omega = float(mpmath.log(max(
            abs(mpmath.mpf(params.initial_matrix_scale_primal)),
            abs(mpmath.mpf(params.initial_matrix_scale_dual)), 2), 2))
    cond_limbs = -(-int(2 * log2_omega + 30) // p_bits)
    # wide (>216-bit) runs cap the factor at 9 base limbs: factorization
    # loops stay on the base scaled representation (Pallas-eligible); the
    # refinement matmuls recover the wide precision (ops.mpwide docstring)
    factor_cap = 9 if (scaled and K > 9) else K
    factor_limbs = min(factor_cap, max(2, (K + 2) // 2, cond_limbs))

    def make_cfg(kf: int) -> StepConfig:
        return StepConfig(
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
            from ..ops.compile_cache import cached_compile

            return cached_compile(fn, sdp, state, verbose=verbosity >= 2)
        return fn

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

    if verbosity >= 1:
        print_fn("\n          time    mu     P-obj       D-obj      gap     "
                 "    P-err       p-err       D-err      P-step   D-step  beta")

    it = 1
    while True:
        if checkpoint_fn is not None and (time.time() - last_checkpoint) >= params.checkpoint_interval:
            checkpoint_fn(state, it)
            last_checkpoint = time.time()

        with timers.scope("run.iteration"):
            t_it = time.time()
            stats, new_state = iteration(sdp, state)
            stats_host = jax.tree.map(np.asarray, stats)
            t_it = time.time() - t_it
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
        # (scaled f32): treat it as the same conditioning failure
        if finite and float(stats_host.beta_corrector) > 1e4:
            finite = False
        if not finite:
            if factor_limbs >= factor_cap:
                reason = TerminateReason.MaxComplementarityExceeded
                if verbosity >= 1:
                    print_fn("non-finite iteration at full factor precision; "
                             "increase --precision")
                break
            factor_limbs += 1
            if verbosity >= 1:
                print_fn(f"conditioning exceeded factor range; increasing "
                         f"factor precision to {factor_limbs} limbs")
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
    )
