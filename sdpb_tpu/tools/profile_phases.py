"""Per-phase device-time breakdown + VPU speed-of-light estimate.

The reference's load-bearing profiler measures per-block
`Q.syrk_i + Q.solve_i + Q.cholesky_i` totals
(/root/reference/src/sdpb/write_timing.cxx:17-31) and `--verbosity=2`
dumps hierarchical timer trees (/root/reference/src/Timers.hxx:21-57).
This tool is the TPU analog at one level finer: it re-jits each phase of
the IPM iteration separately on a real fixture, times them warm, and
reports achieved f32 VPU throughput against a MEASURED on-chip peak.

Why VPU and not MXU: the MP (multi-limb) kernels are compensated
elementwise arithmetic — error-free transforms whose correctness forbids
the MXU's non-correctly-rounded fused accumulation (ops/pallas_kernels.py
module docstring) — so the speed of light for this workload is the vector
unit, measured here by a Pallas FMA-chain calibration kernel rather than
assumed from spec sheets.

FLOP model (from ops/mplist.py): an MP mul at K limbs costs
~K(K+1)/2 TwoProds + a distillation renorm over ~K^2 terms; an MP add
costs exponent alignment + renorm over 2K terms.  Counts below encode
those formulas so each phase's elementwise-op count converts to f32 VPU
flops.

Usage:
    python -m sdpb_tpu.tools.profile_phases \
        --fixture /root/reference/test/data/end-to-end_tests/SingletScalar_cT_test_nmax6/primal_dual_optimal/sdp.orig.zip \
        --scaledLimbs 5 --reps 5 --json /tmp/phases.json
"""
import argparse
import json
import time

import numpy as np


# ---------------------------------------------------------------------------
# Analytic VPU-flop model of ops/mplist arithmetic


def renorm_flops(m: int, K: int) -> int:
    """renorm_list over m terms into K limbs: two_sum passes (6 flops each)
    + 2K quick_two_sums (3 flops each)."""
    two_sums = max(0, K * m - K - K * (K - 1) // 2)
    return 6 * two_sums + 6 * K


def mul_flops(K: int, scaled: bool = True) -> int:
    """One MP elementwise multiply."""
    prescale = 2 * K if scaled else 0
    splits = 8 * K
    prods = (K * (K + 1) // 2) * (9 + (4 if scaled else 0))
    tail = 2 * K
    n_terms = K * (K + 1) // 2 + K * (K - 1) // 2 + 1
    norm = (5 * K + 10) if scaled else 0
    return prescale + splits + prods + tail + renorm_flops(n_terms, K) + norm


def add_flops(K: int, scaled: bool = True) -> int:
    """One MP elementwise add."""
    align = (8 * K + 2) if scaled else 0
    norm = (5 * K + 10) if scaled else 0
    return align + renorm_flops(2 * K, K) + norm


def matmul_ops(B, M, Kd, N) -> float:
    """MP element-op count of [B,M,Kd] @ [B,Kd,N]: one mul + one add per
    contraction element."""
    return float(B) * M * N * Kd


def cholesky_ops(B, n) -> float:
    """Blocked right-looking factorization ~ n^3/3 mul+add pairs, plus the
    masked whole-matrix sweep overhead of the fori_loop formulation (the
    rank-1 update touches all n^2 elements on each of n steps -> n^3)."""
    return float(B) * n ** 3


def trsm_ops(B, n, m) -> float:
    """Triangular solve with n rhs-rows x m cols: the row-sweep touches
    n * (n x m) elements."""
    return float(B) * n * n * m


# ---------------------------------------------------------------------------
# VPU peak calibration


def vpu_peak_gflops(reps: int = 5, steps: int = 2048,
                    tile=(512, 512)) -> float:
    """Measured f32 VPU throughput: a Pallas kernel running an FMA chain
    on a VMEM-resident tile (2 flops per element per step; an fma-fusing
    VPU can show ~2x, making utilization numbers conservative)."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl

    def kernel(x_ref, o_ref):
        a = jnp.float32(1.0000001)
        b = jnp.float32(1e-7)

        def body(_, x):
            return x * a + b

        o_ref[...] = jax.lax.fori_loop(0, steps, body, x_ref[...])

    x = jnp.ones(tile, jnp.float32)
    fn = jax.jit(lambda v: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(tile, jnp.float32))(v))
    jax.device_get(fn(x))                # forced fence (see _force)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(x)
    jax.device_get(r)
    dt = (time.perf_counter() - t0) / reps
    flops = 2.0 * steps * tile[0] * tile[1]
    return flops / dt / 1e9


# ---------------------------------------------------------------------------
# Phase harness


def _force(out):
    """Force completion of `out` (and, by serial device order, everything
    enqueued before it).  jax.block_until_ready through the remote (axon)
    runtime returns before server-side execution finishes — a device_get of
    one leaf is the only reliable fence."""
    import jax

    jax.device_get(jax.tree.leaves(out)[0])


def _time_fn(fn, args, reps: int):
    out = fn(*args)                      # warm (compile via cache)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / reps, out


def profile_fixture(fixture: str, scaled_limbs: int, quant: int,
                    omega: str, reps: int, use_cache: bool = True):
    import jax
    import jax.numpy as jnp

    from ..io.sdp_zip import read_sdp
    from ..models.sdp import build_device_sdp
    from ..ops import linalg
    from ..ops import mpfloat as mp
    from ..ops.compile_cache import cached_compile
    from ..solver.state import initial_state
    from ..solver.params import SolverParameters
    from ..solver.step import (StepConfig, _compute_pairings, _psd_pair,
                               _psum_mp, _schur_complement,
                               _step_length_lambda, make_iteration)
    from ..utils.strings import str_to_limbs, str_to_scaled_limbs

    if scaled_limbs:
        K = scaled_limbs
        K64 = -(-(24 * scaled_limbs) // 53) + 1
        host = read_sdp(fixture, K64, np.float64)
        sdp = build_device_sdp(host, quant=quant, scaled_limbs=scaled_limbs)
        om = str_to_scaled_limbs(omega, scaled_limbs)
        beta_f = str_to_scaled_limbs("0.1", K)
        beta_i = str_to_scaled_limbs("0.3", K)
    else:
        K = 4
        host = read_sdp(fixture, K, np.float64)
        sdp = build_device_sdp(host, quant=quant)
        om = str_to_limbs(omega, K, np.float64)
        beta_f = str_to_limbs("0.1", K, np.float64)
        beta_i = str_to_limbs("0.3", K, np.float64)
    state = initial_state(sdp, om, om)
    Kf = min(K, max(2, (K + 2) // 2,
                    -(-int(2 * 2 * np.log2(float(10) ** 20) + 30)
                      // (24 if scaled_limbs else 53))))
    # match run_solver's factor choice for THIS omega
    log2_om = np.log2(abs(float(omega)))
    p_bits = 24 if scaled_limbs else 53
    Kf = min(K, max(2, (K + 2) // 2, -(-int(2 * log2_om + 30) // p_bits)))
    n_refine = 0 if K <= Kf else -(-K // Kf)

    cfg = StepConfig(
        total_psd_rows=sdp.total_psd_rows, axis=None, factor_limbs=Kf,
        n_refine=n_refine, gamma=0.7, feasible_beta_limbs=beta_f,
        infeasible_beta_limbs=beta_i, primal_error_threshold=1e-10,
        dual_error_threshold=1e-10, max_complementarity=1e30)

    from ..ops.compile_cache import config_key

    kx = f"Kf={Kf};n_refine={n_refine};scaled={scaled_limbs};" + config_key(cfg)

    def jc(f, *args):
        fn = jax.jit(f)
        return cached_compile(fn, *args, key_extra=kx) if use_cache else fn

    N = sdp.dual_dim
    phases = []       # (name, seconds, vpu_flops)

    # ---- phase: Cholesky of X and Y at factor precision
    def ph_chol(sdp_, state_):
        parts = []
        for bk, bs in zip(sdp_.buckets, state_.buckets):
            for M in (_psd_pair(bs, "X_even", "X_odd", bk.shape)
                      + _psd_pair(bs, "Y_even", "Y_odd", bk.shape)):
                s = linalg.PosdefSolver(M, Kf)
                parts.append((s.A, s.L, s.dinv))
        return parts

    f = jc(ph_chol, sdp, state)
    t, xy_parts = _time_fn(f, (sdp, state), reps)
    ops = 0.0
    for bk, bs in zip(sdp.buckets, state.buckets):
        for M in (_psd_pair(bs, "X_even", "X_odd", bk.shape)
                  + _psd_pair(bs, "Y_even", "Y_odd", bk.shape)):
            ops += cholesky_ops(M.shape[0], M.shape[-1])
    phases.append(("cholesky_XY", t,
                   ops * (mul_flops(Kf, bool(scaled_limbs))
                          + add_flops(Kf, bool(scaled_limbs)))))

    def rebuild(parts, i):
        A, L, dinv = parts[i]
        return linalg.PosdefSolver.from_parts(A, L, dinv, Kf)

    # ---- phase: bilinear pairings
    def ph_pair(sdp_, state_, parts):
        i = 0
        TXs_all, TYs_all = [], []
        for bk, bs in zip(sdp_.buckets, state_.buckets):
            n_par = len(_psd_pair(bs, "X_even", "X_odd", bk.shape))
            xs = [rebuild(parts, i + j) for j in range(n_par)]
            i += 2 * n_par   # skip the Y solvers
            Ys = _psd_pair(bs, "Y_even", "Y_odd", bk.shape)
            TX, TY = _compute_pairings(bk, xs, Ys, n_refine)
            TXs_all.append(TX)
            TYs_all.append(TY)
        return TXs_all, TYs_all

    f = jc(ph_pair, sdp, state, xy_parts)
    t, (TXs_all, TYs_all) = _time_fn(f, (sdp, state, xy_parts), reps)
    ops = 0.0
    for bk in sdp.buckets:
        for emb in (bk.emb_even, bk.emb_odd):
            B_, R, C = emb.shape
            if R == 0 or C == 0:
                continue
            # solve (2 trsm) * (1+n_refine matmul-ish passes) + 3 gemms
            ops += (1 + n_refine) * 2 * trsm_ops(B_, R, C)
            ops += 3 * matmul_ops(B_, C, R, C)
    phases.append(("pairings", t,
                   ops * (mul_flops(K, bool(scaled_limbs))
                          + add_flops(K, bool(scaled_limbs)))))

    # ---- phase: Schur complement S assembly
    def ph_schur(sdp_, TXs, TYs):
        return [_schur_complement(bk, tx, ty)
                for bk, tx, ty in zip(sdp_.buckets, TXs, TYs)]

    f = jc(ph_schur, sdp, TXs_all, TYs_all)
    t, Ss = _time_fn(f, (sdp, TXs_all, TYs_all), reps)
    ops = 0.0
    for bk in sdp.buckets:
        P = bk.shape.schur_size
        n_par = (1 if bk.shape.h_even > 0 else 0) + \
                (1 if bk.shape.h_odd > 0 else 0)
        ops += 8.0 * n_par * bk.batch * P * P   # 4 Hadamard muls + adds
    phases.append(("schur_S", t,
                   ops * (mul_flops(K, bool(scaled_limbs))
                          + add_flops(K, bool(scaled_limbs))) / 2))

    # ---- phase: S factorization
    def ph_sfac(Ss_):
        out = []
        for S in Ss_:
            s = linalg.PosdefSolver(S, Kf)
            out.append((s.A, s.L, s.dinv))
        return out

    f = jc(ph_sfac, Ss)
    t, s_parts = _time_fn(f, (Ss,), reps)
    ops = sum(cholesky_ops(S.shape[0], S.shape[-1]) for S in Ss)
    phases.append(("S_cholesky", t,
                   ops * (mul_flops(Kf, bool(scaled_limbs))
                          + add_flops(Kf, bool(scaled_limbs)))))

    # ---- phase: S^{-1}B solves + Q assembly
    def ph_q(sdp_, parts):
        Q = mp.zeros((sdp_.dual_dim, sdp_.dual_dim), K,
                     jnp.float32 if scaled_limbs else jnp.float64,
                     scaled=bool(scaled_limbs))
        for i, bk in enumerate(sdp_.buckets):
            A, L, dinv = parts[i]
            ssol = linalg.PosdefSolver.from_parts(A, L, dinv, Kf)
            V = ssol.solve(bk.Bmat, n_refine)
            Q = mp.add(Q, mp.sum_(linalg.matmul(bk.Bmat.mT, V), axis=0))
        Q = _psum_mp(Q, None)
        return linalg.symmetrize(Q)

    f = jc(ph_q, sdp, s_parts)
    t, Q = _time_fn(f, (sdp, s_parts), reps)
    ops = 0.0
    for bk in sdp.buckets:
        B_, P, Nn = bk.Bmat.shape
        ops += (1 + n_refine) * 2 * trsm_ops(B_, P, Nn)
        ops += matmul_ops(B_, Nn, P, Nn)
    phases.append(("SinvB_Q", t,
                   ops * (mul_flops(K, bool(scaled_limbs))
                          + add_flops(K, bool(scaled_limbs)))))

    # ---- phase: global Q Cholesky
    def ph_qchol(Q_):
        s = linalg.PosdefSolver(Q_, Kf)
        return s.A, s.L, s.dinv

    f = jc(ph_qchol, Q)
    t, _qp = _time_fn(f, (Q,), reps)
    phases.append(("Q_cholesky", t,
                   cholesky_ops(1, N)
                   * (mul_flops(Kf, bool(scaled_limbs))
                      + add_flops(Kf, bool(scaled_limbs)))))

    # ---- phase: step length (min-eigenvalue congruence), X side, using
    # X itself as the direction stand-in (same shapes/cost as dX)
    def ph_eig(sdp_, state_, parts):
        i = 0
        lam = None
        for bk, bs in zip(sdp_.buckets, state_.buckets):
            Xs = _psd_pair(bs, "X_even", "X_odd", bk.shape)
            xs = [rebuild(parts, i + j) for j in range(len(Xs))]
            i += 2 * len(Xs)
            l = _step_length_lambda(xs, Xs, bk.mask, None)
            lam = l if lam is None else jnp.minimum(lam, l)
        return lam

    f = jc(ph_eig, sdp, state, xy_parts)
    t, _ = _time_fn(f, (sdp, state, xy_parts), reps)
    ops = 0.0
    for bk, bs in zip(sdp.buckets, state.buckets):
        for M in _psd_pair(bs, "X_even", "X_odd", bk.shape):
            n = M.shape[-1]
            ops += 2 * trsm_ops(M.shape[0], n, n) + cholesky_ops(M.shape[0], n)
    phases.append(("step_length_eig(x1)", t,
                   ops * (mul_flops(Kf, bool(scaled_limbs))
                          + add_flops(Kf, bool(scaled_limbs)))))

    # ---- total iteration
    it_fn = jax.jit(make_iteration(cfg))
    if use_cache:
        it_fn = cached_compile(it_fn, sdp, state, key_extra=config_key(cfg))
    t_total, _ = _time_fn(it_fn, (sdp, state), reps)

    return phases, t_total


def report(phases, t_total, peak_gflops, reps):
    rows = []
    # the search-direction scan runs the solve phases twice; the measured
    # breakdown here is per-call
    t_sum = sum(t for _, t, _ in phases)
    for name, t, flops in phases:
        g = flops / t / 1e9 if t > 0 else 0.0
        rows.append({
            "phase": name, "ms": round(t * 1e3, 2),
            "pct_of_iteration": round(100 * t / t_total, 1),
            "vpu_gflops": round(g, 1),
            "pct_of_peak": round(100 * g / peak_gflops, 1)
            if peak_gflops else None,
        })
    rows.append({"phase": "other (scan: 2x search-direction solves, "
                          "updates, residues)",
                 "ms": round((t_total - t_sum) * 1e3, 2),
                 "pct_of_iteration": round(100 * (t_total - t_sum)
                                           / t_total, 1)})
    return {"iteration_ms": round(t_total * 1e3, 2),
            "vpu_peak_gflops_measured": round(peak_gflops, 1),
            "reps": reps, "phases": rows}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--fixture", required=True)
    p.add_argument("--scaledLimbs", type=int, default=5,
                   help="scaled f32 limbs (0 = classic f64 limbs)")
    p.add_argument("--quant", type=int, default=32)
    p.add_argument("--omega", default="1e6")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--noCache", action="store_true")
    p.add_argument("--json", default=None, help="also write JSON here")
    args = p.parse_args(argv)

    import jax
    platform = jax.devices()[0].platform
    peak = vpu_peak_gflops() if platform != "cpu" else 0.0
    phases, t_total = profile_fixture(
        args.fixture, args.scaledLimbs, args.quant, args.omega, args.reps,
        use_cache=not args.noCache)
    rec = report(phases, t_total, peak, args.reps)
    rec["platform"] = platform
    print(json.dumps(rec, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rec, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
