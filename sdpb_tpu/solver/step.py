"""One full IPM iteration (residues + predictor-corrector step), fully
jitted and shard_map-compatible.

This is the TPU-native re-design of SDP_Solver::run's loop body
(/root/reference/src/sdp_solve/SDP_Solver/run/run.cxx:113-183 and
run/step/step.cxx:43-163): every per-block Elemental BLAS call becomes a
batched MP kernel over shape buckets, and the cross-rank-group MPI plane
(synchronize_Q ring reduce-scatter, scalar AllReduces, dy assembly)
becomes jax.lax collectives over the `blocks` mesh axis — psum of the
N x N matrix Q, psum of B^T-contractions, and pmax of error norms.

All math follows the reference contract exactly; citations inline.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.sdp import DeviceSDP, Bucket
from ..ops import linalg, mpfloat as mp
from ..ops.mpfloat import MP
from .state import BucketState, SolverState


# ---------------------------------------------------------------------------
# Collective helpers (identity when running single-device)


def _psum(x, axis):
    return jax.lax.psum(x, axis) if axis else x


def _pmax(x, axis):
    return jax.lax.pmax(x, axis) if axis else x


def _psum_mp(x: MP, axis) -> MP:
    """Sum an MP value across devices.  Limb-wise psum would break
    non-overlap only mildly; we re-renormalize afterwards for safety.
    Scaled mode first aligns every shard onto the global max exponent
    (the exact-power-of-two analog of synchronize_Q's serialized BigFloat
    adds, synchronize_Q.cxx:110-113)."""
    if not axis:
        return x
    if hasattr(x, "words"):
        # wide: the cross-device sum decomposes exactly word-by-word
        # (sum_d sum_g w_g^d); one word-level renorm restores non-overlap
        from ..ops import mpwide

        return mpwide.renormalize(
            mpwide.MPW(tuple(_psum_mp(w, axis) for w in x.words)))
    if x.scaled:
        e = jax.lax.pmax(x.exp, axis)
        x = mp.align_mantissa(x, e)
        limbs = jax.lax.psum(x.limbs, axis)
        return mp.renorm([limbs[i] for i in range(limbs.shape[0])], x.K, exp=e)
    limbs = jax.lax.psum(x.limbs, axis)
    return mp.renorm([limbs[i] for i in range(limbs.shape[0])], x.K)


def _pmin(x, axis):
    return -jax.lax.pmax(-x, axis) if axis else x


# ---------------------------------------------------------------------------
# Small structural helpers


def _pairs(dim):
    """(s, r) tuples with r <= s, ordered by offset s(s+1)/2 + r — the
    constraint tuple ordering of the reference (SDP.hxx:52-58)."""
    out = []
    for s in range(dim):
        for r in range(s + 1):
            out.append((s, r))
    return out


def _mask_mp(x: MP, mask, extra_dims: int) -> MP:
    return mp.mask_value(x, mask.reshape(mask.shape + (1,) * extra_dims))


def _row_mask_mp(x: MP, row_mask) -> MP:
    """Mask constraint rows: x [B, P, ...] by row_mask [B, P]."""
    return mp.mask_value(x, row_mask.reshape(row_mask.shape + (1,) * (x.ndim - 2)))


def _psd_outer_masks(bucket: Bucket):
    """Per-parity elementwise PSD masks [B, n, n] (1 where both dims real).
    Shape-padded dims and whole batch-padding entries are zero."""
    out = []
    if bucket.shape.h_even > 0:
        m = bucket.psd_mask_even
        out.append(m[:, :, None] * m[:, None, :])
    if bucket.shape.h_odd > 0:
        m = bucket.psd_mask_odd
        out.append(m[:, :, None] * m[:, None, :])
    return out


def _mask_psd(x: MP, outer_mask) -> MP:
    """x [B, n, n] masked elementwise by outer_mask [B, n, n]."""
    return mp.mask_value(x, outer_mask)


def _scalar_mp(x: float, K, dtype, scaled: bool = False) -> MP:
    return mp.from_double(np.float64(x), K, dtype, scaled=scaled)


def _host_mp(parts, dtype) -> MP:
    """Device MP from host parts: a [K] limb array (classic), a
    (limbs [K], exp scalar) pair (scaled), or a list of such pairs
    (wide); see StepConfig."""
    if isinstance(parts, list):
        from ..ops.mpwide import wide_parts_to_mp

        return wide_parts_to_mp(parts, dtype)
    if isinstance(parts, tuple):
        limbs, exp = parts
        return MP(jnp.asarray(limbs, dtype=dtype),
                  jnp.asarray(exp, dtype=jnp.int32))
    return MP(jnp.asarray(parts, dtype=dtype))


def _bases(bucket: Bucket):
    """Per-parity (basis [B,h,np], embedded basis [B,m*h,m*np]) with h>0."""
    out = []
    if bucket.shape.h_even > 0:
        out.append((bucket.bases_even, bucket.emb_even))
    if bucket.shape.h_odd > 0:
        out.append((bucket.bases_odd, bucket.emb_odd))
    return out


def _psd_pair(bs: BucketState, attr_even: str, attr_odd: str, shape):
    out = []
    if shape.h_even > 0:
        out.append(getattr(bs, attr_even))
    if shape.h_odd > 0:
        out.append(getattr(bs, attr_odd))
    return out


class IterationStats(NamedTuple):
    primal_objective: MP           # scalar MP
    dual_objective: MP
    duality_gap: MP
    primal_error_P: jnp.ndarray    # base scalar
    primal_error_p: jnp.ndarray
    dual_error: jnp.ndarray
    mu: MP                         # scalar MP
    primal_step: jnp.ndarray       # base scalar
    dual_step: jnp.ndarray
    beta_corrector: jnp.ndarray    # base scalar
    is_pd_feasible: jnp.ndarray    # bool
    max_complementarity_exceeded: jnp.ndarray  # bool
    # relative Schur solve residual max_blocks ||S u - rhs|| / ||rhs||
    # (full precision, worst of predictor/corrector).  The detector for
    # the factor-sizing law's SILENT under-range mode (all stats finite,
    # trajectory degraded) — see StepConfig.kkt_residual_threshold.
    kkt_residual: jnp.ndarray      # base scalar


# ---------------------------------------------------------------------------
# Iteration pieces


def _compute_pairings(bucket: Bucket, X_solvers, Ys: List[MP], n_refine: int):
    """A_X_inv = emb^T X^{-1} emb (refined solve against X in place of the
    reference's full-precision Trsm+Syrk, compute_A_X_inv.cxx:21-30),
    A_Y = emb^T Y emb via two Gemms (compute_A_Y.cxx:31-37), reshaped to
    pairing tensors T[B, m, np, m, np]."""
    sh = bucket.shape
    TXs, TYs = [], []
    for (basis, emb), xsol, Y in zip(_bases(bucket), X_solvers, Ys):
        V = xsol.solve(emb, n_refine)                # X^{-1} emb, full K
        # Gram form V^T X V (not emb^T V): EXACTLY PSD like the reference's
        # Syrk of L^{-1} emb, and the refinement error delta enters only as
        # O(delta^2) — an asymmetric emb^T V makes the downstream Schur
        # complement indefinite at the bottom of its spectrum, which kills
        # its low-precision Cholesky.
        X = xsol.A
        A_X = linalg.symmetrize(linalg.matmul(V.mT, linalg.matmul(X, V)))
        A_Y = linalg.matmul(emb.mT, linalg.matmul(Y, emb))
        m, n = sh.dim, sh.num_points
        TXs.append(A_X.reshape((A_X.shape[0], m, n, m, n)))
        TYs.append(A_Y.reshape((A_Y.shape[0], m, n, m, n)))
    return TXs, TYs


def _gather_pairs(T: MP, idx1, idx2) -> MP:
    """T[B,m,np,m,np] -> G[B,npairs,np,npairs,np] with
    G[p1,k1,p2,k2] = T[idx1[p1],k1,idx2[p2],k2]."""
    return mp.take(mp.take(T, idx1, axis=1), idx2, axis=3)


def _schur_complement(bucket: Bucket, TXs, TYs) -> MP:
    """S_{(j,r1,s1,k1),(j,r2,s2,k2)} = 1/4 sum_parity (A_X_inv A_Y + 3 swaps)
    (compute_schur_complement.cxx:6-126) as batched gathers + Hadamard MP
    products.  Padded batch entries get S = I."""
    sh = bucket.shape
    B = bucket.batch
    P = sh.schur_size
    S = None
    if sh.dim == 1:
        for TX, TY in zip(TXs, TYs):
            t = mp.mul(TX.reshape((B, sh.num_points, sh.num_points)),
                       TY.reshape((B, sh.num_points, sh.num_points)))
            S = t if S is None else mp.add(S, t)
    else:
        prs = _pairs(sh.dim)
        s_idx = jnp.array([s for s, r in prs])
        r_idx = jnp.array([r for s, r in prs])
        for TX, TY in zip(TXs, TYs):
            t1 = mp.mul(_gather_pairs(TX, s_idx, r_idx), _gather_pairs(TY, r_idx, s_idx))
            t2 = mp.mul(_gather_pairs(TX, r_idx, r_idx), _gather_pairs(TY, s_idx, s_idx))
            t3 = mp.mul(_gather_pairs(TX, s_idx, s_idx), _gather_pairs(TY, r_idx, r_idx))
            t4 = mp.mul(_gather_pairs(TX, r_idx, s_idx), _gather_pairs(TY, s_idx, r_idx))
            t = mp.add(mp.add(t1, t2), mp.add(t3, t4))
            S = t if S is None else mp.add(S, t)
        S = mp.mul_pow2(S, np.float64(0.25))
        S = S.reshape((B, P, P))
    S = linalg.symmetrize(S)
    # padded constraint rows (shape padding and whole padded batch entries):
    # S row/col zeroed, diagonal patched to 1 so the Cholesky stays defined
    # and padded dx solve to exactly 0.
    rm = bucket.row_mask.astype(S.dtype)
    eye = jnp.eye(P, dtype=S.dtype)
    S = mp.mask_value(S, rm[:, :, None] * rm[:, None, :])
    pad_diag = (eye[None] * (1.0 - rm)[:, :, None]) > 0
    one = _scalar_mp(1.0, S.K, S.dtype, scaled=S.scaled)
    S = mp.where(pad_diag, mp.broadcast_to(one, S.shape), S)
    return S


def _constraint_matrix_weighted_sum(bucket: Bucket, a: MP):
    """result = sum_p a_p A_p per parity
    (constraint_matrix_weighted_sum.cxx:15-69): for each pair (s,r),
    basis diag(a_pair) basis^T scaled by 1 (diag) or 1/2 (off-diag),
    scattered block-symmetrically into [B, m*h, m*h]."""
    sh = bucket.shape
    B = bucket.batch
    prs = _pairs(sh.dim)
    a4 = a.reshape((B, sh.n_pairs, sh.num_points))
    results = []
    for basis, emb in _bases(bucket):
        h = basis.shape[-2]
        # W[b,pair,h,np] = basis[b,h,np] * a[b,pair,np]
        W = mp.mul(mp.expand_dims(basis, 1), mp.expand_dims(a4, 2))
        bT = mp.expand_dims(basis.mT, 1)             # [B,1,np,h]
        Ssub = linalg.matmul(W, bT)                  # [B,npairs,h,h]
        out = mp.zeros((B, sh.dim * h, sh.dim * h), a.K, a.dtype,
                       scaled=a.scaled)
        for p, (s, r) in enumerate(prs):
            blk = Ssub[:, p]
            if s != r:
                blk = mp.mul_pow2(blk, np.float64(0.5))
            out = mp.set_block(
                out, (slice(None), slice(r * h, (r + 1) * h),
                      slice(s * h, (s + 1) * h)), blk)
            if s != r:
                out = mp.set_block(
                    out, (slice(None), slice(s * h, (s + 1) * h),
                          slice(r * h, (r + 1) * h)), blk.mT)
        results.append(out)
    return results


def _trace_Ap(bucket: Bucket, Zs: List[MP]) -> MP:
    """Tr(A_p Z) for all p: diag(basis^T Z[r,s] basis)
    (compute_schur_RHS.cxx:41-83).  Z must be symmetric."""
    sh = bucket.shape
    B = bucket.batch
    prs = _pairs(sh.dim)
    total = None
    for (basis, emb), Z in zip(_bases(bucket), Zs):
        h = basis.shape[-2]
        per_pair = []
        for (s, r) in prs:
            Zsub = Z[:, r * h:(r + 1) * h, s * h:(s + 1) * h]    # [B,h,h]
            t = linalg.matmul(Zsub, basis)                       # [B,h,np]
            q = mp.sum_(mp.mul(t, basis), axis=1)                # [B,np]
            per_pair.append(q)
        contrib = mp.stack(per_pair, axis=1)                     # [B,npairs,np]
        contrib = contrib.reshape((B, sh.schur_size))
        total = contrib if total is None else mp.add(total, contrib)
    return total


def _step_length_lambda(solvers, dMs: List[MP], mask, axis):
    """min over blocks of lambda_min(L^{-1} dM L^{-T})
    (step_length.cxx:27-48, min_eigenvalue.cxx:8-33).  Padded entries
    contribute 0 (no constraint).

    Runs entirely at factor precision: the step length needs only a few
    digits (it is scaled by gamma=0.7 anyway), but the CHOLESKY must be the
    K_f-limb one — a plain f64 factor of X is indefinite under rounding
    once cond(X) > 1e16, which the IPM reaches long before convergence."""
    lam = None
    for sol, dM in zip(solvers, dMs):
        dM_lo = mp.round_to(dM, sol.Kf)
        # the factor is of the equilibrated matrix D M D, whose Cholesky is
        # L~ with L = D^{-1} L~; the congruence needs D dM D
        if sol.scale is not None:
            dM_lo = MP(dM_lo.limbs * (sol.scale[..., :, None] * sol.scale[..., None, :]))
        W = linalg.solve_lower(sol.L, dM_lo, sol.dinv)
        T = linalg.solve_lower(sol.L, W.mT, sol.dinv)
        lmin = linalg.min_eigenvalue_estimate(T)     # [B]
        lmin = jnp.where(mask > 0, lmin, 0.0)
        bmin = jnp.min(lmin)
        lam = bmin if lam is None else jnp.minimum(lam, bmin)
    return lam


def _step_from_lambda(lam, gamma: float):
    """min(1, -gamma/lambda_min) (step_length.cxx:41-48)."""
    return jnp.where(lam > -gamma, jnp.ones_like(lam), -gamma / lam)


# ---------------------------------------------------------------------------
# The iteration


@dataclass(frozen=True)
class StepConfig:
    """Static + device-constant parameters for the jitted iteration."""
    total_psd_rows: int
    axis: Optional[str]              # mesh axis name for collectives
    gamma: float                     # stepLengthReduction (base float; ~0.7)
    feasible_beta_limbs: np.ndarray
    infeasible_beta_limbs: np.ndarray
    primal_error_threshold: float
    dual_error_threshold: float
    max_complementarity: float
    # mixed-precision solve scheme (see ops.linalg.PosdefSolver): Cholesky
    # factors at factor_limbs (double-double by default), full precision
    # recovered with n_refine refinement passes.  0 passes = pure
    # low-precision solves (only sensible when K == factor_limbs).
    factor_limbs: int = 2
    n_refine: int = 0
    # Device-side termination (make_chunked_iteration): MP limb parts of
    # the duality-gap threshold plus the flag/step-floor parameters of
    # compute_feasible_and_termination.cxx:20-65.  duality_gap_threshold_
    # limbs=None means the chunked driver is not in use (legacy host loop
    # decides termination).
    duality_gap_threshold_limbs: object = None
    find_primal_feasible: bool = False
    find_dual_feasible: bool = False
    detect_primal_feasible_jump: bool = False
    detect_dual_feasible_jump: bool = False
    min_primal_step: float = 0.0
    min_dual_step: float = 0.0
    # KKT solve-residual guard: relative Schur residual above this value
    # is a conditioning failure, catching the sizing law's silent
    # under-range mode that no finiteness check can see
    # (solve.initial_factor_limbs docstring).  0 disables measurement.
    # With kkt_heal (factor below its cap) a trip raises REASON_RETRY
    # (factor bump + replay); at the cap the host only WARNS — a degraded
    # run that still progresses beats a dead one, matching the
    # reference's grind-to-small-steps behavior.
    kkt_residual_threshold: float = 0.0
    kkt_heal: bool = True


def make_iteration(cfg: StepConfig):
    """Build the jittable iteration: (sdp, state) -> (stats, new_state).

    The SDP is a traced argument (not a closure constant) so the same
    function can be wrapped in jax.shard_map with the block-batch axes of
    both the problem data and the state sharded over a device mesh
    (sdpb_tpu.parallel.mesh).

    The returned stats describe the INPUT state (objectives/residues are
    computed before stepping, as in run.cxx:134-160), so on termination the
    caller keeps the input state as the solution.
    """
    axis = cfg.axis

    def iteration(sdp: DeviceSDP, state: SolverState):
        K = sdp.b.K
        dtype = sdp.b.dtype
        scaled = sdp.b.scaled
        beta_feas = _host_mp(cfg.feasible_beta_limbs, dtype)
        beta_infeas = _host_mp(cfg.infeasible_beta_limbs, dtype)
        one = _scalar_mp(1.0, K, dtype, scaled)
        # ---- objectives (compute_objectives.cxx:10-31)
        p_obj = sdp.objective_const
        for bk, bs in zip(sdp.buckets, state.buckets):
            cx = mp.sum_(_row_mask_mp(mp.mul(bk.c, bs.x), bk.row_mask), axis=None)
            p_obj = mp.add(p_obj, cx)
        p_obj = _psum_mp(p_obj, axis)
        d_obj = mp.add(sdp.objective_const, mp.dot(sdp.b, state.y))
        gap_num = mp.abs_(mp.sub(p_obj, d_obj))
        gap_den = mp.maximum(mp.add(mp.abs_(p_obj), mp.abs_(d_obj)), one)
        duality_gap = mp.div(gap_num, gap_den)

        # ---- Cholesky of X and Y at factor precision (run.cxx:136-140);
        # X gets a refined-solve wrapper, Y's factor only feeds step length
        X_solvers, Y_solvers = [], []
        for bk, bs in zip(sdp.buckets, state.buckets):
            Xs = _psd_pair(bs, "X_even", "X_odd", bk.shape)
            Ys = _psd_pair(bs, "Y_even", "Y_odd", bk.shape)
            X_solvers.append([linalg.PosdefSolver(X, cfg.factor_limbs) for X in Xs])
            Y_solvers.append([linalg.PosdefSolver(Y, cfg.factor_limbs) for Y in Ys])

        # ---- bilinear pairings (compute_bilinear_pairings.cxx:17-31)
        TXs_all, TYs_all = [], []
        for bk, bs, xsols in zip(sdp.buckets, state.buckets, X_solvers):
            Ys = _psd_pair(bs, "Y_even", "Y_odd", bk.shape)
            TX, TY = _compute_pairings(bk, xsols, Ys, cfg.n_refine)
            TXs_all.append(TX)
            TYs_all.append(TY)

        # ---- dual residues: c - Tr(A_* Y) - B y
        #      (compute_dual_residues_and_error.cxx:3-66)
        dual_residues = []
        dual_error = jnp.zeros((), dtype=dtype)
        for bk, bs, TYs in zip(sdp.buckets, state.buckets, TYs_all):
            sh = bk.shape
            B = bk.batch
            prs = _pairs(sh.dim)
            diag_sum = None
            for TY in TYs:
                per_pair = []
                for (s, r) in prs:
                    sub = TY[:, r, :, s, :]                       # [B,np,np]
                    per_pair.append(mp.diagonal(sub))             # [B,np]
                contrib = mp.stack(per_pair, axis=1).reshape((B, sh.schur_size))
                diag_sum = contrib if diag_sum is None else mp.add(diag_sum, contrib)
            By = linalg.matvec(bk.Bmat, state.y)
            res = mp.sub(mp.sub(bk.c, diag_sum), By)
            dual_residues.append(res)
            dual_error = jnp.maximum(
                dual_error, mp.max_abs(_row_mask_mp(res, bk.row_mask)))
        dual_error = _pmax(dual_error, axis)

        # ---- primal residues P = sum_p A_p x_p - X
        #      (compute_primal_residues_and_error_P_Ax_X.cxx)
        primal_residues = []
        primal_error_P = jnp.zeros((), dtype=dtype)
        for bk, bs in zip(sdp.buckets, state.buckets):
            Ax = _constraint_matrix_weighted_sum(bk, bs.x)
            Xs = _psd_pair(bs, "X_even", "X_odd", bk.shape)
            # mask kills the -I of padded PSD dims (X = I there by
            # construction, sum A_p x_p = 0)
            Ps = [_mask_psd(mp.sub(a, X), om)
                  for a, X, om in zip(Ax, Xs, _psd_outer_masks(bk))]
            primal_residues.append(Ps)
            for P in Ps:
                primal_error_P = jnp.maximum(primal_error_P, mp.max_abs(P))
        primal_error_P = _pmax(primal_error_P, axis)

        # ---- primal residue p = b - B^T x
        #      (compute_primal_residues_and_error_p_b_Bx.cxx)
        Btx = mp.zeros((sdp.dual_dim,), K, dtype, scaled=scaled)
        for bk, bs in zip(sdp.buckets, state.buckets):
            xm = _row_mask_mp(bs.x, bk.row_mask)
            t = linalg.matmul(bk.Bmat.mT, linalg.col(xm))[..., 0]  # [B,N]
            Btx = mp.add(Btx, mp.sum_(t, axis=0))
        Btx = _psum_mp(Btx, axis)
        primal_residue_p = mp.sub(sdp.b, Btx)
        primal_error_p = _pmax(mp.max_abs(primal_residue_p), axis)

        # ---- feasibility for centering (compute_feasible_and_termination.cxx:15-18)
        is_pd_feasible = jnp.logical_and(
            primal_error_P < cfg.primal_error_threshold,
            jnp.logical_and(primal_error_p < cfg.primal_error_threshold,
                            dual_error < cfg.dual_error_threshold))

        # ---- Schur complement solver init
        #      (initialize_schur_complement_solver.cxx:61-103)
        S_solvers, SinvBs = [], []
        Q = mp.zeros((sdp.dual_dim, sdp.dual_dim), K, dtype, scaled=scaled)
        for bk, TXs, TYs in zip(sdp.buckets, TXs_all, TYs_all):
            S = _schur_complement(bk, TXs, TYs)
            ssol = linalg.PosdefSolver(S, cfg.factor_limbs)
            V = ssol.solve(bk.Bmat, cfg.n_refine)          # S^{-1} B [B,P,N]
            S_solvers.append(ssol)
            SinvBs.append(V)
            # Q = sum_blocks B^T S^{-1} B (initialize_Q_group.cxx:31-67)
            Q = mp.add(Q, mp.sum_(linalg.matmul(bk.Bmat.mT, V), axis=0))
        Q = _psum_mp(Q, axis)          # the synchronize_Q reduce (cxx:23-186)
        Q = linalg.symmetrize(Q)
        Q_solver = linalg.PosdefSolver(Q, cfg.factor_limbs)

        # ---- mu = Tr(XY)/total_psd_rows (step.cxx:96-104)
        trXY = None
        for bk, bs in zip(sdp.buckets, state.buckets):
            Xs = _psd_pair(bs, "X_even", "X_odd", bk.shape)
            Ys = _psd_pair(bs, "Y_even", "Y_odd", bk.shape)
            for X, Y, om in zip(Xs, Ys, _psd_outer_masks(bk)):
                # mask excludes the padded identity dims from Tr(XY)
                t = mp.sum_(linalg.frobenius(_mask_psd(X, om), Y), axis=0)
                trXY = t if trXY is None else mp.add(trXY, t)
        trXY = _psum_mp(trXY, axis)
        mu = mp.div(trXY, _scalar_mp(float(cfg.total_psd_rows), K, dtype, scaled))
        # clamp to the limb dtype's range (1e100 overflows float32 to inf)
        max_comp = min(cfg.max_complementarity, float(np.finfo(dtype).max))
        max_comp_exceeded = mp.to_float_array(mu) > max_comp

        # ---- predictor + corrector as ONE scanned search direction
        #
        # The two phases (step.cxx:106-127) run the identical program —
        # only beta and the -dX dY correction term differ — so they are a
        # 2-step lax.scan over a (dx, dX, dy, dY, beta) carry.  The
        # search-direction graph (the largest part of the iteration) is
        # traced and compiled ONCE instead of twice.  Step 0 reproduces the
        # predictor bitwise: the correction term is scaled by 0 and beta
        # selects beta_predictor (predictor_centering_parameter.cxx:4-9).
        beta_pred = mp.where(is_pd_feasible, mp.zeros((), K, dtype, scaled=scaled),
                             beta_infeas)
        total_mp = _scalar_mp(float(cfg.total_psd_rows), K, dtype, scaled)

        def pc_body(carry, step_idx):
            dXs_p, dYs_p, _, _, _ = carry
            is_corr = (step_idx > 0)
            corr_scale = step_idx.astype(dtype)  # 0.0 predictor / 1.0 corrector

            # corrector beta from the previous direction
            # (corrector_centering_parameter.cxx:12-31)
            frob = None
            for i, (bk, bs) in enumerate(zip(sdp.buckets, state.buckets)):
                Xs = _psd_pair(bs, "X_even", "X_odd", bk.shape)
                Ys = _psd_pair(bs, "Y_even", "Y_odd", bk.shape)
                oms = _psd_outer_masks(bk)
                for ip, (X, Y) in enumerate(zip(Xs, Ys)):
                    t = linalg.frobenius(
                        _mask_psd(mp.add(X, dXs_p[i][ip]), oms[ip]),
                        mp.add(Y, dYs_p[i][ip]))
                    t = mp.sum_(t, axis=0)
                    frob = t if frob is None else mp.add(frob, t)
            frob = _psum_mp(frob, axis)
            r = mp.div(frob, mp.mul(mu, total_mp))
            beta_cand = mp.where(mp.lt(r, one), mp.mul(r, r), r)
            beta_c_feas = mp.minimum(mp.maximum(beta_feas, beta_cand), one)
            beta_c_infeas = mp.maximum(beta_infeas, beta_cand)
            beta_corr = mp.where(is_pd_feasible, beta_c_feas, beta_c_infeas)
            beta = mp.where(is_corr, beta_corr, beta_pred)

            # search direction (compute_search_direction.cxx:56-93)
            bmu = mp.mul(beta, mu)
            dxs, Rs_all = [], []
            for i, (bk, bs) in enumerate(zip(sdp.buckets, state.buckets)):
                Xs = _psd_pair(bs, "X_even", "X_odd", bk.shape)
                Ys = _psd_pair(bs, "Y_even", "Y_odd", bk.shape)
                Rs, Zs = [], []
                for ip, (X, Y) in enumerate(zip(Xs, Ys)):
                    # R = beta mu I - X Y - [corrector] dX dY
                    R = mp.neg(linalg.matmul(X, Y))
                    corr = linalg.matmul(dXs_p[i][ip], dYs_p[i][ip])
                    R = mp.sub(R, mp.mask_value(corr, corr_scale))
                    n = R.shape[-1]
                    R = mp.add(R, mp.scalar_eye(bmu, n))
                    # Z = Symmetrize(X^{-1}(P Y - R))
                    Z = mp.sub(linalg.matmul(primal_residues[i][ip], Y), R)
                    Z = X_solvers[i][ip].solve(Z, cfg.n_refine)
                    Z = linalg.symmetrize(Z)
                    Rs.append(R)
                    Zs.append(Z)
                Rs_all.append(Rs)
                # dx rhs = -dual_residues - Tr(A_p Z) (compute_schur_RHS.cxx)
                trAZ = _trace_Ap(bk, Zs)
                dxs.append(mp.neg(mp.add(dual_residues[i], trAZ)))

            # solve {{S,-B},{B^T,0}} (solve_schur_complement_equation.cxx):
            # u = S^{-1} rhs;  dy = Q^{-1}(p - B^T u);  dx = u + (S^{-1}B) dy
            us = []
            dy_local = mp.zeros((sdp.dual_dim,), K, dtype, scaled=scaled)
            kkt_resid = jnp.zeros((), dtype=dtype)
            for i, bk in enumerate(sdp.buckets):
                u = S_solvers[i].solve(linalg.col(dxs[i]), cfg.n_refine)
                us.append(u)
                if cfg.kkt_residual_threshold > 0:
                    # full-precision solve residual: the only signal the
                    # silent factor under-range mode produces
                    r = mp.sub(linalg.col(dxs[i]),
                               linalg.matmul(S_solvers[i].A, u))
                    rn = mp.max_abs(_row_mask_mp(r[..., 0], bk.row_mask))
                    bn = mp.max_abs(_row_mask_mp(dxs[i], bk.row_mask))
                    tiny = np.finfo(np.float32 if dtype == jnp.float32
                                    else np.float64).tiny
                    kkt_resid = jnp.maximum(
                        kkt_resid, rn / jnp.maximum(bn, tiny))
                t = linalg.matmul(bk.Bmat.mT, u)[..., 0]       # [B,N]
                dy_local = mp.add(dy_local, mp.sum_(t, axis=0))
            dy = mp.sub(primal_residue_p, _psum_mp(dy_local, axis))
            dy = Q_solver.solve(linalg.col(dy), cfg.n_refine)[..., 0]
            for i, bk in enumerate(sdp.buckets):
                dx = mp.add(us[i], linalg.matmul(SinvBs[i], linalg.col(dy)))[..., 0]
                dx = _row_mask_mp(dx, bk.row_mask)
                dxs[i] = dx

            # dX = P + sum_p A_p dx_p ; dY = -Sym(X^{-1}(dX Y - R))
            dXs, dYs = [], []
            for i, (bk, bs) in enumerate(zip(sdp.buckets, state.buckets)):
                Adx = _constraint_matrix_weighted_sum(bk, dxs[i])
                Ys = _psd_pair(bs, "Y_even", "Y_odd", bk.shape)
                oms = _psd_outer_masks(bk)
                bdX, bdY = [], []
                for ip in range(len(Adx)):
                    dX = mp.add(Adx[ip], primal_residues[i][ip])
                    dX = _mask_psd(dX, oms[ip])
                    dY = mp.sub(linalg.matmul(dX, Ys[ip]), Rs_all[i][ip])
                    dY = X_solvers[i][ip].solve(dY, cfg.n_refine)
                    dY = mp.neg(linalg.symmetrize(dY))
                    dY = _mask_psd(dY, oms[ip])
                    bdX.append(dX)
                    bdY.append(dY)
                dXs.append(bdX)
                dYs.append(bdY)
            return (dXs, dYs, dxs, dy, beta), kkt_resid

        def zeros_like_psd(bs, bk):
            return [mp.zeros(X.shape, K, dtype, scaled=scaled)
                    for X in _psd_pair(bs, "X_even", "X_odd", bk.shape)]

        carry0 = (
            [zeros_like_psd(bs, bk) for bk, bs in zip(sdp.buckets, state.buckets)],
            [zeros_like_psd(bs, bk) for bk, bs in zip(sdp.buckets, state.buckets)],
            [mp.zeros((bk.batch, bk.shape.schur_size), K, dtype, scaled=scaled)
             for bk in sdp.buckets],
            mp.zeros((sdp.dual_dim,), K, dtype, scaled=scaled),
            mp.zeros((), K, dtype, scaled=scaled),
        )
        (dXs, dYs, dxs, dy, beta_corr), kkt_seq = jax.lax.scan(
            pc_body, carry0, jnp.arange(2))
        kkt_residual = _pmax(jnp.max(kkt_seq), axis)

        # ---- step lengths (step.cxx:129-144)
        lam_p, lam_d = None, None
        for i, (bk, bs) in enumerate(zip(sdp.buckets, state.buckets)):
            lp = _step_length_lambda(X_solvers[i], dXs[i], bk.mask, axis)
            ld = _step_length_lambda(Y_solvers[i], dYs[i], bk.mask, axis)
            lam_p = lp if lam_p is None else jnp.minimum(lam_p, lp)
            lam_d = ld if lam_d is None else jnp.minimum(lam_d, ld)
        lam_p = _pmin(lam_p, axis)
        lam_d = _pmin(lam_d, axis)
        primal_step = _step_from_lambda(lam_p, cfg.gamma)
        dual_step = _step_from_lambda(lam_d, cfg.gamma)
        both = jnp.minimum(primal_step, dual_step)
        primal_step = jnp.where(is_pd_feasible, both, primal_step)
        dual_step = jnp.where(is_pd_feasible, both, dual_step)

        # ---- update (step.cxx:146-162)
        ap = mp.from_double(primal_step, K, dtype, scaled=scaled)
        ad = mp.from_double(dual_step, K, dtype, scaled=scaled)
        new_buckets = []
        for i, (bk, bs) in enumerate(zip(sdp.buckets, state.buckets)):
            x_new = mp.add(bs.x, mp.mul(ap, dxs[i]))
            Xs = _psd_pair(bs, "X_even", "X_odd", bk.shape)
            Ys = _psd_pair(bs, "Y_even", "Y_odd", bk.shape)
            X_new = [mp.add(X, mp.mul(ap, dX)) for X, dX in zip(Xs, dXs[i])]
            Y_new = [mp.add(Y, mp.mul(ad, dY)) for Y, dY in zip(Ys, dYs[i])]
            # re-assemble even/odd slots
            sh = bk.shape
            Xe, Xo = bs.X_even, bs.X_odd
            Ye, Yo = bs.Y_even, bs.Y_odd
            k = 0
            if sh.h_even > 0:
                Xe, Ye = X_new[k], Y_new[k]
                k += 1
            if sh.h_odd > 0:
                Xo, Yo = X_new[k], Y_new[k]
            new_buckets.append(BucketState(
                x=x_new, X_even=Xe, X_odd=Xo, Y_even=Ye, Y_odd=Yo))
        y_new = mp.add(state.y, mp.mul(ad, dy))
        new_state = SolverState(y=y_new, buckets=new_buckets)

        stats = IterationStats(
            primal_objective=p_obj,
            dual_objective=d_obj,
            duality_gap=duality_gap,
            primal_error_P=primal_error_P,
            primal_error_p=primal_error_p,
            dual_error=dual_error,
            mu=mu,
            primal_step=primal_step,
            dual_step=dual_step,
            beta_corrector=mp.to_float_array(beta_corr),
            is_pd_feasible=is_pd_feasible,
            max_complementarity_exceeded=max_comp_exceeded,
            kkt_residual=kkt_residual,
        )
        return stats, new_state

    return iteration


# ---------------------------------------------------------------------------
# Device-resident chunked driver
#
# The reference's run loop (run/run.cxx:113-183) syncs every iteration:
# compute -> check termination on the root -> broadcast -> next.  On MPI
# that costs microseconds; on a remote TPU every host sync is a tunnel
# round trip that dwarfs the sub-millisecond device iteration.  The
# TPU-native driver therefore runs UP TO `chunk` iterations inside one
# executable -- a lax.scan whose body is the full IPM iteration plus the
# ordered termination logic of compute_feasible_and_termination.cxx:20-65
# computed on device -- and the host syncs once per chunk, reading back the
# stacked per-iteration stats for printing/bookkeeping.
#
# Stop semantics match the host loop exactly: whatever stops the run
# (termination, max-complementarity, or a non-finite iteration needing a
# factor-precision bump), the carried state freezes at the INPUT state of
# the stopping iteration -- the reference also keeps the pre-step state as
# the solution (stats describe the input state, see make_iteration).
# Frozen tail steps of the scan still execute arithmetic on the frozen
# state; their outputs are masked out (`executed`), costing only
# sub-millisecond device time.

REASON_NONE = 0
REASON_PD_OPTIMAL = 1
REASON_DUAL_FEASIBLE = 2
REASON_PRIMAL_FEASIBLE = 3
REASON_DUAL_JUMP = 4
REASON_PRIMAL_JUMP = 5
REASON_MAX_ITER = 6
REASON_PRIMAL_STEP_SMALL = 8
REASON_DUAL_STEP_SMALL = 9
REASON_MAX_COMPLEMENTARITY = 10
REASON_RETRY = 11       # non-finite stats / exploding corrector beta: the
                        # host bumps factor_limbs and retries the state


class ChunkCarry(NamedTuple):
    it: jnp.ndarray           # int32, 1-based global index of next iteration
    prev_p_step: jnp.ndarray  # base float, previous iteration's step lengths
    prev_d_step: jnp.ndarray
    done: jnp.ndarray         # bool
    reason: jnp.ndarray       # int32 REASON_* code


def _stats_finite(stats: IterationStats):
    """All-finite check over the solve-critical stats (the host loop's
    self-heal trigger), plus the saturating-f32 beta explosion guard.

    The beta bound stays LOOSE (1e4): recovery from an off-center state
    after a factor-precision bump legitimately passes through corrector
    betas of 3e2-5e3 (measured on nmax6 during a successful Kf=5->6 heal),
    so a tighter bound turns recoverable runs into terminations.  Slow-burn
    factor-range exhaustion (all stats finite, feasible-phase beta capped
    at 1) is NOT detectable here at all — preventing it is the factor
    SIZING's job (solve.initial_factor_limbs)."""
    fields = (stats.primal_objective, stats.dual_objective,
              stats.duality_gap, stats.mu, stats.primal_error_P,
              stats.primal_error_p, stats.dual_error, stats.primal_step,
              stats.dual_step)
    ok = None
    for leaf in jax.tree.leaves(fields):
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            continue
        f = jnp.all(jnp.isfinite(leaf))
        ok = f if ok is None else jnp.logical_and(ok, f)
    return jnp.logical_and(ok, stats.beta_corrector <= 1e4)


def make_chunked_iteration(cfg: StepConfig, chunk: int):
    """(sdp, state, carry, max_iterations) ->
           (new_state, carry', stats_seq, executed_seq)

    Runs up to `chunk` IPM iterations device-side.  `stats_seq` leaves are
    stacked along axis 0 (scan order); `executed_seq[i]` marks rows whose
    iteration actually ran (the stopping iteration is executed but not
    advanced -- exactly the legacy loop, which breaks before printing).
    `max_iterations` is a traced int32 scalar so different limits share one
    executable.  cfg.duality_gap_threshold_limbs must be set."""
    assert cfg.duality_gap_threshold_limbs is not None
    it_fn = make_iteration(cfg)

    def chunked(sdp: DeviceSDP, state: SolverState, carry: ChunkCarry,
                max_iterations):
        dtype = sdp.b.dtype
        gap_thr = _host_mp(cfg.duality_gap_threshold_limbs, dtype)

        def body(c, _):
            st, cy = c
            stats, new_state = it_fn(sdp, st)

            finite = _stats_finite(stats)
            primal_err = jnp.maximum(stats.primal_error_P,
                                     stats.primal_error_p)
            is_pf = primal_err < cfg.primal_error_threshold
            is_df = stats.dual_error < cfg.dual_error_threshold
            is_opt = mp.lt(stats.duality_gap, gap_thr)
            F = jnp.zeros((), jnp.bool_)

            # ordered checks, first match wins (evaluated back to front)
            checks = [
                (jnp.logical_and(jnp.logical_and(is_pf, is_df), is_opt),
                 REASON_PD_OPTIMAL),
                (is_df if cfg.find_dual_feasible else F,
                 REASON_DUAL_FEASIBLE),
                (is_pf if cfg.find_primal_feasible else F,
                 REASON_PRIMAL_FEASIBLE),
                (cy.prev_d_step == 1.0 if cfg.detect_dual_feasible_jump
                 else F, REASON_DUAL_JUMP),
                (cy.prev_p_step == 1.0 if cfg.detect_primal_feasible_jump
                 else F, REASON_PRIMAL_JUMP),
                (cy.it > max_iterations, REASON_MAX_ITER),
                (jnp.logical_and(cy.it > 1,
                                 cy.prev_p_step < cfg.min_primal_step),
                 REASON_PRIMAL_STEP_SMALL),
                (jnp.logical_and(cy.it > 1,
                                 cy.prev_d_step < cfg.min_dual_step),
                 REASON_DUAL_STEP_SMALL),
                # after the ordered chain (run loop checks it post-terminate)
                (stats.max_complementarity_exceeded,
                 REASON_MAX_COMPLEMENTARITY),
            ]
            reason_now = jnp.int32(REASON_NONE)
            for cond, code in reversed(checks):
                reason_now = jnp.where(cond, jnp.int32(code), reason_now)
            # non-finite preempts everything (host checks finiteness first);
            # a tripped KKT solve-residual guard is the same class of
            # failure with the same cure (factor bump + chunk replay)
            healthy = finite
            if cfg.kkt_residual_threshold > 0 and cfg.kkt_heal:
                healthy = jnp.logical_and(
                    healthy,
                    stats.kkt_residual <= cfg.kkt_residual_threshold)
            reason_now = jnp.where(healthy, reason_now,
                                   jnp.int32(REASON_RETRY))

            active = jnp.logical_not(cy.done)
            stop_now = jnp.logical_and(active, reason_now != REASON_NONE)
            advance = jnp.logical_and(active, reason_now == REASON_NONE)

            st2 = jax.tree.map(
                lambda new, old: jnp.where(
                    jnp.reshape(advance, (1,) * new.ndim), new, old),
                new_state, st)
            cy2 = ChunkCarry(
                it=cy.it + advance.astype(jnp.int32),
                prev_p_step=jnp.where(advance, stats.primal_step,
                                      cy.prev_p_step),
                prev_d_step=jnp.where(advance, stats.dual_step,
                                      cy.prev_d_step),
                done=jnp.logical_or(cy.done, stop_now),
                reason=jnp.where(stop_now, reason_now, cy.reason),
            )
            return (st2, cy2), (stats, active)

        (state2, carry2), (stats_seq, executed_seq) = jax.lax.scan(
            body, (state, carry), None, length=chunk)
        return state2, carry2, stats_seq, executed_seq

    return chunked
