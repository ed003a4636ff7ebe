"""approx_objective: objective of a perturbed SDP family from one solved SDP
(/root/reference/src/approx_objective/).

Linear:    dObj = dconst + db.y + dc.x - x.dB.y
           (Approx_Objective.cxx:10-52)
Quadratic: adds (db.dy + dc.dx - dx.dB.y - x.dB.dy)/2 where (dx, dy) solve
           the frozen Schur system with RHS (dB.y - dc, db - dB^T x)
           (Approx_Objective.cxx:55-130, compute_dx_dy.cxx).

The frozen Schur solver (S-Cholesky, S^{-1}B, Q) is rebuilt from the saved
(X, Y) solution state with the same mixed-precision machinery as the IPM
step (setup_solver.cxx analog).
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.sdp import DeviceSDP
from ..ops import linalg, mpfloat as mp
from ..ops.mpfloat import MP
from ..solver.state import SolverState
from ..solver.step import (_bases, _compute_pairings, _psd_pair,
                           _row_mask_mp, _schur_complement)


class FrozenSchur(NamedTuple):
    """The frozen Schur solver of a solved SDP: everything the quadratic
    approximation's (dx, dy) solve needs, serializable for reuse across
    invocations (the --writeSolverState state of
    /root/reference/src/approx_objective/setup_solver.cxx:40-52 /
    write_solver_state.cxx; there: schur_complement_cholesky_*,
    schur_off_diagonal_* = L^{-1}B, Q_cholesky.txt)."""
    Ss: List[MP]        # per-bucket S [B, P, P] (refinement residuals)
    S_Ls: List[MP]      # per-bucket S-Cholesky factors (factor precision)
    S_dinvs: List[MP]   # per-bucket factor diagonal reciprocals
    SinvBs: List[MP]    # per-bucket S^{-1} B [B, P, N]
    Q: MP               # [N, N]
    Q_L: MP
    Q_dinv: MP


def make_setup_fn(factor_limbs: int, n_refine: int):
    """Jitted (sdp, state) -> FrozenSchur: the expensive part of the
    quadratic approximation, computed once and reusable across many
    --newSdp invocations (setup_solver.cxx analog)."""

    def setup(sdp: DeviceSDP, state: SolverState) -> FrozenSchur:
        K = sdp.b.K
        dtype = sdp.b.dtype
        X_solvers = []
        for bk, bs in zip(sdp.buckets, state.buckets):
            Xs = _psd_pair(bs, "X_even", "X_odd", bk.shape)
            X_solvers.append(
                [linalg.PosdefSolver(X, factor_limbs) for X in Xs])
        Ss, S_Ls, S_dinvs, SinvBs = [], [], [], []
        Q = mp.zeros((sdp.dual_dim, sdp.dual_dim), K, dtype,
                     scaled=sdp.b.scaled)
        for bk, bs, xsols in zip(sdp.buckets, state.buckets, X_solvers):
            Ys = _psd_pair(bs, "Y_even", "Y_odd", bk.shape)
            TXs, TYs = _compute_pairings(bk, xsols, Ys, n_refine)
            S = _schur_complement(bk, TXs, TYs)
            ssol = linalg.PosdefSolver(S, factor_limbs)
            V = ssol.solve(bk.Bmat, n_refine)
            Ss.append(S)
            S_Ls.append(ssol.L)
            S_dinvs.append(ssol.dinv)
            SinvBs.append(V)
            Q = mp.add(Q, mp.sum_(linalg.matmul(bk.Bmat.mT, V), axis=0))
        Q = linalg.symmetrize(Q)
        qsol = linalg.PosdefSolver(Q, factor_limbs)
        return FrozenSchur(Ss=Ss, S_Ls=S_Ls, S_dinvs=S_dinvs, SinvBs=SinvBs,
                           Q=Q, Q_L=qsol.L, Q_dinv=qsol.dinv)

    return setup


def make_approx_fn(factor_limbs: int, n_refine: int):
    """Build the jitted function
    (sdp, state, frozen, d_const, d_b, d_c_buckets, d_B_buckets, quadratic)
    -> (objective, d_objective, dd_objective) MP scalars.  `frozen` is the
    FrozenSchur from make_setup_fn (pass None for --linear)."""

    def approx(sdp: DeviceSDP, state: SolverState,
               frozen: Optional[FrozenSchur], d_const: MP, d_b: MP,
               d_cs: List[MP], d_Bs: List[MP], quadratic: bool):
        K = sdp.b.K
        dtype = sdp.b.dtype

        # objective = b.y + const
        objective = mp.add(mp.dot(sdp.b, state.y), sdp.objective_const)

        # linear terms
        d_obj = mp.add(d_const, mp.dot(d_b, state.y))
        for bk, bs, dc, dB in zip(sdp.buckets, state.buckets, d_cs, d_Bs):
            xm = _row_mask_mp(bs.x, bk.row_mask)
            d_obj = mp.add(d_obj, mp.sum_(mp.mul(dc, xm), axis=None))
            dBy = linalg.matvec(dB, state.y)            # [B, P]
            d_obj = mp.sub(d_obj, mp.sum_(mp.mul(dBy, xm), axis=None))

        dd_obj = mp.zeros((), K, dtype, scaled=sdp.b.scaled)
        if quadratic:
            S_solvers = [
                linalg.PosdefSolver.from_parts(S, L, dinv, factor_limbs)
                for S, L, dinv in zip(frozen.Ss, frozen.S_Ls, frozen.S_dinvs)]
            SinvBs = frozen.SinvBs
            Q_solver = linalg.PosdefSolver.from_parts(
                frozen.Q, frozen.Q_L, frozen.Q_dinv, factor_limbs)

            # RHS: dx_rhs = dB.y - dc ; dy_rhs = db - sum dB^T x
            dx_rhss = []
            dy_rhs = d_b
            for bk, bs, dc, dB in zip(sdp.buckets, state.buckets, d_cs, d_Bs):
                rhs = mp.sub(linalg.matvec(dB, state.y), dc)
                dx_rhss.append(_row_mask_mp(rhs, bk.row_mask))
                xm = _row_mask_mp(bs.x, bk.row_mask)
                t = linalg.matmul(dB.mT, linalg.col(xm))[..., 0]
                dy_rhs = mp.sub(dy_rhs, mp.sum_(t, axis=0))

            # solve {{S,-B},{B^T,0}}
            us = []
            t_sum = mp.zeros((sdp.dual_dim,), K, dtype,
                             scaled=sdp.b.scaled)
            for i, bk in enumerate(sdp.buckets):
                u = S_solvers[i].solve(linalg.col(dx_rhss[i]), n_refine)
                us.append(u)
                t_sum = mp.add(t_sum, mp.sum_(
                    linalg.matmul(bk.Bmat.mT, u)[..., 0], axis=0))
            dy = Q_solver.solve(
                linalg.col(mp.sub(dy_rhs, t_sum)), n_refine)[..., 0]
            dxs = []
            for i, bk in enumerate(sdp.buckets):
                dx = mp.add(us[i], linalg.matmul(
                    SinvBs[i], linalg.col(dy)))[..., 0]
                dxs.append(_row_mask_mp(dx, bk.row_mask))

            # quadratic terms
            half = mp.from_double(np.float64(0.5), K, dtype,
                                  scaled=sdp.b.scaled)
            dd_obj = mp.mul(mp.dot(d_b, dy), half)
            for bk, bs, dc, dB, dx in zip(sdp.buckets, state.buckets, d_cs,
                                          d_Bs, dxs):
                xm = _row_mask_mp(bs.x, bk.row_mask)
                dd_obj = mp.add(dd_obj, mp.mul(
                    mp.sum_(mp.mul(dc, dx), axis=None), half))
                dBy = linalg.matvec(dB, state.y)
                dd_obj = mp.sub(dd_obj, mp.mul(
                    mp.sum_(mp.mul(dBy, dx), axis=None), half))
                dBdy = linalg.matvec(dB, dy)
                dd_obj = mp.sub(dd_obj, mp.mul(
                    mp.sum_(mp.mul(dBdy, xm), axis=None), half))

        total = mp.add(mp.add(objective, d_obj), dd_obj)
        return total, d_obj, dd_obj

    return approx


def save_solver_state(path, frozen: FrozenSchur, factor_limbs: int) -> None:
    """Serialize a FrozenSchur to one .npz (the --writeSolverState analog;
    write_solver_state.cxx writes text blocks per rank — here one
    layout-independent archive)."""
    arrays = {"__factor_limbs": np.asarray(factor_limbs)}

    def put(name, a: MP):
        if hasattr(a, "words"):     # wide: one plane per word (ops.mpwide)
            for g, w in enumerate(a.words):
                arrays[f"{name}.w{g}"] = np.asarray(w.limbs)
                arrays[f"{name}.w{g}.exp"] = np.asarray(w.exp)
            return
        arrays[name] = np.asarray(a.limbs)
        if a.scaled:
            arrays[name + ".exp"] = np.asarray(a.exp)

    for i in range(len(frozen.Ss)):
        put(f"S_{i}", frozen.Ss[i])
        put(f"S_L_{i}", frozen.S_Ls[i])
        put(f"S_dinv_{i}", frozen.S_dinvs[i])
        put(f"SinvB_{i}", frozen.SinvBs[i])
    put("Q", frozen.Q)
    put("Q_L", frozen.Q_L)
    put("Q_dinv", frozen.Q_dinv)
    np.savez(path, **arrays)


def load_solver_state(path) -> Optional[tuple]:
    """(FrozenSchur, factor_limbs) from save_solver_state's npz, or None."""
    import os

    if not os.path.exists(path):
        return None
    data = np.load(path)

    def get(name):
        if f"{name}.w0" in data.files:
            from ..ops.mpwide import MPW

            words = []
            g = 0
            while f"{name}.w{g}" in data.files:
                words.append(MP(jnp.asarray(data[f"{name}.w{g}"]),
                                jnp.asarray(data[f"{name}.w{g}.exp"])))
                g += 1
            return MPW(tuple(words))
        limbs = jnp.asarray(data[name])
        e = name + ".exp"
        exp = jnp.asarray(data[e]) if e in data.files else None
        return MP(limbs, exp)

    nb = sum(1 for k in data.files if k.startswith("S_L_"))
    frozen = FrozenSchur(
        Ss=[get(f"S_{i}") for i in range(nb)],
        S_Ls=[get(f"S_L_{i}") for i in range(nb)],
        S_dinvs=[get(f"S_dinv_{i}") for i in range(nb)],
        SinvBs=[get(f"SinvB_{i}") for i in range(nb)],
        Q=get("Q"), Q_L=get("Q_L"), Q_dinv=get("Q_dinv"))
    return frozen, int(data["__factor_limbs"])


def load_reference_solver_state(solution_dir, sdp, factor_limbs: int,
                                n_refine: int) -> Optional[FrozenSchur]:
    """FrozenSchur from the reference's --writeSolverState TEXT blocks
    (schur_complement_cholesky_<j>.txt + Q_cholesky.txt,
    /root/reference/src/approx_objective/setup_solver.cxx:40-52 /
    write_solver_state.cxx) — drop-in reuse of a reference run's frozen
    solver.  S and Q are reconstructed as L L^T from the full-precision
    factors; S^{-1}B comes from a refined solve against the reconstructed
    S (the schur_off_diagonal_* files carry only the factor-forward solve
    L^{-1}B, which the mixed-precision scheme re-derives anyway).
    Returns None when the directory has no Q_cholesky.txt."""
    import os
    from pathlib import Path

    from ..io.text_blocks import read_text_matrix

    solution_dir = Path(solution_dir)
    if not (solution_dir / "Q_cholesky.txt").exists():
        return None
    K = sdp.b.K
    dtype = sdp.b.dtype
    scaled = sdp.b.scaled
    p = 24 if dtype == jnp.float32 else 53
    K64 = -(-(p * K) // 53) + 1

    def stage(out64):
        if scaled and K > 9:
            from ..ops.mpwide import f64_limbs_to_wide_parts, wide_parts_to_mp

            return wide_parts_to_mp(f64_limbs_to_wide_parts(out64, K))
        if scaled:
            limbs, exp = mp.f64_limbs_to_scaled_parts(out64, K)
            return MP(jnp.asarray(limbs), jnp.asarray(exp))
        npdt = np.float32 if dtype == jnp.float32 else np.float64
        return MP(jnp.asarray(mp.f64_limbs_to_classic(out64, K, npdt),
                              dtype=dtype))

    def lower_of(arr64):
        """Text factors may be stored upper (the reference Choleskys Q in
        the UPPER triangle): transpose to lower by content."""
        strict_upper = np.triu(np.abs(arr64).sum(axis=0), 1).sum()
        strict_lower = np.tril(np.abs(arr64).sum(axis=0), -1).sum()
        return arr64 if strict_lower >= strict_upper else \
            np.swapaxes(arr64, -1, -2)

    Ss, S_Ls, S_dinvs, SinvBs = [], [], [], []
    for bk in sdp.buckets:
        sh = bk.shape
        B = bk.batch
        P = sh.schur_size
        out = np.zeros((K64, B, P, P), np.float64)
        for i, rs in enumerate(bk.real_sizes):
            if rs.block_index < 0:
                out[0, i] = np.eye(P)
                continue
            P_real = sh.n_pairs * rs.num_points
            arr = read_text_matrix(
                solution_dir
                / f"schur_complement_cholesky_{rs.block_index}.txt",
                K64, np.float64, expect_shape=(P_real, P_real))
            arr = lower_of(arr)
            if P_real == P:
                out[:, i] = arr
            else:
                # shape-padded constraint rows carry identity (the
                # _schur_complement padding convention)
                o4 = out[:, i].reshape(K64, sh.n_pairs, sh.num_points,
                                       sh.n_pairs, sh.num_points)
                a4 = arr.reshape(K64, sh.n_pairs, rs.num_points,
                                 sh.n_pairs, rs.num_points)
                o4[:, :, :rs.num_points, :, :rs.num_points] = a4
                pad = np.arange(P).reshape(sh.n_pairs, sh.num_points)[
                    :, rs.num_points:].ravel()
                out[0, i, pad, pad] = 1.0
        L = stage(out)
        S = linalg.matmul(L, L.mT)
        ssol = linalg.PosdefSolver(S, factor_limbs)
        Ss.append(S)
        S_Ls.append(ssol.L)
        S_dinvs.append(ssol.dinv)
        SinvBs.append(ssol.solve(bk.Bmat, n_refine))
    N = sdp.dual_dim
    q64 = lower_of(read_text_matrix(solution_dir / "Q_cholesky.txt",
                                    K64, np.float64, expect_shape=(N, N)))
    QL = stage(q64)
    Q = linalg.matmul(QL, QL.mT)
    qsol = linalg.PosdefSolver(Q, factor_limbs)
    return FrozenSchur(Ss=Ss, S_Ls=S_Ls, S_dinvs=S_dinvs, SinvBs=SinvBs,
                       Q=Q, Q_L=qsol.L, Q_dinv=qsol.dinv)


def stage_host_mp(arr, scaled_limbs: int = 0, dtype=None):
    """Host limb stack -> device MP in the requested representation
    (classic when scaled_limbs == 0; scaled/wide exponent-tracked f32
    otherwise — the TPU numerics, models.sdp._stage analog)."""
    import jax.numpy as _jnp

    from ..ops import mpfloat as _mp

    if not scaled_limbs:
        return MP(jnp.asarray(arr, dtype=dtype) if dtype is not None
                  else jnp.asarray(arr))
    if scaled_limbs > 9:
        from ..ops.mpwide import f64_limbs_to_wide_parts, wide_parts_to_mp

        return wide_parts_to_mp(f64_limbs_to_wide_parts(arr, scaled_limbs))
    limbs, exp = _mp.f64_limbs_to_scaled_parts(np.asarray(arr, np.float64),
                                               scaled_limbs)
    return MP(_jnp.asarray(limbs), _jnp.asarray(exp))


def sdp_delta_buckets(sdp_dev: DeviceSDP, host_old, host_new, K, np_dtype,
                      scaled_limbs: int = 0):
    """d_c/d_B bucketed like sdp_dev (the Axpy(-1, old, new) analog,
    approx_objective/Axpy.cxx).  Requires identical block structure.
    scaled_limbs > 0 stages to the scaled/wide TPU representation (host
    limbs must then be float64, as in models.sdp.build_device_sdp)."""
    old_by_index = {b.index: b for b in host_old.blocks}
    new_by_index = {b.index: b for b in host_new.blocks}
    d_cs, d_Bs = [], []
    for bk in sdp_dev.buckets:
        sh = bk.shape
        B = bk.batch
        N = sdp_dev.dual_dim
        dc = np.zeros((K, B, sh.schur_size), dtype=np_dtype)
        dB = np.zeros((K, B, sh.schur_size, N), dtype=np_dtype)
        for i, rs in enumerate(bk.real_sizes):
            if rs.block_index < 0:
                continue
            ob = old_by_index[rs.block_index]
            nb = new_by_index[rs.block_index]
            if ob.B.shape != nb.B.shape:
                raise ValueError(
                    f"block {rs.block_index}: shapes differ between sdp "
                    f"and newSdp ({ob.B.shape} vs {nb.B.shape})")
            n_pairs = sh.n_pairs
            dc_r = (nb.c - ob.c).reshape(K, n_pairs, rs.num_points)
            dc[:, i].reshape(K, n_pairs, sh.num_points)[:, :, :rs.num_points] = dc_r
            dB_r = (nb.B - ob.B).reshape(K, n_pairs, rs.num_points, N)
            dB[:, i].reshape(K, n_pairs, sh.num_points, N)[:, :, :rs.num_points] = dB_r
        d_cs.append(stage_host_mp(dc, scaled_limbs))
        d_Bs.append(stage_host_mp(dB, scaled_limbs))
    return d_cs, d_Bs
