"""Dense linear algebra on MP (multi-limb) arrays.

These are the TPU-native replacements for the Elemental distributed BLAS
the reference leans on (El::Gemm/Trsm/Syrk/Cholesky/HermitianEig over
El::BigFloat DistMatrices — e.g.
/root/reference/src/sdp_solve/SDP_Solver/run/step/initialize_schur_complement_solver/initialize_Q_group.cxx:31-67).

Design notes:
  * All routines operate on batched blocks: shapes [..., n, m] with leading
    batch axes, so a whole bucket of same-shape SDP blocks is processed by
    one fused XLA computation (the analog of SDPB's per-block MPI loop).
  * Sequential factorizations use lax.fori_loop with masked whole-matrix
    updates — the trace stays O(1) in the matrix size, and every step is a
    fully vectorized rank-1 / row update.
  * No data-dependent control flow; padded batch entries must be arranged
    by the caller so factorizations stay well-defined (e.g. identity blocks).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import mpfloat as mp
from .mpfloat import MP


# ---------------------------------------------------------------------------
# Products


def matmul(a: MP, b: MP, chunk: int = 128) -> MP:
    """a @ b with full MP precision: a [..., M, Kd], b [..., Kd, N].

    On TPU, batched float32 operands that fit VMEM go through the Pallas
    kernel (accumulator resident on-chip; see ops.pallas_kernels).  The
    XLA fallback computes elementwise MP products tree-reduced over the
    contraction axis, chunked to bound the [..., M, chunk, N] intermediate.
    """
    Kd = a.shape[-1]
    assert b.shape[-2] == Kd, (a.shape, b.shape)
    from . import pallas_kernels as pk

    if pk.pallas_matmul_viable(a, b):
        return pk.mp_matmul(a, b)
    # the vectorized MP product materializes ~2K^2 term arrays of the
    # [..., M, chunk, N] intermediate; bound the footprint at high K
    if a.K >= 6:
        chunk = max(4, (chunk * 25) // (a.K * a.K))

    def _expand(x: MP, y: MP) -> MP:
        # x [..., M, c] -> [..., M, c, 1]; y [..., c, N] -> [..., 1, c, N]
        xe = mp.expand_dims(x, -1)
        ye = mp.expand_dims(y, -3)
        terms = mp.mul(xe, ye)
        return mp.sum_(terms, axis=terms.ndim - 2)

    if Kd <= chunk:
        return _expand(a, b)

    nchunks = -(-Kd // chunk)
    pad = nchunks * chunk - Kd
    if pad:
        a = mp.pad_dim(a, axis=a.ndim - 1, count=pad)
        b = mp.pad_dim(b, axis=b.ndim - 2, count=pad)

    def body(i, acc):
        sl_a = mp.dynamic_slice_in_dim(a, i * chunk, chunk, axis=a.ndim - 1)
        sl_b = mp.dynamic_slice_in_dim(b, i * chunk, chunk, axis=b.ndim - 2)
        return mp.add(acc, _expand(sl_a, sl_b))

    out_shape = a.shape[:-1] + (b.shape[-1],)
    acc0 = mp.zeros(out_shape, a.K, a.dtype, scaled=a.scaled)
    return jax.lax.fori_loop(0, nchunks, body, acc0)


def col(x: MP) -> MP:
    """Append a trailing singleton axis: [..., n] -> [..., n, 1]."""
    return mp.expand_dims(x, -1)


def matvec(a: MP, x: MP, chunk: int = 128) -> MP:
    return matmul(a, col(x), chunk=chunk)[..., 0]


def outer(u: MP, v: MP) -> MP:
    return mp.mul(mp.expand_dims(u, -1), mp.expand_dims(v, -2))


def symmetrize(a: MP) -> MP:
    """(A + A^T)/2, mirroring Block_Diagonal_Matrix::symmetrize
    (/root/reference/src/sdp_solve/Block_Diagonal_Matrix.hxx)."""
    return mp.mul_pow2(mp.add(a, a.mT), np.float64(0.5))


def frobenius(a: MP, b: MP) -> MP:
    """Tr(A B) for symmetric A, B = elementwise dot over the last two axes."""
    prod = mp.mul(a, b)
    flat = prod.reshape(tuple(prod.shape[:-2]) + (prod.shape[-2] * prod.shape[-1],))
    return mp.sum_(flat, axis=flat.ndim - 1)


def trace(a: MP) -> MP:
    d = mp.diagonal(a)
    return mp.sum_(d, axis=d.ndim - 1)


def row(x: MP) -> MP:
    """Prepend a singleton row axis: [..., m] -> [..., 1, m]."""
    return mp.expand_dims(x, -2)


# ---------------------------------------------------------------------------
# Cholesky


def cholesky(A: MP) -> MP:
    """Lower Cholesky of SPD blocks A [..., n, n] (batched).

    Right-looking, one lax.fori_loop step per column with masked rank-1
    updates.  Mirrors cholesky_decomposition in the reference
    (/root/reference/src/sdp_solve/SDP_Solver/run/cholesky_decomposition.cxx).

    One rsqrt Newton chain per column provides both the diagonal sqrt
    (d = d2 * r) and the column scaling (1/d = r), keeping the loop body —
    and hence the XLA graph — half the size of a sqrt + reciprocal pair.

    On TPU, float32 batches that fit VMEM run as a single Pallas kernel
    (whole factorization on-chip, one custom call; see ops.pallas_kernels).
    """
    from . import pallas_kernels as pk

    if pk.pallas_cholesky_viable(A):
        return pk.mp_cholesky(A)
    n = A.shape[-1]
    row_idx = jnp.arange(n)

    def body(j, carry):
        M, L = carry
        colM = mp.take(M, j, axis=M.ndim - 1)       # [..., n]
        d2 = mp.take(colM, j, axis=colM.ndim - 1)   # [...]
        r = mp.rsqrt(d2)                    # 1/sqrt(d2)
        d = mp.mul(d2, r)                   # sqrt(d2)
        colj = mp.mul(colM, col(r))
        col_below = mp.mask_value(colj, row_idx > j)
        # L column j: d on the diagonal, scaled entries below
        colL = mp.where(row_idx == j, mp.broadcast_to(col(d), colj.shape), col_below)
        L = mp.where(row_idx == j, col(colL), L)    # write column j
        # trailing update M -= col_below col_below^T
        M = mp.sub(M, outer(col_below, col_below))
        return M, L

    L0 = mp.zeros(A.shape, A.K, A.dtype, scaled=A.scaled)
    _, L = jax.lax.fori_loop(0, n, body, (A, L0))
    return L


def _diag_mp(L: MP) -> MP:
    """Diagonal of [..., n, n] as [..., n]."""
    return mp.diagonal(L)


# ---------------------------------------------------------------------------
# Triangular solves


def solve_lower(L: MP, B: MP, diag_inv: MP = None) -> MP:
    """X = L^{-1} B by forward substitution; L [..., n, n] lower, B [..., n, m].

    The reference's El::Trsm(LEFT, LOWER, NORMAL) analog.  The diagonal
    reciprocals are computed once, vectorized over all columns, OUTSIDE the
    fori_loop — removing the Newton iteration from the loop body keeps the
    XLA graph small (compile time) and the VPU work per step low.

    TPU float32 batches go through the Pallas substitution kernel.
    """
    from . import pallas_kernels as pk

    if pk.pallas_trsm_viable(L, B):
        return pk.mp_solve_triangular(L, B, lower=True)
    n = L.shape[-1]
    row_idx = jnp.arange(n)
    dinv = mp.reciprocal(_diag_mp(L)) if diag_inv is None else diag_inv  # [..., n]

    def body(i, X):
        Lrow = mp.take(L, i, axis=L.ndim - 2)        # [..., n]
        di = mp.take(dinv, i, axis=dinv.ndim - 1)    # [...]
        # acc = sum_{k<i} L[i,k] X[k,:]
        terms = mp.mask_value(mp.mul(col(Lrow), X), (row_idx < i)[:, None])
        acc = mp.sum_(terms, axis=terms.ndim - 2)    # [..., m]
        Brow = mp.take(B, i, axis=B.ndim - 2)
        xi = mp.mul(mp.sub(Brow, acc), col(di))
        X = mp.where((row_idx == i)[:, None], row(xi), X)
        return X

    X0 = mp.zeros(B.shape, B.K, B.dtype, scaled=B.scaled)
    return jax.lax.fori_loop(0, n, body, X0)


def solve_lower_T(L: MP, B: MP, diag_inv: MP = None) -> MP:
    """X = L^{-T} B by backward substitution (El::Trsm LEFT, LOWER, TRANSPOSE)."""
    from . import pallas_kernels as pk

    if pk.pallas_trsm_viable(L, B):
        return pk.mp_solve_triangular(L.mT, B, lower=False)
    n = L.shape[-1]
    row_idx = jnp.arange(n)
    dinv = mp.reciprocal(_diag_mp(L)) if diag_inv is None else diag_inv

    def body(k, X):
        i = n - 1 - k
        Lcol = mp.take(L, i, axis=L.ndim - 1)        # [..., n] = L[:, i]
        di = mp.take(dinv, i, axis=dinv.ndim - 1)
        terms = mp.mask_value(mp.mul(col(Lcol), X), (row_idx > i)[:, None])
        acc = mp.sum_(terms, axis=terms.ndim - 2)
        Brow = mp.take(B, i, axis=B.ndim - 2)
        xi = mp.mul(mp.sub(Brow, acc), col(di))
        X = mp.where((row_idx == i)[:, None], row(xi), X)
        return X

    X0 = mp.zeros(B.shape, B.K, B.dtype, scaled=B.scaled)
    return jax.lax.fori_loop(0, n, body, X0)


def cholesky_solve(L: MP, B: MP) -> MP:
    """A^{-1} B given A = L L^T (El::cholesky::SolveAfter analog).
    The diagonal reciprocal is shared by both triangular solves."""
    dinv = mp.reciprocal(_diag_mp(L))
    return solve_lower_T(L, solve_lower(L, B, dinv), dinv)


# ---------------------------------------------------------------------------
# Mixed-precision iterative refinement
#
# The TPU-native replacement for running Elemental's O(n^3) factorizations
# at full GMP precision (the reference's dominant cost): factor once in
# LOW precision (K_f limbs, typically 2 = double-double), then recover full
# K-limb accuracy by refining with residuals computed in full precision.
# Each pass contracts the error by ~cond(A) * 2^-(p*K_f), so
# ceil(K/K_f) + 1 passes suffice while cond(A) stays well below 2^(p*K_f).
# Sequential trsm loops run at K_f only — the XLA graph size and the
# loop-dominated runtime become independent of the target precision, and
# the full-precision work is batched matmuls (MXU-shaped).


class PosdefSolver:
    """Low-precision Cholesky factor of an SPD MP matrix, with
    full-precision refined solves against the original matrix.

    Optional Jacobi equilibration with EXACT power-of-two scales
    s_i ~ 1/sqrt(diag_ii) is available for diagonally-graded matrices, but
    is OFF by default: for the IPM's Schur complement S (a Gram matrix of
    sampled constraints) diagonal scaling empirically RAISES the effective
    condition number — its tiny eigenvalues come from near-dependence
    among large-diagonal rows, so compressing those rows pushes lambda_min
    down faster than lambda_max.  Range is instead bought with
    factor_limbs ~ K/2 + 1 (see solver.solve)."""

    def __init__(self, A: MP, factor_limbs: int = 2, equilibrate: bool = False):
        self.A = A
        if equilibrate and A.scaled:
            raise NotImplementedError(
                "equilibration is unnecessary with exponent-tracked limbs")
        if equilibrate:
            d0 = jnp.abs(jnp.diagonal(A.limbs[0], axis1=-2, axis2=-1))  # [.., n]
            d0 = jnp.where((d0 > 0) & jnp.isfinite(d0), d0, 1.0)
            # scale_i = 2^(-round(log2 d_i / 2)), clamped to the dtype's range
            max_e = float(np.finfo(A.dtype).maxexp - 8)
            e = jnp.clip(jnp.round(jnp.log2(d0) / 2.0), -max_e / 2, max_e / 2)
            self.scale = jnp.exp2(-e).astype(A.dtype)
            As = MP(A.limbs * (self.scale[..., :, None] * self.scale[..., None, :]))
        else:
            self.scale = None
            As = A
        self.L = cholesky(mp.round_to(As, factor_limbs))
        self.dinv = mp.reciprocal(_diag_mp(self.L))
        self.Kf = factor_limbs

    @classmethod
    def from_parts(cls, A: MP, L: MP, dinv: MP, factor_limbs: int):
        """Reassemble from precomputed parts (deserialized frozen solver
        state; the approx_objective --writeSolverState reuse path, mirroring
        /root/reference/src/approx_objective/setup_solver.cxx:40-52)."""
        self = cls.__new__(cls)
        self.A = A
        self.scale = None
        self.L = L
        self.dinv = dinv
        self.Kf = factor_limbs
        return self

    def _row_scale(self, B: MP) -> MP:
        if self.scale is None:
            return B
        return MP(B.limbs * self.scale[..., :, None])

    def solve_lo(self, B_lo: MP) -> MP:
        """A_lo^{-1} B at factor precision: A^{-1} = D As^{-1} D with
        D = diag(scale)."""
        t = self._row_scale(B_lo)
        u = solve_lower_T(self.L, solve_lower(self.L, t, self.dinv), self.dinv)
        return self._row_scale(u)

    def solve(self, B: MP, n_refine: int) -> MP:
        """A^{-1} B at B's full precision via iterative refinement.

        The refinement runs as a fori_loop so its body (a full-K matmul +
        one low-precision solve) is traced once per call site regardless
        of the pass count — unrolling would multiply the XLA graph by
        n_refine (measured on TPU: no runtime gain from unrolling; the
        body's Pallas calls dominate, not the while toll)."""
        K = B.K
        x0 = mp.round_to(self.solve_lo(mp.round_to(B, self.Kf)), K)
        if n_refine == 0:
            return x0

        def body(_, x):
            r = mp.sub(B, matmul(self.A, x))
            dx = self.solve_lo(mp.round_to(r, self.Kf))
            return mp.add(x, mp.round_to(dx, K))

        return jax.lax.fori_loop(0, n_refine, body, x0)


# ---------------------------------------------------------------------------
# Eigen bounds (step length)


def min_eigenvalue_estimate(A: MP):
    """Estimate of lambda_min of symmetric blocks A [..., n, n] in the BASE
    dtype.  The IPM step length only needs a few correct digits (it is
    multiplied by stepLengthReduction=0.7 anyway;
    /root/reference/src/sdp_solve/SDP_Solver/run/step/step_length/min_eigenvalue.cxx
    uses a full HermitianEig, overkill for the bound).  Values are rescaled
    by the max magnitude for range safety, then eigvalsh in base precision.
    """
    a = mp.to_float_array(A)
    scale = jnp.max(jnp.abs(a), axis=(-2, -1), keepdims=True)
    safe = jnp.where(scale == 0, 1.0, scale)
    w = jnp.linalg.eigvalsh((a / safe).astype(jnp.float32) if a.dtype == jnp.float32 else a / safe)
    return w[..., 0] * safe[..., 0, 0]
