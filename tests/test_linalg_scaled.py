"""Scaled-mode (exponent-tracked) MP linear algebra on ill-scaled SPD
systems — the regime that raw f32 limbs cannot touch (diagonal spans ~1e30,
solves meet ~1e-30 magnitudes; cf. the IPM's cond(S) ~ max(Omega^2, 1/gap^2)
along its trajectory, VERDICT.md item 2)."""
import mpmath
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdpb_tpu.ops import linalg, mpfloat as mp
from sdpb_tpu.utils.strings import scaled_limbs_to_mpf


def scaled_from_mpmath(vals, K):
    arr = np.asarray(vals, dtype=object)
    flat = arr.reshape(-1)
    K64 = -(-(24 * K) // 53) + 1
    limbs64 = np.zeros((K64, flat.size), dtype=np.float64)
    for i, x in enumerate(flat):
        rem = x
        for k in range(K64):
            hi = np.float64(float(rem))
            limbs64[k, i] = hi
            rem = rem - mpmath.mpf(float(hi))
    limbs, exp = mp.f64_limbs_to_scaled_parts(
        limbs64.reshape((K64,) + arr.shape), K)
    return mp.MP(jnp.asarray(limbs), jnp.asarray(exp))


def scaled_to_mpmath(a):
    limbs = np.asarray(a.limbs, dtype=np.float64)
    exp = np.asarray(a.exp)
    K = limbs.shape[0]
    flat = limbs.reshape(K, -1)
    ef = exp.reshape(-1)
    out = np.empty(flat.shape[1], dtype=object)
    for i in range(flat.shape[1]):
        out[i] = scaled_limbs_to_mpf(flat[:, i], ef[i])
    return out.reshape(limbs.shape[1:])


@pytest.mark.parametrize("K", [5, 9])
def test_cholesky_solve_wide_spectrum(K):
    """A = G diag(10^-15..10^15) G^T: cond ~ 1e30 (needs > 100 bits to
    factor at all), entries spanning ~60 decades in the solve chain."""
    p = 24
    rng = np.random.default_rng(3)
    n, nrhs = 8, 2
    prec = p * K + 96
    with mpmath.workprec(prec):
        G = [[mpmath.mpf(rng.uniform(-1, 1)) for _ in range(n)] for _ in range(n)]
        d = [mpmath.mpf(10) ** (30 * i / (n - 1) - 15) for i in range(n)]
        A = [[mpmath.fsum(G[i][k] * d[k] * G[j][k] for k in range(n))
              for j in range(n)] for i in range(n)]
        B = [[mpmath.mpf(rng.uniform(-1, 1)) for _ in range(nrhs)] for _ in range(n)]
        a = scaled_from_mpmath(A, K)
        b = scaled_from_mpmath(B, K)

        L = jax.jit(linalg.cholesky)(a)
        rec = jax.jit(lambda l: linalg.matmul(l, l.mT))(L)
        rec_v = scaled_to_mpmath(rec)
        amax = max(abs(A[i][j]) for i in range(n) for j in range(n))
        tol = mpmath.mpf(2) ** (-(p * K - 30))
        for i in range(n):
            for j in range(n):
                assert abs(rec_v[i][j] - A[i][j]) / amax < tol, (i, j)

        X = jax.jit(linalg.cholesky_solve)(L, b)
        AX = jax.jit(linalg.matmul)(a, X)
        AXv = scaled_to_mpmath(AX)
        # residual relative to |B| ~ 1: a backward-stable full-K solve
        # leaves residual ~ 2^-pK * cond(A); cond ~ 1e30 costs ~100 bits
        budget = (p * K - 30) - 100
        tol = mpmath.mpf(2) ** (-max(budget, 16))
        for i in range(n):
            for j in range(nrhs):
                assert abs(AXv[i][j] - B[i][j]) < tol, (i, j, float(abs(AXv[i][j] - B[i][j])))


def test_solver_mixed_precision_refinement():
    """PosdefSolver at factor_limbs < K with refinement recovers full-K
    solves on an ill-conditioned scaled system (the production configuration
    of solver.solve: Kf ~ K/2+1, n_refine ~ 2)."""
    K, Kf = 9, 5
    p = 24
    rng = np.random.default_rng(4)
    n = 6
    with mpmath.workprec(p * K + 96):
        G = [[mpmath.mpf(rng.uniform(-1, 1)) for _ in range(n)] for _ in range(n)]
        d = [mpmath.mpf(10) ** (20 * i / (n - 1) - 10) for i in range(n)]
        A = [[mpmath.fsum(G[i][k] * d[k] * G[j][k] for k in range(n))
              for j in range(n)] for i in range(n)]
        B = [[mpmath.mpf(rng.uniform(-1, 1))] for _ in range(n)]
        a = scaled_from_mpmath(A, K)
        b = scaled_from_mpmath(B, K)
        solver = linalg.PosdefSolver(a, factor_limbs=Kf)
        X = jax.jit(lambda bb: solver.solve(bb, n_refine=2))(b)
        AX = jax.jit(linalg.matmul)(a, X)
        AXv = scaled_to_mpmath(AX)
        for i in range(n):
            err = abs(AXv[i][0] - B[i][0])
            assert err < mpmath.mpf(2) ** -150, (i, float(err))
