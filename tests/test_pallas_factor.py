"""Parity of the Pallas factorization kernels (interpret mode on CPU).

The Cholesky / triangular-solve kernels replace the XLA fori_loop
factorizations in ops.linalg (per-block El::Cholesky / El::Trsm of the
reference, initialize_Q_group.cxx:31-67).  Interpret mode evaluates the
same kernel program with XLA ops, so these tests pin the kernel's MP
semantics machine-independently; the Mosaic lowering itself is covered by
the on-TPU tests in test_pallas_kernels.py.

Checks are against mpmath on the exact staged inputs: residual
|L L^T - A| / |A| and |T X - B| / |B| within the K-limb tolerance, plus
agreement with the XLA path at the same tolerance.
"""
import mpmath
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdpb_tpu.ops import linalg, mpfloat as mp
from sdpb_tpu.ops import pallas_kernels as pk
from sdpb_tpu.ops.mpfloat import MP
from sdpb_tpu.utils.strings import limbs_to_mpf, scaled_limbs_to_mpf


def _spd_host(n, B, seed, spread=0.0):
    """Random SPD batch [B, n, n] in f64; `spread` decades of diagonal
    grading to exercise the scaled representation's exponent range."""
    rng = np.random.default_rng(seed)
    G = rng.standard_normal((B, n, n))
    A = G @ np.swapaxes(G, -1, -2) + n * np.eye(n)
    if spread:
        d = 10.0 ** rng.uniform(-spread, spread, size=(B, n))
        A = A * d[:, :, None] * d[:, None, :]
    # exact symmetry (graded scaling rounds the two triangles differently;
    # the solver guarantees symmetric inputs via linalg.symmetrize, and
    # both factorization paths read only the lower triangle)
    return (A + np.swapaxes(A, -1, -2)) / 2


def _stage(A, K, scaled):
    if scaled:
        limbs, exp = mp.f64_to_scaled_parts(A, K)
        return MP(jnp.asarray(limbs), jnp.asarray(exp))
    return mp.from_double(A.astype(np.float64), K, jnp.float32)


def _entry(a: MP, idx):
    l = np.asarray(a.limbs)
    if a.scaled:
        return scaled_limbs_to_mpf(l[(slice(None),) + idx],
                                   np.asarray(a.exp)[idx])
    return limbs_to_mpf(l[(slice(None),) + idx])


def _as_mpmath(a: MP):
    B, n, m = a.shape
    return [[[_entry(a, (b, i, j)) for j in range(m)] for i in range(n)]
            for b in range(B)]


@pytest.mark.parametrize("scaled", [False, True])
def test_cholesky_kernel_parity(scaled):
    K, B, n = 3, 2, 16
    A = _spd_host(n, B, seed=1, spread=6.0 if scaled else 0.0)
    a = _stage(A, K, scaled)

    L = pk.mp_cholesky(a, interpret=True)
    Lx = linalg.cholesky(a)

    tol = mpmath.mpf(2) ** (-24 * K + 14)
    with mpmath.workprec(24 * K + 80):
        Am = _as_mpmath(a)
        Lm = _as_mpmath(L)
        Lxm = _as_mpmath(Lx)
        for b in range(B):
            for i in range(n):
                for j in range(n):
                    rec = mpmath.fsum(Lm[b][i][t] * Lm[b][j][t]
                                      for t in range(min(i, j) + 1))
                    scale = abs(Am[b][i][i] * Am[b][j][j]) ** mpmath.mpf(0.5)
                    assert abs(rec - Am[b][i][j]) / scale < tol, (b, i, j)
                    if j <= i:
                        ds = abs(Lxm[b][i][j]) + scale ** mpmath.mpf(0.5)
                        assert abs(Lm[b][i][j] - Lxm[b][i][j]) / ds < tol


@pytest.mark.parametrize("scaled", [False, True])
def test_matmul_kernel_parity(scaled):
    """Unified matmul kernel vs the XLA fallback (ops.linalg.matmul),
    including the scaled (exponent-tracked) representation the production
    TPU path runs."""
    K, B, M, Kd, N = 3, 2, 8, 12, 8
    rng = np.random.default_rng(11)
    spread = 6.0 if scaled else 0.0
    Ah = rng.standard_normal((B, M, Kd)) * 10.0 ** rng.uniform(
        -spread, spread, (B, M, Kd))
    Bh = rng.standard_normal((B, Kd, N)) * 10.0 ** rng.uniform(
        -spread, spread, (B, Kd, N))
    a = _stage(Ah, K, scaled)
    b = _stage(Bh, K, scaled)

    out = pk.mp_matmul(a, b, interpret=True)
    ref = linalg.matmul(a, b)

    tol = mpmath.mpf(2) ** (-24 * K + 18)
    with mpmath.workprec(24 * K + 80):
        Om = _as_mpmath(out)
        Rm = _as_mpmath(ref)
        Am = _as_mpmath(a)
        Bm = _as_mpmath(b)
        for bi in range(B):
            for i in range(M):
                for j in range(N):
                    exact = mpmath.fsum(Am[bi][i][t] * Bm[bi][t][j]
                                        for t in range(Kd))
                    scale = mpmath.fsum(abs(Am[bi][i][t] * Bm[bi][t][j])
                                        for t in range(Kd))
                    assert abs(Om[bi][i][j] - exact) / scale < tol, (bi, i, j)
                    assert abs(Om[bi][i][j] - Rm[bi][i][j]) / scale < tol


@pytest.mark.parametrize("scaled", [False, True])
def test_trsm_kernel_parity(scaled):
    K, B, n, m = 3, 2, 16, 8
    A = _spd_host(n, B, seed=2, spread=4.0 if scaled else 0.0)
    rng = np.random.default_rng(3)
    Bh = rng.standard_normal((B, n, m))
    a = _stage(A, K, scaled)
    bmat = _stage(Bh, K, scaled)

    L = pk.mp_cholesky(a, interpret=True)
    X = pk.mp_solve_triangular(L, bmat, lower=True, interpret=True)
    Y = pk.mp_solve_triangular(L.mT, X, lower=False, interpret=True)

    # XLA-path references on the same factor
    Xx = linalg.solve_lower(L, bmat)
    Yx = linalg.solve_lower_T(L, Xx)

    tol = mpmath.mpf(2) ** (-24 * K + 16)
    with mpmath.workprec(24 * K + 80):
        Lm = _as_mpmath(L)
        Bm = _as_mpmath(bmat)
        Xm = _as_mpmath(X)
        for b in range(B):
            for i in range(n):
                for j in range(m):
                    # forward solve residual: (L X)[i,j] == B[i,j], scaled
                    # by the backward-stable bound sum_t |L[i,t] X[t,j]|
                    # (under grading this exceeds |B| where terms cancel)
                    rec = mpmath.fsum(Lm[b][i][t] * Xm[b][t][j]
                                      for t in range(i + 1))
                    scale = mpmath.fsum(abs(Lm[b][i][t] * Xm[b][t][j])
                                        for t in range(i + 1)) + abs(Bm[b][i][j])
                    assert abs(rec - Bm[b][i][j]) / scale < tol, (b, i, j)
        # backward solve residual: (L^T Y)[i,j] == X[i,j], same scaling
        Ym = _as_mpmath(Y)
        for b in range(B):
            for i in range(n):
                for j in range(m):
                    rec = mpmath.fsum(Lm[b][t][i] * Ym[b][t][j]
                                      for t in range(i, n))
                    scale = mpmath.fsum(abs(Lm[b][t][i] * Ym[b][t][j])
                                        for t in range(i, n)) + abs(Xm[b][i][j])
                    assert abs(rec - Xm[b][i][j]) / scale < tol, (b, i, j)
        # and the two implementations agree at the solution level (same
        # factor, same algorithmic order -> differences stay near renorm
        # level; condition-number slack is folded into a looser bound)
        Yxm = _as_mpmath(Yx)
        yscale = max(abs(Yxm[b][i][j]) for b in range(B) for i in range(n)
                     for j in range(m))
        worst = max(abs(Ym[b][i][j] - Yxm[b][i][j]) for b in range(B)
                    for i in range(n) for j in range(m))
        assert worst / yscale < mpmath.mpf(2) ** (-24 * (K - 1)), worst


@pytest.mark.parametrize("scaled", [False, True])
def test_matmul_kernel_broadcast_batch(scaled):
    """>4-D call sites with BROADCAST batch axes reach the kernel via
    _canon_batched_pair: [B, npairs, h, Kd] x [B, 1, Kd, N] — the
    constraint_matrix_weighted_sum shape (step.py) whose XLA fallback
    lowers to a term-count while loop on TPU (the round-4 profile's 72%
    hot spot).  Parity vs the XLA matmul on the same operands."""
    K, B, P, h, Kd, N = 3, 2, 2, 5, 7, 5
    rng = np.random.default_rng(23)
    spread = 4.0 if scaled else 0.0
    Wh = rng.standard_normal((B, P, h, Kd)) * 10.0 ** rng.uniform(
        -spread, spread, (B, P, h, Kd))
    Bh = rng.standard_normal((B, 1, Kd, N))
    a = _stage(Wh, K, scaled)
    b = _stage(Bh, K, scaled)

    out = pk.mp_matmul(a, b, interpret=True)
    assert out.shape == (B, P, h, N)
    ref = linalg.matmul(a, b)

    tol = mpmath.mpf(2) ** (-24 * K + 18)
    with mpmath.workprec(24 * K + 80):
        for bi in range(B):
            for p in range(P):
                for i in range(h):
                    for j in range(N):
                        o = _entry(out, (bi, p, i, j))
                        r = _entry(ref, (bi, p, i, j))
                        terms = [_entry(a, (bi, p, i, t))
                                 * _entry(b, (bi, 0, t, j))
                                 for t in range(Kd)]
                        exact = mpmath.fsum(terms)
                        scale = mpmath.fsum(abs(t) for t in terms) + tol
                        assert abs(o - exact) / scale < tol, (bi, p, i, j)
                        assert abs(o - r) / scale < tol, (bi, p, i, j)
