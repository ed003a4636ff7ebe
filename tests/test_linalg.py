"""MP linear algebra vs mpmath ground truth on random SPD systems."""
import mpmath
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdpb_tpu.ops import linalg, mpfloat as mp
from sdpb_tpu.utils.strings import limbs_to_mpf


def mp_from_mpmath(vals, K, np_dtype):
    """vals: nested list of mpmath numbers -> MP array (exact peel-off)."""
    arr = np.asarray(vals, dtype=object)
    flat = arr.reshape(-1)
    limbs = np.zeros((K, flat.size), dtype=np_dtype)
    for i, x in enumerate(flat):
        rem = x
        for k in range(K):
            hi = np_dtype(float(rem))
            limbs[k, i] = hi
            rem = rem - mpmath.mpf(float(hi))
    return mp.MP(jnp.asarray(limbs.reshape((K,) + arr.shape), dtype=np_dtype))


def mp_to_mpmath(a):
    limbs = np.asarray(a.limbs, dtype=np.float64)
    K = limbs.shape[0]
    flat = limbs.reshape(K, -1)
    out = np.empty(flat.shape[1], dtype=object)
    for i in range(flat.shape[1]):
        out[i] = limbs_to_mpf(flat[:, i])
    return out.reshape(limbs.shape[1:])


def rand_mpmath_matrix(rng, shape, prec):
    with mpmath.workprec(prec):
        return [
            [mpmath.mpf(rng.uniform(-1, 1)) + mpmath.mpf(rng.uniform(-1, 1)) * mpmath.mpf(2) ** -40
             for _ in range(shape[1])]
            for _ in range(shape[0])
        ]


CONFIGS = [(np.float32, 5), (np.float64, 2)]


@pytest.mark.parametrize("np_dtype,K", CONFIGS)
def test_matmul(np_dtype, K):
    p = 24 if np_dtype == np.float32 else 53
    rng = np.random.default_rng(0)
    prec = p * K + 64
    with mpmath.workprec(prec):
        A = rand_mpmath_matrix(rng, (7, 150), prec)
        B = rand_mpmath_matrix(rng, (150, 5), prec)
        a = mp_from_mpmath(A, K, np_dtype)
        b = mp_from_mpmath(B, K, np_dtype)
        c = jax.jit(lambda x, y: linalg.matmul(x, y, chunk=64))(a, b)
        got = mp_to_mpmath(c)
        for i in range(7):
            for j in range(5):
                expect = mpmath.fsum(A[i][k] * B[k][j] for k in range(150))
                err = abs(got[i][j] - expect)
                assert err < mpmath.mpf(2) ** (-(p * K - 24)), (i, j, float(err))


@pytest.mark.parametrize("np_dtype,K", CONFIGS)
def test_cholesky_and_solves(np_dtype, K):
    p = 24 if np_dtype == np.float32 else 53
    rng = np.random.default_rng(1)
    n, nrhs, batch = 12, 3, 2
    prec = p * K + 64
    with mpmath.workprec(prec):
        As, Bs = [], []
        for _ in range(batch):
            G = rand_mpmath_matrix(rng, (n, n), prec)
            A = [[mpmath.fsum(G[i][k] * G[j][k] for k in range(n))
                  + (mpmath.mpf(n) if i == j else mpmath.mpf(0))
                  for j in range(n)] for i in range(n)]
            As.append(A)
            Bs.append(rand_mpmath_matrix(rng, (n, nrhs), prec))
        a = mp_from_mpmath(As, K, np_dtype)
        b = mp_from_mpmath(Bs, K, np_dtype)

        L = jax.jit(linalg.cholesky)(a)
        # L L^T == A
        rec = jax.jit(lambda l: linalg.matmul(l, l.mT))(L)
        rec_v = mp_to_mpmath(rec)
        tol = mpmath.mpf(2) ** (-(p * K - 28))
        for bi in range(batch):
            amax = max(abs(As[bi][i][j]) for i in range(n) for j in range(n))
            for i in range(n):
                for j in range(n):
                    assert abs(rec_v[bi][i][j] - As[bi][i][j]) / amax < tol

        # strictly lower respected: upper triangle must be exactly zero
        Lv = np.asarray(mp.to_float_array(L))
        assert np.all(np.triu(Lv, 1) == 0)

        # cholesky_solve: A X = B
        X = jax.jit(linalg.cholesky_solve)(L, b)
        AX = jax.jit(linalg.matmul)(a, X)
        AXv = mp_to_mpmath(AX)
        for bi in range(batch):
            for i in range(n):
                for j in range(nrhs):
                    # conditioning costs some bits; require most of them
                    assert abs(AXv[bi][i][j] - Bs[bi][i][j]) < mpmath.mpf(2) ** (-(p * K - 40))


@pytest.mark.parametrize("np_dtype,K", CONFIGS)
def test_solve_lower_roundtrip(np_dtype, K):
    p = 24 if np_dtype == np.float32 else 53
    rng = np.random.default_rng(2)
    n, m = 9, 4
    prec = p * K + 64
    with mpmath.workprec(prec):
        Lm = rand_mpmath_matrix(rng, (n, n), prec)
        for i in range(n):
            Lm[i][i] = abs(Lm[i][i]) + mpmath.mpf(1)
            for j in range(i + 1, n):
                Lm[i][j] = mpmath.mpf(0)
        Bm = rand_mpmath_matrix(rng, (n, m), prec)
        L = mp_from_mpmath(Lm, K, np_dtype)
        B = mp_from_mpmath(Bm, K, np_dtype)
        X = jax.jit(linalg.solve_lower)(L, B)
        LX = jax.jit(linalg.matmul)(L, X)
        LXv = mp_to_mpmath(LX)
        for i in range(n):
            for j in range(m):
                assert abs(LXv[i][j] - Bm[i][j]) < mpmath.mpf(2) ** (-(p * K - 30))
        # transpose solve
        Xt = jax.jit(linalg.solve_lower_T)(L, B)
        LtXt = jax.jit(lambda l, x: linalg.matmul(l.mT, x))(L, Xt)
        LtXtv = mp_to_mpmath(LtXt)
        for i in range(n):
            for j in range(m):
                assert abs(LtXtv[i][j] - Bm[i][j]) < mpmath.mpf(2) ** (-(p * K - 30))


def test_trace_frobenius_symmetrize():
    K, np_dtype = 2, np.float64
    rng = np.random.default_rng(3)
    A = rng.standard_normal((4, 4))
    B = rng.standard_normal((4, 4))
    a = mp.from_double(A, K, jnp.float64)
    b = mp.from_double(B, K, jnp.float64)
    from fractions import Fraction as F

    tr = np.asarray(mp.to_double(linalg.trace(a)))
    tr_exact = float(sum(F(A[i, i]) for i in range(4)))
    assert abs(tr - tr_exact) < 1e-25
    fr = np.asarray(mp.to_double(linalg.frobenius(a, b)))
    fr_exact = float(sum(F(x) * F(y) for x, y in zip(A.ravel(), B.ravel())))
    assert abs(fr - fr_exact) < 1e-24
    s = np.asarray(mp.to_double(linalg.symmetrize(a)))
    np.testing.assert_allclose(s, (A + A.T) / 2, rtol=0, atol=1e-25)


def test_min_eigenvalue_estimate():
    rng = np.random.default_rng(4)
    n = 16
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w = np.sort(rng.uniform(-2.0, 3.0, n))
    A = (Q * w) @ Q.T
    a = mp.from_double(A, 2, jnp.float64)
    est = float(np.asarray(linalg.min_eigenvalue_estimate(a)))
    assert abs(est - w[0]) < 1e-6 * max(1, abs(w[0]))
