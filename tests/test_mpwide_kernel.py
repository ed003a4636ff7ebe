"""Parity of the kernel-safe wide arithmetic (ops.mpwide_kernel) against
mpmath.

These ops are what the Pallas wide-matmul kernel carries on-chip; they must
reproduce the composite path's accuracy class (the correctness anchor of
the reference's default --precision 400 / gap 1e-30 contract,
/root/reference/src/sdp_solve/Solver_Parameters/Solver_Parameters.cxx:18,59-64).

Run as plain XLA:CPU (the barrier-pinned tracing the pallas interpret mode
also uses) at Kg=5 (240-bit wide): the arithmetic is structurally identical
at every Kg, and XLA:CPU compile of the Kg=9 unrolled graphs takes >10 min
per op (measured) — the Kg=9 production width is exercised ON CHIP by the
wide TPU solve tests (tests/test_tpu_solve.py) and the bench wide
milestone.
"""
import mpmath
import numpy as np
import pytest

import jax

from sdpb_tpu.ops import mpwide as mpw
from sdpb_tpu.ops import mpwide_kernel as wk
from sdpb_tpu.ops.mpfloat import MP
from sdpb_tpu.ops.mpwide import MPW
from sdpb_tpu.utils.strings import scaled_limbs_to_mpf

K = 10          # wide_config(10) = 2 words x 5 limbs = 240 bits
Kg = 5
PREC = 24 * K


def mpw_to_mpf(a: MPW):
    words = [(np.asarray(w.limbs, np.float64).reshape(w.K, -1),
              np.asarray(w.exp).reshape(-1)) for w in a.words]
    n = words[0][0].shape[1]
    out = []
    with mpmath.workprec(PREC + 120):
        for i in range(n):
            acc = mpmath.mpf(0)
            for wl, we in words:
                acc += scaled_limbs_to_mpf(wl[:, i], we[i])
            out.append(acc)
    return out


def stage_vals(vals, shape):
    K64 = -(-PREC // 53) + 2
    n = len(vals)
    limbs64 = np.zeros((K64, n), dtype=np.float64)
    with mpmath.workprec(PREC + 120):
        for i, x in enumerate(vals):
            rem = x
            for k in range(K64):
                hi = np.float64(float(rem))
                limbs64[k, i] = hi
                rem = rem - mpmath.mpf(float(hi))
    parts = mpw.f64_limbs_to_wide_parts(
        limbs64.reshape((K64,) + tuple(shape)), K)
    return mpw.wide_parts_to_mp(parts)


def rand_wide(rng, shape, decades=20):
    n = int(np.prod(shape)) if shape else 1
    vals = []
    with mpmath.workprec(PREC + 120):
        for _ in range(n):
            mant = mpmath.mpf(rng.uniform(-1, 1))
            extra = (mpmath.mpf(rng.uniform(-1, 1))
                     * mpmath.mpf(2) ** (-PREC // 2))
            tail = (mpmath.mpf(rng.uniform(-1, 1))
                    * mpmath.mpf(2) ** (-PREC + 40))
            x = (mant + extra + tail) * mpmath.mpf(10) ** int(
                rng.integers(-decades, decades + 1))
            vals.append(x)
    return stage_vals(vals, shape), vals


def check_rel(got_mp, expected_vals, tol_bits):
    got = mpw_to_mpf(got_mp)
    with mpmath.workprec(PREC + 120):
        for g, e in zip(got, expected_vals):
            if e == 0:
                assert abs(g) < mpmath.mpf(2) ** (-tol_bits), g
                continue
            rel = abs(g - e) / abs(e)
            assert rel < mpmath.mpf(2) ** (-tol_bits), \
                (float(rel and mpmath.log(rel, 2)), float(e))


def to_wval(a: MPW):
    assert a.G == 2
    return tuple((w.limbs, w.exp) for w in a.words)


def from_wval(wv) -> MPW:
    return MPW(tuple(MP(l, e) for l, e in wv))


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(20260820)


def test_wmul_vs_mpmath(rng):
    a, va = rand_wide(rng, (7,), decades=20)
    b, vb = rand_wide(rng, (7,), decades=20)

    @jax.jit
    def f(aw, bw):
        return wk.wmul(aw, bw, Kg)

    p = from_wval(f(to_wval(a), to_wval(b)))
    with mpmath.workprec(PREC + 120):
        check_rel(p, [x * y for x, y in zip(va, vb)], PREC - 26)


def test_wadd_vs_mpmath(rng):
    a, va = rand_wide(rng, (7,), decades=20)
    b, vb = rand_wide(rng, (7,), decades=20)

    @jax.jit
    def f(aw, bw):
        return wk.wadd(aw, bw, Kg)

    s = from_wval(f(to_wval(a), to_wval(b)))
    with mpmath.workprec(PREC + 120):
        check_rel(s, [x + y for x, y in zip(va, vb)], PREC - 26)


def test_wide_fma_chain(rng):
    """A Kd-term cheap-carry multiply-accumulate chain + one wnormalize
    (the matmul kernel inner loop) holds full-width accuracy."""
    Kd = 9
    a, va = rand_wide(rng, (Kd,), decades=4)
    b, vb = rand_wide(rng, (Kd,), decades=4)

    @jax.jit
    def dot(aw, bw):
        acc = wk.wzeros((), Kg)
        for t in range(Kd):
            at = tuple((l[:, t], e[t]) for l, e in aw)
            bt = tuple((l[:, t], e[t]) for l, e in bw)
            acc = wk.wfma_acc(acc, at, bt, Kg)
        return wk.wnormalize(acc, Kg)

    got = from_wval(dot(to_wval(a), to_wval(b)))
    with mpmath.workprec(PREC + 120):
        expect = sum((x * y for x, y in zip(va, vb)), mpmath.mpf(0))
        check_rel(got, [expect], PREC - 32)


def test_wide_matmul_interpret(rng):
    """The full pallas wide-matmul kernel in interpret mode (CPU) on a
    tiny problem — exercises the BlockSpec plumbing, padding, and the
    canonicalization wrapper end to end."""
    from sdpb_tpu.ops import pallas_kernels as pk

    B, M, Kd, N = 1, 2, 3, 2
    a, va = rand_wide(rng, (B, M, Kd), decades=2)
    b, vb = rand_wide(rng, (B, Kd, N), decades=2)
    out = pk.mp_matmul(a, b, interpret=True)
    got = mpw_to_mpf(out)
    va3 = np.array(va, dtype=object).reshape(B, M, Kd)
    vb3 = np.array(vb, dtype=object).reshape(B, Kd, N)
    with mpmath.workprec(PREC + 120):
        i = 0
        for bb in range(B):
            for m_ in range(M):
                for n_ in range(N):
                    e = sum((va3[bb, m_, t] * vb3[bb, t, n_]
                             for t in range(Kd)), mpmath.mpf(0))
                    g = got[i]
                    i += 1
                    rel = abs(g - e) / abs(e)
                    assert rel < mpmath.mpf(2) ** (-(PREC - 32)), float(rel)
