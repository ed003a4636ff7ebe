"""Parity of the kernel-safe wide arithmetic (ops.mpwide_kernel) against
mpmath.

These ops are what the Pallas wide-matmul kernel carries on-chip; they
must reproduce the composite path's accuracy class (the correctness
anchor of the reference's default --precision 400 / gap 1e-30 contract,
/root/reference/src/sdp_solve/Solver_Parameters/Solver_Parameters.cxx:18,59-64).

The arithmetic is structurally identical at every word width Kg, and
XLA:CPU compile time of the unrolled graphs grows superlinearly (Kg=9:
>10 min per op, measured; Kg=5: >5 min) — so CPU parity runs at Kg=3
(144-bit wide) where a jitted op compiles in seconds, with staging
through ops.mpwide under a widened wide_config.  The Kg=9 production
width is exercised ON CHIP by the wide TPU solve tests
(tests/test_tpu_solve.py) and was audited element-exactly against a
host IEEE emulation in round 5 (0/4740 elements above 2^-400 relative
error across batched/tiled/accumulated shapes).
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

K = 6           # 2 words x 3 limbs = 144 bits (test-only small width)
Kg = 3
PREC = 24 * K


@pytest.fixture(autouse=True)
def _small_wide(monkeypatch):
    """mpwide's staging normally requires K > 9; the kernel ops are
    width-generic, so stage small wide values through a widened config."""
    monkeypatch.setattr(mpw, "wide_config", lambda k: (2, -(-k // 2)))


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


def rand_wide(rng, shape, decades=6):
    n = int(np.prod(shape)) if shape else 1
    vals = []
    with mpmath.workprec(PREC + 120):
        for _ in range(n):
            x = (mpmath.mpf(rng.uniform(-1, 1))
                 + mpmath.mpf(rng.uniform(-1, 1))
                 * mpmath.mpf(2) ** (-PREC // 2)
                 + mpmath.mpf(rng.uniform(-1, 1))
                 * mpmath.mpf(2) ** (-PREC + 40)) * mpmath.mpf(10) ** int(
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
    a, va = rand_wide(rng, (7,))
    b, vb = rand_wide(rng, (7,))

    @jax.jit
    def f(aw, bw):
        return wk.wmul(aw, bw, Kg)

    p = from_wval(f(to_wval(a), to_wval(b)))
    with mpmath.workprec(PREC + 120):
        check_rel(p, [x * y for x, y in zip(va, vb)], PREC - 22)


def test_wadd_vs_mpmath(rng):
    a, va = rand_wide(rng, (7,))
    b, vb = rand_wide(rng, (7,))

    @jax.jit
    def f(aw, bw):
        return wk.wadd(aw, bw, Kg)

    s = from_wval(f(to_wval(a), to_wval(b)))
    with mpmath.workprec(PREC + 120):
        check_rel(s, [x + y for x, y in zip(va, vb)], PREC - 22)


def test_wide_fma_chain(rng):
    """A short cheap-carry multiply-accumulate chain + one wnormalize
    (the matmul kernel inner loop) holds full-width accuracy."""
    Kd = 3
    a, va = rand_wide(rng, (Kd,), decades=2)
    b, vb = rand_wide(rng, (Kd,), decades=2)

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
        check_rel(got, [expect], PREC - 26)


def test_subnormal_spill_preserves_gap_content(rng):
    """The round-5 bug class: operands whose word-0 content spans beyond
    the ~242-bit f32-normal window (deep coefficient gaps).  The spill
    routing must keep the product exact past the window bound."""
    with mpmath.workprec(PREC + 200):
        va = [mpmath.mpf(3) / 7 + mpmath.mpf(5) / 11 * mpmath.mpf(2) ** -100]
        vb = [mpmath.mpf(1) / 3 + mpmath.mpf(2) ** -90 / 7]
    a = stage_vals(va, (1,))
    b = stage_vals(vb, (1,))

    @jax.jit
    def f(aw, bw):
        return wk.wmul(aw, bw, Kg)

    p = from_wval(f(to_wval(a), to_wval(b)))
    with mpmath.workprec(PREC + 200):
        check_rel(p, [va[0] * vb[0]], PREC - 22)


@pytest.mark.slow
def test_wide_matmul_interpret(rng):
    """The full pallas wide-matmul kernel in interpret mode (CPU) on a
    tiny problem — exercises the BlockSpec plumbing, padding, grid
    reduction and the canonicalization wrapper end to end.  Slow: the
    interpret-mode body compiles as plain XLA:CPU (minutes)."""
    from sdpb_tpu.ops import pallas_kernels as pk

    B, M, Kd, N = 1, 2, 2, 2
    a, va = rand_wide(rng, (B, M, Kd), decades=1)
    b, vb = rand_wide(rng, (B, Kd, N), decades=1)
    out = pk._mp_matmul_pallas_wide(a, b, chunk=2, interpret=True)
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
                    assert rel < mpmath.mpf(2) ** (-(PREC - 26)), float(rel)
