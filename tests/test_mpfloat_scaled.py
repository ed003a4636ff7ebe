"""Validate the SCALED (per-element exponent) MP representation against
mpmath ground truth.

This is the TPU-native analog of GMP's (mantissa, exponent) pair: float32
mantissa limbs normalized onto the CENTER(K) ladder plus an int32 exponent,
giving up to K=9 (216-bit) precision with unlimited range — the fix for the
round-1 f32 exponent walls (overflow at Omega^2 ~ 1e40, duality-gap floor
~1e-12 from limb-tail underflow; see VERDICT.md item 2).

Values here deliberately span many decades (far beyond what raw f32 limbs
can represent) and include exponent extremes beyond float64's range.
"""
import mpmath
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdpb_tpu.ops import mpfloat as mp
from sdpb_tpu.ops.mpfloat import MP
from sdpb_tpu.utils.strings import scaled_limbs_to_mpf

jadd = jax.jit(mp.add)
jsub = jax.jit(mp.sub)
jmul = jax.jit(mp.mul)
jdiv = jax.jit(mp.div)
jsqrt = jax.jit(mp.sqrt)

GUARD = 16


def rand_scaled(rng, shape, K, decades=40):
    """Random scaled MP with full-precision mantissas over +-`decades`."""
    n = int(np.prod(shape)) if shape else 1
    K64 = -(-(24 * K) // 53) + 1
    limbs64 = np.zeros((K64, n), dtype=np.float64)
    vals = []
    with mpmath.workprec(24 * K + 120):
        for i in range(n):
            mant = mpmath.mpf(rng.uniform(-1, 1))
            extra = mpmath.mpf(rng.uniform(-1, 1)) * mpmath.mpf(2) ** (-24 * K // 2)
            x = (mant + extra) * mpmath.mpf(10) ** rng.integers(-decades, decades + 1)
            vals.append(x)
            rem = x
            for k in range(K64):
                hi = np.float64(float(rem))
                limbs64[k, i] = hi
                rem = rem - mpmath.mpf(float(hi))
    limbs, exp = mp.f64_limbs_to_scaled_parts(
        limbs64.reshape((K64,) + tuple(shape)), K)
    return MP(jnp.asarray(limbs), jnp.asarray(exp)), vals


def check_close(result_mp, expected_vals, tol_bits):
    limbs = np.asarray(result_mp.limbs, dtype=np.float64)
    exp = np.asarray(result_mp.exp)
    K = limbs.shape[0]
    flat = limbs.reshape(K, -1)
    eflat = exp.reshape(-1)
    with mpmath.workprec(30 * K + 128):
        for i, exp_val in enumerate(expected_vals):
            got = scaled_limbs_to_mpf(flat[:, i], eflat[i])
            denom = abs(exp_val) if exp_val != 0 else mpmath.mpf(1)
            err = abs(got - exp_val) / denom
            assert err < mpmath.mpf(2) ** (-tol_bits), (
                f"elem {i}: rel err {mpmath.nstr(err, 5)} exceeds 2^-{tol_bits}"
            )


CONFIGS = [3, 5, 9]


@pytest.mark.parametrize("K", CONFIGS)
def test_roundtrip(K):
    rng = np.random.default_rng(0)
    a, av = rand_scaled(rng, (32,), K)
    check_close(a, av, 24 * K - 2)
    # normalized invariant: top limb exponent == CENTER(K) (nonzero elems)
    C = mp.center_for(K)
    top = np.asarray(a.limbs[0])
    _, e = np.frexp(top)
    assert np.all((e - 1) == C), (e - 1, C)


@pytest.mark.parametrize("K", CONFIGS)
def test_add_sub_wide_range(K):
    rng = np.random.default_rng(1)
    a, av = rand_scaled(rng, (64,), K)
    b, bv = rand_scaled(rng, (64,), K)
    with mpmath.workprec(24 * K + 120):
        check_close(jadd(a, b), [x + y for x, y in zip(av, bv)], 24 * K - GUARD)
        check_close(jsub(a, b), [x - y for x, y in zip(av, bv)], 24 * K - GUARD)


@pytest.mark.parametrize("K", CONFIGS)
def test_mul_wide_range(K):
    rng = np.random.default_rng(2)
    a, av = rand_scaled(rng, (64,), K)
    b, bv = rand_scaled(rng, (64,), K)
    with mpmath.workprec(24 * K + 120):
        check_close(jmul(a, b), [x * y for x, y in zip(av, bv)], 24 * K - GUARD)


@pytest.mark.parametrize("K", CONFIGS)
def test_div_sqrt(K):
    rng = np.random.default_rng(3)
    a, av = rand_scaled(rng, (32,), K, decades=30)
    b, bv = rand_scaled(rng, (32,), K, decades=30)
    with mpmath.workprec(24 * K + 120):
        check_close(jdiv(a, b), [x / y for x, y in zip(av, bv)], 24 * K - GUARD)
        aa = mp.abs_(a)
        check_close(jsqrt(aa), [mpmath.sqrt(abs(x)) for x in av], 24 * K - GUARD)
    z = jsqrt(mp.zeros((4,), K, jnp.float32, scaled=True))
    assert np.all(np.asarray(z.limbs) == 0)
    assert np.all(np.asarray(z.exp) == mp.EXP_ZERO)


def test_cancellation():
    """(a + tiny) - a recovers tiny: the raw-f32 failure mode this
    representation exists to fix (tails below 1e-38 used to flush)."""
    K = 5
    rng = np.random.default_rng(4)
    a, av = rand_scaled(rng, (16,), K, decades=0)
    # tiny = a * 2^-96: far below f32's subnormal floor relative to a at
    # unit scale after 4 limbs; exponent tracking must keep it
    tiny = MP(a.limbs, a.exp - 96)
    s = jsub(jadd(a, tiny), a)
    with mpmath.workprec(24 * K + 120):
        expect = [x * mpmath.mpf(2) ** -96 for x in av]
        check_close(s, expect, 24 - GUARD + 24 * (K - 1) - 96 if False else 20)


def test_beyond_f64_range():
    """Arithmetic at magnitudes float64 cannot represent (the solver's
    X*Y products at Omega=1e20 with 9-limb precision stay finite)."""
    K = 5
    rng = np.random.default_rng(5)
    a, av = rand_scaled(rng, (8,), K, decades=0)
    big = MP(a.limbs, a.exp + 2000)     # ~ 10^602
    sq = jmul(big, big)                  # ~ 10^1204
    back = jdiv(sq, big)
    got = np.asarray(back.exp) - np.asarray(big.exp)
    # back == big to full precision
    diff = jsub(back, big)
    rel = np.asarray(mp.to_float_array(jdiv(diff, big)))
    assert np.all(np.abs(rel) < 2.0 ** -(24 * K - GUARD)), rel
    assert np.all(np.abs(got) <= 1), got


def test_compare_where_sum_dot():
    K = 5
    rng = np.random.default_rng(6)
    a, av = rand_scaled(rng, (64,), K, decades=20)
    b, bv = rand_scaled(rng, (64,), K, decades=20)
    got = np.asarray(a < b)
    expect = np.array([x < y for x, y in zip(av, bv)])
    assert np.array_equal(got, expect)
    m = mp.maximum(a, b)
    check_close(m, [max(x, y) for x, y in zip(av, bv)], 20)
    with mpmath.workprec(24 * K + 120):
        s = mp.sum_(a, axis=0)
        check_close(s, [sum(av, mpmath.mpf(0))], 40)  # wide range: abs cancel
        d = mp.dot(a, b)
        expect = sum((x * y for x, y in zip(av, bv)), mpmath.mpf(0))
        check_close(d, [expect], 40)


def test_structural_helpers():
    K = 5
    rng = np.random.default_rng(7)
    a, av = rand_scaled(rng, (4, 6), K, decades=10)
    # mask floors exponents so masked zeros never dominate alignment
    msk = np.zeros((4, 6), np.float32)
    msk[0, :] = 1.0
    am = mp.mask_value(a, jnp.asarray(msk))
    assert np.all(np.asarray(am.exp)[1:] == mp.EXP_ZERO)
    s = mp.add(am, a)  # masked rows must not perturb a's rows 1..3
    with mpmath.workprec(24 * K + 120):   # mpmath rounds ops to context prec
        doubled = [v * 2 for v in av[0:6]]
    check_close(s[0], doubled, 24 * K - GUARD)
    check_close(s[1], av[6:12], 24 * K - GUARD)
    # take / stack / diagonal / transpose round-trips
    t = mp.take(a, jnp.asarray([2, 0]), axis=0)
    check_close(t[0], av[12:18], 24 * K - 2)
    st = mp.stack([a[0], a[1]], axis=0)
    check_close(st[1], av[6:12], 24 * K - 2)
    sq = mp.mul(a.mT, a.mT)  # shape sanity on transpose
    assert sq.shape == (6, 4) and sq.exp.shape == (6, 4)
    # round_to re-centers on the smaller ladder
    r = mp.round_to(a, 3)
    C3 = mp.center_for(3)
    _, e = np.frexp(np.asarray(r.limbs[0]))
    assert np.all((e - 1) == C3)
    check_close(r[0], av[:6], 3 * 24 - 4)
    # mul_pow2 host power of two: exact exponent bump
    h = mp.mul_pow2(a, np.float64(0.25))
    assert np.all(np.asarray(h.exp) == np.asarray(a.exp) - 2)


def test_to_scaled_matches_classic():
    K = 5
    rng = np.random.default_rng(8)
    vals = rng.uniform(-2, 2, 16)
    classic = mp.from_double(vals, K, jnp.float32)
    scaled = jax.jit(mp.to_scaled)(classic)
    back = np.asarray(mp.to_double(scaled))
    assert np.array_equal(back, vals)


def test_from_double_scaled_exact():
    x = np.array([1.5, -2.25, 1e150, 3.333333333333333, 0.0, 1e-200])
    a = mp.from_double(x, 5, jnp.float32, scaled=True)
    back = np.asarray(mp.to_double(a))
    assert np.array_equal(back, x)
    assert int(np.asarray(a.exp)[4]) == mp.EXP_ZERO
