"""Validate MP expansion arithmetic against mpmath ground truth.

The precision contract: K limbs of a p-bit base dtype give results with
relative error < 2**-(p*K - GUARD) for add/mul/div/sqrt on renormalized
inputs.  This is the analog of the reference's GMP precision guarantee
(El::gmp::SetPrecision, /root/reference/src/sdpb/main.cxx:33).
"""
import mpmath
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdpb_tpu.ops import mpfloat as mp
from sdpb_tpu.utils.strings import limbs_to_mpf

jadd = jax.jit(mp.add)
jsub = jax.jit(mp.sub)
jmul = jax.jit(mp.mul)
jdiv = jax.jit(mp.div)
jsqrt = jax.jit(mp.sqrt)

GUARD = 14  # allowed slack bits vs the ideal p*K (denormal edges, chain-sum slack)


def rand_mp(rng, shape, K, np_dtype, scale_decades=6):
    """Random MP values with limbs produced by exact peel-off of a random
    high-precision mpmath number (so inputs are perfectly renormalized)."""
    p = 24 if np_dtype == np.float32 else 53
    n = int(np.prod(shape)) if shape else 1
    limbs = np.zeros((K, n), dtype=np_dtype)
    vals = []
    with mpmath.workprec(p * K + 64):
        for i in range(n):
            mant = mpmath.mpf(rng.uniform(-1, 1))
            extra = mpmath.mpf(rng.uniform(-1, 1)) * mpmath.mpf(2) ** (-p * K // 2)
            x = (mant + extra) * mpmath.mpf(10) ** rng.integers(-scale_decades, scale_decades + 1)
            vals.append(x)
            rem = x
            for k in range(K):
                hi = np_dtype(float(rem))
                limbs[k, i] = hi
                rem = rem - mpmath.mpf(float(hi))
    a = mp.MP(jnp.asarray(limbs.reshape((K,) + tuple(shape)), dtype=np_dtype))
    return a, vals


def check_close(result_mp, expected_vals, tol_bits):
    limbs = np.asarray(result_mp.limbs, dtype=np.float64)
    K = limbs.shape[0]
    flat = limbs.reshape(K, -1)
    with mpmath.workprec(60 * K + 64):
        for i, exp_val in enumerate(expected_vals):
            got = limbs_to_mpf(flat[:, i])
            denom = abs(exp_val) if exp_val != 0 else mpmath.mpf(1)
            err = abs(got - exp_val) / denom
            assert err < mpmath.mpf(2) ** (-tol_bits), (
                f"elem {i}: rel err {mpmath.nstr(err, 5)} "
                f"exceeds 2^-{tol_bits}"
            )


# NOTE: float32 expansions without an exponent field cannot exceed ~150 bits
# at unit scale (limb k underflows the f32 denormal floor ~1e-45), so K>6 f32
# configs are only meaningful with the exponent-extended representation
# (see mpfloat exp support); they are excluded here.
CONFIGS = [(np.float32, 2), (np.float32, 3), (np.float32, 5),
           (np.float64, 2), (np.float64, 4)]


@pytest.mark.parametrize("np_dtype,K", CONFIGS)
def test_add_sub(np_dtype, K):
    p = 24 if np_dtype == np.float32 else 53
    rng = np.random.default_rng(0)
    a, av = rand_mp(rng, (64,), K, np_dtype)
    b, bv = rand_mp(rng, (64,), K, np_dtype)
    with mpmath.workprec(p * K + 64):
        check_close(jadd(a, b), [x + y for x, y in zip(av, bv)], p * K - GUARD)
        check_close(jsub(a, b), [x - y for x, y in zip(av, bv)], p * K - GUARD)


@pytest.mark.parametrize("np_dtype,K", CONFIGS)
def test_cancellation(np_dtype, K):
    """(a + tiny) - a must recover tiny exactly-ish."""
    p = 24 if np_dtype == np.float32 else 53
    rng = np.random.default_rng(1)
    a, av = rand_mp(rng, (16,), K, np_dtype, scale_decades=0)
    tiny = mp.mul_pow2(a, np_dtype(2.0) ** -(p * (K - 1)))
    s = jsub(jadd(a, tiny), a)
    with mpmath.workprec(p * K + 64):
        expect = [x * mpmath.mpf(2) ** -(p * (K - 1)) for x in av]
        check_close(s, expect, p - GUARD)  # relative to tiny itself


@pytest.mark.parametrize("np_dtype,K", CONFIGS)
def test_mul(np_dtype, K):
    p = 24 if np_dtype == np.float32 else 53
    rng = np.random.default_rng(2)
    # float32 expansions without exponent tracking lose low limbs to
    # underflow once |value| strays a few decades from 1 (the product's
    # limb K sits at |ab| * 2^-24(K-1), and f32 denormals start at ~1e-38);
    # high-K f32 tests therefore stay near unit scale.  The
    # exponent-tracked representation lifts this restriction.
    decades = 2 if (np_dtype == np.float32 and K >= 4) else 6
    a, av = rand_mp(rng, (64,), K, np_dtype, scale_decades=decades)
    b, bv = rand_mp(rng, (64,), K, np_dtype, scale_decades=decades)
    with mpmath.workprec(p * K + 64):
        check_close(jmul(a, b), [x * y for x, y in zip(av, bv)], p * K - GUARD)


@pytest.mark.xfail(reason="known limitation: raw f32 expansions underflow "
                   "at |value| far from 1; fixed by exponent-tracked MP",
                   strict=False)
def test_mul_f32_wide_range():
    np_dtype, K, p = np.float32, 5, 24
    rng = np.random.default_rng(2)
    a, av = rand_mp(rng, (64,), K, np_dtype, scale_decades=6)
    b, bv = rand_mp(rng, (64,), K, np_dtype, scale_decades=6)
    with mpmath.workprec(p * K + 64):
        check_close(jmul(a, b), [x * y for x, y in zip(av, bv)], p * K - GUARD)


@pytest.mark.parametrize("np_dtype,K", CONFIGS)
def test_div(np_dtype, K):
    p = 24 if np_dtype == np.float32 else 53
    rng = np.random.default_rng(3)
    decades = 2 if (np_dtype == np.float32 and K >= 4) else 6
    a, av = rand_mp(rng, (32,), K, np_dtype, scale_decades=decades)
    b, bv = rand_mp(rng, (32,), K, np_dtype, scale_decades=decades)
    with mpmath.workprec(p * K + 64):
        check_close(jdiv(a, b), [x / y for x, y in zip(av, bv)], p * K - GUARD)


@pytest.mark.parametrize("np_dtype,K", CONFIGS)
def test_sqrt(np_dtype, K):
    p = 24 if np_dtype == np.float32 else 53
    rng = np.random.default_rng(4)
    decades = 2 if (np_dtype == np.float32 and K >= 4) else 6
    a, av = rand_mp(rng, (32,), K, np_dtype, scale_decades=decades)
    a = mp.abs_(a)
    s = jsqrt(a)
    with mpmath.workprec(p * K + 64):
        check_close(s, [mpmath.sqrt(abs(x)) for x in av], p * K - GUARD)
    z = mp.sqrt(mp.zeros((4,), K, a.dtype))
    assert np.all(np.asarray(z.limbs) == 0)


@pytest.mark.parametrize("np_dtype,K", [(np.float32, 5), (np.float64, 2)])
def test_sum_dot(np_dtype, K):
    p = 24 if np_dtype == np.float32 else 53
    rng = np.random.default_rng(5)
    a, av = rand_mp(rng, (200,), K, np_dtype, scale_decades=3)
    b, bv = rand_mp(rng, (200,), K, np_dtype, scale_decades=3)
    with mpmath.workprec(p * K + 64):
        s = mp.sum_(a, axis=0)
        check_close(s, [sum(av, mpmath.mpf(0))], p * K - GUARD - 8)
        d = mp.dot(a, b)
        expect = sum((x * y for x, y in zip(av, bv)), mpmath.mpf(0))
        check_close(d, [expect], p * K - GUARD - 8)


@pytest.mark.parametrize("np_dtype,K", [(np.float32, 5), (np.float64, 2)])
def test_compare_where(np_dtype, K):
    rng = np.random.default_rng(6)
    a, av = rand_mp(rng, (64,), K, np_dtype)
    b, bv = rand_mp(rng, (64,), K, np_dtype)
    got = np.asarray(a < b)
    expect = np.array([x < y for x, y in zip(av, bv)])
    assert np.array_equal(got, expect)
    m = mp.maximum(a, b)
    check_close(m, [max(x, y) for x, y in zip(av, bv)], 20)
    # comparing values differing only in the last limb
    p = 24 if np_dtype == np.float32 else 53
    tiny = mp.mul_pow2(mp.abs_(a), np_dtype(2.0) ** -(p * (K - 1) + 4))
    assert np.all(np.asarray((a + tiny) > a))


def test_from_to_double():
    x = np.array([1.5, -2.25, 1e20, 3.333333333333333])
    a = mp.from_double(x, 5, jnp.float32)
    back = np.asarray(mp.to_double(a))
    assert np.array_equal(back, x)


def test_string_roundtrip():
    from sdpb_tpu.utils.strings import str_to_limbs, limbs_to_str
    s = "1.8402657631320492466880401717305542"
    for dt, K in [(np.float32, 5), (np.float64, 2)]:
        limbs = str_to_limbs(s, K, dt)
        out = limbs_to_str(limbs, ndigits=30)
        with mpmath.workprec(200):
            assert abs(mpmath.mpf(out) - mpmath.mpf(s)) < mpmath.mpf(10) ** -28
