"""Parity of the kernel-side list-form MP arithmetic (ops.mplist) against
the stacked-form reference implementation (ops.mpfloat) and mpmath.

mplist is what Pallas kernel bodies execute; any drift from mpfloat's
semantics would make kernel and XLA paths disagree.  These tests run the
list ops as plain jitted XLA (contraction disabled by conftest's
--xla_cpu_use_fusion_emitters=false, same safety domain as Mosaic).
"""
import mpmath
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdpb_tpu.ops import mpfloat as mp
from sdpb_tpu.ops import mplist as ml
from sdpb_tpu.utils.strings import scaled_limbs_to_mpf, str_to_scaled_limbs


def _rand_scaled(K, shape, seed, exp_range=40):
    """Random scaled MP host parts with wild exponents."""
    rng = np.random.default_rng(seed)
    vals = rng.standard_normal(shape)
    exps = rng.integers(-exp_range, exp_range, size=shape)
    xs = vals * np.exp2(exps.astype(np.float64))
    limbs, exp = mp.f64_to_scaled_parts(xs, K)
    # add low-order noise so limbs beyond f64's 53 bits are exercised
    noise = rng.standard_normal(shape) * np.exp2(exps - 40.0)
    l2, e2 = mp.f64_to_scaled_parts(noise, K)
    a = mp.add(mp.MP(jnp.asarray(limbs), jnp.asarray(exp)),
               mp.MP(jnp.asarray(l2), jnp.asarray(e2)))
    return np.asarray(a.limbs), np.asarray(a.exp)


def _to_mpf(limbs, exp, idx):
    return scaled_limbs_to_mpf(limbs[(slice(None),) + idx], exp[idx])


def _val(limbs, exp):
    xs = [jnp.asarray(limbs[k]) for k in range(limbs.shape[0])]
    return (xs, jnp.asarray(exp)) if exp is not None else (xs, None)


@pytest.mark.parametrize(
    "K", [3, 5, pytest.param(9, marks=pytest.mark.slow)])
@pytest.mark.parametrize("op", ["add", "sub", "mul"])
def test_scaled_binary_parity(K, op):
    shape = (4, 8)
    al, ae = _rand_scaled(K, shape, seed=K * 10 + 1)
    bl, be = _rand_scaled(K, shape, seed=K * 10 + 2)

    fn_ml = {"add": ml.add, "sub": ml.sub, "mul": ml.mul}[op]
    fn_mp = {"add": mp.add, "sub": mp.sub, "mul": mp.mul}[op]

    @jax.jit
    def run_list(al, ae, bl, be):
        xs, e = fn_ml(_val(al, ae), _val(bl, be), K)
        return jnp.stack(xs, 0), e

    got_l, got_e = run_list(al, ae, bl, be)
    got_l, got_e = np.asarray(got_l), np.asarray(got_e)

    ref = fn_mp(mp.MP(jnp.asarray(al), jnp.asarray(ae)),
                mp.MP(jnp.asarray(bl), jnp.asarray(be)))
    ref_l, ref_e = np.asarray(ref.limbs), np.asarray(ref.exp)

    with mpmath.workprec(24 * K + 80):
        for i in range(shape[0]):
            for j in range(shape[1]):
                g = _to_mpf(got_l, got_e, (i, j))
                r = _to_mpf(ref_l, ref_e, (i, j))
                scale = max(abs(r), mpmath.mpf(2) ** -10000)
                assert abs(g - r) / scale < mpmath.mpf(2) ** (-24 * K + 6), (
                    op, K, i, j, mpmath.nstr(g, 30), mpmath.nstr(r, 30))


@pytest.mark.parametrize(
    "K", [3, 5, pytest.param(9, marks=pytest.mark.slow)])
@pytest.mark.parametrize("fn", ["rsqrt", "reciprocal"])
def test_scaled_newton_parity(K, fn):
    shape = (8,)
    rng = np.random.default_rng(7)
    vals = np.abs(rng.standard_normal(shape)) + 0.1
    exps = rng.integers(-60, 60, size=shape)
    xs = vals * np.exp2(exps.astype(np.float64))
    limbs, exp = mp.f64_to_scaled_parts(xs, K)

    fn_ml = {"rsqrt": ml.rsqrt, "reciprocal": ml.reciprocal}[fn]

    @jax.jit
    def run_list(l, e):
        xs_, e_ = fn_ml(_val(l, e), K)
        return jnp.stack(xs_, 0), e_

    got_l, got_e = map(np.asarray, run_list(limbs, exp))
    with mpmath.workprec(24 * K + 80):
        for i in range(shape[0]):
            g = _to_mpf(got_l, got_e, (i,))
            x = mpmath.mpf(float(vals[i])) * mpmath.mpf(2) ** int(exps[i])
            r = 1 / mpmath.sqrt(x) if fn == "rsqrt" else 1 / x
            assert abs(g - r) / abs(r) < mpmath.mpf(2) ** (-24 * K + 8), (
                fn, K, i, mpmath.nstr(g, 30), mpmath.nstr(r, 30))


@pytest.mark.parametrize("K", [2, 4])
def test_classic_parity_f64(K):
    """Classic list ops at float64 against mpfloat."""
    rng = np.random.default_rng(3)
    shape = (4, 4)
    a64 = rng.standard_normal(shape)
    b64 = rng.standard_normal(shape)
    A = mp.from_double(a64, K, jnp.float64)
    B = mp.from_double(b64, K, jnp.float64)
    # inject low limbs
    A = mp.mul(A, mp.from_double(1.0 + 1e-30, K, jnp.float64))
    B = mp.add(B, mp.from_double(b64 * 1e-25, K, jnp.float64))

    @jax.jit
    def run_list(al, bl):
        s, _ = ml.mul(([al[k] for k in range(K)], None),
                      ([bl[k] for k in range(K)], None), K)
        r, _ = ml.rsqrt(([jnp.abs(al[k]) + (2.0 if k == 0 else 0.0)
                          for k in range(K)], None), K)
        return jnp.stack(s, 0), jnp.stack(r, 0)

    s_l, r_l = run_list(A.limbs, B.limbs)
    ref = mp.mul(A, B)
    np.testing.assert_allclose(np.asarray(s_l).sum(0),
                               np.asarray(ref.limbs).sum(0), rtol=1e-15)
    # rsqrt vs mpmath — the reference must be built from the ACTUAL input
    # limbs (the +2.0 shift rounds in f64; comparing against the exact sum
    # would charge that input rounding to the algorithm)
    from sdpb_tpu.utils.strings import limbs_to_mpf
    a_abs = np.abs(np.asarray(A.limbs))
    inp = np.stack([a_abs[0] + 2.0] + [a_abs[k] for k in range(1, K)], 0)
    with mpmath.workprec(53 * K + 60):
        for i in range(shape[0]):
            for j in range(shape[1]):
                x = limbs_to_mpf(inp[:, i, j])
                g = limbs_to_mpf(np.asarray(r_l)[:, i, j])
                r = 1 / mpmath.sqrt(x)
                assert abs(g - r) / abs(r) < mpmath.mpf(2) ** (-53 * K + 8)
