"""Validate the WIDE (multi-word scaled) MP representation against mpmath.

The wide representation (ops.mpwide) composes G words of <= 216-bit scaled
f32 MPs into a 24*Kg*G-bit value with per-word exponents — the TPU analog
of GMP's mantissa-words + exponent pair, covering the reference's default
--precision 400 contract
(/root/reference/src/sdp_solve/Solver_Parameters/Solver_Parameters.cxx:18)
which the single-ladder scaled format cannot reach (216-bit cap).

The critical case a flat f32 ladder can NEVER handle is also tested:
cancellation deeper than ~250 bits inside the precision window (the word
exponents simply drop, as GMP's would).
"""
import mpmath
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdpb_tpu.ops import mpfloat as mp
from sdpb_tpu.ops import mpwide as mpw
from sdpb_tpu.ops.mpwide import MPW
from sdpb_tpu.utils.strings import scaled_limbs_to_mpf

K = 18          # 2 words x 9 limbs = 432 bits
PREC = 24 * K


def mpw_to_mpf(a: MPW):
    """Exact mpmath values of a host-materialized MPW (flattened)."""
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
    """Exact mpmath values -> wide MPW (via f64-limb peel + staging)."""
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


def rand_wide(rng, shape, decades=40):
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


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(20260817)


def test_staging_roundtrip(rng):
    a, va = rand_wide(rng, (7,))
    check_rel(a, va, PREC - 8)


def test_add_sub(rng):
    a, va = rand_wide(rng, (11,), decades=30)
    b, vb = rand_wide(rng, (11,), decades=30)
    s = jax.jit(mp.add)(a, b)
    with mpmath.workprec(PREC + 120):
        check_rel(s, [x + y for x, y in zip(va, vb)], PREC - 26)
    d = jax.jit(mp.sub)(a, b)
    with mpmath.workprec(PREC + 120):
        check_rel(d, [x - y for x, y in zip(va, vb)], PREC - 26)


def test_deep_cancellation(rng):
    """a + b with ~300-bit leading cancellation: impossible for any flat
    f32 ladder (>252-bit span), exact-to-word-precision here because the
    word exponents drop with the result."""
    with mpmath.workprec(PREC + 200):
        va = [mpmath.mpf(3) / 7, mpmath.mpf(10) ** 25]
        delta = [mpmath.mpf(2) ** -300 * v * (1 + mpmath.mpf(1) / 3)
                 for v in va]
        vb = [-(v - d) for v, d in zip(va, delta)]
        a = stage_vals(va, (2,))
        b = stage_vals(vb, (2,))
        s = jax.jit(mp.add)(a, b)
        # result ~ 2^-300 * a; inputs carry ~PREC bits -> result keeps
        # ~PREC-300 bits
        check_rel(s, [v + w for v, w in zip(va, vb)], PREC - 300 - 30)


def test_mul(rng):
    a, va = rand_wide(rng, (11,), decades=30)
    b, vb = rand_wide(rng, (11,), decades=30)
    p = jax.jit(mp.mul)(a, b)
    with mpmath.workprec(PREC + 120):
        check_rel(p, [x * y for x, y in zip(va, vb)], PREC - 26)


def test_mul_extreme_range():
    """Products beyond float64's exponent range (the GMP-range contract).

    Expected values are the exact products of the STAGED inputs: the host
    f64-limb staging itself cannot carry 432 bits for values near 1e+-250
    (tail limbs fall below float64's 2^-1074 floor — a documented input
    limitation, not a device-arithmetic one)."""
    with mpmath.workprec(PREC + 120):
        va = [mpmath.mpf(10) ** 250, mpmath.mpf(10) ** -250]
        vb = [mpmath.mpf(10) ** 240, mpmath.mpf(10) ** -240]
        a = stage_vals(va, (2,))
        b = stage_vals(vb, (2,))
        p = jax.jit(mp.mul)(a, b)
        sa, sb = mpw_to_mpf(a), mpw_to_mpf(b)
        check_rel(p, [x * y for x, y in zip(sa, sb)], PREC - 26)


def test_div(rng):
    a, va = rand_wide(rng, (7,), decades=20)
    b, vb = rand_wide(rng, (7,), decades=20)
    q = jax.jit(mp.div)(a, b)
    with mpmath.workprec(PREC + 120):
        check_rel(q, [x / y for x, y in zip(va, vb)], PREC - 34)


def test_sqrt(rng):
    _, va = rand_wide(rng, (7,), decades=20)
    with mpmath.workprec(PREC + 120):
        va = [abs(v) for v in va] + [mpmath.mpf(0)]
        a = stage_vals(va, (8,))
        s = jax.jit(mp.sqrt)(a)
        check_rel(s, [mpmath.sqrt(v) for v in va], PREC - 34)


def test_structural(rng):
    a, va = rand_wide(rng, (3, 4), decades=10)
    # where / mask / take / getitem / sum
    m = np.array([[1, 0, 1, 1], [0, 1, 0, 1], [1, 1, 1, 0]], np.float32)
    masked = mp.mask_value(a, jnp.asarray(m))
    got = mpw_to_mpf(masked)
    for i, (g, e) in enumerate(zip(got, va)):
        keep = m.reshape(-1)[i]
        with mpmath.workprec(PREC + 60):
            assert (g == 0) if not keep else abs(g - e) / abs(e) < mpmath.mpf(2) ** (-PREC + 10)
    s = mp.sum_(a, axis=1)
    with mpmath.workprec(PREC + 120):
        rows = [sum(va[i * 4:(i + 1) * 4], mpmath.mpf(0)) for i in range(3)]
        check_rel(s, rows, PREC - 30)
    d = mp.diagonal(mp.expand_dims(a, -1) * mp.expand_dims(a, -2))
    assert d.shape == (3, 4)


def test_round_widen(rng):
    a, va = rand_wide(rng, (5,), decades=10)
    lo = mp.round_to(a, 4)        # -> base scaled MP, 96 bits
    assert not hasattr(lo, "words") and lo.K == 4
    back = mp.round_to(lo, K)     # -> widened
    assert hasattr(back, "words")
    with mpmath.workprec(200):
        for g, e in zip(mpw_to_mpf(back), va):
            assert abs(g - e) / abs(e) < mpmath.mpf(2) ** (-4 * 24 + 10)


def test_host_f64_roundtrip(rng):
    a, va = rand_wide(rng, (6,), decades=30)
    l64 = mp.host_f64_limbs(a)
    b = mpw.wide_parts_to_mp(mpw.f64_limbs_to_wide_parts(l64, K))
    check_rel(b, va, PREC - 10)


def test_compare_sign(rng):
    with mpmath.workprec(PREC + 60):
        va = [mpmath.mpf(1) / 3, mpmath.mpf(1) / 3 + mpmath.mpf(2) ** -350,
              mpmath.mpf(-5), mpmath.mpf(0)]
    a = stage_vals(va, (4,))
    b = stage_vals([va[1], va[0], va[2], va[3]], (4,))
    lt = np.asarray(mp.lt(a, b))
    assert lt.tolist() == [True, False, False, False]
    sg = np.asarray(mp.sign_array(a))
    assert sg.tolist() == [1.0, 1.0, -1.0, 0.0]


def test_posdef_refined_solve(rng):
    """Mixed-precision scheme at wide precision: factor at 4 base limbs,
    refine to the full 432 bits (the architecture the solver uses —
    factorizations never see the wide type)."""
    from sdpb_tpu.ops.linalg import PosdefSolver, matmul

    n = 6
    M = rng.standard_normal((n, n))
    A64 = M @ M.T + n * np.eye(n)
    with mpmath.workprec(PREC + 120):
        Am = mpmath.matrix([[mpmath.mpf(float(A64[i, j])) for j in range(n)]
                            for i in range(n)])
        bvals = [mpmath.mpf(float(v)) for v in rng.standard_normal(n)]
        xm = mpmath.lu_solve(Am, mpmath.matrix(bvals))
    A = stage_vals([mpmath.mpf(float(A64[i, j])) for i in range(n)
                    for j in range(n)], (n, n))
    b = stage_vals(bvals, (n,))
    sol = PosdefSolver(A, factor_limbs=4)
    x = sol.solve(mp.expand_dims(b, -1), n_refine=8)[..., 0]
    got = mpw_to_mpf(x)
    with mpmath.workprec(PREC + 120):
        for g, e in zip(got, [xm[i] for i in range(n)]):
            assert abs(g - e) / abs(e) < mpmath.mpf(2) ** (-390), \
                float(mpmath.log(abs(g - e) / abs(e), 2))
