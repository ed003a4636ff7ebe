"""Robustness regressions: failure paths must degrade cleanly.

The reference defends the same surfaces with informative errors instead of
crashes (/root/reference/Changelog.md:76-79) and loud precision checks
(read_block_stream.cxx:55-61); these tests pin our equivalents.
"""
import math

import numpy as np
import pytest


def _toy_sdp(K=2):
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.models.synthetic import random_sdp

    host = random_sdp(num_blocks=2, dim=1, num_points=4, dual_dim=3, K=K,
                      np_dtype=np.float64, seed=0)
    return build_device_sdp(host)


def test_first_iteration_nonfinite_terminates_cleanly():
    """A non-finite FIRST iteration at full factor precision must return a
    well-formed SolveResult (MaxComplementarityExceeded), not NameError."""
    import jax.numpy as jnp

    from sdpb_tpu.ops.mpfloat import MP
    from sdpb_tpu.solver.params import SolverParameters
    from sdpb_tpu.solver.solve import TerminateReason, run_solver
    from sdpb_tpu.solver.state import initial_state
    from sdpb_tpu.utils.strings import str_to_limbs

    sdp = _toy_sdp(K=2)
    omega = str_to_limbs("1e2", 2, np.float64)
    state = initial_state(sdp, omega, omega)
    # poison the state: K=2 with Omega=1e2 gives factor_limbs == K, so the
    # self-healing ladder has no headroom and must terminate instead
    state.y = MP(jnp.full_like(state.y.limbs, jnp.nan))

    params = SolverParameters(
        precision=106,
        initial_matrix_scale_primal="1e2", initial_matrix_scale_dual="1e2",
        max_iterations=5)
    res = run_solver(sdp, params, verbosity=0, initial=state)
    assert res.terminate_reason == TerminateReason.MaxComplementarityExceeded
    assert math.isnan(float(res.duality_gap))
    assert res.iterations == 1


def test_scaled_staging_rejects_insufficient_host_limbs():
    """Staging a scaled SDP from host f64 limbs with fewer bits than the
    scaled mantissa must fail loudly, not silently lose precision."""
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.models.synthetic import random_sdp

    host = random_sdp(num_blocks=1, dim=1, num_points=4, dual_dim=3, K=2,
                      np_dtype=np.float64, seed=0)
    # scaled K=5 needs ceil(120/53)+1 = 4 host limbs; 2 is insufficient
    with pytest.raises(AssertionError, match="carry"):
        build_device_sdp(host, scaled_limbs=5)


def test_to_float_array_gradual_underflow():
    """Scaled to_float_array: values below f32's min normal must underflow
    toward 0 (subnormal then exact 0), not floor at ~1.2e-38 — error norms
    feed termination thresholds."""
    import jax.numpy as jnp

    from sdpb_tpu.ops import mpfloat as mp
    from sdpb_tpu.utils.strings import str_to_scaled_limbs

    K = 3
    for s, expect in (("1e-42", 1e-42), ("1e-60", 0.0), ("1e-300", 0.0)):
        limbs, exp = str_to_scaled_limbs(s, K)
        a = mp.MP(jnp.asarray(limbs).reshape(K, 1), jnp.asarray([exp]))
        got = float(np.asarray(mp.to_float_array(a))[0])
        if expect == 0.0:
            assert got == 0.0, (s, got)
        else:
            assert got == pytest.approx(expect, rel=0.05), (s, got)
    # sanity: normal-range values unaffected
    limbs, exp = str_to_scaled_limbs("3.25e10", K)
    a = mp.MP(jnp.asarray(limbs).reshape(K, 1), jnp.asarray([exp]))
    assert float(np.asarray(mp.to_float_array(a))[0]) == pytest.approx(3.25e10, rel=1e-6)


def test_scaled_serialization_overflow_is_loud():
    """scaled_parts_to_f64_limbs must raise on magnitudes beyond float64
    range instead of writing inf into checkpoints."""
    from sdpb_tpu.ops.mpfloat import center_for, scaled_parts_to_f64_limbs
    from sdpb_tpu.utils.strings import str_to_scaled_limbs

    K = 3
    limbs, exp = str_to_scaled_limbs("1.5", K)
    # limb magnitude ~2^center_for(K); push the exponent past f64's range
    big_exp = np.asarray([2000 - center_for(K)], np.int32)
    with pytest.raises(ValueError, match="float64 range"):
        scaled_parts_to_f64_limbs(limbs.reshape(K, 1), big_exp, 2)
    # in-range round-trip still exact
    out = scaled_parts_to_f64_limbs(limbs.reshape(K, 1), np.asarray([exp]), 2)
    assert out[0, 0] + out[1, 0] == 1.5
