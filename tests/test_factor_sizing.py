"""Factor-precision sizing of the mixed-precision solve scheme
(solver.solve.initial_factor_limbs): auto model, explicit --factorLimbs
pin, and the wide-representation cap."""
import numpy as np

from sdpb_tpu.solver.params import SolverParameters
from sdpb_tpu.solver.solve import initial_factor_limbs


def _p(**kw):
    return SolverParameters(
        initial_matrix_scale_primal=kw.pop("omega", "1e6"),
        initial_matrix_scale_dual=kw.pop("omega_d", "1e6"),
        duality_gap_threshold=kw.pop("gap", "1e-10"), **kw)


def test_auto_covers_declared_gap():
    # gap 1e-10, Omega 1e6, f32 limbs: 2*(20+33.2)+30 = 136 bits -> 6
    # limbs (the empirical nmax6 requirement; 4 and 5 limbs measurably
    # degrade/exhaust, see initial_factor_limbs docstring)
    kf, cap = initial_factor_limbs(_p(), K=6, scaled=True, npdt=np.float32)
    assert (kf, cap) == (6, 6)
    # deeper declared gap raises the floor to the cap
    kf, _ = initial_factor_limbs(_p(gap="1e-25"), K=9, scaled=True,
                                 npdt=np.float32)
    assert kf == 9
    # f64 limbs carry more bits per limb
    kf, cap = initial_factor_limbs(_p(gap="1e-12"), K=4, scaled=False,
                                   npdt=np.float64)
    assert (kf, cap) == (3, 4)


def test_omega_dominates_when_larger():
    kf_small, _ = initial_factor_limbs(_p(omega="1e2", omega_d="1e2",
                                          gap="1e-2"),
                                       K=6, scaled=True, npdt=np.float32)
    kf_big, _ = initial_factor_limbs(_p(omega="1e20", omega_d="1e2",
                                        gap="1e-2"),
                                     K=6, scaled=True, npdt=np.float32)
    assert kf_big > kf_small


def test_explicit_pin_clamped():
    # pin wins over the auto model
    kf, _ = initial_factor_limbs(_p(factor_limbs=6), K=6, scaled=True,
                                 npdt=np.float32)
    assert kf == 6
    # clamped to the cap from above and to 2 from below
    kf, cap = initial_factor_limbs(_p(factor_limbs=50), K=6, scaled=True,
                                   npdt=np.float32)
    assert (kf, cap) == (6, 6)
    kf, _ = initial_factor_limbs(_p(factor_limbs=1), K=6, scaled=True,
                                 npdt=np.float32)
    assert kf == 2


def test_wide_cap_is_nine_base_limbs():
    # K=18 scaled (432-bit wide): factor capped at 9 so factorization
    # loops stay on the base (Pallas-eligible) representation
    kf, cap = initial_factor_limbs(_p(factor_limbs=18), K=18, scaled=True,
                                   npdt=np.float32)
    assert (kf, cap) == (9, 9)


def test_cli_roundtrip():
    import argparse

    from sdpb_tpu.cli.common import add_solver_options, solver_params_from_args

    p = argparse.ArgumentParser()
    add_solver_options(p)
    args = p.parse_args(["--factorLimbs", "5", "--precision", "144"])
    params = solver_params_from_args(args)
    assert params.factor_limbs == 5
    kf, _ = initial_factor_limbs(params, K=6, scaled=True, npdt=np.float32)
    assert kf == 5
