"""Multi-device block sharding: the shard_mapped iteration over a virtual
8-device CPU mesh must reproduce the single-device solve (same math, Q and
scalar reductions via psum/pmax/pmin instead of in-device tree sums).

This exercises the collective plane the reference implements with MPI
(synchronize_Q ring reduce-scatter, El::mpi::AllReduce —
/root/reference/src/sdp_solve/SDP_Solver/run/step/initialize_schur_complement_solver/synchronize_Q.cxx).
"""
import os

import mpmath
import numpy as np
import pytest

import jax

REFERENCE_SDP = "/root/reference/test/data/sdp.zip"


def _mesh(n):
    from sdpb_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    if len(devices) < n:
        pytest.skip(f"need {n} devices, have {len(devices)}")
    return make_mesh(devices[:n])


def test_sharded_iteration_matches_single_device():
    """One IPM step on a 12-block random SDP: sharded over 4 devices ==
    unsharded, to MP roundoff."""
    import jax.numpy as jnp

    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.models.synthetic import random_sdp
    from sdpb_tpu.parallel.mesh import (
        BLOCK_AXIS, make_sharded_iteration, shard_sdp, shard_state)
    from sdpb_tpu.solver.state import initial_state
    from sdpb_tpu.solver.step import StepConfig, make_iteration
    from sdpb_tpu.utils.strings import str_to_limbs

    n_dev = 4
    mesh = _mesh(n_dev)
    K = 2
    host = random_sdp(num_blocks=12, dim=2, num_points=3, dual_dim=4,
                      K=K, np_dtype=np.float64, seed=3)

    def cfg(axis):
        return StepConfig(
            total_psd_rows=sdp_ref.total_psd_rows, axis=axis, gamma=0.7,
            feasible_beta_limbs=str_to_limbs("0.1", K, np.float64),
            infeasible_beta_limbs=str_to_limbs("0.3", K, np.float64),
            primal_error_threshold=1e-15, dual_error_threshold=1e-15,
            max_complementarity=1e100)

    omega = str_to_limbs("1e1", K, np.float64)

    # single-device reference
    sdp_ref = build_device_sdp(host)
    state_ref = initial_state(sdp_ref, omega, omega)
    stats1, new1 = jax.jit(make_iteration(cfg(None)))(sdp_ref, state_ref)

    # sharded
    sdp_sh = build_device_sdp(host, pad_to=n_dev)
    state_sh = initial_state(sdp_sh, omega, omega)
    sdp_sh = shard_sdp(sdp_sh, mesh)
    state_sh = shard_state(state_sh, mesh)
    it = make_sharded_iteration(sdp_sh, state_sh, cfg(BLOCK_AXIS), mesh)
    stats2, new2 = it(sdp_sh, state_sh)

    # psum order differs from the in-device tree-sum order, so results agree
    # to MP roundoff; collapsing limbs to f64 for comparison bounds the
    # observable granularity at ~1e-16 relative.
    for name in ("primal_objective", "dual_objective", "duality_gap", "mu"):
        a = np.asarray(getattr(stats1, name).limbs, dtype=np.float64).sum()
        b = np.asarray(getattr(stats2, name).limbs, dtype=np.float64).sum()
        assert np.isclose(a, b, rtol=1e-12, atol=1e-30), (name, a, b)
    for name in ("primal_error_P", "primal_error_p", "dual_error",
                 "primal_step", "dual_step"):
        a = float(np.asarray(getattr(stats1, name)))
        b = float(np.asarray(getattr(stats2, name)))
        assert np.isclose(a, b, rtol=1e-9), (name, a, b)

    y1 = np.asarray(new1.y.limbs, dtype=np.float64).sum(axis=0)
    y2 = np.asarray(new2.y.limbs, dtype=np.float64).sum(axis=0)
    np.testing.assert_allclose(y1, y2, rtol=1e-12, atol=1e-20)


@pytest.mark.skipif(not os.path.exists(REFERENCE_SDP), reason="no reference data")
def test_toy_solve_sharded():
    """Full toy solve on an 8-device mesh (1 real block + 7 padding blocks)
    reproduces the oracle objective."""
    import jax.numpy as jnp

    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.parallel.mesh import shard_sdp, shard_state
    from sdpb_tpu.solver.params import SolverParameters
    from sdpb_tpu.solver.solve import TerminateReason, run_solver
    from sdpb_tpu.solver.state import initial_state
    from sdpb_tpu.utils.platform import limbs_for_precision

    mesh = _mesh(8)
    K = limbs_for_precision(96, jnp.float64)
    host = read_sdp(REFERENCE_SDP, K, np.float64)
    sdp = build_device_sdp(host, pad_to=8)
    sdp = shard_sdp(sdp, mesh)
    params = SolverParameters(
        precision=96, duality_gap_threshold="1e-15",
        primal_error_threshold="1e-15", dual_error_threshold="1e-15",
        initial_matrix_scale_primal="1e2", initial_matrix_scale_dual="1e2",
        max_iterations=250)
    result = run_solver(sdp, params, verbosity=0, mesh=mesh)
    assert result.terminate_reason == TerminateReason.PrimalDualOptimal
    with mpmath.workprec(200):
        oracle = mpmath.mpf("1.84026576313204924668804017173055")
        assert abs(result.primal_objective - oracle) < mpmath.mpf("1e-13")
