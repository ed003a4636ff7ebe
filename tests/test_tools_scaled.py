"""Companion tools on the SCALED (exponent-tracked f32) representation —
the production TPU numerics.  The tool family's core is
representation-agnostic (every op dispatches through ops.mpfloat); this
validates the staging plumbing end-to-end: approx_objective computes the
same perturbed objective from a scaled-staged problem + solution state as
from the classic f64 one (reference: src/approx_objective/)."""
import copy
import os

import mpmath
import numpy as np
import pytest

TOY = "/root/reference/test/data/sdp.zip"


@pytest.mark.skipif(not os.path.exists(TOY), reason="no reference data")
def test_approx_objective_linear_scaled(tmp_path):
    import jax

    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.solver.params import SolverParameters
    from sdpb_tpu.solver.solve import run_solver
    from sdpb_tpu.io.solution import WriteSolution, save_solution
    from sdpb_tpu.solver.checkpoint import load_text_checkpoint
    from sdpb_tpu.tools.approx_objective import (make_approx_fn,
                                                 sdp_delta_buckets,
                                                 stage_host_mp)
    from sdpb_tpu.utils.strings import mp_host_to_mpf

    # solve once at classic f64 and persist the solution state
    K = 3
    host = read_sdp(TOY, K, np.float64)
    sdp = build_device_sdp(host)
    params = SolverParameters(
        precision=150, duality_gap_threshold="1e-14",
        primal_error_threshold="1e-14", dual_error_threshold="1e-14",
        initial_matrix_scale_primal="1e4", initial_matrix_scale_dual="1e4",
        max_iterations=200)
    res = run_solver(sdp, params, verbosity=0)
    out_dir = tmp_path / "out"
    save_solution(out_dir, res, sdp, WriteSolution(True, True, True, True),
                  verbosity=0)

    # perturbed problem
    host2 = copy.deepcopy(host)
    host2.b = host.b * (1 + 1e-6)

    def linear_obj(scaled_limbs: int):
        if scaled_limbs:
            K64 = -(-(24 * scaled_limbs) // 53) + 1
            h_old = read_sdp(TOY, K64, np.float64)
            h_new = copy.deepcopy(h_old)
            h_new.b = h_old.b * (1 + 1e-6)
        else:
            h_old, h_new = host, host2
        dev = build_device_sdp(h_old, scaled_limbs=scaled_limbs)
        # text solutions are representation-portable: the classic-f64
        # solve state loads straight into the scaled problem
        state = load_text_checkpoint(out_dir, dev, verbosity=0)
        d_cs, d_Bs = sdp_delta_buckets(dev, h_old, h_new, h_old.b.shape[0],
                                       np.float64, scaled_limbs=scaled_limbs)
        d_const = stage_host_mp(h_new.objective_const - h_old.objective_const,
                                scaled_limbs)
        d_b = stage_host_mp(h_new.b - h_old.b, scaled_limbs)
        fn = jax.jit(make_approx_fn(dev.b.K, 0),
                     static_argnames=("quadratic",))
        total, d_obj, _ = fn(dev, state, None, d_const, d_b, d_cs, d_Bs,
                             quadratic=False)
        host_total = jax.tree.map(np.asarray, total)
        return mp_host_to_mpf(host_total)

    classic = linear_obj(0)
    scaled = linear_obj(5)   # 120-bit scaled f32 (the TPU default tier)
    with mpmath.workprec(300):
        assert abs(scaled - classic) < mpmath.mpf("1e-20"), (
            mpmath.nstr(scaled, 25), mpmath.nstr(classic, 25))
