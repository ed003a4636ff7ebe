"""approx_objective: the quadratic approximation of a perturbed SDP's
objective must match a true re-solve to the solve accuracy (the reference
validates the same way; approx_objective.test.cxx)."""
import json
import os

import mpmath
import numpy as np
import pytest

TOY = "/root/reference/test/data/sdp.zip"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(TOY), reason="no reference data")
def test_approx_objective_quadratic(tmp_path):
    import copy

    from sdpb_tpu.cli.approx_objective import main as approx_main
    from sdpb_tpu.io.sdp_zip import read_sdp, write_sdp
    from sdpb_tpu.io.solution import WriteSolution, save_solution
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.solver.params import SolverParameters
    from sdpb_tpu.solver.solve import run_solver

    K = 3
    host = read_sdp(TOY, K, np.float64)
    sdp = build_device_sdp(host)
    params = SolverParameters(
        precision=150, duality_gap_threshold="1e-20",
        primal_error_threshold="1e-20", dual_error_threshold="1e-20",
        initial_matrix_scale_primal="1e4", initial_matrix_scale_dual="1e4",
        max_iterations=300)
    res = run_solver(sdp, params, verbosity=0)
    out_dir = tmp_path / "out"
    save_solution(out_dir, res, sdp, WriteSolution(True, True, True, True),
                  verbosity=0)
    old_zip = tmp_path / "old.zip"
    write_sdp(old_zip, host, block_format="json")

    host2 = copy.deepcopy(host)
    host2.b = host.b * (1 + 1e-6)
    new_zip = tmp_path / "new.zip"
    write_sdp(new_zip, host2, block_format="json")

    sdp2 = build_device_sdp(read_sdp(new_zip, K, np.float64))
    res2 = run_solver(sdp2, params, verbosity=0)

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = approx_main(["--sdp", str(old_zip), "--newSdp", str(new_zip),
                          "--precision", "150", "--solutionDir", str(out_dir),
                          "--writeSolverState"])
    assert rc == 0
    result = json.loads(buf.getvalue())[0]
    with mpmath.workprec(250):
        err = abs(mpmath.mpf(result["objective"]) - res2.dual_objective)
        # quadratic approx of a 1e-6 perturbation: error ~ solve accuracy
        assert err < mpmath.mpf("1e-17"), result["objective"]
        # the quadratic term itself is nonzero and small
        dd = abs(mpmath.mpf(result["dd_objective"]))
        assert mpmath.mpf(0) < dd < mpmath.mpf("1e-9")

    # --writeSolverState reuse: the state file exists and a second
    # invocation (which loads it instead of rebuilding the Schur solver)
    # reproduces the result exactly (setup_solver.cxx:40-52 analog)
    assert (out_dir / "solver_state.npz").exists()
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        rc = approx_main(["--sdp", str(old_zip), "--newSdp", str(new_zip),
                          "--precision", "150", "--solutionDir", str(out_dir)])
    assert rc == 0
    result2 = json.loads(buf2.getvalue())[0]
    assert result2["objective"] == result["objective"]
    assert result2["dd_objective"] == result["dd_objective"]


def test_planner_block_grid_mapping():
    """Worst-Fit-First bin packing invariants (compute_block_grid_mapping)."""
    from sdpb_tpu.parallel.planner import compute_block_grid_mapping

    costs = sorted(((c, i) for i, c in enumerate(
        [100, 50, 30, 20, 10, 5, 5, 5])), reverse=True)
    mapping = compute_block_grid_mapping(4, 2, costs)
    assert len(mapping) == 2
    all_blocks = sorted(i for node in mapping for m in node
                        for i in m.block_indices)
    assert all_blocks == list(range(8))
    total_procs = sum(m.num_procs for node in mapping for m in node)
    assert total_procs == 8
    for node in mapping:
        for m in node:
            # num_procs > 1 and multiple blocks are mutually exclusive
            assert not (m.num_procs > 1 and len(m.block_indices) > 1)


def test_planner_lpt_order():
    from sdpb_tpu.parallel.planner import plan_block_order

    costs = [100, 1, 1, 1, 50, 50, 2, 2]
    order = plan_block_order(costs, 4)
    assert sorted(order) == list(range(8))
    chunks = [order[i * 2:(i + 1) * 2] for i in range(4)]
    loads = [sum(costs[i] for i in ch) for ch in chunks]
    # the big block is alone-ish; no chunk has two of the three big blocks
    assert max(loads) <= 101


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(TOY), reason="no reference data")
def test_reference_solver_state_reuse(tmp_path):
    """The reference's --writeSolverState TEXT blocks
    (schur_complement_cholesky_<j>.txt, Q_cholesky.txt;
    setup_solver.cxx:40-52) load into a FrozenSchur matching the directly
    built one.  Q_cholesky is written UPPER-triangular (as the reference's
    Cholesky(UPPER, Q) stores it) to exercise the triangle detection."""
    import jax

    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.io.text_blocks import write_text_matrix
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.ops import linalg, mpfloat as mp
    from sdpb_tpu.solver.params import SolverParameters
    from sdpb_tpu.solver.solve import run_solver
    from sdpb_tpu.tools.approx_objective import (load_reference_solver_state,
                                                 make_setup_fn)

    K = 3
    host = read_sdp(TOY, K, np.float64)
    sdp = build_device_sdp(host)
    params = SolverParameters(
        precision=150, duality_gap_threshold="1e-10",
        primal_error_threshold="1e-10", dual_error_threshold="1e-10",
        initial_matrix_scale_primal="1e2", initial_matrix_scale_dual="1e2",
        max_iterations=200)
    res = run_solver(sdp, params, verbosity=0)
    frozen0 = jax.jit(make_setup_fn(K, 1))(sdp, res.state)

    # full-precision factors, written in the reference text layout
    L = linalg.cholesky(frozen0.Ss[0])          # [B, P, P] lower
    QL = linalg.cholesky(frozen0.Q)             # [N, N] lower
    bk = sdp.buckets[0]
    for i, rs in enumerate(bk.real_sizes):
        if rs.block_index < 0:
            continue
        write_text_matrix(
            tmp_path / f"schur_complement_cholesky_{rs.block_index}.txt",
            np.asarray(L.limbs[:, i]))
    write_text_matrix(tmp_path / "Q_cholesky.txt",
                      np.swapaxes(np.asarray(QL.limbs), -1, -2))  # UPPER

    frozen1 = load_reference_solver_state(tmp_path, sdp, K, 1)
    assert frozen1 is not None
    for a, b in ((frozen1.Q, frozen0.Q), (frozen1.Ss[0], frozen0.Ss[0]),
                 (frozen1.SinvBs[0], frozen0.SinvBs[0])):
        av = np.asarray(mp.to_double(a))
        bv = np.asarray(mp.to_double(b))
        scale = np.max(np.abs(bv)) or 1.0
        assert np.allclose(av, bv, rtol=0, atol=1e-13 * scale), \
            np.max(np.abs(av - bv)) / scale
