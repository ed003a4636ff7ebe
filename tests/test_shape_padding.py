"""Shape-unified (quantized) bucketing: blocks of different (num_points, h)
padded into one bucket with row/PSD masks must produce the same iterations
as exact per-shape bucketing.

This is the TPU-native answer to heterogeneous block shapes (the reference
simply runs per-block C++ on ragged El::Matrices; XLA's static-shape model
instead wants few uniform batched programs — SURVEY.md hard part #3/#4).
"""
import mpmath
import numpy as np
import pytest

import jax

from sdpb_tpu.io.sdp_zip import BlockData, SDPData
from sdpb_tpu.models.sdp import build_device_sdp
from sdpb_tpu.models.synthetic import random_sdp
from sdpb_tpu.solver.state import initial_state
from sdpb_tpu.solver.step import StepConfig, make_iteration
from sdpb_tpu.utils.strings import str_to_limbs


def mixed_sdp(K=2, dual_dim=3, seed=0):
    """Blocks with heterogeneous num_points (4, 5, 7) and dims (1, 2)."""
    rng = np.random.default_rng(seed)
    blocks = []
    idx = 0
    for dim, npts in ((1, 4), (1, 5), (1, 7), (2, 4), (2, 6)):
        part = random_sdp(num_blocks=1, dim=dim, num_points=npts,
                          dual_dim=dual_dim, K=K, np_dtype=np.float64,
                          seed=seed + idx)
        blk = part.blocks[0]
        blk.index = idx
        blocks.append(blk)
        idx += 1
    base = random_sdp(num_blocks=1, dim=1, num_points=4, dual_dim=dual_dim,
                      K=K, np_dtype=np.float64, seed=seed)
    return SDPData(objective_const=base.objective_const, b=base.b, blocks=blocks)


def run_iters(sdp_host, shape_policy, n_iters=3, K=2):
    sdp = build_device_sdp(sdp_host, shape_policy=shape_policy)
    omega = str_to_limbs("1e1", K, np.float64)
    state = initial_state(sdp, omega, omega)
    cfg = StepConfig(
        total_psd_rows=sdp.total_psd_rows, axis=None, gamma=0.7,
        feasible_beta_limbs=str_to_limbs("0.1", K, np.float64),
        infeasible_beta_limbs=str_to_limbs("0.3", K, np.float64),
        primal_error_threshold=1e-15, dual_error_threshold=1e-15,
        max_complementarity=1e100)
    it = jax.jit(make_iteration(cfg))
    stats = None
    for _ in range(n_iters):
        stats, state = it(sdp, state)
    return sdp, stats, state


def test_quantized_matches_exact():
    host = mixed_sdp()
    sdp_e, stats_e, state_e = run_iters(host, "exact")
    sdp_q, stats_q, state_q = run_iters(host, "quantized")

    # quantization must actually merge shapes (else the test is vacuous)
    assert len(sdp_q.buckets) < len(sdp_e.buckets)
    assert sdp_q.total_psd_rows == sdp_e.total_psd_rows

    for name in ("primal_objective", "dual_objective", "duality_gap", "mu"):
        a = np.asarray(getattr(stats_e, name).limbs, dtype=np.float64).sum()
        b = np.asarray(getattr(stats_q, name).limbs, dtype=np.float64).sum()
        assert np.isclose(a, b, rtol=1e-12, atol=1e-30), (name, a, b)
    for name in ("primal_error_P", "primal_error_p", "dual_error",
                 "primal_step", "dual_step", "beta_corrector"):
        a = float(np.asarray(getattr(stats_e, name)))
        b = float(np.asarray(getattr(stats_q, name)))
        assert np.isclose(a, b, rtol=1e-9), (name, a, b)

    y_e = np.asarray(state_e.y.limbs, dtype=np.float64).sum(axis=0)
    y_q = np.asarray(state_q.y.limbs, dtype=np.float64).sum(axis=0)
    np.testing.assert_allclose(y_e, y_q, rtol=1e-12, atol=1e-20)

    # per-block solution state matches after unpadding
    from sdpb_tpu.io.solution import host_blocks

    blocks_e = host_blocks(sdp_e, state_e)
    blocks_q = host_blocks(sdp_q, state_q)
    assert blocks_e.keys() == blocks_q.keys()
    for idx in blocks_e:
        for name in ("x", "X_even", "X_odd", "Y_even", "Y_odd"):
            a = blocks_e[idx][name].sum(axis=0)
            b = blocks_q[idx][name].sum(axis=0)
            assert a.shape == b.shape, (idx, name, a.shape, b.shape)
            np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-18,
                                       err_msg=f"{idx} {name}")


def test_checkpoint_roundtrip_across_bucketing(tmp_path):
    """Checkpoint written under exact bucketing resumes under quantized
    bucketing (layout independence)."""
    from sdpb_tpu.solver.checkpoint import load_checkpoint, save_checkpoint

    host = mixed_sdp()
    sdp_e, _, state_e = run_iters(host, "exact", n_iters=2)
    save_checkpoint(tmp_path, sdp_e, state_e, verbosity=0)

    sdp_q = build_device_sdp(host, shape_policy="quantized")
    state_q = load_checkpoint(tmp_path, sdp_q, verbosity=0)
    assert state_q is not None

    from sdpb_tpu.io.solution import host_blocks

    be = host_blocks(sdp_e, state_e)
    bq = host_blocks(sdp_q, state_q)
    for idx in be:
        for name in ("x", "X_even", "Y_odd"):
            np.testing.assert_allclose(
                be[idx][name].sum(axis=0), bq[idx][name].sum(axis=0),
                rtol=1e-14, atol=1e-300, err_msg=f"{idx} {name}")
