"""Multi-host plane: two jax.distributed processes (4 virtual CPU devices
each) solve the toy SDP over one 8-device global mesh and must reproduce
the single-process result.

This is the TPU-native analog of the reference's MPI cluster execution
(allocate_blocks.cxx:37-117 distributes blocks over nodes;
synchronize_Q.cxx:23-186 reduces Q across them): here both processes run
the identical SPMD iteration and XLA's psum carries Q across the process
boundary.  The toy has ONE real block, so seven of the eight shards are
pure padding — the masking machinery is exercised under multi-process
sharding too.
"""
import os
import socket
import subprocess
import sys

import pytest

ORACLE = "1.84026576313204924668804017173055"

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=4 "
                           "--xla_cpu_use_fusion_emitters=false")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from sdpb_tpu.parallel import distributed
distributed.initialize(f"127.0.0.1:{port}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np, mpmath
from sdpb_tpu.io.sdp_zip import read_sdp
from sdpb_tpu.models.sdp import build_device_sdp
from sdpb_tpu.parallel.mesh import make_mesh, replicate_tree, shard_sdp
from sdpb_tpu.solver.params import SolverParameters
from sdpb_tpu.solver.solve import TerminateReason, run_solver

K = 2
host = read_sdp("/root/reference/test/data/sdp.zip", K, np.float64)
mesh = make_mesh()
sdp = build_device_sdp(host, pad_to=mesh.size)
sdp = shard_sdp(sdp, mesh)
params = SolverParameters(
    precision=106, duality_gap_threshold="1e-10",
    primal_error_threshold="1e-10", dual_error_threshold="1e-10",
    initial_matrix_scale_primal="1e2", initial_matrix_scale_dual="1e2",
    max_iterations=100)
res = run_solver(sdp, params, verbosity=0, mesh=mesh)
assert res.terminate_reason == TerminateReason.PrimalDualOptimal, (
    str(res.terminate_reason), res.iterations)
# exercise the cross-process state gather (checkpoint/solution path)
rep = replicate_tree(res.state, mesh)
y0 = np.asarray(rep.y.limbs)
assert np.all(np.isfinite(y0))
if pid == 0:
    with mpmath.workprec(200):
        print("OBJ", mpmath.nstr(res.primal_objective, 20), flush=True)

# multihost + GSPMD (intra-block row sharding): regression for the staging
# gap — host-local state must be staged onto the multi-process mesh per the
# gspmd specs before entering the globally-sharded jit (solve.py), or the
# first iteration fails on non-addressable inputs.
from sdpb_tpu.parallel.mesh import shard_sdp_gspmd
sdp_g = build_device_sdp(host)
sdp_g = shard_sdp_gspmd(sdp_g, mesh, big_bytes=0)
params_g = SolverParameters(
    precision=106, duality_gap_threshold="1e-10",
    primal_error_threshold="1e-10", dual_error_threshold="1e-10",
    initial_matrix_scale_primal="1e2", initial_matrix_scale_dual="1e2",
    max_iterations=3)
res_g = run_solver(sdp_g, params_g, verbosity=0, mesh=mesh,
                   mesh_mode="gspmd", big_bytes=0)
assert np.isfinite(float(res_g.duality_gap)), res_g.duality_gap
if pid == 0:
    print("GSPMD_OK", flush=True)

# multihost timing run: the coordinator measures, every process receives
# the identical record via broadcast (the reference's root-decides pattern,
# main.cxx:50-91 + run.cxx:125-126) and derives the same bucketing policy
import json
from sdpb_tpu.models.synthetic import random_sdp
from sdpb_tpu.parallel.timing import load_timings, timing_run_broadcast

ck_dir = sys.argv[3]
host_t = random_sdp(num_blocks=4, dim=1, num_points=4, dual_dim=3, K=K,
                    np_dtype=np.float64)
rec = timing_run_broadcast(host_t, params_g, ck_dir if pid == 0 else None,
                           verbosity=0)
assert rec["chosen"]["policy"] in ("quantized", "exact"), rec["chosen"]
if pid != 0:
    # the non-coordinator's broadcast record must equal what the
    # coordinator persisted (same policy everywhere, no SPMD fork)
    saved = load_timings(ck_dir)
    assert saved is not None and saved["chosen"] == rec["chosen"], (
        saved, rec["chosen"])
print(f"TIMING_POLICY {json.dumps(rec['chosen'], sort_keys=True)}", flush=True)
"""


@pytest.mark.skipif(not os.path.exists("/root/reference/test/data/sdp.zip"),
                    reason="no reference data")
def test_two_process_solve_matches_oracle(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    ck_dir = str(tmp_path / "timings_ck")
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, str(i), str(port),
                          ck_dir],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True,
                         cwd="/root/repo")
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, (out[-2000:], err[-2000:])
    obj_line = [l for l in outs[0][1].splitlines() if l.startswith("OBJ")]
    assert obj_line, outs[0][1]
    assert any(l.startswith("GSPMD_OK") for l in outs[0][1].splitlines()), \
        outs[0][1]
    # every process must report the SAME measured bucketing policy (the
    # coordinator-measures-then-broadcast contract)
    policies = []
    for rc, out, err in outs:
        lines = [l for l in out.splitlines() if l.startswith("TIMING_POLICY")]
        assert lines, out
        policies.append(lines[0])
    assert policies[0] == policies[1], policies
    got = obj_line[0].split(None, 1)[1]
    import mpmath

    with mpmath.workprec(200):
        assert abs(mpmath.mpf(got) - mpmath.mpf(ORACLE)) < mpmath.mpf("1e-9"), got
