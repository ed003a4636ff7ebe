"""`sdpb` executable: solve a preprocessed SDP.

Mirrors the reference driver (/root/reference/src/sdpb/main.cxx:21-99 and
solve.cxx:18-55): load problem -> resume from checkpoint or fresh state ->
run the IPM -> final checkpoint + solution files.  Multi-device execution
shards block batches over all visible devices automatically.

    python -m sdpb_tpu.cli.sdpb -s sdp.zip --precision 96 [options]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

from .common import (add_solver_options, parse_with_param_file,
                     setup_backend, solver_params_from_args)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sdpb", description="TPU-native SDPB: semidefinite program solver")
    p.add_argument("--sdpDir", "-s", required=True,
                   help="Directory or zip containing preprocessed SDP data files.")
    p.add_argument("--paramFile", "-p", default=None,
                   help="Optional key=value file; command line overrides it.")
    p.add_argument("--outDir", "-o", default=None,
                   help="Output directory (default: sdpDir + '_out').")
    p.add_argument("--checkpointDir", "-c", default=None,
                   help="Checkpoint directory (default: sdpDir + '.ck').")
    p.add_argument("--initialCheckpointDir", "-i", default=None,
                   help="Directory to load the initial checkpoint from "
                        "(default: checkpointDir).")
    p.add_argument("--noFinalCheckpoint", action="store_true",
                   help="Don't save a final checkpoint after terminating.")
    p.add_argument("--writeSolution", default="x,y",
                   help="Comma-separated list among x,y,X,Y.")
    p.add_argument("--procsPerNode", type=int, default=0,
                   help="Accepted for reference compatibility; device count "
                        "is discovered from the JAX runtime.")
    p.add_argument("--procGranularity", type=int, default=1,
                   help="Accepted for reference compatibility.")
    p.add_argument("--verbosity", type=int, default=1,
                   help="0 -> no output, 1 -> regular output, 2 -> debug")
    p.add_argument("--platform", choices=["auto", "cpu"], default="auto",
                   help="JAX platform: 'cpu' forces host execution (float64 "
                        "limbs); 'auto' uses the default backend (TPU when "
                        "available, float32 limbs).")
    add_solver_options(p)
    return p


def main(argv=None) -> int:
    args = parse_with_param_file(build_parser(), argv)
    params = solver_params_from_args(args)

    sdp_path = args.sdpDir
    base = sdp_path[:-4] if sdp_path.endswith(".zip") else sdp_path
    out_dir = Path(args.outDir or (base + "_out"))
    ck_dir = Path(args.checkpointDir or (base + ".ck"))
    initial_ck = Path(args.initialCheckpointDir) if args.initialCheckpointDir else ck_dir

    dtype, np_dtype = setup_backend(force_cpu=(args.platform == "cpu"))
    import jax

    from ..io.sdp_zip import read_sdp
    from ..io.solution import WriteSolution, save_solution
    from ..models.sdp import build_device_sdp
    from ..solver.checkpoint import load_checkpoint, save_checkpoint
    from ..solver.solve import run_solver
    from ..utils.platform import limbs_for_precision
    from ..utils.timers import Timers

    write_solution = WriteSolution.parse(args.writeSolution)
    K = limbs_for_precision(params.precision, dtype)
    verbosity = args.verbosity

    if verbosity >= 1:
        print(f"SDPB TPU-native solver")
        print(f"SDP directory   : {sdp_path}")
        print(f"out directory   : {out_dir}")
        print(f"checkpoint dir  : {ck_dir}")
        print(f"precision       : {params.precision} bits "
              f"({K} x {np_dtype.__name__} limbs)")
    if np_dtype.__name__ == "float32" and K > 6 and verbosity >= 1:
        print(f"WARNING: {K} float32 limbs compile slowly and float32's "
              f"exponent range caps reachable duality gaps near ~1e-12; "
              f"for --precision > ~140 prefer --platform cpu (float64 limbs)")

    timers = Timers()
    with timers.scope("read_sdp"):
        host = read_sdp(sdp_path, K, np_dtype)

    devices = jax.devices()
    mesh = None
    if len(devices) > 1:
        from ..parallel.mesh import make_mesh, shard_sdp

        mesh = make_mesh(devices)
        sdp = build_device_sdp(host, pad_to=mesh.size)
        sdp = shard_sdp(sdp, mesh)
        if verbosity >= 1:
            print(f"devices         : {len(devices)} ({devices[0].platform}), "
                  f"blocks mesh of size {mesh.size}")
    else:
        sdp = build_device_sdp(host)
        if verbosity >= 1:
            print(f"devices         : 1 ({devices[0].platform})")

    initial = load_checkpoint(initial_ck, sdp, verbosity) if initial_ck.exists() else None

    def checkpoint_fn(state, it):
        save_checkpoint(ck_dir, sdp, state, options=params.to_dict(),
                        verbosity=verbosity)

    result = run_solver(
        sdp, params, verbosity=verbosity, mesh=mesh, initial=initial,
        checkpoint_fn=checkpoint_fn, timers=timers)

    if verbosity >= 1:
        print(f"-----{result.terminate_reason}-----")
        from ..io.solution import mp_str
        mant = 24 if np_dtype.__name__ == "float32" else 53
        nd = int(mant * K * 0.30103) + 1
        print(f"primalObjective = {mp_str(result.primal_objective, nd)}")
        print(f"dualObjective   = {mp_str(result.dual_objective, nd)}")
        print(f"dualityGap      = {mp_str(result.duality_gap, nd)}")
        print(f"primalError     = {mp_str(result.primal_error, nd)}")
        print(f"dualError       = {mp_str(result.dual_error, nd)}")

    if not args.noFinalCheckpoint:
        save_checkpoint(ck_dir, sdp, result.state, options=params.to_dict(),
                        verbosity=verbosity)
    save_solution(out_dir, result, sdp, write_solution, verbosity=verbosity)
    if verbosity >= 2:
        print(timers.to_json())
    return 0


if __name__ == "__main__":
    sys.exit(main())
