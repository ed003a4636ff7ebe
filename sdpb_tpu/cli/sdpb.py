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
    p.add_argument("--maxBlockMemory", type=int, default=1 << 30,
                   help="Per-block device-memory budget in bytes (the "
                        "--maxSharedMemory analog): blocks above it switch "
                        "to intra-block row sharding over the mesh "
                        "(GSPMD path) instead of batch sharding.")
    p.add_argument("--timingRun", choices=["auto", "never"], default="auto",
                   help="'auto' (default): when checkpointDir has no "
                        "block_timings.json, measure candidate bucketing "
                        "policies over 2 iterations and persist the result "
                        "(the reference's timing-run flow, main.cxx:50-91); "
                        "'never' skips measurement.")
    p.add_argument("--coordinator", default=None,
                   help="Multi-host: coordinator address host:port for "
                        "jax.distributed (or env JAX_COORDINATOR_ADDRESS). "
                        "All processes join one mesh spanning every host's "
                        "devices; the reference's MPI plane analog.")
    p.add_argument("--numProcesses", type=int, default=None,
                   help="Multi-host: total process count (JAX_NUM_PROCESSES).")
    p.add_argument("--processId", type=int, default=None,
                   help="Multi-host: this process's id (JAX_PROCESS_ID).")
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
    from ..parallel import distributed

    distributed.initialize(args.coordinator, args.numProcesses, args.processId)
    import jax

    # one writer/printer per job: non-coordinator processes run the same
    # SPMD program silently (the reference's rank-0 pattern, run.cxx:125)
    if jax.process_index() != 0:
        args.verbosity = 0

    from ..io.sdp_zip import read_sdp
    from ..io.solution import WriteSolution, save_solution
    from ..models.sdp import build_device_sdp
    from ..solver.checkpoint import load_checkpoint, save_checkpoint
    from ..solver.solve import run_solver
    from ..utils.platform import limbs_for_precision
    from ..utils.timers import Timers

    write_solution = WriteSolution.parse(args.writeSolution)
    verbosity = args.verbosity

    # TPU: SCALED f32 limbs (per-element exponents; full range, <= 216
    # bits), or the WIDE multi-word representation beyond that
    # (ops.mpwide; covers the reference's default --precision 400,
    # Solver_Parameters.cxx:18).  CPU: classic f64 limbs (any precision).
    scaled_limbs = 0
    if np_dtype.__name__ == "float32":
        scaled_limbs = limbs_for_precision(params.precision, dtype)
        if scaled_limbs > 27:
            raise SystemExit(
                f"--precision {params.precision} needs {scaled_limbs} f32 "
                "limbs; the wide representation supports <= 27 (648 bits). "
                "Use --platform cpu (float64 limbs) for higher precision.")
        import numpy as np

        K = -(-(24 * scaled_limbs) // 53) + 1   # f64 host limbs
        np_dtype = np.float64
    else:
        K = limbs_for_precision(params.precision, dtype)

    if verbosity >= 1:
        print(f"SDPB TPU-native solver")
        print(f"SDP directory   : {sdp_path}")
        print(f"out directory   : {out_dir}")
        print(f"checkpoint dir  : {ck_dir}")
        if scaled_limbs:
            print(f"precision       : {params.precision} bits "
                  f"({scaled_limbs} scaled float32 limbs + exponent)")
        else:
            print(f"precision       : {params.precision} bits "
                  f"({K} x {np_dtype.__name__} limbs)")

    timers = Timers()
    with timers.scope("read_sdp"):
        host = read_sdp(sdp_path, K, np_dtype)

    # timing run (reference: src/sdpb/main.cxx:50-91 — 2-iteration measured
    # costs drive block allocation): measure once, persist in the checkpoint
    # dir, reuse thereafter
    from ..parallel.timing import load_timings, save_timings, timing_run

    timings = load_timings(ck_dir)
    if (timings is None and args.timingRun != "never"
            and host.num_blocks > 1):
        if jax.process_count() == 1:
            if verbosity >= 1:
                print("no block timings found; running 2-iteration timing "
                      "run (persisted to checkpointDir/block_timings.json)")
            timings = timing_run(host, params, verbosity=verbosity,
                                 scaled_limbs=scaled_limbs)
            save_timings(ck_dir, timings)
        else:
            # multihost: the coordinator measures and broadcasts the record
            # so every process derives the identical bucketing policy (the
            # reference's root-decides pattern, main.cxx:50-91 +
            # run.cxx:125-126); the broadcast is also the barrier
            from ..parallel.timing import timing_run_broadcast

            if verbosity >= 1:
                print("no block timings found; coordinator running the "
                      "timing run (record broadcast to all processes)")
            timings = timing_run_broadcast(host, params, ck_dir,
                                           verbosity=verbosity,
                                           scaled_limbs=scaled_limbs)
    policy, quant, block_costs = "quantized", 8, None
    if timings is not None:
        policy = timings["chosen"]["policy"]
        quant = int(timings["chosen"]["quant"])
        block_costs = timings.get("block_costs")

    devices = jax.devices()
    mesh = None
    mesh_mode = "shard_map"
    if len(devices) > 1:
        from ..parallel.mesh import (_bucket_bytes, make_mesh, shard_sdp,
                                     shard_sdp_gspmd)

        mesh = make_mesh(devices)
        sdp = build_device_sdp(host, pad_to=mesh.size, shape_policy=policy,
                               quant=quant, block_costs=block_costs,
                               scaled_limbs=scaled_limbs)
        if any(_bucket_bytes(bk) > args.maxBlockMemory for bk in sdp.buckets):
            # oversized block(s): intra-block row sharding via the GSPMD
            # path (no batch padding needed there)
            mesh_mode = "gspmd"
            sdp = build_device_sdp(host, shape_policy=policy, quant=quant,
                                   block_costs=block_costs,
                                   scaled_limbs=scaled_limbs)
            sdp = shard_sdp_gspmd(sdp, mesh, big_bytes=args.maxBlockMemory)
        else:
            sdp = shard_sdp(sdp, mesh)
        if verbosity >= 1:
            print(f"devices         : {len(devices)} ({devices[0].platform}), "
                  f"blocks mesh of size {mesh.size}, mode {mesh_mode}")
    else:
        sdp = build_device_sdp(host, shape_policy=policy, quant=quant,
                               scaled_limbs=scaled_limbs)
        if verbosity >= 1:
            print(f"devices         : 1 ({devices[0].platform})")

    initial = load_checkpoint(initial_ck, sdp, verbosity) if initial_ck.exists() else None

    multihost = jax.process_count() > 1
    i_write = jax.process_index() == 0

    def _gathered(state):
        if multihost:
            from ..parallel.mesh import replicate_tree

            state = replicate_tree(state, mesh)
        return state

    def checkpoint_fn(state, it):
        state = _gathered(state)
        if i_write:
            save_checkpoint(ck_dir, sdp, state, options=params.to_dict(),
                            verbosity=verbosity)

    result = run_solver(
        sdp, params, verbosity=verbosity, mesh=mesh, mesh_mode=mesh_mode,
        big_bytes=args.maxBlockMemory, initial=initial,
        checkpoint_fn=checkpoint_fn, timers=timers,
        use_compile_cache=(mesh is None))

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

    result.state = _gathered(result.state)
    if not args.noFinalCheckpoint and i_write:
        save_checkpoint(ck_dir, sdp, result.state, options=params.to_dict(),
                        verbosity=verbosity)
    if i_write:
        save_solution(out_dir, result, sdp, write_solution, verbosity=verbosity)
    if verbosity >= 2:
        print(timers.to_json())
        # profiling file parity: the reference writes per-rank profiles into
        # ck.profiling/ at -v2 (write_timing.cxx:10-14, Timers.hxx:34-57)
        prof_dir = Path(str(ck_dir) + ".profiling")
        prof_dir.mkdir(parents=True, exist_ok=True)
        timers.write_profile(prof_dir / f"profiling.{jax.process_index()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
