"""`approx_objective` executable: linear/quadratic objective of perturbed
SDPs from one solved SDP (/root/reference/src/approx_objective/main.cxx).

    approx_objective --sdp sdp.zip --newSdp new.zip --precision 400
                     [--solutionDir sdp_out] [--linear]

Requires the solution written with --writeSolution=x,y,X,Y (the X/Y state
rebuilds the frozen Schur solver).  Prints a JSON array of
{path, objective, d_objective, dd_objective}.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import mpmath


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="approx_objective")
    p.add_argument("--sdp", required=True)
    p.add_argument("--newSdp", required=True,
                   help="Perturbed SDP (zip/dir), or .nsv list of them")
    p.add_argument("--precision", type=int, required=True)
    p.add_argument("--solutionDir", default=None,
                   help="Default: sdp path with '_out' appended")
    p.add_argument("--linear", action="store_true",
                   help="Only compute the linear approximation")
    p.add_argument("--writeSolverState", action="store_true",
                   help="Serialize the frozen Schur solver (S-Cholesky, "
                        "S^-1 B, Q) into solutionDir/solver_state.npz so "
                        "later invocations skip the rebuild "
                        "(setup_solver.cxx:40-52 analog)")
    p.add_argument("--procsPerNode", type=int, default=0)
    p.add_argument("--platform", choices=["auto", "cpu"], default="cpu",
                   help="'cpu' (default): classic float64 limbs — "
                        "postprocessing-scale work; 'auto': the default "
                        "backend, with the SCALED/WIDE exponent-tracked "
                        "f32 representation on TPU (the production solver "
                        "numerics)")
    args = p.parse_args(argv)

    from .common import setup_backend

    setup_backend(force_cpu=(args.platform == "cpu"))
    import jax

    from ..io.sdp_zip import read_sdp
    from ..models.sdp import build_device_sdp
    from ..solver.checkpoint import load_text_checkpoint
    from ..tools.approx_objective import make_approx_fn, sdp_delta_buckets
    from ..utils.platform import default_base_dtype, limbs_for_precision
    from ..utils.strings import limbs_to_mpf
    import jax.numpy as jnp
    import numpy as np

    dtype = default_base_dtype()
    np_dtype = np.float32 if dtype == jnp.float32 else np.float64
    # f32 backends use the scaled/wide exponent-tracked representation
    # (the TPU production numerics; models.sdp.build_device_sdp)
    scaled_limbs = 0
    if np_dtype == np.float32:
        scaled_limbs = limbs_for_precision(args.precision, dtype)
        K = -(-(24 * scaled_limbs) // 53) + 1   # f64 host limbs
        np_dtype = np.float64
    else:
        K = limbs_for_precision(args.precision, dtype)
    base = args.sdp[:-4] if args.sdp.endswith(".zip") else args.sdp
    solution_dir = Path(args.solutionDir or (base + "_out"))

    host_old = read_sdp(args.sdp, K, np_dtype)
    sdp = build_device_sdp(host_old, scaled_limbs=scaled_limbs)
    state = load_text_checkpoint(solution_dir, sdp, verbosity=0)

    # the frozen Schur solver factors S at the SOLVED point, where
    # cond(S) ~ 1/gap^2 is maximal — use full factor precision (capped at
    # 9 base limbs in wide mode: factorizations stay on the base
    # representation, refinement recovers the rest; ops.mpwide)
    K_dev = sdp.b.K
    factor_limbs = min(K_dev, 9) if scaled_limbs else K
    n_refine = 1 if not scaled_limbs else max(1, -(-K_dev // factor_limbs))

    from ..tools.approx_objective import (load_reference_solver_state,
                                          load_solver_state, make_setup_fn,
                                          save_solver_state)

    frozen = None
    state_path = solution_dir / "solver_state.npz"
    if not args.linear:
        loaded = load_solver_state(state_path)
        if loaded is not None and loaded[1] == factor_limbs:
            frozen = loaded[0]
        else:
            # reference --writeSolverState text blocks (setup_solver.cxx
            # reuse path): skip the Schur rebuild when a reference run
            # left its frozen solver behind
            frozen = load_reference_solver_state(
                solution_dir, sdp, factor_limbs, n_refine)
        if frozen is None:
            setup = jax.jit(make_setup_fn(factor_limbs, n_refine))
            frozen = setup(sdp, state)
            if args.writeSolverState:
                save_solver_state(state_path, frozen, factor_limbs)

    fn = jax.jit(make_approx_fn(factor_limbs, n_refine),
                 static_argnames=("quadratic",))

    new_paths = [args.newSdp]
    if args.newSdp.endswith(".nsv"):
        from ..convert.pmp import read_nsv_paths

        new_paths = [str(s) for s in read_nsv_paths(args.newSdp)]

    ndigits = int(args.precision * 0.30103) + 1

    from ..utils.strings import mp_host_to_mpf

    def s(mp_val):
        host = jax.tree.map(np.asarray, mp_val)
        return mpmath.nstr(mp_host_to_mpf(host), ndigits,
                           strip_zeros=False, min_fixed=1, max_fixed=0)

    results = []
    for path in new_paths:
        host_new = read_sdp(path, K, np_dtype)
        d_cs, d_Bs = sdp_delta_buckets(sdp, host_old, host_new, K, np_dtype,
                                       scaled_limbs=scaled_limbs)
        from ..tools.approx_objective import stage_host_mp

        d_const = stage_host_mp(
            host_new.objective_const - host_old.objective_const, scaled_limbs)
        d_b = stage_host_mp(host_new.b - host_old.b, scaled_limbs)
        total, d_obj, dd_obj = fn(sdp, state, frozen, d_const, d_b, d_cs,
                                  d_Bs, quadratic=not args.linear)
        results.append({
            "path": str(path),
            "objective": s(total),
            "d_objective": s(d_obj),
            "dd_objective": s(dd_obj),
        })
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
