"""Solution output: out.txt + x/y vectors + X/Y matrices, byte-format-
compatible with the reference solver's save_solution
(/root/reference/src/sdpb/save_solution.cxx:36-125) so downstream tools
(spectrum, approx_objective, plotting scripts) interoperate.

PSD block numbering follows the reference: block j's even-parity matrix is
X_matrix_<2j>.txt, odd-parity X_matrix_<2j+1>.txt; odd blocks with zero
size are skipped (save_solution.cxx:105-121).
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..models.sdp import DeviceSDP
from ..solver.state import SolverState
from ..utils.strings import limbs_to_str
from .text_blocks import write_text_matrix


@dataclass(frozen=True)
class WriteSolution:
    """Parsed --writeSolution flags (reference Write_Solution,
    /root/reference/src/sdp_solve/Write_Solution.cxx:8-41)."""

    vector_x: bool = True
    vector_y: bool = True
    matrix_X: bool = False
    matrix_Y: bool = False

    @classmethod
    def parse(cls, spec: str) -> "WriteSolution":
        flags = dict(vector_x=False, vector_y=False, matrix_X=False, matrix_Y=False)
        for token in spec.split(","):
            token = token.strip()
            if not token:
                continue
            if token == "x":
                flags["vector_x"] = True
            elif token == "y":
                flags["vector_y"] = True
            elif token == "X":
                flags["matrix_X"] = True
            elif token == "Y":
                flags["matrix_Y"] = True
            else:
                raise ValueError(
                    f"Invalid argument to --writeSolution: '{token}'")
        return cls(**flags)


def psd_real_indices(dim: int, h_pad: int, h_real: int) -> np.ndarray:
    """Row indices of the real PSD dims inside a dim*h_pad padded matrix
    (each of the dim diagonal copies keeps its first h_real rows)."""
    return np.concatenate(
        [np.arange(d * h_pad, d * h_pad + h_real) for d in range(dim)]
    ) if dim > 0 and h_real > 0 else np.zeros(0, dtype=int)


def host_blocks(sdp: DeviceSDP, state: SolverState) -> Dict[int, dict]:
    """Un-bucket the device state into per-(real)-block host limb arrays,
    slicing away shape padding.

    Returns {block_index: {x: [K,P_real], X_even: [K,pe,pe], X_odd,
    Y_even, Y_odd}} with padding entries dropped."""
    from ..ops import mpfloat as mp

    out: Dict[int, dict] = {}
    for bk, bs in zip(sdp.buckets, state.buckets):
        sh = bk.shape
        # always materialize as CLASSIC float64 limbs: the portable on-disk
        # number format, independent of the device representation
        x = mp.host_f64_limbs(bs.x)
        mats = {name: mp.host_f64_limbs(getattr(bs, name))
                for name in ("X_even", "X_odd", "Y_even", "Y_odd")}
        K = x.shape[0]
        for i, rs in enumerate(bk.real_sizes):
            if rs.block_index < 0:
                continue
            xi = x[:, i].reshape(K, sh.n_pairs, sh.num_points)[:, :, :rs.num_points]
            entry = {"x": xi.reshape(K, -1)}
            for name in mats:
                h_pad = sh.h_even if name.endswith("even") else sh.h_odd
                h_real = rs.h_even if name.endswith("even") else rs.h_odd
                m = mats[name][:, i]
                if h_real == h_pad:
                    entry[name] = m
                else:
                    ridx = psd_real_indices(sh.dim, h_pad, h_real)
                    entry[name] = m[:, ridx[:, None], ridx[None, :]]
            out[rs.block_index] = entry
    return out


def save_solution(
    out_dir,
    result,
    sdp: DeviceSDP,
    write_solution: WriteSolution = WriteSolution(),
    runtime_label: str = "Solver runtime ",
    verbosity: int = 1,
    print_fn=print,
) -> None:
    """Write out.txt (+ y.txt, x_<i>.txt, X/Y_matrix_<i>.txt per flags)."""
    out_dir = Path(out_dir)
    if verbosity >= 1:
        print_fn(f"Saving solution to      : {out_dir}")
    out_dir.mkdir(parents=True, exist_ok=True)

    # full working precision, like set_stream_precision in the reference
    state = result.state
    mant = 24 if str(state.y.dtype) == "float32" else 53
    ndigits = int(mant * state.y.K * 0.30103) + 1

    (out_dir / "out.txt").write_text(
        f'terminateReason = "{result.terminate_reason}";\n'
        f"primalObjective = {mp_str(result.primal_objective, ndigits)};\n"
        f"dualObjective   = {mp_str(result.dual_objective, ndigits)};\n"
        f"dualityGap      = {mp_str(result.duality_gap, ndigits)};\n"
        f"primalError     = {mp_str(result.primal_error, ndigits)};\n"
        f"dualError       = {mp_str(result.dual_error, ndigits)};\n"
        f"{runtime_label:<16s}= {int(result.runtime)};\n")

    if write_solution.vector_y:
        from ..ops import mpfloat as mp

        y = mp.host_f64_limbs(state.y)  # [K64, N]
        write_text_matrix(out_dir / "y.txt", y[:, :, None])

    if write_solution.vector_x or write_solution.matrix_X or write_solution.matrix_Y:
        blocks = host_blocks(sdp, state)
        for idx, data in sorted(blocks.items()):
            if write_solution.vector_x:
                write_text_matrix(out_dir / f"x_{idx}.txt", data["x"][:, :, None])
            for parity, name in ((0, "even"), (1, "odd")):
                suffix = f"{2 * idx + parity}.txt"
                if write_solution.matrix_X and data[f"X_{name}"].shape[-1] > 0:
                    write_text_matrix(out_dir / f"X_matrix_{suffix}", data[f"X_{name}"])
                if write_solution.matrix_Y and data[f"Y_{name}"].shape[-1] > 0:
                    write_text_matrix(out_dir / f"Y_matrix_{suffix}", data[f"Y_{name}"])


def mp_str(v, ndigits: int) -> str:
    """Decimal string of an mpmath value or float (out.txt style)."""
    import mpmath

    if isinstance(v, float):
        v = mpmath.mpf(v)
    return mpmath.nstr(v, ndigits, strip_zeros=False, min_fixed=1, max_fixed=0)
