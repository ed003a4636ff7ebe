"""Solver parameters — flag-for-flag with the reference's Solver_Parameters
(/root/reference/src/sdp_solve/Solver_Parameters/Solver_Parameters.cxx).

Numeric parameters are carried as DECIMAL STRINGS and parsed exactly into
MP limbs / mpmath, mirroring the reference's practice of constructing
BigFloat defaults from strings for cross-precision reproducibility
(Solver_Parameters.cxx:10-14).

`precision` keeps the reference's meaning (bits of significand); it is
mapped to the limb count of the MP arithmetic.  Note the practical ceiling
of ~120 bits for float32 limbs without exponent tracking (see
sdpb_tpu.ops.mpfloat); float64 limbs scale further.
"""
from __future__ import annotations

from dataclasses import dataclass, field, asdict
import sys


@dataclass
class SolverParameters:
    precision: int = 96
    find_primal_feasible: bool = False
    find_dual_feasible: bool = False
    detect_primal_feasible_jump: bool = False
    detect_dual_feasible_jump: bool = False
    max_iterations: int = 500
    max_runtime: int = sys.maxsize
    checkpoint_interval: int = 3600
    duality_gap_threshold: str = "1e-30"
    primal_error_threshold: str = "1e-30"
    dual_error_threshold: str = "1e-30"
    initial_matrix_scale_primal: str = "1e20"
    initial_matrix_scale_dual: str = "1e20"
    feasible_centering_parameter: str = "0.1"
    infeasible_centering_parameter: str = "0.3"
    step_length_reduction: str = "0.7"
    min_primal_step: str = "0"
    min_dual_step: str = "0"
    max_complementarity: str = "1e100"
    checkpoint_dir: str = ""
    initial_checkpoint_dir: str = ""
    # TPU extension (no reference analog): Cholesky factor precision in
    # LIMBS of the mixed-precision solve scheme (ops.linalg.PosdefSolver).
    # 0 = auto-size from Omega and the gap threshold, then self-heal upward
    # on conditioning failures.  Explicit values pin the factor (clamped to
    # [2, precision-derived cap]) — used when the auto model under-sizes
    # the endgame (each heal is a recompile).
    factor_limbs: int = 0
    # TPU extension: relative KKT solve-residual guard.  The empirical
    # factor-sizing law (solve.initial_factor_limbs) has a SILENT failure
    # mode — an under-ranged early-phase factor degrades the trajectory
    # with every stat finite (solve.py docstring).  Each iteration now
    # measures max_blocks ||S u - rhs|| / ||rhs|| of the predictor/
    # corrector Schur solves at full precision; exceeding this threshold
    # triggers the same self-heal as a non-finite stat (factor bump +
    # chunk replay).  "0" disables the guard.
    kkt_residual_threshold: str = "1e-2"

    def to_dict(self):
        return asdict(self)

    @staticmethod
    def option_names():
        """camelCase CLI names matching the reference's boost::program_options."""
        return {
            "precision": "precision",
            "find_primal_feasible": "findPrimalFeasible",
            "find_dual_feasible": "findDualFeasible",
            "detect_primal_feasible_jump": "detectPrimalFeasibleJump",
            "detect_dual_feasible_jump": "detectDualFeasibleJump",
            "max_iterations": "maxIterations",
            "max_runtime": "maxRuntime",
            "checkpoint_interval": "checkpointInterval",
            "duality_gap_threshold": "dualityGapThreshold",
            "primal_error_threshold": "primalErrorThreshold",
            "dual_error_threshold": "dualErrorThreshold",
            "initial_matrix_scale_primal": "initialMatrixScalePrimal",
            "initial_matrix_scale_dual": "initialMatrixScaleDual",
            "feasible_centering_parameter": "feasibleCenteringParameter",
            "infeasible_centering_parameter": "infeasibleCenteringParameter",
            "step_length_reduction": "stepLengthReduction",
            "min_primal_step": "minPrimalStep",
            "min_dual_step": "minDualStep",
            "max_complementarity": "maxComplementarity",
            "checkpoint_dir": "checkpointDir",
            "initial_checkpoint_dir": "initialCheckpointDir",
            "factor_limbs": "factorLimbs",
            "kkt_residual_threshold": "kktResidualThreshold",
        }
