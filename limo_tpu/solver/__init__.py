from .ba_core import NormalEqs, ResidualStats, assemble, plane_boxplus
from .lm import apply_step, run_lm, solve_normal_equations
from .trimmed import SolveInfo, solve_trimmed
from .pose_only import PoseOnlyResult, pose_only_step

__all__ = [
    "NormalEqs", "ResidualStats", "assemble", "plane_boxplus",
    "apply_step", "run_lm", "solve_normal_equations",
    "SolveInfo", "solve_trimmed",
    "PoseOnlyResult", "pose_only_step",
]
