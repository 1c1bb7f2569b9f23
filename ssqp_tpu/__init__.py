"""ssqp_tpu — a TPU-native status-switching QP/LP solver framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the reference
Julia package StatusSwitchingQP.jl (dense active-set convex QP + LP via the
Status Switching Method): fixed-shape masked status bookkeeping, padded
Cholesky KKT solves under `lax.while_loop`, batched instances via `vmap`, and
instance sharding across device meshes via `shard_map`.
"""

from ssqp_tpu.types import (
    DN,
    EO,
    IN,
    LP,
    OE,
    QP,
    UP,
    MC_DEGENERATE_BOUNDS,
    MC_INFEASIBLE,
    MC_NO_CONSTRAINTS,
    MC_NOT_PSD,
    MC_OK,
    MC_REDUNDANT,
    Result,
    Settings,
    lp_from_qp,
    make_lp,
    make_qp,
    qp_from_lp,
    qp_frontier_L,
    qp_frontier_mu,
)

__all__ = [
    "IN", "DN", "UP", "OE", "EO",
    "LP", "QP", "Settings", "Result",
    "make_lp", "make_qp", "qp_from_lp", "lp_from_qp",
    "MC_OK", "MC_INFEASIBLE", "MC_REDUNDANT", "MC_NO_CONSTRAINTS",
    "MC_DEGENERATE_BOUNDS", "MC_NOT_PSD",
    "solve_qp", "simplex_lp", "solve_lp", "box_lp", "solve_qp_refined",
    "solve_qp_refined_dd", "solve_qp_diff",
    "qp_frontier_L", "qp_frontier_mu", "Model", "read_mps", "solve_mps",
    "write_mps",
]

__version__ = "0.1.0"


def __getattr__(name):  # lazy imports to keep package import light
    if name == "solve_qp":
        from ssqp_tpu.solvers.ssqp import solve_qp
        return solve_qp
    if name == "simplex_lp":
        from ssqp_tpu.solvers.lp import simplex_lp
        return simplex_lp
    if name == "solve_lp":
        from ssqp_tpu.solvers.cclp import solve_lp
        return solve_lp
    if name == "box_lp":
        from ssqp_tpu.solvers.boxlp import box_lp
        return box_lp
    if name == "solve_qp_refined":
        from ssqp_tpu.solvers.refine import solve_qp_refined
        return solve_qp_refined
    if name == "solve_qp_refined_dd":
        from ssqp_tpu.solvers.refine import solve_qp_refined_dd
        return solve_qp_refined_dd
    if name == "solve_qp_diff":
        from ssqp_tpu.solvers.diff import solve_qp_diff
        return solve_qp_diff
    if name == "Model":
        from ssqp_tpu.model import Model
        return Model
    if name in ("read_mps", "solve_mps", "write_mps"):
        from ssqp_tpu.utils import mps
        return getattr(mps, name)
    raise AttributeError(f"module 'ssqp_tpu' has no attribute {name!r}")
