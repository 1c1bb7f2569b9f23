"""MPS file workflow (reference: examples/rwMOI.jl — read a problem file,
hand it to the solver through the modeling layer, inspect the results).

The reference demonstrates MPS -> MOI -> SimplexLP; the TPU-native
equivalent is MPS -> Model -> solve, with dual certificates on top (a
capability the reference lacks, MOIwrapper.jl:255-257).

Run: python examples/mps_workflow.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import ssqp_tpu

DATA = pathlib.Path(__file__).resolve().parents[1] / "tests" / "data"


def main():
    # 1. Read + solve an LP fixture in one call
    m = ssqp_tpu.solve_mps(DATA / "simple_lp.mps")
    print(f"simple_lp.mps: {m.termination_status()} "
          f"objective={m.objective_value():.6f}")
    print("  x =", np.round(m.values(), 6))

    # 2. A QP with a QMATRIX section goes through the same entry point
    mq = ssqp_tpu.solve_mps(DATA / "simple_qp.mps")
    print(f"simple_qp.mps: {mq.termination_status()} "
          f"objective={mq.objective_value():.6f}")

    # 3. read_mps returns the Model un-solved: adjust, then optimize —
    #    the round trip the reference scripts do via JuMP
    m2 = ssqp_tpu.read_mps(DATA / "bounds_ranges.mps")
    m2.optimize()
    print(f"bounds_ranges.mps: {m2.termination_status()} "
          f"objective={m2.objective_value():.6f}")

    # 4. Dual certificates for the constraint rows (beyond the reference)
    duals = mq.duals()
    if duals is not None:
        print("  row duals:", {k: np.round(v, 6) for k, v in duals.items()}
              if isinstance(duals, dict) else np.round(np.asarray(duals), 6))


if __name__ == "__main__":
    main()
