"""Portfolio selection walkthrough (reference: examples/ + README usage).

Solves the reference's default portfolio problem and its variants through
every API layer: direct solve, warm start, frontier constructors, the
modeling API, and the high-accuracy refined solve.

Run: python examples/portfolio.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import ssqp_tpu


def main():
    rng = np.random.default_rng(0)
    N = 16
    H = rng.standard_normal((N, N))
    V = H @ H.T / N + 0.25 * np.eye(N)  # covariance
    rets = rng.uniform(0.02, 0.25, N)  # expected returns

    # 1. The reference's default problem: min ½x'Vx s.t. 1'x = 1, x >= 0
    Q = ssqp_tpu.make_qp(V)
    res = ssqp_tpu.solve_qp(Q)
    print(f"min-variance portfolio: status={int(res.status)} "
          f"risk={np.sqrt(res.x @ V @ res.x):.4f}")

    # 2. Risk/return tradeoff via the L-parameterized frontier constructor
    Qr = ssqp_tpu.make_qp(V, rets)  # q field holds expected returns
    QL = ssqp_tpu.qp_frontier_L(Qr, 1.0)
    resL = ssqp_tpu.solve_qp(QL)
    print(f"L=1 frontier point: ret={resL.x @ rets:.4f} "
          f"risk={np.sqrt(resL.x @ V @ resL.x):.4f}")

    # 3. Target-return variant (mu-parameterized)
    Qmu = ssqp_tpu.qp_frontier_mu(Qr, float(rets.mean()))
    resmu = ssqp_tpu.solve_qp(Qmu)
    print(f"mu-target point: ret={resmu.x @ rets:.4f} (target {rets.mean():.4f})")

    # 4. Warm start from a previous solution (the reference's sweep trick)
    res2 = ssqp_tpu.solve_qp(QL, S=resL.S, x0=resL.x)
    print(f"warm restart converged in {int(res2.status)} iteration(s)")

    # 5. Modeling API with extra constraints (sector cap)
    m = ssqp_tpu.Model()
    xs = m.add_variables(N, lb=0.0, ub=0.3)
    m.add_eq({i: 1.0 for i in xs}, 1.0)
    m.add_le({i: 1.0 for i in xs[: N // 2]}, 0.6)  # sector cap
    m.set_objective(quad={(i, j): V[i, j] for i in xs for j in xs
                          if V[i, j] != 0.0},
                    lin={i: -rets[i] for i in xs})
    print(f"model API: {m.optimize()} objective={m.objective_value():.5f}")

    # 6. High-accuracy tier: f32 active-set search + f64 refinement
    resr = ssqp_tpu.solve_qp_refined(Q, search_dtype=np.float32)
    print(f"refined solve matches f64 path to "
          f"{np.abs(np.asarray(resr.x) - np.asarray(res.x)).max():.2e}")


if __name__ == "__main__":
    main()
