"""Differentiable QP solves: sensitivities and gradient-based calibration.

The solver composes with jax.grad/jax.jacobian/jax.vmap through
`solve_qp_diff` (solvers/diff.py) — implicit differentiation at the optimum,
a capability the Julia reference has no analogue for. Three demos:

  1. frontier sensitivity dx*/dlambda (risk-aversion jacobian) vs finite
     differences;
  2. shadow prices: d(optimal value)/d(budget b) equals -lambda, straight
     from jax.grad;
  3. calibration: recover the risk aversion that produces a target
     allocation by gradient descent THROUGH the solver.

Run: python examples/differentiable.py
"""

import dataclasses
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

import ssqp_tpu
from ssqp_tpu.solvers.diff import qp_value, solve_qp_diff


def main():
    rng = np.random.default_rng(3)
    N = 32
    H = rng.standard_normal((N, N))
    V = (H @ H.T / N + 0.5 * np.eye(N)).astype(np.float32)
    mu = rng.uniform(0.0, 0.25, N).astype(np.float32)
    Q = ssqp_tpu.make_qp(V, mu, u=np.full(N, 3.0 / N, np.float32),
                         dtype=np.float32)

    # -- 1. frontier sensitivity --------------------------------------------
    def alloc(lam):
        Qi = dataclasses.replace(Q, q=-lam * jnp.asarray(mu))
        return solve_qp_diff(Qi).x

    lam0 = jnp.float32(0.8)
    dx = jax.jacfwd(alloc)(lam0)
    h = 1e-2
    fd = (alloc(lam0 + h) - alloc(lam0 - h)) / (2 * h)
    print(f"dx*/dlambda: |AD|={float(jnp.linalg.norm(dx)):.4f}  "
          f"max|AD-FD|={float(jnp.max(jnp.abs(dx - fd))):.2e}")

    # -- 2. shadow price of the budget --------------------------------------
    def value(b):
        Qi = dataclasses.replace(Q, b=b)
        r = solve_qp_diff(Qi)
        return qp_value(Qi, r.x)

    g_b = jax.grad(value)(Q.b)
    lam_eq = solve_qp_diff(Q).lam[: Q.M]
    print(f"shadow price: dV/db={float(g_b[0]):+.5f}  "
          f"-lambda_eq={float(-lam_eq[0]):+.5f}")

    # -- 3. calibrate risk aversion to a target allocation -------------------
    target = np.asarray(alloc(jnp.float32(1.3)))

    @jax.jit
    def loss(lam):
        return jnp.sum((alloc(lam) - target) ** 2)

    lam = jnp.float32(0.4)
    gl = jax.jit(jax.grad(loss))
    for i in range(40):
        lam = lam - 8.0 * gl(lam)
    print(f"calibration: recovered lambda={float(lam):.4f} (true 1.3), "
          f"loss={float(loss(lam)):.2e}")


if __name__ == "__main__":
    main()
