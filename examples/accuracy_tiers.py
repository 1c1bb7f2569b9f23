"""Accuracy tiers (reference: Settings{BigFloat}, types.jl:410-417).

The reference's arbitrary-precision story is type-genericity: run the same
algorithm in BigFloat with tol 2^-76. The TPU-native ladder instead:

  1. f32 search           — TPU speed, ~1e-7 objective accuracy
  2. f32 search + f64 refinement (solve_qp_refined, ONE fused dispatch)
  3. f64 search + double-double residual sweeps (solve_qp_refined_dd)
     — the solution comes back as an unevaluated f64 PAIR (x, x_lo)
     carrying ~32 significant digits

Run: python examples/accuracy_tiers.py   (CPU ok; enables x64)
"""

import pathlib
import sys
from fractions import Fraction

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

# This demo is about f64/beyond-f64 digits: run on CPU (f64 LU is
# unsupported on TPU — the TPU recipe is f32 search + f64 refinement,
# see solvers/refine.py).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

import ssqp_tpu


def main():
    rng = np.random.default_rng(7)
    N = 12
    H = rng.standard_normal((N, N))
    V = H @ H.T / N + 0.5 * np.eye(N)
    q = rng.standard_normal(N)
    Q = ssqp_tpu.make_qp(V, q, d=np.full(N, -10.0), u=np.full(N, 10.0),
                         dtype=np.float64)
    Vx, qx = np.asarray(Q.V), np.asarray(Q.q)  # make_qp symmetrizes

    # exact optimum via rational arithmetic (floats ARE rationals)
    n = N + 1
    K = np.zeros((n, n))
    K[:N, :N] = Vx
    K[:N, N] = 1.0
    K[N, :N] = 1.0
    rhs = np.concatenate([-qx, [1.0]])
    A = [[Fraction(K[i, j]) for j in range(n)] + [Fraction(rhs[i])]
         for i in range(n)]
    for c in range(n):
        p = max(range(c, n), key=lambda r: abs(A[r][c]))
        A[c], A[p] = A[p], A[c]
        inv = 1 / A[c][c]
        A[c] = [v * inv for v in A[c]]
        for r in range(n):
            if r != c and A[r][c] != 0:
                f = A[r][c]
                A[r] = [vr - f * vc for vr, vc in zip(A[r], A[c])]
    x_star = [A[r][n] for r in range(N)]

    def err(pairs):
        return max(abs(float(p - e)) for p, e in zip(pairs, x_star))

    r32 = ssqp_tpu.solve_qp_refined(Q, search_dtype=jnp.float32)
    pairs32 = [Fraction(float(v)) for v in np.asarray(r32.x)]
    print(f"tier 2 (f32 search + f64 refine): ||x-x*||_inf = {err(pairs32):.2e}")

    r64 = ssqp_tpu.solve_qp(Q)
    pairs64 = [Fraction(float(v)) for v in np.asarray(r64.x)]
    print(f"plain f64 solve:                  ||x-x*||_inf = {err(pairs64):.2e}")

    rdd, xlo = ssqp_tpu.solve_qp_refined_dd(Q)
    pairsdd = [Fraction(float(a)) + Fraction(float(b))
               for a, b in zip(np.asarray(rdd.x), np.asarray(xlo))]
    print(f"tier 3 (double-double pair):      ||x-x*||_inf = {err(pairsdd):.2e}")


if __name__ == "__main__":
    main()
