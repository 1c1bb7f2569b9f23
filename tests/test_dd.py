"""Beyond-f64 accuracy tier (VERDICT r2 missing #3): double-double residual
refinement vs an EXACT rational-arithmetic oracle.

The reference's Settings{BigFloat} runs the whole solver at tol 2^-76
(types.jl:410-417). The TPU-native equivalent keeps the f64 search and pushes
the final fixed-active-set solve past f64 with compensated (double-double)
sweeps (solvers/refine.py::solve_qp_refined_dd). Float inputs are exactly
representable rationals, so Python Fractions give a ZERO-error oracle —
stronger than any mpmath tolerance.
"""

from fractions import Fraction

import numpy as np

from ssqp_tpu.solvers.refine import solve_qp_refined_dd
from ssqp_tpu.solvers.ssqp import solve_qp
from ssqp_tpu.types import make_qp


def _exact_solve(M_rows, rhs):
    """Gaussian elimination over Fractions (exact)."""
    n = len(rhs)
    A = [[Fraction(x) for x in row] + [Fraction(r)]
         for row, r in zip(M_rows, rhs)]
    for c in range(n):
        p = max(range(c, n), key=lambda r: abs(A[r][c]))
        assert A[p][c] != 0
        A[c], A[p] = A[p], A[c]
        inv = Fraction(1, 1) / A[c][c]
        A[c] = [v * inv for v in A[c]]
        for r in range(n):
            if r != c and A[r][c] != 0:
                f = A[r][c]
                A[r] = [vr - f * vc for vr, vc in zip(A[r], A[c])]
    return [A[r][n] for r in range(n)]


def test_dd_refinement_beats_f64_vs_exact_oracle():
    rng = np.random.default_rng(12)
    N = 12
    H = rng.standard_normal((N, N))
    V = H @ H.T / N + 0.5 * np.eye(N)
    q = rng.standard_normal(N)
    A = np.ones((1, N))
    b = np.array([1.0])
    # wide box: the optimum is interior, so the exact optimum solves the
    # equality KKT system — exactly representable as a Fractions solve
    Q = make_qp(V, q, A, b, d=np.full(N, -10.0), u=np.full(N, 10.0),
                dtype=np.float64)
    # the oracle must see EXACTLY the solver's data (make_qp symmetrizes V)
    V = np.asarray(Q.V)
    q = np.asarray(Q.q)

    r_dd, x_lo = solve_qp_refined_dd(Q, sweeps=6)
    assert int(r_dd.status) > 0
    assert np.all(np.asarray(r_dd.S[:N]) == 0)  # all IN (interior)
    r64 = solve_qp(Q)

    # exact oracle: [V A'; A 0][x; lam] = [-q; b] over Fractions
    K = np.block([[V, A.T], [A, np.zeros((1, 1))]])
    rhs = np.concatenate([-q, b])
    sol = _exact_solve(K.tolist(), rhs.tolist())
    x_exact = sol[:N]

    def exact_obj(x_frac):
        f = Fraction(0)
        for i in range(N):
            for j in range(N):
                f += Fraction(V[i, j]) * x_frac[i] * x_frac[j]
        f = f / 2
        for i in range(N):
            f += Fraction(q[i]) * x_frac[i]
        return f

    f_star = exact_obj(x_exact)

    xdd = [Fraction(float(np.asarray(r_dd.x)[i]))
           + Fraction(float(np.asarray(x_lo)[i])) for i in range(N)]
    x64 = [Fraction(float(np.asarray(r64.x)[i])) for i in range(N)]

    xinf_dd = max(abs(float(a - e)) for a, e in zip(xdd, x_exact))
    xinf_64 = max(abs(float(a - e)) for a, e in zip(x64, x_exact))
    gap_dd = abs(float(exact_obj(xdd) - f_star))
    gap_64 = abs(float(exact_obj(x64) - f_star))

    # the dd pair certifies beyond-f64 digits the plain path cannot
    assert xinf_dd < 1e-18, (xinf_dd, xinf_64)
    assert gap_dd < 1e-20, (gap_dd, gap_64)
    assert xinf_dd < 1e-3 * max(xinf_64, 1e-30)
    assert gap_dd <= gap_64 + 1e-30


def test_dd_with_active_bounds():
    """dd refinement on a problem whose optimum pins several coordinates:
    the refined system includes identity pin rows; the pair must still
    certify ~1e-18 against the exact KKT solve of the labeled set."""
    rng = np.random.default_rng(3)
    N = 10
    H = rng.standard_normal((N, N))
    V = H @ H.T / N + 0.5 * np.eye(N)
    q = rng.standard_normal(N)
    A = np.ones((1, N))
    b = np.array([1.0])
    u = np.full(N, 0.18)  # tight box pins several coords at the optimum
    Q = make_qp(V, q, A, b, d=np.zeros(N), u=u, dtype=np.float64)
    V = np.asarray(Q.V)  # make_qp symmetrizes; the oracle needs its exact data
    q = np.asarray(Q.q)
    r_dd, x_lo = solve_qp_refined_dd(Q, sweeps=6)
    assert int(r_dd.status) > 0
    S = np.asarray(r_dd.S[:N])
    assert (S != 0).any()  # some pins
    # exact oracle on the labeled active set: free rows stationarity +
    # pinned coordinates + budget row. The reduction (moving pins to the
    # rhs) must itself be EXACT — f64 subtractions here would plant
    # eps-scale noise bigger than what the dd pair resolves.
    free = S == 0
    nf = int(free.sum())
    idx = np.nonzero(free)[0]
    pin_val = np.where(S == 1, 0.0, np.where(S == 2, u, 0.0))
    K = np.zeros((nf + 1, nf + 1))
    K[:nf, :nf] = V[np.ix_(idx, idx)]
    K[:nf, nf] = 1.0
    K[nf, :nf] = 1.0
    pins = np.nonzero(~free)[0]
    rhs = []
    for k, i in enumerate(idx):
        r = -Fraction(q[i])
        for jj in pins:
            r -= Fraction(V[i, jj]) * Fraction(float(pin_val[jj]))
        rhs.append(r)
    rhs.append(Fraction(1) - sum(Fraction(float(pin_val[jj])) for jj in pins))
    sol = _exact_solve(K.tolist(), rhs)
    x_exact = [Fraction(0)] * N
    for k, i in enumerate(idx):
        x_exact[i] = sol[k]
    for i in np.nonzero(~free)[0]:
        x_exact[i] = Fraction(float(pin_val[i]))
    xdd = [Fraction(float(np.asarray(r_dd.x)[i]))
           + Fraction(float(np.asarray(x_lo)[i])) for i in range(N)]
    xinf_dd = max(abs(float(a - e)) for a, e in zip(xdd, x_exact))
    assert xinf_dd < 1e-18, xinf_dd
