"""Dual certificates — capability the reference does not have
(ConstraintDual/DualObjectiveValue unsupported, MOIwrapper.jl:255-257).

Checks stationarity and complementary slackness from the duals returned in
``Result.lam``/``Result.gamma`` (convention documented in types.py::Result).
"""

import numpy as np

import jax

from ssqp_tpu.types import DN, EO, IN, OE, UP, Settings, make_qp
from ssqp_tpu.solvers.ssqp import solve_qp
from ssqp_tpu.utils.problems import generate_qp_known_opt

TOL = 1e-6


def _check_certificate(Q, r):
    x = np.asarray(r.x, float)
    lam = np.asarray(r.lam, float)
    gamma = np.asarray(r.gamma, float)
    V, q = np.asarray(Q.V), np.asarray(Q.q)
    A, G = np.asarray(Q.A), np.asarray(Q.G)
    d, u = np.asarray(Q.d), np.asarray(Q.u)
    S = np.asarray(r.S)
    AG = np.concatenate([A, G], axis=0) if Q.J else A

    # stationarity identity: Vx + q + AG'lam == gamma
    stat = V @ x + q + AG.T @ lam - gamma
    assert np.abs(stat).max() < TOL

    # gamma ~ 0 on free coordinates; signed on bound coordinates
    Sx = S[: Q.N]
    assert np.abs(gamma[Sx == IN]).max(initial=0.0) < TOL
    assert gamma[Sx == DN].min(initial=0.0) > -TOL
    assert gamma[Sx == UP].max(initial=0.0) < TOL

    # inequality multipliers: zero on inactive rows, >= 0 on active rows;
    # complementary slackness mu_j * (g - Gx)_j == 0
    if Q.J:
        mu = lam[Q.M:]
        Se = S[Q.N:]
        assert np.abs(mu[Se == OE]).max(initial=0.0) < TOL
        assert mu[Se == EO].min(initial=0.0) > -TOL
        slack = np.asarray(Q.g) - G @ x
        assert np.abs(mu * slack).max(initial=0.0) < TOL
    # bound complementary slackness
    assert np.abs(gamma * np.where(gamma > 0, x - d, 0.0)).max() < TOL
    assert np.abs(gamma * np.where(gamma < 0, np.where(
        np.isfinite(u), u - x, 1.0), 0.0)).max() < TOL


class TestDuals:
    def test_generated_with_known_multipliers(self):
        for s in range(5):
            p = generate_qp_known_opt(seed=60 + s, N=12, M=2, J=4)
            Q = make_qp(p.V, p.q, p.A, p.b, G=p.G, g=p.g, d=p.d, u=p.u)
            r = solve_qp(Q)
            assert int(r.status) > 0
            _check_certificate(Q, r)

    def test_portfolio_frontier(self):
        rng = np.random.default_rng(1)
        N = 32
        H = rng.standard_normal((N, N))
        V = H @ H.T / N + 0.5 * np.eye(N)
        mu = rng.uniform(0.0, 0.2, N)
        Q = make_qp(V, -1.2 * mu, u=np.full(N, 4.0 / N))
        r = solve_qp(Q)
        assert int(r.status) > 0
        _check_certificate(Q, r)

    def test_batch_carries_duals(self):
        from ssqp_tpu.parallel.batch import frontier_batch, solve_qp_batch

        rng = np.random.default_rng(2)
        N = 16
        H = rng.standard_normal((N, N))
        V = H @ H.T / N + 0.5 * np.eye(N)
        mu = rng.uniform(0.0, 0.2, N)
        Q = make_qp(V, mu, u=np.full(N, 6.0 / N))
        Qb, shared = frontier_batch(Q, np.linspace(0.1, 1.5, 8))
        res = solve_qp_batch(Qb, Settings(), shared=shared)
        assert res.lam.shape == (8, Q.M + Q.J)
        assert res.gamma.shape == (8, N)
        for i in range(8):
            Qi = make_qp(V, -float(np.linspace(0.1, 1.5, 8)[i]) * mu,
                         u=np.full(N, 6.0 / N))
            ri = type(res)(res.x[i], res.S[i], res.status[i],
                           res.lam[i], res.gamma[i])
            assert int(res.status[i]) > 0
            _check_certificate(Qi, ri)

    def test_model_duals(self):
        from ssqp_tpu.model import Model

        p = generate_qp_known_opt(seed=77, N=8, M=1, J=2)
        Q = make_qp(p.V, p.q, p.A, p.b, G=p.G, g=p.g, d=p.d, u=p.u)
        m = Model.from_problem(Q)
        assert m.optimize() == "OPTIMAL"
        du = m.duals()
        assert du["eq"].shape == (1,)
        assert du["ineq"].shape == (2,)
        assert du["bounds"].shape == (8,)
        x = m.values()
        stat = (np.asarray(Q.V) @ x + np.asarray(Q.q)
                + np.asarray(Q.A).T @ du["eq"]
                + np.asarray(Q.G).T @ du["ineq"] - du["bounds"])
        assert np.abs(stat).max() < TOL

    def test_refined_solve_keeps_duals(self):
        """refine_result must not strip the dual certificate — the refined
        point gets re-derived lam/gamma (every-QP-solve invariant)."""
        import jax.numpy as jnp

        from ssqp_tpu.solvers.refine import solve_qp_refined

        p = generate_qp_known_opt(seed=5, N=10, M=1, J=2)
        Q = make_qp(np.asarray(p.V, np.float64), np.asarray(p.q, np.float64),
                    np.asarray(p.A, np.float64), np.asarray(p.b, np.float64),
                    G=np.asarray(p.G, np.float64), g=np.asarray(p.g, np.float64),
                    d=np.asarray(p.d, np.float64), u=np.asarray(p.u, np.float64),
                    dtype=np.float64)
        r = solve_qp_refined(Q, search_dtype=jnp.float32)
        assert int(r.status) > 0
        assert r.lam is not None and r.gamma is not None
        _check_certificate(Q, r)


# ---------------------------------------------------------------------------
# LP dual certificates (VERDICT r2 item 3): both LP engines attach
# Result.lam/.gamma; cross-checked against scipy linprog's marginals on the
# conformance LPs (sign map documented in Model.duals).
# ---------------------------------------------------------------------------

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from conformance.registry import REGISTRY  # noqa: E402
from ssqp_tpu.types import make_lp  # noqa: E402


def _check_lp_certificate(P, r, tol=1e-6):
    """Validity of the LP certificate: stationarity identity, signs, and
    complementary slackness (min-sense convention, types.py::Result)."""
    x = np.asarray(r.x, float)
    lam = np.asarray(r.lam, float)
    gamma = np.asarray(r.gamma, float)
    c = np.asarray(P.c, float)
    A, G = np.asarray(P.A, float), np.asarray(P.G, float)
    S = np.asarray(r.S)
    AG = np.concatenate([A, G], axis=0) if P.J else A
    stat = c + (AG.T @ lam if AG.shape[0] else 0.0) - gamma
    assert np.abs(stat).max(initial=0.0) < tol
    Sx = S[: P.N]
    assert np.abs(gamma[Sx == IN]).max(initial=0.0) < tol
    assert gamma[Sx == DN].min(initial=0.0) > -tol
    assert gamma[Sx == UP].max(initial=0.0) < tol
    if P.J:
        mu = lam[P.M:]
        Se = S[P.N:]
        assert np.abs(mu[Se == OE]).max(initial=0.0) < tol
        assert mu[Se == EO].min(initial=0.0) > -tol
        slack = np.asarray(P.g) - G @ x
        assert np.abs(mu * slack).max(initial=0.0) < 10 * tol


def test_lp_duals_vs_linprog_marginals():
    from scipy.optimize import linprog

    from ssqp_tpu.solvers.cclp import solve_lp
    from ssqp_tpu.solvers.lp import simplex_lp

    compared = validated = 0
    for case in REGISTRY:
        if case.kind != "lp" or case.expect != "optimal":
            continue
        P = make_lp(case.c, case.A, case.b, G=case.G, g=case.g, d=case.d,
                    u=case.u)
        if P.mc <= 0:
            continue
        c = np.asarray(P.c, float)
        A, b = np.asarray(P.A, float), np.asarray(P.b, float)
        G, g = np.asarray(P.G, float), np.asarray(P.g, float)
        d, u = np.asarray(P.d, float), np.asarray(P.u, float)
        ref = linprog(c, A_ub=G if P.J else None, b_ub=g if P.J else None,
                      A_eq=A if P.M else None, b_eq=b if P.M else None,
                      bounds=list(zip(d, u)), method="highs")
        if not ref.success:
            continue
        for engine, solver in (("simplex", simplex_lp), ("cclp", solve_lp)):
            if engine not in case.engines:
                continue
            r = solver(P)
            if int(r.status) <= 0 or r.lam is None:
                continue
            _check_lp_certificate(P, r)
            validated += 1
            if int(r.status) != 1:
                continue  # non-unique optimum: marginals not comparable
            x = np.asarray(r.x, float)
            if np.abs(x - ref.x).max() > 1e-7:
                continue  # different optimal vertex
            lam = np.asarray(r.lam, float)
            gamma = np.asarray(r.gamma, float)
            # strong duality always holds for a valid certificate: the dual
            # objective equals the primal optimum (guards the degenerate
            # cases below, where the marginals themselves are non-unique)
            slack = (g - G @ x) if P.J else np.zeros(0)
            act_g = slack < 1e-7 if P.J else np.zeros(0, bool)
            bnd = np.where(gamma > 1e-9, np.where(np.isfinite(d), d, 0.0),
                           np.where(gamma < -1e-9,
                                    np.where(np.isfinite(u), u, 0.0), 0.0))
            dual_obj = (-(b @ lam[: P.M]) - (g @ lam[P.M:] if P.J else 0.0)
                        + bnd @ gamma)
            assert abs(dual_obj - ref.fun) < 1e-6 * (1 + abs(ref.fun))
            # exact marginal agreement is only well-posed at a NONDEGENERATE
            # vertex (active rows independent and exactly N of them);
            # degenerate cases (e.g. the transport LP's redundant supply/
            # demand rows) have a dual face — our min-norm ridge recovery
            # and HiGHS's vertex choice legitimately differ there
            rows = [A] if P.M else []
            if P.J and act_g.any():
                rows.append(G[act_g])
            at_d = np.abs(x - d) < 1e-7
            at_u = np.abs(x - u) < 1e-7
            nb = int(at_d.sum() + at_u.sum())
            eye = np.eye(P.N)
            if nb:
                rows.append(eye[at_d | at_u])
            Mact = np.vstack(rows) if rows else np.zeros((0, P.N))
            nondegenerate = (
                Mact.shape[0] == P.N
                and np.linalg.matrix_rank(Mact, tol=1e-9) == P.N
            )
            if not nondegenerate:
                continue
            # scipy convention: eq/ineq marginals are the NEGATED lam;
            # lower+upper marginals sum to the reduced gradient gamma
            if P.M:
                np.testing.assert_allclose(
                    np.asarray(ref.eqlin.marginals), -lam[: P.M], atol=1e-6)
            if P.J:
                np.testing.assert_allclose(
                    np.asarray(ref.ineqlin.marginals), -lam[P.M:], atol=1e-6)
            np.testing.assert_allclose(
                np.asarray(ref.lower.marginals) + np.asarray(ref.upper.marginals),
                gamma, atol=1e-6)
            compared += 1
    # the battery must genuinely exercise the comparison
    assert validated >= 60, validated
    assert compared >= 30, compared


def test_box_lp_duals():
    from ssqp_tpu.solvers.cclp import solve_lp

    P = make_lp([1.0, -2.0, 0.5], A=np.zeros((0, 3)), b=np.zeros(0),
                d=[-1.0, -1.0, -1.0], u=[2.0, 2.0, 2.0])
    r = solve_lp(P)  # box-only -> closed-form path
    assert int(r.status) == 1
    _check_lp_certificate(P, r)
