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
