"""S-loop solver tests: reference smoke problems + constructed-optimum battery."""

import jax.numpy as jnp
import numpy as np
import pytest

from ssqp_tpu import DN, EO, IN, OE, UP, Settings, make_qp
from ssqp_tpu.solvers.ssqp import solve_qp, solve_qp_loop
from ssqp_tpu.utils.problems import (
    generate_qp_known_opt,
    kkt_residual,
    portfolio_start,
)


def warm(Q, z0, Sx0, Se0=None, settings=None):
    settings = settings or Settings()
    Se0 = np.full(Q.J, OE, np.int8) if Se0 is None else Se0
    from ssqp_tpu.solvers.ssqp import solve_qp_warm2

    return solve_qp_warm2(
        Q, jnp.asarray(Sx0, jnp.int8), jnp.asarray(Se0, jnp.int8),
        jnp.asarray(z0), settings,
    )


def test_reference_three_asset_portfolio():
    """The reference's smoke QP (test/runtests.jl:22-32): expects S=[UP,IN,IN]."""
    V = np.array([
        [1 / 100, 1 / 80, 1 / 100],
        [1 / 80, 1 / 16, 1 / 40],
        [1 / 100, 1 / 40, 1 / 25],
    ])
    up = np.array([0.7, np.inf, 0.7])
    Q = make_qp(V, u=up)
    z0, Sx0 = portfolio_start(np.zeros(3), up)
    res = warm(Q, z0, Sx0)
    assert int(res.status) > 0
    np.testing.assert_array_equal(np.asarray(res.S), [UP, IN, IN])
    z = np.asarray(res.x)
    assert abs(z.sum() - 1.0) < 1e-9
    assert abs(z[0] - 0.7) < 1e-9
    r = kkt_residual(V, np.zeros(3), np.ones((1, 3)), np.ones(1),
                     np.zeros((0, 3)), np.zeros(0), np.zeros(3), up, z)
    assert r["max"] < 1e-8


def test_equal_weight_unconstrained_interior():
    # V = I, no bounds active: optimum z = 1/N each
    N = 8
    Q = make_qp(np.eye(N))
    z0, Sx0 = portfolio_start(np.zeros(N), np.full(N, np.inf))
    res = warm(Q, z0, Sx0)
    assert int(res.status) > 0
    np.testing.assert_allclose(np.asarray(res.x), np.full(N, 1 / N), atol=1e-10)
    assert (np.asarray(res.S) == IN).all()


@pytest.mark.parametrize("seed", range(8))
def test_constructed_optimum_no_ineq(seed):
    gp = generate_qp_known_opt(seed, N=12, M=3, J=0, n_dn=3, n_up=2, j_act=0)
    Q = make_qp(gp.V, gp.q, gp.A, gp.b, d=gp.d, u=gp.u)
    # warm start from a feasible-ish point: project x_opt interior? Use the
    # optimum's own statuses but start all-IN at a feasible point: x_opt is
    # feasible, start there with all-IN statuses (loop must still verify).
    Sx0 = np.full(gp.x_opt.shape, IN, np.int8)
    res = warm(Q, gp.x_opt, Sx0)
    assert int(res.status) > 0
    np.testing.assert_allclose(np.asarray(res.x), gp.x_opt, atol=1e-7)
    f = 0.5 * np.asarray(res.x) @ gp.V @ np.asarray(res.x) + gp.q @ np.asarray(res.x)
    assert abs(f - gp.f_opt) < 1e-8


@pytest.mark.parametrize("seed", range(8))
def test_constructed_optimum_with_ineq(seed):
    gp = generate_qp_known_opt(100 + seed, N=10, M=2, J=4, n_dn=2, n_up=1, j_act=2)
    Q = make_qp(gp.V, gp.q, gp.A, gp.b, G=gp.G, g=gp.g, d=gp.d, u=gp.u)
    Sx0 = np.full(gp.x_opt.shape, IN, np.int8)
    Se0 = np.full(4, OE, np.int8)
    res = warm(Q, gp.x_opt, Sx0, Se0)
    assert int(res.status) > 0
    np.testing.assert_allclose(np.asarray(res.x), gp.x_opt, atol=1e-7)
    r = kkt_residual(gp.V, gp.q, gp.A, gp.b, gp.G, gp.g, gp.d, gp.u,
                     np.asarray(res.x))
    assert r["max"] < 1e-7


def test_status_vector_matches_constructed_active_set():
    gp = generate_qp_known_opt(7, N=10, M=2, J=3, n_dn=2, n_up=2, j_act=1)
    Q = make_qp(gp.V, gp.q, gp.A, gp.b, G=gp.G, g=gp.g, d=gp.d, u=gp.u)
    res = warm(Q, gp.x_opt, np.full(10, IN, np.int8), np.full(3, OE, np.int8))
    assert int(res.status) > 0
    S = np.asarray(res.S)
    np.testing.assert_array_equal(S[:10], gp.Sx_opt)
    np.testing.assert_array_equal(S[10:], gp.Se_opt)


def test_invalid_model_mc():
    # d == u triggers mc=-30 -> status -1 without solving (SSQP.jl:226-228)
    Q = make_qp(np.eye(2), d=np.array([0.3, 0.0]), u=np.array([0.3, 1.0]))
    res = solve_qp(Q)
    assert int(res.status) == -1


def test_warm_start_from_wrong_active_set():
    # start at a vertex with wrong statuses; loop must switch to the optimum
    gp = generate_qp_known_opt(3, N=8, M=1, J=0, n_dn=2, n_up=1, j_act=0)
    Q = make_qp(gp.V, gp.q, gp.A, gp.b, d=gp.d, u=gp.u)
    # feasible start: x_opt with every at-bound variable marked, others IN
    Sx0 = gp.Sx_opt.copy()
    res = warm(Q, gp.x_opt, Sx0)
    assert int(res.status) > 0
    np.testing.assert_allclose(np.asarray(res.x), gp.x_opt, atol=1e-7)


def test_kkt_report_diagnostics():
    # observability: batched device-resident KKT report (SURVEY.md §5)
    from ssqp_tpu.parallel.batch import solve_qp_batch, stack_qps
    from ssqp_tpu.utils.diagnostics import kkt_report

    gens = [generate_qp_known_opt(seed=s, N=10, M=2, J=3) for s in range(3)]
    Qb = stack_qps([
        make_qp(g.V, g.q, g.A, g.b, G=g.G, g=g.g, d=g.d, u=g.u)
        for g in gens
    ])
    res = solve_qp_batch(Qb, Settings())
    rep = kkt_report(Qb, res, batched=True)
    assert rep.solved.all()
    assert float(np.max(np.asarray(rep.feas_eq))) < 1e-8
    assert float(np.max(np.asarray(rep.stationarity))) < 1e-6
    assert (np.asarray(rep.iters) > 0).all()


class TestWaterfillSeed:
    """Water-filling PDAS seed (round 5): the exact separable-model active
    set that seeds identification on single-equality box QPs
    (solvers/ssqp.py::_waterfill_seed)."""

    def _oracle(self, a, q, D, d, u, beta):
        lo, hi = -1e3, 1e3
        for _ in range(200):
            mid = 0.5 * (lo + hi)
            s = a @ np.clip((-q - mid * a) / D, d, u)
            lo, hi = (mid, hi) if s > beta else (lo, mid)
        return np.clip((-q - 0.5 * (lo + hi) * a) / D, d, u)

    @pytest.mark.parametrize("seed", range(6))
    def test_matches_dual_bisection(self, seed):
        from ssqp_tpu.solvers.ssqp import _waterfill_seed

        rng = np.random.default_rng(seed)
        N = int(rng.integers(4, 24))
        D = rng.uniform(0.2, 3.0, N)
        q = rng.standard_normal(N)
        a = rng.standard_normal(N)
        if seed % 2 == 0:
            a = np.abs(a) + 0.1  # budget-row-like
        if seed % 3 == 0:
            a[0] = 0.0  # decoupled variable
        d = rng.uniform(-2, 0, N)
        u = d + rng.uniform(0.1, 2.0, N)
        if seed % 2 == 1:
            u[1] = np.inf  # long-only-style unbounded upper
        lamg = float(rng.uniform(-2, 2))
        xg = np.clip((-q - lamg * a) / D, d, u)
        beta = float(a @ xg)
        Q = make_qp(np.diag(D), q, A=a[None, :], b=np.array([beta]),
                    d=d, u=u)
        ok, Sx, z = _waterfill_seed(Q)
        assert bool(ok)
        x_ref = self._oracle(a, q, D, d, u, beta)
        np.testing.assert_allclose(np.asarray(z), x_ref, atol=1e-6)
        Sx = np.asarray(Sx)
        interior = (x_ref > d + 1e-7) & (x_ref < u - 1e-7)
        assert (Sx[interior] == IN).all()

    def test_seeded_solve_matches_unseeded(self):
        """End to end: the seed changes the PDAS trajectory, not the
        answer — solve_qp with/without pdas_waterfill agree to solver tol
        on a tight-box frontier instance."""
        import dataclasses
        from ssqp_tpu.solvers.ssqp import solve_qp

        rng = np.random.default_rng(11)
        N = 48
        H = rng.standard_normal((N, N))
        V = H @ H.T / N + 0.5 * np.eye(N)
        mu = rng.uniform(0, 0.2, N)
        Q = make_qp(V, -mu, u=np.full(N, 4.0 / N))
        s_on = Settings()
        s_off = dataclasses.replace(s_on, pdas_waterfill=False)
        r_on = solve_qp(Q, settings=s_on)
        r_off = solve_qp(Q, settings=s_off)
        assert int(r_on.status) > 0 and int(r_off.status) > 0
        np.testing.assert_allclose(np.asarray(r_on.x), np.asarray(r_off.x),
                                   atol=1e-8)
