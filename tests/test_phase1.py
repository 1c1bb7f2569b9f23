"""Phase-1 simplex + cold-start solveQP tests (reference initQP path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ssqp_tpu import DN, EO, IN, OE, UP, Settings, make_qp
from ssqp_tpu.solvers.phase1 import init_qp_traced
from ssqp_tpu.solvers.ssqp import solve_qp, solve_qp_auto
from ssqp_tpu.utils.problems import generate_qp_known_opt, kkt_residual


def feasible(Q, x, tol=1e-8):
    x = np.asarray(x)
    ok = True
    if Q.M:
        ok &= np.abs(np.asarray(Q.A) @ x - np.asarray(Q.b)).max() < tol
    if Q.J:
        ok &= (np.asarray(Q.G) @ x - np.asarray(Q.g)).max() < tol
    ok &= (x - np.asarray(Q.d)).min() > -tol
    ok &= (np.asarray(Q.u) - x).min() > -tol
    return bool(ok)


def test_phase1_portfolio_feasible():
    V = np.eye(3)
    Q = make_qp(V, u=np.array([0.7, np.inf, 0.7]))
    x0, Sx, Se, st = init_qp_traced(Q, Settings())
    assert int(st) == 1
    assert feasible(Q, x0)


def test_cold_start_three_asset_reference():
    V = np.array([
        [1 / 100, 1 / 80, 1 / 100],
        [1 / 80, 1 / 16, 1 / 40],
        [1 / 100, 1 / 40, 1 / 25],
    ])
    Q = make_qp(V, u=np.array([0.7, np.inf, 0.7]))
    res = solve_qp(Q)
    assert int(res.status) > 0
    np.testing.assert_array_equal(np.asarray(res.S), [UP, IN, IN])


def test_phase1_infeasible():
    # 1'z = 1 but z >= 2 elementwise: infeasible
    Q = make_qp(np.eye(2), d=np.array([2.0, 2.0]))
    res = solve_qp(Q)
    assert int(res.status) == 0


def test_free_variables():
    # all-free with no inequalities -> mc=-20, status -1 through the direct
    # API (reference types.jl:280-284; the Model API solves it analytically)
    N = 5
    Q = make_qp(np.eye(N), d=np.full(N, -np.inf), u=np.full(N, np.inf))
    assert Q.mc == -20
    res = solve_qp(Q)
    assert int(res.status) == -1


def test_free_variables_with_inequality():
    # min 1/2 ||x||^2 s.t. sum x = 1, x free, plus a slack inequality:
    # optimum x = 1/N (free-variable split path through Phase-1)
    N = 5
    G = np.zeros((1, N))
    G[0, 0] = 1.0
    Q = make_qp(np.eye(N), G=G, g=[10.0],
                d=np.full(N, -np.inf), u=np.full(N, np.inf))
    res = solve_qp(Q)
    assert int(res.status) > 0
    np.testing.assert_allclose(np.asarray(res.x), np.full(N, 1 / N), atol=1e-8)


def test_flipped_upper_only_variables():
    # x in (-inf, 0.1]: optimum of min 1/2||x||^2 s.t. sum x = 1 clips at 0.1
    N = 4
    Q = make_qp(np.eye(N), d=np.full(N, -np.inf), u=np.full(N, 0.3))
    res = solve_qp(Q)
    assert int(res.status) > 0
    assert feasible(Q, res.x)
    np.testing.assert_allclose(np.asarray(res.x), np.full(N, 0.25), atol=1e-8)


def test_flipped_active_upper():
    # force some upper bounds active: u = [0.2, 0.2, inf, inf] with free lower
    N = 4
    V = np.eye(N)
    u = np.array([0.2, 0.2, np.inf, np.inf])
    Q = make_qp(V, d=np.full(N, -np.inf), u=u)
    res = solve_qp(Q)
    assert int(res.status) > 0
    assert feasible(Q, res.x)
    r = kkt_residual(V, np.zeros(N), np.ones((1, N)), np.ones(1),
                     np.zeros((0, N)), np.zeros(0), np.full(N, -np.inf), u,
                     np.asarray(res.x))
    assert r["max"] < 1e-7


@pytest.mark.parametrize("seed", range(6))
def test_cold_constructed_optimum(seed):
    gp = generate_qp_known_opt(300 + seed, N=10, M=2, J=4, n_dn=2, n_up=1, j_act=2)
    Q = make_qp(gp.V, gp.q, gp.A, gp.b, G=gp.G, g=gp.g, d=gp.d, u=gp.u)
    res = solve_qp(Q)
    assert int(res.status) > 0
    np.testing.assert_allclose(np.asarray(res.x), gp.x_opt, atol=1e-6)


@pytest.mark.parametrize("rule", ["dantzig", "max_improvement", "steepest_edge"])
def test_pivot_rules(rule):
    gp = generate_qp_known_opt(55, N=8, M=2, J=2, n_dn=1, n_up=1, j_act=1)
    Q = make_qp(gp.V, gp.q, gp.A, gp.b, G=gp.G, g=gp.g, d=gp.d, u=gp.u)
    res = solve_qp(Q, settings=Settings(rule=rule))
    assert int(res.status) > 0
    np.testing.assert_allclose(np.asarray(res.x), gp.x_opt, atol=1e-6)


def test_auto_jit_traced():
    gp = generate_qp_known_opt(77, N=6, M=1, J=2, n_dn=1, n_up=0, j_act=1)
    Q = make_qp(gp.V, gp.q, gp.A, gp.b, G=gp.G, g=gp.g, d=gp.d, u=gp.u)
    res = solve_qp_auto(Q, settings=Settings())
    assert int(res.status) > 0
    np.testing.assert_allclose(np.asarray(res.x), gp.x_opt, atol=1e-6)


def test_init_ssqp_feasible():
    # simpler finite-lower-bound Phase-1 (reference initSSQP, SSQP.jl:386-453)
    from ssqp_tpu.solvers.phase1 import init_ssqp_traced

    rng = np.random.default_rng(3)
    N = 8
    H = rng.standard_normal((N, N))
    V = H @ H.T / N + 0.5 * np.eye(N)
    G = rng.standard_normal((2, N))
    x_feas = rng.uniform(0.1, 0.3, N)
    Q = make_qp(V, None, np.ones((1, N)), [float(x_feas.sum())],
                G=G, g=G @ x_feas + 0.5, u=np.full(N, 1.0))
    x0, Sx, Se, st = init_ssqp_traced(Q, Settings())
    assert int(st) == 1
    x0 = np.asarray(x0)
    assert abs(x0.sum() - x_feas.sum()) < 1e-8
    assert (np.asarray(Q.G) @ x0 <= np.asarray(Q.g) + 1e-8).all()
    assert (x0 >= -1e-12).all() and (x0 <= 1.0 + 1e-12).all()


def test_init_ssqp_infeasible():
    from ssqp_tpu.solvers.phase1 import init_ssqp_traced

    Q = make_qp(np.eye(3), None, np.ones((1, 3)), [10.0], u=np.ones(3))
    *_, st = init_ssqp_traced(Q, Settings())
    assert int(st) == 0
