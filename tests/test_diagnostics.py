"""Device-side diagnostics (utils/diagnostics.py) and the host-side oracle
(utils/problems.py::kkt_residual) — sign-correctness regression battery."""

import numpy as np

import jax.numpy as jnp

from ssqp_tpu.types import DN, UP, Result, make_qp
from ssqp_tpu.solvers.ssqp import solve_qp
from ssqp_tpu.utils.diagnostics import kkt_report
from ssqp_tpu.utils.problems import kkt_residual


def _toy():
    N = 4
    V = np.eye(N)
    q = np.array([-1.0, -1.0, 0.5, 0.5])
    return make_qp(V, q, np.ones((1, N)), np.array([2.0]),
                   d=np.zeros(N), u=np.ones(N))


def test_kkt_report_flags_suboptimal_pinned_vertex():
    """Regression: with every variable pinned, unconstrained least-squares
    multipliers gave stationarity 0 for ANY vertex; the sign-projected
    report must show a violation at a wrongly-pinned vertex."""
    Q = _toy()
    x_bad = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    S_bad = jnp.asarray([DN, DN, UP, UP], jnp.int8)
    rep = kkt_report(Q, Result(x_bad, S_bad, jnp.asarray(1, jnp.int32)))
    assert float(rep.stationarity) > 0.1


def test_kkt_report_zero_at_optimum():
    Q = _toy()
    r = solve_qp(Q)
    assert int(r.status) > 0
    rep = kkt_report(Q, Result(r.x, r.S, r.status))
    assert float(rep.stationarity) < 1e-8
    assert float(rep.feas_eq) < 1e-10
    assert bool(rep.solved)


def test_kkt_report_batched():
    Q = _toy()
    r = solve_qp(Q)
    import jax

    Qb = jax.tree.map(lambda a: jnp.stack([a, a]), Q)
    Rb = Result(jnp.stack([r.x, r.x]), jnp.stack([r.S, r.S]),
                jnp.stack([r.status, r.status]))
    rep = kkt_report(Qb, Rb, batched=True)
    assert rep.stationarity.shape == (2,)
    assert (np.asarray(rep.stationarity) < 1e-8).all()


def test_kkt_residual_fixed_variable_free_sign():
    """Regression: a fixed variable (d==u) carries a free-sign multiplier;
    the oracle previously offered only the lower-bound column and reported
    a phantom stationarity residual when the reduced gradient was negative.

    min 1/2 x'x + q'x with x0 fixed at 1 and q0 = +1: optimal x0 = 1 needs
    gamma = grad = 2 > 0 handled by the LOWER column; q0 = -3 makes
    grad = -2 < 0, needing the UPPER column."""
    N = 2
    V = np.eye(N)
    A = np.zeros((0, N))
    b = np.zeros(0)
    G = np.zeros((0, N))
    g = np.zeros(0)
    d = np.array([1.0, 0.0])
    u = np.array([1.0, 5.0])
    for q0 in (1.0, -3.0):
        q = np.array([q0, 0.0])
        x = np.array([1.0, 0.0])  # optimum: x1 free at its unconstrained 0
        r = kkt_residual(V, q, A, b, G, g, d, u, x)
        assert r["max"] < 1e-8, (q0, r)
