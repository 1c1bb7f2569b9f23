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


def test_refinement_rescues_feasibility_cheating_search_point():
    """Regression (found by differential soak, seed 20042): an f32 search can
    return a vertex that buys a lower objective by violating constraints at
    ~2x its tolerance; the refinement guard must accept the exactly-feasible
    refined point even though its objective is 'worse' than the cheater's."""
    import jax.numpy as jnp

    from ssqp_tpu.solvers.refine import solve_qp_refined

    rng = np.random.default_rng(20_042)
    N = int(rng.integers(1, 7)) * 4
    M = int(rng.integers(1, min(N, 4)))
    J = int(rng.integers(0, 5))
    H = rng.standard_normal((N, N))
    V = H @ H.T / N + rng.uniform(0.05, 0.6) * np.eye(N)
    A = rng.standard_normal((M, N))
    x0 = rng.uniform(0.2, 0.8, N)
    b = A @ x0
    G = rng.standard_normal((J, N))
    g = G @ x0 + rng.uniform(0.05, 1.0, J)
    _ = rng.standard_normal(N)
    q = rng.standard_normal(N)
    Q = make_qp(V, q, A, b, G=G, g=g, d=np.zeros(N), u=np.full(N, 2.0))
    r = solve_qp_refined(Q, search_dtype=jnp.float32)
    assert int(r.status) > 0
    x = np.asarray(r.x)
    assert np.abs(A @ x - b).max() < 1e-9
    assert (G @ x - g).max() < 1e-9


def test_two_sided_complementarity_flags_spurious_oe_multiplier():
    """A spurious multiplier planted on an INACTIVE (OE) row must show up in
    the complementarity field (VERDICT r2 weak #6: the EO-tightness check
    alone was blind to it)."""
    import jax.numpy as jnp

    from ssqp_tpu.solvers.ssqp import solve_qp
    from ssqp_tpu.types import Result, make_qp
    from ssqp_tpu.utils.diagnostics import kkt_report

    rng = np.random.default_rng(5)
    N = 8
    H = rng.standard_normal((N, N))
    V = H @ H.T / N + 0.5 * np.eye(N)
    G = rng.standard_normal((2, N))
    Q = make_qp(V, rng.standard_normal(N), G=G,
                g=G @ (np.ones(N) / N) + 1.0,  # both rows slack at optimum
                u=np.full(N, 0.8))
    r = solve_qp(Q)
    assert int(r.status) > 0
    rep0 = kkt_report(Q, r)
    assert float(rep0.complementarity) < 1e-8
    # plant a spurious multiplier on an OE row
    lam_bad = np.asarray(r.lam).copy()
    Se = np.asarray(r.S)[N:]
    oe = np.nonzero(Se == 3)[0]  # OE rows
    assert oe.size > 0
    lam_bad[Q.M + oe[0]] = 0.7
    r_bad = Result(r.x, r.S, r.status, jnp.asarray(lam_bad), r.gamma)
    rep1 = kkt_report(Q, r_bad)
    assert float(rep1.complementarity) > 1e-2  # flagged
