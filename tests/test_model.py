"""Modeling API (MOI-wrapper equivalent) — conformance-style problems with
known optima, mirroring the reference's MOI.Test surface (SURVEY.md §4)."""

import numpy as np
import pytest

from ssqp_tpu.model import (
    INFEASIBLE,
    INFEASIBLE_OR_UNBOUNDED,
    Model,
    OPTIMAL,
    OPTIMIZE_NOT_CALLED,
)

ATOL = 1e-6  # the reference's MOI conformance tolerance (testMOI.jl:25-27)


class TestLP:
    def test_basic_lp(self):
        # max 2x + 3y s.t. x + y <= 4, x, y >= 0 -> (0, 4), f = 12
        m = Model()
        x, y = m.add_variables(2, lb=0.0)
        m.add_le({x: 1.0, y: 1.0}, 4.0)
        m.set_objective(lin={x: 2.0, y: 3.0}, sense="max")
        assert m.optimize() == OPTIMAL
        assert abs(m.objective_value() - 12.0) < ATOL
        np.testing.assert_allclose(m.values(), [0.0, 4.0], atol=ATOL)

    def test_ge_and_interval(self):
        # min x + y s.t. x + 2y >= 2, 1 <= x - y <= 3, x,y in [0, 5]
        m = Model()
        x, y = m.add_variables(2, lb=0.0, ub=5.0)
        m.add_ge({x: 1.0, y: 2.0}, 2.0)
        m.add_interval({x: 1.0, y: -1.0}, 1.0, 3.0)
        m.set_objective(lin={x: 1.0, y: 1.0})
        assert m.optimize() == OPTIMAL
        v = m.values()
        assert v[0] + 2 * v[1] >= 2 - ATOL
        assert 1 - ATOL <= v[0] - v[1] <= 3 + ATOL
        # optimum: x - y = 1 and x + 2y = 2 -> x = 4/3, y = 1/3, f = 5/3
        assert abs(m.objective_value() - 5.0 / 3.0) < ATOL

    def test_infeasible(self):
        m = Model()
        x = m.add_variable(lb=0.0, ub=1.0)
        m.add_ge({x: 1.0}, 2.0)
        m.set_objective(lin={x: 1.0})
        assert m.optimize() == INFEASIBLE

    def test_unbounded(self):
        m = Model()
        x = m.add_variable(lb=0.0)
        y = m.add_variable(lb=0.0)
        m.add_ge({x: 1.0, y: 1.0}, 1.0)
        m.set_objective(lin={x: -1.0})
        assert m.optimize() == INFEASIBLE_OR_UNBOUNDED

    def test_objective_constant(self):
        m = Model()
        x = m.add_variable(lb=1.0, ub=2.0)
        m.add_le({x: 1.0}, 5.0)
        m.set_objective(lin={x: 1.0}, constant=10.0)
        assert m.optimize() == OPTIMAL
        assert abs(m.objective_value() - 11.0) < ATOL


class TestQP:
    def test_basic_qp(self):
        # min x^2 + y^2 s.t. x + y = 2 -> (1, 1), f = 2
        m = Model()
        x, y = m.add_variables(2, lb=0.0)
        m.add_eq({x: 1.0, y: 1.0}, 2.0)
        m.set_objective(quad={(x, x): 2.0, (y, y): 2.0})
        assert m.optimize() == OPTIMAL
        np.testing.assert_allclose(m.values(), [1.0, 1.0], atol=ATOL)
        assert abs(m.objective_value() - 2.0) < ATOL

    def test_duplicate_quad_terms_accumulate(self):
        # (x,x) given twice: 1 + 1 = 2 -> objective x^2 -> same as above
        m = Model()
        x, y = m.add_variables(2, lb=0.0)
        m.add_eq({x: 1.0, y: 1.0}, 2.0)
        m.set_objective(quad={(x, x): 2.0, (y, y): 2.0})
        m2 = Model()
        a, c = m2.add_variables(2, lb=0.0)
        m2.add_eq({a: 1.0, c: 1.0}, 2.0)
        # 1.0 twice for (a,a) plus cross terms given in both orders
        m2._quad = {}
        for k, v in [((a, a), 1.0), ((a, a), 1.0), ((c, c), 2.0)]:
            m2._quad[k] = m2._quad.get(k, 0.0) + v
        m.optimize()
        m2.optimize()
        assert abs(m.objective_value() - m2.objective_value()) < ATOL

    def test_max_qp(self):
        # max -(x-1)^2 = -x^2 + 2x - 1 over [0, 5] -> x = 1, f = 0
        m = Model()
        x = m.add_variable(lb=0.0, ub=5.0)
        m.add_le({x: 1.0}, 5.0)
        m.set_objective(quad={(x, x): -2.0}, lin={x: 2.0}, constant=-1.0,
                        sense="max")
        assert m.optimize() == OPTIMAL
        assert abs(m.value(x) - 1.0) < ATOL
        assert abs(m.objective_value() - 0.0) < ATOL

    def test_qp_with_inequalities(self):
        # min 1/2||x||^2 s.t. x1 + x2 >= 1 -> (0.5, 0.5)
        m = Model()
        x, y = m.add_variables(2)
        m.set_bounds(x, lb=-10.0, ub=10.0)
        m.set_bounds(y, lb=-10.0, ub=10.0)
        m.add_ge({x: 1.0, y: 1.0}, 1.0)
        m.set_objective(quad={(x, x): 1.0, (y, y): 1.0})
        assert m.optimize() == OPTIMAL
        np.testing.assert_allclose(m.values(), [0.5, 0.5], atol=ATOL)

    def test_auto_downgrade_to_lp(self):
        m = Model()
        x = m.add_variable(lb=0.0, ub=1.0)
        m.add_le({x: 1.0}, 1.0)
        m.set_objective(quad={}, lin={x: -1.0})
        assert m.optimize() == OPTIMAL
        from ssqp_tpu.types import LP

        assert isinstance(m._problem, LP)  # downgraded (MOIwrapper.jl:120-128)
        assert abs(m.value(x) - 1.0) < ATOL


class TestAnalyticPresolve:
    def test_equality_only_lp(self):
        # no inequalities/bounds, M > 0: direct A \ b (MOIwrapper.jl:136-141)
        m = Model()
        x, y = m.add_variables(2)  # free
        m.add_eq({x: 1.0, y: 1.0}, 2.0)
        m.add_eq({x: 1.0, y: -1.0}, 0.0)
        m.set_objective(lin={x: 1.0})
        assert m.optimize() == OPTIMAL
        np.testing.assert_allclose(m.values(), [1.0, 1.0], atol=ATOL)

    def test_unconstrained_qp(self):
        # min x^2 - 2x free -> x = 1 (V \ -q)
        m = Model()
        x = m.add_variable()
        m.set_objective(quad={(x, x): 2.0}, lin={x: -2.0})
        assert m.optimize() == OPTIMAL
        assert abs(m.value(x) - 1.0) < ATOL

    def test_unconstrained_lp_unbounded(self):
        m = Model()
        x = m.add_variable()
        m.set_objective(lin={x: 1.0})
        assert m.optimize() == INFEASIBLE_OR_UNBOUNDED


class TestModelMisc:
    def test_not_called(self):
        m = Model()
        m.add_variable(lb=0.0)
        assert m.termination_status() == OPTIMIZE_NOT_CALLED

    def test_empty_row_warns(self):
        m = Model()
        m.add_variable(lb=0.0, ub=1.0)
        with pytest.warns(UserWarning):
            m.add_le({}, 1.0)

    def test_solve_time_recorded(self):
        m = Model()
        x = m.add_variable(lb=0.0, ub=2.0)
        m.add_le({x: 1.0}, 2.0)
        m.set_objective(quad={(x, x): 2.0}, lin={x: -2.0})
        m.optimize()
        assert m.solve_time >= 0.0
        assert m.iterations() >= 1


class TestRoundTrip:
    def test_qp_round_trip(self):
        # problem -> Model -> problem -> solve gives the same optimum
        # (reference QP2MOI/MOI2QP round trip, MOIwrapper.jl:461-509)
        from ssqp_tpu.utils.problems import generate_qp_known_opt
        from ssqp_tpu.types import QP, make_qp

        g = generate_qp_known_opt(seed=3, N=8, M=2, J=2)
        Q = make_qp(g.V, g.q, g.A, g.b, G=g.G, g=g.g, d=g.d, u=g.u)
        m = Model.from_problem(Q)
        P2 = m.to_problem()
        assert isinstance(P2, QP)
        np.testing.assert_allclose(np.asarray(P2.V), np.asarray(Q.V), atol=1e-12)
        np.testing.assert_allclose(np.asarray(P2.q), np.asarray(Q.q), atol=1e-12)
        assert m.optimize() == OPTIMAL
        np.testing.assert_allclose(m.values(), g.x_opt, atol=1e-6)

    def test_lp_round_trip(self):
        from ssqp_tpu.types import LP, make_lp

        P = make_lp([-1.0, -2.0], G=[[1.0, 1.0]], g=[4.0], u=[3.0, 3.0])
        m = Model.from_problem(P)
        P2 = m.to_problem()
        assert isinstance(P2, LP)
        assert m.optimize() == OPTIMAL
        np.testing.assert_allclose(m.values(), [1.0, 3.0], atol=1e-6)


def test_model_refined_tier():
    """Model.optimize(refine=True) routes through the mixed-precision tier
    (VERDICT r2 item 9): result at least as accurate as the plain solve and
    duals still attached."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    N = 16
    H = rng.standard_normal((N, N))
    V = H @ H.T / N + 0.4 * np.eye(N)
    m = Model()
    m.add_variables(N, lb=0.0, ub=0.3)
    m.add_eq(np.ones(N), 1.0)
    m.set_objective(quad=2.0 * V, lin=rng.standard_normal(N))
    assert m.optimize(refine=True, search_dtype=jnp.float32) == "OPTIMAL"
    f_ref = m.objective_value()
    d = m.duals()
    assert d["eq"].shape == (1,)
    m2 = Model()
    m2.add_variables(N, lb=0.0, ub=0.3)
    m2.add_eq(np.ones(N), 1.0)
    m2.set_objective(quad=2.0 * V, lin=m._lin)
    m2.optimize()
    assert abs(f_ref - m2.objective_value()) < 1e-7
    # refine on an LP is rejected
    ml = Model()
    ml.add_variables(2, lb=0.0, ub=1.0)
    ml.add_eq([1.0, 1.0], 1.0)
    ml.set_objective(lin=[1.0, 2.0])
    with pytest.raises(ValueError, match="refine"):
        ml.optimize(refine=True)
