"""MOI.Test-scale conformance battery runner.

Mirrors the reference's conformance protocol (test/testMOI.jl:24-48):
hundreds of canonical problems at atol=rtol=1e-6, every solver engine
exercised, statuses checked against the documented contract
(types.py module docstring / SSQP.jl:205-209 / Simplex.jl:826-828).
"""

import numpy as np
import pytest

from ssqp_tpu.types import make_lp, make_qp
from ssqp_tpu.utils.problems import kkt_residual

from .registry import REGISTRY

LP_CASES = [c for c in REGISTRY if c.kind == "lp"]
QP_CASES = [c for c in REGISTRY if c.kind == "qp"]

# total case executions (LP cases run once per engine)
TOTAL_RUNS = sum(len(c.engines) for c in LP_CASES) + len(QP_CASES)


def test_registry_is_moi_test_scale():
    # the battery must stay at MOI.Test scale — hundreds of problems
    assert TOTAL_RUNS >= 200, TOTAL_RUNS


def _lp_objective(c, x):
    return float(np.asarray(c) @ np.asarray(x, float))


def _solve_lp(case, engine):
    P = make_lp(case.c, case.A, case.b, G=case.G, g=case.g, d=case.d,
                u=case.u)
    if engine == "model":
        return _solve_via_model(P, case)
    if engine == "simplex":
        from ssqp_tpu.solvers.lp import simplex_lp

        return simplex_lp(P)
    from ssqp_tpu.solvers.cclp import solve_lp

    return solve_lp(P)


def _solve_via_model(P, case):
    """Route through the Model API (reference MOI path) and translate the
    termination status back into the raw status-code convention so one
    assertion block serves both routes."""
    from ssqp_tpu.model import (
        INFEASIBLE, INFEASIBLE_OR_UNBOUNDED, Model, NUMERICAL_ERROR, OPTIMAL,
    )
    from ssqp_tpu.types import Result

    m = Model.from_problem(P)
    term = m.optimize()
    if term == OPTIMAL:
        if case.f_opt is not None:
            f = m.objective_value()
            assert abs(f - case.f_opt) <= case.atol * max(1.0, abs(case.f_opt)), (
                f"{case.name}[model]: f={f} expected {case.f_opt}"
            )
        st = 1
    elif term == INFEASIBLE:
        st = 0
    elif term == INFEASIBLE_OR_UNBOUNDED:
        st = 3
    elif term == NUMERICAL_ERROR:
        st = -1
    else:
        st = -7777
    return Result(m.values(), m.statuses(), st)


@pytest.mark.parametrize(
    "case,engine",
    [(c, e) for c in LP_CASES for e in c.engines],
    ids=[f"{c.name}-{e}" for c in LP_CASES for e in c.engines],
)
def test_lp_conformance(case, engine):
    r = _solve_lp(case, engine)
    st = int(r.status)
    if case.expect == "optimal":
        assert st in (1, 2), f"{case.name}[{engine}]: status {st}"
        x = np.asarray(r.x, float)
        # feasibility at tolerance
        if case.A is not None and len(case.A):
            assert np.abs(case.A @ x - case.b).max() < 1e-6
        if case.G is not None and len(case.G):
            assert (case.G @ x - case.g).max() < 1e-6
        if case.d is not None:
            assert (case.d - x).max() < 1e-6
        if case.u is not None:
            assert (x - case.u).max() < 1e-6
        if case.f_opt is not None:
            f = _lp_objective(case.c, x)
            assert abs(f - case.f_opt) <= case.atol * max(1.0, abs(case.f_opt)), (
                f"{case.name}[{engine}]: f={f} expected {case.f_opt}"
            )
        if case.x_opt is not None:
            assert np.abs(x - case.x_opt).max() < 1e-5
    elif case.expect == "infeasible":
        assert st == 0, f"{case.name}[{engine}]: status {st}"
    elif case.expect == "unbounded":
        assert st == 3, f"{case.name}[{engine}]: status {st}"
    elif case.expect == "invalid":
        assert st == -1, f"{case.name}[{engine}]: status {st}"
    else:  # pragma: no cover
        raise AssertionError(case.expect)


@pytest.mark.parametrize("case", QP_CASES, ids=[c.name for c in QP_CASES])
def test_qp_conformance(case):
    from ssqp_tpu.solvers.ssqp import solve_qp

    Q = make_qp(case.V, case.c, A=case.A, b=case.b, G=case.G, g=case.g,
                d=case.d, u=case.u)
    if case.via == "model":
        r = _solve_via_model(Q, case)
    else:
        r = solve_qp(Q)
    st = int(r.status)
    if case.expect == "optimal":
        assert st > 0, f"{case.name}: status {st}"
        x = np.asarray(r.x, float)
        f = float(0.5 * x @ np.asarray(case.V) @ x + np.asarray(case.c) @ x)
        assert abs(f - case.f_opt) <= case.atol * max(1.0, abs(case.f_opt)), (
            f"{case.name}: f={f} expected {case.f_opt}"
        )
        res = kkt_residual(
            np.asarray(Q.V), np.asarray(Q.q), np.asarray(Q.A),
            np.asarray(Q.b), np.asarray(Q.G), np.asarray(Q.g),
            np.asarray(Q.d), np.asarray(Q.u), x,
        )["max"]
        assert res < 10 * case.atol, f"{case.name}: KKT residual {res:.2e}"
    elif case.expect == "infeasible":
        assert st == 0, f"{case.name}: status {st}"
    elif case.expect == "invalid":
        assert st == -1, f"{case.name}: status {st}"
    else:  # pragma: no cover
        raise AssertionError(case.expect)
