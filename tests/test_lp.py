"""Two-phase simplex LP driver vs scipy.optimize.linprog oracle."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linprog

from ssqp_tpu import DN, EO, IN, OE, UP, Settings, make_lp
from ssqp_tpu.solvers.boxlp import box_lp
from ssqp_tpu.solvers.lp import simplex_lp


def oracle(c, A, b, G, g, d, u):
    bounds = [(di if np.isfinite(di) else None, ui if np.isfinite(ui) else None)
              for di, ui in zip(d, u)]
    r = linprog(c, A_ub=G if len(g) else None, b_ub=g if len(g) else None,
                A_eq=A if len(b) else None, b_eq=b if len(b) else None,
                bounds=bounds, method="highs")
    return r


def test_reference_unbounded_smoke():
    """Reference smoke test (test/runtests.jl:7-19): expects status 3."""
    c = np.array([-3.0, -2.0])
    G = np.array([[-1.0, 3.0], [1.0, -5.0]])
    g = np.array([12.0, 5.0])
    P = make_lp(c, G=G, g=g, d=np.zeros(2), u=np.full(2, np.inf))
    res = simplex_lp(P)
    assert int(res.status) == 3


@pytest.mark.parametrize("seed", range(8))
def test_random_feasible_lp_vs_scipy(seed):
    rng = np.random.default_rng(seed)
    N, M, J = 8, 2, 4
    A = rng.standard_normal((M, N))
    G = rng.standard_normal((J, N))
    x_feas = rng.uniform(0.2, 0.8, N)
    b = A @ x_feas
    g = G @ x_feas + rng.uniform(0.1, 1.0, J)
    c = rng.standard_normal(N)
    d = np.zeros(N)
    u = np.ones(N)
    P = make_lp(c, A, b, G=G, g=g, d=d, u=u)
    res = simplex_lp(P)
    ref = oracle(c, A, b, G, g, d, u)
    assert ref.status == 0
    assert int(res.status) in (1, 2)
    f = float(c @ np.asarray(res.x))
    assert abs(f - ref.fun) < 1e-7, (f, ref.fun)
    # feasibility of our solution
    x = np.asarray(res.x)
    assert np.abs(A @ x - b).max() < 1e-8
    assert (G @ x - g).max() < 1e-8
    assert x.min() > -1e-9 and x.max() < 1 + 1e-9


@pytest.mark.parametrize("seed", range(4))
def test_lp_free_variables_vs_scipy(seed):
    rng = np.random.default_rng(100 + seed)
    N, M = 6, 3
    A = rng.standard_normal((M, N))
    b = A @ rng.standard_normal(N)
    c = rng.standard_normal(N)
    d = np.full(N, -np.inf)
    u = np.full(N, np.inf)
    d[:3] = -1.0  # mix: 3 half-bounded below, 3 free
    # bound the problem: add box on a few coords via G
    G = np.vstack([np.eye(N), -np.eye(N)])
    g = np.full(2 * N, 5.0)
    P = make_lp(c, A, b, G=G, g=g, d=d, u=u)
    res = simplex_lp(P)
    ref = oracle(c, A, b, G, g, d, u)
    if ref.status == 0:
        assert int(res.status) in (1, 2)
        f = float(c @ np.asarray(res.x))
        assert abs(f - ref.fun) < 1e-7
    else:
        assert int(res.status) in (0, 3)


def test_lp_infeasible():
    # x1 + x2 = 1 with x >= 1 each
    c = np.array([1.0, 1.0])
    A = np.ones((1, 2))
    b = np.array([1.0])
    P = make_lp(c, A, b, d=np.array([1.0, 1.0]))
    res = simplex_lp(P)
    assert int(res.status) == 0


def test_lp_redundant_rows():
    rng = np.random.default_rng(5)
    N = 6
    A1 = rng.standard_normal((2, N))
    A = np.vstack([A1, A1[0] + A1[1]])  # redundant third row
    x_feas = rng.uniform(0.2, 0.8, N)
    b = A @ x_feas
    c = rng.standard_normal(N)
    P = make_lp(c, A, b, d=np.zeros(N), u=np.ones(N))
    res = simplex_lp(P)
    ref = oracle(c, A, b, np.zeros((0, N)), np.zeros(0), np.zeros(N), np.ones(N))
    assert int(res.status) in (1, 2)
    assert abs(float(c @ np.asarray(res.x)) - ref.fun) < 1e-7


def test_lp_upper_only_variables():
    # (-inf, u] variables exercise the flip path
    rng = np.random.default_rng(6)
    N, M = 5, 2
    A = rng.standard_normal((M, N))
    b = A @ rng.uniform(-1, 0, N)
    c = rng.uniform(0.5, 1.5, N)  # positive costs; lower unbounded dims bounded by A? keep box via G
    G = -np.eye(N)
    g = np.full(N, 3.0)  # x >= -3
    d = np.full(N, -np.inf)
    u = np.zeros(N)
    P = make_lp(c, A, b, G=G, g=g, d=d, u=u)
    res = simplex_lp(P)
    ref = oracle(c, A, b, G, g, d, u)
    assert ref.status == 0
    assert int(res.status) in (1, 2)
    assert abs(float(c @ np.asarray(res.x)) - ref.fun) < 1e-7


def test_maximize():
    c = np.array([1.0, 2.0])
    A = np.ones((1, 2))
    b = np.array([1.0])
    P = make_lp(c, A, b, d=np.zeros(2), u=np.ones(2))
    res = simplex_lp(P, minimize=False)
    assert int(res.status) in (1, 2)
    np.testing.assert_allclose(np.asarray(res.x), [0.0, 1.0], atol=1e-9)


def test_box_lp():
    c = np.array([1.0, -2.0, 0.0])
    P = make_lp(c, d=np.array([-1.0, -1, -1]), u=np.array([2.0, 2, 2]))
    res = box_lp(P)
    np.testing.assert_allclose(np.asarray(res.x), [-1.0, 2.0, -1.0])
    assert int(res.status) == 2  # zero cost coordinate -> infinitely many
    S = np.asarray(res.S)
    assert S[0] == DN and S[1] == UP


def test_box_lp_unbounded():
    c = np.array([1.0, 1.0])
    P = make_lp(c, d=np.array([-np.inf, 0.0]), u=np.array([1.0, 1.0]))
    res = box_lp(P)
    assert int(res.status) == 3


def test_lp_redundant_row_with_free_variable_unique():
    """Regression: a purged redundant row leaves its artificial basic; the
    free-variable re-check must exclude it from the dual solve instead of
    reporting a unique optimum as status 2 (singular solve)."""
    # min x1 + x2, x1 + x2 + x3 = 2 (duplicated), x3 free, x1,x2 in [0,1]
    c = np.array([1.0, 1.0, 0.0])
    A = np.array([[1.0, 1.0, 1.0], [1.0, 1.0, 1.0]])  # duplicate rows
    b = np.array([2.0, 2.0])
    P = make_lp(c, A, b, d=[0.0, 0.0, -np.inf], u=[1.0, 1.0, np.inf])
    r = simplex_lp(P)
    assert int(r.status) == 1, int(r.status)
    np.testing.assert_allclose(np.asarray(r.x[:2]), [0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(float(r.x[2]), 2.0, atol=1e-9)


def test_lp_phase1_iteration_limit_not_infeasible():
    """Regression: a Phase-1 that hits the iteration budget must report
    -max_iter (undecided), not 0 (infeasible) — the problem IS feasible."""
    rng = np.random.default_rng(3)
    N, M = 24, 8
    A = rng.standard_normal((M, N))
    x0 = rng.uniform(0.2, 0.8, N)
    b = A @ x0
    c = rng.standard_normal(N)
    P = make_lp(c, A, b, d=np.zeros(N), u=np.ones(N))
    s = Settings(max_iter=2)  # far below what Phase-1 needs
    r = simplex_lp(P, settings=s)
    assert int(r.status) == -2, int(r.status)


def test_cclp_f32_duplicate_row_purged():
    """Regression: standard_form's purge tolerance must follow the settings
    tier — an f32 duplicated row was left unpurged by the f64-tier 2^-26
    default, making the criss-cross basis singular (status -1)."""
    from ssqp_tpu.solvers.cclp import solve_lp

    rng = np.random.default_rng(11)
    N, M = 12, 3
    A = rng.standard_normal((M, N)).astype(np.float32)
    A[M - 1] = A[0]  # duplicate row (exact in f32)
    x0 = rng.uniform(0.2, 0.8, N).astype(np.float32)
    b = (A @ x0).astype(np.float32)
    # perturb so the duplicate row's residual is f32-noise, not exactly 0
    A = (A * np.float32(1.0)).astype(np.float32)
    c = rng.standard_normal(N).astype(np.float32)
    P = make_lp(c, A, b, d=np.zeros(N, np.float32), u=np.ones(N, np.float32),
                dtype=np.float32)
    r = solve_lp(P, settings=Settings.for_dtype(np.float32))
    assert int(r.status) >= 1, int(r.status)
    ref = linprog(c, A_eq=A[:2], b_eq=b[:2], bounds=[(0, 1)] * N)
    assert ref.success
    np.testing.assert_allclose(float(np.dot(c, np.asarray(r.x))),
                               float(ref.fun), atol=5e-5)


def test_cclp_free_variable_status_in():
    """Regression: a free variable must come back with status IN, never DN
    (DN reads as x = d = -inf to status consumers)."""
    from ssqp_tpu.solvers.cclp import solve_lp

    # x2 free with zero cost: optimum has both split parts nonbasic
    c = np.array([1.0, 0.0])
    A = np.array([[1.0, 0.0]])
    b = np.array([0.5])
    P = make_lp(c, A, b, d=[0.0, -np.inf], u=[1.0, np.inf])
    r = solve_lp(P)
    assert int(r.status) >= 1
    assert int(r.S[1]) == int(IN), np.asarray(r.S)


class TestLPWaves:
    """Wave-parallel warm simplex for c-parametric LP families (verdict r5
    item 5): shared Phase-1 + neighbor-basis Phase-2 warm starts must agree
    with the plain per-instance two-phase solve."""

    def _family(self, N=24, M=3, J=6, B=32, seed=4):
        import dataclasses

        rng = np.random.default_rng(seed)
        A = rng.standard_normal((M, N))
        x0 = rng.uniform(0.1, 1.0, N)
        b = A @ x0
        G = rng.standard_normal((J, N))
        g = G @ x0 + rng.uniform(0.1, 1.0, J)
        c0 = rng.standard_normal(N)
        dc = rng.standard_normal(N) * 0.5
        ts = np.linspace(0.0, 1.0, B)
        C = c0[None, :] + ts[:, None] * dc[None, :]
        P = make_lp(c0, A, b, G=G, g=g, d=np.zeros(N), u=np.full(N, 2.0))
        Pb = dataclasses.replace(P, c=jnp.asarray(C))
        return Pb, ("A", "b", "G", "g", "d", "u")

    def test_matches_plain_batch(self):
        from ssqp_tpu.parallel.batch import (
            solve_lp_batch, solve_lp_batch_waves,
        )

        Pb, shared = self._family()
        s = Settings()
        r0 = solve_lp_batch(Pb, s, shared=shared)
        r1 = solve_lp_batch_waves(Pb, s, shared, waves=8)
        st0 = np.asarray(r0.status)
        st1 = np.asarray(r1.status)
        assert (st0 >= 1).all() and (st1 >= 1).all()
        # same objective at every grid point (bases may differ on ties)
        f0 = (np.asarray(Pb.c) * np.asarray(r0.x)).sum(1)
        f1 = (np.asarray(Pb.c) * np.asarray(r1.x)).sum(1)
        np.testing.assert_allclose(f1, f0, atol=1e-7)
        # unique optima must match in x as well
        uniq = (st0 == 1) & (st1 == 1)
        np.testing.assert_allclose(np.asarray(r1.x)[uniq],
                                   np.asarray(r0.x)[uniq], atol=1e-6)

    def test_infeasible_family(self):
        """Phase-1 is shared: an infeasible constraint set must mark every
        grid point status 0."""
        import dataclasses
        from ssqp_tpu.parallel.batch import solve_lp_batch_waves

        N, B = 8, 16
        rng = np.random.default_rng(1)
        A = np.ones((2, N))
        b = np.array([1.0, 5.0])  # contradictory budget rows
        C = rng.standard_normal((B, N))
        P = make_lp(C[0], A, b, d=np.zeros(N), u=np.ones(N))
        Pb = dataclasses.replace(P, c=jnp.asarray(C))
        r = solve_lp_batch_waves(Pb, Settings(),
                                 ("A", "b", "G", "g", "d", "u"), waves=4)
        assert (np.asarray(r.status) == 0).all()

    def test_unbounded_slot(self):
        """A cost direction making the LP unbounded must come back 3 and
        not poison its warm-started neighbors."""
        import dataclasses
        from ssqp_tpu.parallel.batch import solve_lp_batch_waves

        N, B = 4, 16
        A = np.zeros((0, N))
        b = np.zeros((0,))
        G = np.array([[1.0, -1.0, 0.0, 0.0]])  # x1 - x2 <= 1
        g = np.array([1.0])
        d = np.zeros(N)
        u = np.full(N, np.inf)
        C = np.tile(np.ones(N), (B, 1))  # bounded slots: optimum x = 0
        C[5] = np.array([-1.0, 0.0, 1.0, 1.0])  # ray (1,1,0,0) improves
        P = make_lp(C[0], A, b, G=G, g=g, d=d, u=u)
        Pb = dataclasses.replace(P, c=jnp.asarray(C))
        r = solve_lp_batch_waves(Pb, Settings(),
                                 ("A", "b", "G", "g", "d", "u"), waves=4)
        st = np.asarray(r.status)
        assert st[5] == 3
        ok = np.delete(np.arange(B), 5)
        assert (st[ok] >= 1).all() and (st[ok] != 3).all()


class TestLPWavesRHS:
    """RHS-parametric warm waves (round 5): dual-simplex restarts from the
    grid neighbor's optimal basis when only b/g vary."""

    def _family(self, N=20, M=3, J=5, B=32, seed=12):
        import dataclasses

        rng = np.random.default_rng(seed)
        A = rng.standard_normal((M, N))
        G = rng.standard_normal((J, N))
        c = rng.standard_normal(N)
        x0 = rng.uniform(0.2, 0.9, N)
        x1 = rng.uniform(0.2, 0.9, N)
        ts = np.linspace(0.0, 1.0, B)
        Xc = x0[None, :] + ts[:, None] * (x1 - x0)[None, :]
        bB = Xc @ A.T
        gB = Xc @ G.T + rng.uniform(0.1, 1.0, J)[None, :]
        P = make_lp(c, A, bB[0], G=G, g=gB[0], d=np.zeros(N),
                    u=np.full(N, 2.0))
        Pb = dataclasses.replace(P, b=jnp.asarray(bB), g=jnp.asarray(gB))
        return Pb, ("c", "A", "G", "d", "u")

    def test_matches_plain_batch(self):
        from ssqp_tpu.parallel.batch import (
            solve_lp_batch, solve_lp_batch_waves_rhs,
        )

        Pb, shared = self._family()
        s = Settings()
        r0 = solve_lp_batch(Pb, s, shared=shared)
        r1 = solve_lp_batch_waves_rhs(Pb, s, shared, waves=8)
        st0 = np.asarray(r0.status)
        st1 = np.asarray(r1.status)
        assert (st0 >= 1).all() and (st1 >= 1).all(), (st0.min(), st1.min())
        c = np.asarray(Pb.c)
        f0 = np.asarray(r0.x) @ c
        f1 = np.asarray(r1.x) @ c
        np.testing.assert_allclose(f1, f0, atol=1e-7)
        uniq = (st0 == 1) & (st1 == 1)
        np.testing.assert_allclose(np.asarray(r1.x)[uniq],
                                   np.asarray(r0.x)[uniq], atol=1e-6)

    def test_b_only_variation(self):
        """g shared, only b varies (M-only grid)."""
        import dataclasses
        from ssqp_tpu.parallel.batch import (
            solve_lp_batch, solve_lp_batch_waves_rhs,
        )

        Pb, _ = self._family()
        Pb2 = dataclasses.replace(Pb, g=Pb.g[0])
        shared = ("c", "A", "G", "g", "d", "u")
        s = Settings()
        r0 = solve_lp_batch(Pb2, s, shared=shared)
        r1 = solve_lp_batch_waves_rhs(Pb2, s, shared, waves=4)
        assert (np.asarray(r1.status) >= 1).all()
        c = np.asarray(Pb2.c)
        np.testing.assert_allclose(np.asarray(r1.x) @ c,
                                   np.asarray(r0.x) @ c, atol=1e-7)

    def test_infeasible_member(self):
        """One grid member's rhs is unattainable -> status 0 for it,
        neighbors unaffected (rescue + guard)."""
        import dataclasses
        from ssqp_tpu.parallel.batch import solve_lp_batch_waves_rhs

        N, B = 8, 16
        rng = np.random.default_rng(5)
        A = np.vstack([np.ones(N), np.ones(N)])  # duplicated budget row
        c = rng.standard_normal(N)
        bB = np.tile(np.array([2.0, 2.0]), (B, 1))
        bB[6] = [2.0, 3.0]  # inconsistent on the dependent row
        P = make_lp(c, A, bB[0], d=np.zeros(N), u=np.ones(N))
        Pb = dataclasses.replace(P, b=jnp.asarray(bB))
        r = solve_lp_batch_waves_rhs(Pb, Settings(),
                                     ("c", "A", "G", "g", "d", "u"),
                                     waves=4)
        st = np.asarray(r.status)
        assert st[6] == 0, st
        ok = np.delete(np.arange(B), 6)
        assert (st[ok] >= 1).all(), st


class TestLPAutoDispatch:
    """solve_lp_batch_auto routes by family structure: c-grids to the warm
    simplex waves, rhs-grids to the dual waves, mixed batches to plain."""

    def test_routing(self):
        from unittest import mock
        from ssqp_tpu.parallel import batch as pb

        P = make_lp(np.zeros(4), np.ones((1, 4)), np.ones(1),
                    d=np.zeros(4), u=np.ones(4))
        import dataclasses
        Pb = dataclasses.replace(P, c=jnp.zeros((32, 4)))
        calls = []
        with mock.patch.object(pb, "solve_lp_batch_waves",
                               side_effect=lambda *a, **k: calls.append("c")), \
             mock.patch.object(pb, "solve_lp_batch_waves_rhs",
                               side_effect=lambda *a, **k: calls.append("rhs")), \
             mock.patch.object(pb, "solve_lp_batch",
                               side_effect=lambda *a, **k: calls.append("plain")):
            pb.solve_lp_batch_auto(Pb, Settings(),
                                   ("A", "b", "G", "g", "d", "u"))
            Pr = dataclasses.replace(P, b=jnp.ones((32, 1)))
            pb.solve_lp_batch_auto(Pr, Settings(),
                                   ("c", "A", "G", "g", "d", "u"))
            # both c and b vary: no warm structure -> plain
            Pm = dataclasses.replace(P, c=jnp.zeros((32, 4)),
                                     b=jnp.ones((32, 1)))
            pb.solve_lp_batch_auto(Pm, Settings(), ("A", "G", "g", "d", "u"))
            # explicit waves=0 forces plain even on a c-grid
            pb.solve_lp_batch_auto(Pb, Settings(),
                                   ("A", "b", "G", "g", "d", "u"), waves=0)
        assert calls == ["c", "rhs", "plain", "plain"], calls

    def test_matches_plain_small(self):
        import dataclasses
        from ssqp_tpu.parallel.batch import (
            solve_lp_batch, solve_lp_batch_auto,
        )

        rng = np.random.default_rng(2)
        N, B = 10, 16
        A = rng.standard_normal((2, N))
        x0 = rng.uniform(0.2, 0.8, N)
        C = jnp.asarray(rng.standard_normal((B, N)))
        P = make_lp(C[0], A, A @ x0, d=np.zeros(N), u=np.ones(N))
        Pb = dataclasses.replace(P, c=C)
        shared = ("A", "b", "G", "g", "d", "u")
        r0 = solve_lp_batch(Pb, Settings(), shared=shared)
        r1 = solve_lp_batch_auto(Pb, Settings(), shared)
        # an unsorted c batch still goes through waves (structure allows);
        # objectives must agree regardless of grid sortedness
        f0 = (np.asarray(C) * np.asarray(r0.x)).sum(1)
        f1 = (np.asarray(C) * np.asarray(r1.x)).sum(1)
        np.testing.assert_allclose(f1, f0, atol=1e-7)


class TestSimplexWarmRestart:
    """simplex_lp(warm_from=...) (round 5): dual-simplex restart from a
    prior Result — solveQP(Q,S,x0)-style ergonomics for the LP side."""

    def _problem(self, b_shift=0.0, seed=21, N=16, M=2, J=4):
        rng = np.random.default_rng(seed)
        A = rng.standard_normal((M, N))
        G = rng.standard_normal((J, N))
        x0 = rng.uniform(0.2, 0.8, N)
        b = A @ x0 + b_shift * rng.standard_normal(M) * 0.05
        g = G @ x0 + rng.uniform(0.1, 1.0, J)
        c = rng.standard_normal(N)
        return make_lp(c, A, b, G=G, g=g, d=np.zeros(N), u=np.full(N, 2.0))

    def test_warm_matches_cold_after_rhs_change(self):
        P0 = self._problem(0.0)
        r0 = simplex_lp(P0)
        assert int(r0.status) >= 1
        P1 = self._problem(1.0)  # same (c, A, G, d, u), moved b
        cold = simplex_lp(P1)
        warm = simplex_lp(P1, warm_from=r0)
        assert int(warm.status) >= 1
        c = np.asarray(P1.c)
        np.testing.assert_allclose(float(c @ np.asarray(warm.x)),
                                   float(c @ np.asarray(cold.x)), atol=1e-8)
        x = np.asarray(warm.x)
        assert np.abs(np.asarray(P1.A) @ x - np.asarray(P1.b)).max() < 1e-8
        assert (np.asarray(P1.G) @ x - np.asarray(P1.g)).max() < 1e-8

    def test_warm_same_problem_is_immediate(self):
        P = self._problem(0.0)
        r0 = simplex_lp(P)
        warm = simplex_lp(P, warm_from=r0)
        assert int(warm.status) >= 1
        c = np.asarray(P.c)
        np.testing.assert_allclose(float(c @ np.asarray(warm.x)),
                                   float(c @ np.asarray(r0.x)), atol=1e-9)

    def test_cost_change_falls_back(self):
        """A changed cost row breaks dual feasibility: the entry gate must
        reject the warm start and the traced fallback must still produce
        the right optimum."""
        import dataclasses

        P0 = self._problem(0.0)
        r0 = simplex_lp(P0)
        rng = np.random.default_rng(77)
        P1 = dataclasses.replace(P0, c=jnp.asarray(rng.standard_normal(16)))
        cold = simplex_lp(P1)
        warm = simplex_lp(P1, warm_from=r0)
        assert int(warm.status) >= 1
        c = np.asarray(P1.c)
        np.testing.assert_allclose(float(c @ np.asarray(warm.x)),
                                   float(c @ np.asarray(cold.x)), atol=1e-8)

    def test_warm_with_free_and_flipped_vars(self):
        """The standardized-basis reconstruction must handle free (split)
        and (-inf, u] (flipped) variables."""
        rng = np.random.default_rng(31)
        N, M = 8, 3
        A = rng.standard_normal((M, N))
        b = A @ rng.standard_normal(N)
        c = rng.standard_normal(N)
        d = np.full(N, -np.inf)
        u = np.full(N, np.inf)
        d[:3] = 0.0  # 3 standard, 2 flipped, 3 free
        u[:5] = 4.0
        G = np.vstack([np.eye(N), -np.eye(N)])
        g = np.full(2 * N, 6.0)
        P0 = make_lp(c, A, b, G=G, g=g, d=d, u=u)
        r0 = simplex_lp(P0)
        if int(r0.status) < 1:
            pytest.skip("draw not optimal")
        import dataclasses

        P1 = dataclasses.replace(
            P0, b=P0.b + jnp.asarray(0.03 * rng.standard_normal(M)))
        cold = simplex_lp(P1)
        warm = simplex_lp(P1, warm_from=r0)
        assert int(warm.status) == int(cold.status) or (
            int(warm.status) >= 1 and int(cold.status) >= 1)
        if int(cold.status) >= 1:
            np.testing.assert_allclose(
                float(c @ np.asarray(warm.x)),
                float(c @ np.asarray(cold.x)), atol=1e-7)

    def test_infeasible_after_shift(self):
        """A warm restart into an infeasible problem must report 0."""
        import dataclasses

        N = 6
        A = np.ones((1, N))
        c = np.arange(1.0, N + 1)
        P0 = make_lp(c, A, np.array([2.0]), d=np.zeros(N), u=np.ones(N))
        r0 = simplex_lp(P0)
        assert int(r0.status) >= 1
        P1 = dataclasses.replace(P0, b=jnp.array([float(N) + 1.0]))
        warm = simplex_lp(P1, warm_from=r0)
        assert int(warm.status) == 0, int(warm.status)

    def test_small_cost_drift_still_correct(self):
        """Regression (round-5 review): a cost row perturbed BELOW the old
        sqrt(tol) entry gate but above solver tol must not ship a
        suboptimal vertex as optimal — the scale-aware gate (or the
        post-exit dual certificate) must force the two-phase fallback."""
        import dataclasses

        P0 = self._problem(0.0)
        r0 = simplex_lp(P0)
        rng = np.random.default_rng(99)
        P1 = dataclasses.replace(
            P0, c=P0.c + jnp.asarray(5e-5 * rng.standard_normal(16)))
        cold = simplex_lp(P1)
        warm = simplex_lp(P1, warm_from=r0)
        assert int(warm.status) >= 1
        c = np.asarray(P1.c)
        np.testing.assert_allclose(float(c @ np.asarray(warm.x)),
                                   float(c @ np.asarray(cold.x)),
                                   atol=1e-8)


class TestRHSGuardScale:
    """Regression (round-5 review): the waves_rhs original-constraint
    guard's tolerance must scale with |g| too — a b-only scale falsely
    demoted genuine optima to infeasible on large-|g| families."""

    def test_large_g_family_not_demoted(self):
        import dataclasses
        from ssqp_tpu.parallel.batch import (
            solve_lp_batch, solve_lp_batch_waves_rhs,
        )

        rng = np.random.default_rng(42)
        N, J, B = 12, 6, 16
        SCALE = 2e3
        G = SCALE * rng.standard_normal((J, N))
        c = rng.standard_normal(N)
        x0 = rng.uniform(0.2, 0.9, N)
        x1 = rng.uniform(0.2, 0.9, N)
        ts = np.linspace(0.0, 1.0, B)
        Xc = x0[None, :] + ts[:, None] * (x1 - x0)[None, :]
        gB = Xc @ G.T + SCALE * rng.uniform(0.1, 1.0, J)[None, :]
        P = make_lp(c, np.zeros((0, N)), np.zeros(0), G=G, g=gB[0],
                    d=np.zeros(N), u=np.full(N, 2.0))
        Pb = dataclasses.replace(P, g=jnp.asarray(gB))
        shared = ("c", "A", "b", "G", "d", "u")
        s = Settings()
        r0 = solve_lp_batch(Pb, s, shared=shared)
        r1 = solve_lp_batch_waves_rhs(Pb, s, shared, waves=4)
        st0 = np.asarray(r0.status)
        st1 = np.asarray(r1.status)
        assert (st0 >= 1).all()
        assert (st1 >= 1).all(), st1  # the old guard demoted some to 0
        np.testing.assert_allclose(np.asarray(r1.x) @ c,
                                   np.asarray(r0.x) @ c, atol=1e-6)
