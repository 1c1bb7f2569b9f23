"""Hardening for lightly-exercised parity features (round-1 VERDICT item 7):
pivot rules at realistic sizes cross-checked against scipy, the column-pivot
purge flavor, init_ssqp_traced, simplex_lp_standard, and the persistent
compilation cache hook.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssqp_tpu.types import Settings, make_lp, make_qp
from ssqp_tpu.solvers.lp import simplex_lp, simplex_lp_standard


def _rand_lp(seed, N=60, M=6, J=15):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((M, N))
    x0 = rng.uniform(0.1, 1.0, N)
    b = A @ x0
    G = rng.standard_normal((J, N))
    g = G @ x0 + rng.uniform(0.1, 1.0, J)
    c = rng.standard_normal(N)
    return c, A, b, G, g


def _scipy_opt(c, A, b, G, g, lo=0.0, hi=2.0):
    from scipy.optimize import linprog

    res = linprog(c, A_ub=G, b_ub=g, A_eq=A, b_eq=b,
                  bounds=[(lo, hi)] * len(c), method="highs")
    assert res.status == 0
    return float(res.fun)


class TestPivotRulesAtScale:
    """All three reference pivot rules must agree with HiGHS on N>=50
    instances (reference kernels cDantzigLP / stpEdgeLP / maxImprvLP,
    Simplex.jl:445, 37, 641)."""

    @pytest.mark.parametrize("rule", ["dantzig", "steepest_edge",
                                      "max_improvement"])
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_rule_matches_highs(self, rule, seed):
        c, A, b, G, g = _rand_lp(seed)
        f_ref = _scipy_opt(c, A, b, G, g)
        P = make_lp(c, A, b, G=G, g=g, d=np.zeros(len(c)),
                    u=np.full(len(c), 2.0))
        r = simplex_lp(P, settings=Settings(rule=rule))
        assert int(r.status) in (1, 2), (rule, seed, int(r.status))
        f = float(np.asarray(P.c) @ np.asarray(r.x))
        assert abs(f - f_ref) < 1e-6 * max(1.0, abs(f_ref)), (rule, seed)


class TestPivotRulesInfiniteUpper:
    """Infinite upper bounds through every pivot rule's ratio test: the
    basic-bound gathers are one-hot contractions, and 0*inf through a
    matmul is NaN, so +inf entries are re-marked after the contraction
    (simplex.py body / _all_ratio). A u=+inf LP with a bounded optimum
    must still match HiGHS under all three rules."""

    @pytest.mark.parametrize("rule", ["dantzig", "steepest_edge",
                                      "max_improvement"])
    @pytest.mark.parametrize("seed", [3, 4])
    def test_rule_inf_upper_matches_highs(self, rule, seed):
        c, A, b, G, g = _rand_lp(seed)
        c = np.abs(c)  # keep min c'x over x>=0 bounded without upper bounds
        f_ref = _scipy_opt(c, A, b, G, g, hi=None)
        P = make_lp(c, A, b, G=G, g=g, d=np.zeros(len(c)),
                    u=np.full(len(c), np.inf))
        r = simplex_lp(P, settings=Settings(rule=rule))
        assert int(r.status) in (1, 2), (rule, seed, int(r.status))
        f = float(np.asarray(P.c) @ np.asarray(r.x))
        assert abs(f - f_ref) < 1e-6 * max(1.0, abs(f_ref)), (rule, seed)


class TestColumnPivotFlavor:
    """Settings.pivot='column' (reference getRowsGJ, utils.jl:2-45) on QPs
    with redundant working rows at N=50."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_column_purge_qp(self, seed):
        from ssqp_tpu.solvers.ssqp import solve_qp

        rng = np.random.default_rng(seed)
        N = 50
        H = rng.standard_normal((N, N))
        V = H @ H.T / N + 0.5 * np.eye(N)
        mu = rng.uniform(0.0, 0.2, N)
        # duplicated budget row -> rank-deficient working system every iter
        A = np.vstack([np.ones(N), np.ones(N)])
        b = np.array([1.0, 1.0])
        Q = make_qp(V, -mu, A, b, u=np.full(N, 4.0 / N))
        r_row = solve_qp(Q, settings=Settings(pivot="row"))
        r_col = solve_qp(Q, settings=Settings(pivot="column"))
        assert int(r_row.status) > 0 and int(r_col.status) > 0
        np.testing.assert_allclose(np.asarray(r_row.x), np.asarray(r_col.x),
                                   atol=1e-7)


class TestInitSSQP:
    """init_ssqp_traced (reference initSSQP, SSQP.jl:386-453) must produce a
    feasible start the S-loop accepts, across random finite-lower-bound
    problems."""

    @pytest.mark.parametrize("seed", range(4))
    def test_feasible_start_and_solve(self, seed):
        from ssqp_tpu.solvers.phase1 import init_ssqp_traced
        from ssqp_tpu.solvers.ssqp import solve_qp_loop

        rng = np.random.default_rng(seed)
        N, J = 24, 6
        H = rng.standard_normal((N, N))
        V = H @ H.T / N + 0.5 * np.eye(N)
        mu = rng.uniform(0.0, 0.2, N)
        G = rng.standard_normal((J, N))
        g = G @ np.full(N, 1.0 / N) + rng.uniform(0.05, 0.5, J)
        Q = make_qp(V, -mu, G=G, g=g, u=np.full(N, 6.0 / N))
        s = Settings()
        x0, Sx, Se, st = init_ssqp_traced(Q, s)
        assert int(st) == 1
        x0n = np.asarray(x0)
        assert abs(x0n.sum() - 1.0) < 1e-8
        assert (np.asarray(Q.G) @ x0n <= np.asarray(Q.g) + 1e-8).all()
        r = solve_qp_loop(Q, Sx, Se, x0, s, pre_status=st)
        assert int(r.status) > 0


class TestSimplexLPStandard:
    """simplex_lp_standard — the reference SimplexLP(c,A,b,d,u) signature
    (Simplex.jl:1036)."""

    def test_standard_form_entry(self):
        # min -x1 - x2 s.t. x1 + x2 + s = 2 with s >= 0 box
        c = [-1.0, -1.0, 0.0]
        A = [[1.0, 1.0, 1.0]]
        b = [2.0]
        r = simplex_lp_standard(c, A, b, d=[0.0, 0.0, 0.0],
                                u=[np.inf] * 3)
        assert int(r.status) in (1, 2)
        x = np.asarray(r.x)
        assert abs(x[0] + x[1] - 2.0) < 1e-9

    @pytest.mark.parametrize("seed", [0, 1])
    def test_standard_matches_highs(self, seed):
        from scipy.optimize import linprog

        rng = np.random.default_rng(100 + seed)
        N, M = 30, 4
        A = rng.standard_normal((M, N))
        x0 = rng.uniform(0.1, 1.0, N)
        b = A @ x0
        c = rng.standard_normal(N)
        res = linprog(c, A_eq=A, b_eq=b, bounds=[(0.0, 2.0)] * N,
                      method="highs")
        assert res.status == 0
        r = simplex_lp_standard(c, A, b, d=np.zeros(N), u=np.full(N, 2.0))
        assert int(r.status) in (1, 2)
        f = float(np.asarray(c) @ np.asarray(r.x))
        assert abs(f - res.fun) < 1e-6 * max(1.0, abs(res.fun))


class TestCompilationCache:
    def test_enable_compilation_cache(self, tmp_path):
        from ssqp_tpu.utils.aot import enable_compilation_cache, warmup

        p = enable_compilation_cache(str(tmp_path / "cache"))
        assert p == str(tmp_path / "cache")
        import os

        assert os.path.isdir(p)
        assert jax.config.jax_compilation_cache_dir == p
        # warm a tiny shape through the hook so the path is exercised
        n = warmup(shapes=((6, 1, 0),), dtype=np.float64)
        assert n == 1
        # refined=True warms the mixed-precision pipeline as a 2nd program
        n = warmup(shapes=((6, 1, 0),), dtype=np.float32, refined=True)
        assert n == 2
