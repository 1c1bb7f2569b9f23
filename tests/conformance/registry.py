"""Conformance problem registry — the MOI.Test-scale battery.

The reference's real correctness surface is `MOI.Test.runtests`: hundreds of
canonical LP/QP problems with known optima at atol=rtol=1e-6
(reference test/testMOI.jl:24-48). This registry reproduces that *scale and
shape coverage* natively: hand-built canonical edge cases (bound edge cases,
degenerate ranks, empty dimensions, sense handling, redundant/inconsistent
systems, N=1/N=2 degeneracies) plus structured generated families whose
optima are known by construction or cross-checked against scipy
(`linprog`-HiGHS for LPs, separable/equality analytic forms for QPs).

Every case is a `Case` with:
  kind      'lp' | 'qp'
  arrays    problem data (numpy, f64)
  expect    'optimal'    -> status > 0, objective == f_opt at atol, KKT < tol
            'infeasible' -> status == 0
            'unbounded'  -> status == 3 (LP engines' convention)
            'invalid'    -> status == -1 (constructor-rejected models)
  f_opt     optimal objective for 'optimal' cases
"""

from __future__ import annotations

import dataclasses

import numpy as np

INF = np.inf


@dataclasses.dataclass
class Case:
    name: str
    kind: str  # 'lp' | 'qp'
    expect: str  # 'optimal' | 'infeasible' | 'unbounded' | 'invalid'
    f_opt: float | None = None
    x_opt: np.ndarray | None = None
    atol: float = 1e-6
    # problem data
    V: np.ndarray | None = None
    c: np.ndarray | None = None  # LP cost / QP linear term q
    A: np.ndarray | None = None
    b: np.ndarray | None = None
    G: np.ndarray | None = None
    g: np.ndarray | None = None
    d: np.ndarray | None = None
    u: np.ndarray | None = None
    # which LP engines to run ('simplex', 'cclp'); QPs ignore this
    engines: tuple = ("simplex", "cclp")
    # 'solver' = direct engine entry point; 'model' = the Model API (the
    # reference reaches mc=-20 models only through its MOI wrapper's
    # analytic presolve, MOIwrapper.jl:131-160)
    via: str = "solver"


def _a(x):
    return None if x is None else np.asarray(x, float)


def lp(name, expect, c, A=None, b=None, G=None, g=None, d=None, u=None,
       f=None, x=None, atol=1e-6, engines=("simplex", "cclp"), via="solver"):
    return Case(name, "lp", expect, f, _a(x), atol, None, _a(c), _a(A), _a(b),
                _a(G), _a(g), _a(d), _a(u), engines, via)


def qp(name, expect, V, q, A=None, b=None, G=None, g=None, d=None, u=None,
       f=None, x=None, atol=1e-6, via="solver"):
    return Case(name, "qp", expect, f, _a(x), atol, _a(V), _a(q), _a(A),
                _a(b), _a(G), _a(g), _a(d), _a(u), ("simplex", "cclp"), via)


def _noA(n):
    """Explicit empty equality block (make_qp otherwise defaults to the
    portfolio budget row, types.jl:229-236)."""
    return dict(A=np.zeros((0, n)), b=np.zeros((0,)))


# ---------------------------------------------------------------------------
# Hand-built canonical LP cases
# ---------------------------------------------------------------------------


def _hand_lps():
    cases = []
    # --- N=1 degeneracies -------------------------------------------------
    cases += [
        lp("lp_n1_min_at_lower", "optimal", c=[1.0], A=[[1.0]], b=[0.5],
           d=[0.0], u=[2.0], f=0.5, x=[0.5]),
        lp("lp_n1_box_only_lower", "optimal", c=[1.0], d=[-1.0], u=[3.0],
           f=-1.0, x=[-1.0]),
        lp("lp_n1_box_only_upper", "optimal", c=[-2.0], d=[-1.0], u=[3.0],
           f=-6.0, x=[3.0]),
        lp("lp_n1_box_unbounded", "unbounded", c=[1.0], d=[-INF], u=[3.0]),
        lp("lp_n1_ineq_only", "optimal", c=[-1.0], G=[[1.0]], g=[2.0],
           d=[0.0], u=[INF], f=-2.0, x=[2.0]),
        lp("lp_n1_eq_infeasible_bounds", "infeasible", c=[1.0], A=[[1.0]],
           b=[5.0], d=[0.0], u=[2.0]),
        # mc=-20 free-variable equality LPs: the raw SimplexLP gate returns
        # -1 (Simplex.jl:847-849); criss-cross has no gate (CCLP.jl:289) and
        # the Model analytic presolve solves them (MOIwrapper.jl:131-160)
        lp("lp_n1_free_eq", "optimal", c=[3.0], A=[[2.0]], b=[4.0],
           d=[-INF], u=[INF], f=6.0, x=[2.0], engines=("cclp", "model")),
        lp("lp_n1_free_eq_simplex_gate", "invalid", c=[3.0], A=[[2.0]],
           b=[4.0], d=[-INF], u=[INF], engines=("simplex",)),
        lp("lp_n1_flip_var", "optimal", c=[1.0], G=[[-1.0]], g=[1.0],
           d=[-INF], u=[2.0], f=-1.0, x=[-1.0]),
        lp("lp_n1_zero_objective", "optimal", c=[0.0], A=[[1.0]], b=[1.0],
           d=[0.0], u=[2.0], f=0.0),
    ]
    # --- N=2 canonical shapes ---------------------------------------------
    cases += [
        lp("lp_n2_unique_vertex", "optimal", c=[-1.0, -2.0],
           G=[[1.0, 1.0], [1.0, 0.0]], g=[4.0, 3.0], d=[0.0, 0.0],
           u=[INF, INF], f=-8.0, x=[0.0, 4.0]),
        lp("lp_n2_degenerate_vertex", "optimal", c=[-1.0, -1.0],
           G=[[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], g=[1.0, 1.0, 2.0],
           d=[0.0, 0.0], u=[INF, INF], f=-2.0, x=[1.0, 1.0]),
        lp("lp_n2_infinitely_many", "optimal", c=[-1.0, -1.0],
           G=[[1.0, 1.0]], g=[2.0], d=[0.0, 0.0], u=[INF, INF], f=-2.0),
        lp("lp_n2_unbounded_ray", "unbounded", c=[-1.0, 0.0],
           G=[[-1.0, 1.0]], g=[0.0], d=[0.0, 0.0], u=[INF, INF]),
        lp("lp_n2_infeasible_ineq", "infeasible", c=[1.0, 1.0],
           G=[[1.0, 1.0], [-1.0, -1.0]], g=[1.0, -3.0], d=[0.0, 0.0],
           u=[INF, INF]),
        lp("lp_n2_redundant_rows", "optimal", c=[1.0, 1.0],
           A=[[1.0, 1.0], [2.0, 2.0]], b=[2.0, 4.0], d=[0.0, 0.0],
           u=[5.0, 5.0], f=2.0),
        lp("lp_n2_inconsistent_rows", "infeasible", c=[1.0, 1.0],
           A=[[1.0, 1.0], [1.0, 1.0]], b=[2.0, 3.0], d=[0.0, 0.0],
           u=[5.0, 5.0]),
        # x NOT pinned: every (0, t) with t in [1, 3] is optimal (two
        # equally-optimal vertices) — only the objective is checkable
        lp("lp_n2_interval_row", "optimal", c=[1.0, 0.0],
           G=[[1.0, 1.0], [-1.0, -1.0]], g=[3.0, -1.0], d=[0.0, 0.0],
           u=[INF, INF], f=0.0),
        lp("lp_n2_greaterthan_row", "optimal", c=[1.0, 2.0],
           G=[[-1.0, -1.0]], g=[-1.0], d=[0.0, 0.0], u=[INF, INF],
           f=1.0, x=[1.0, 0.0]),
        lp("lp_n2_negative_lower", "optimal", c=[1.0, 1.0],
           A=[[1.0, -1.0]], b=[0.0], d=[-2.0, -2.0], u=[2.0, 2.0],
           f=-4.0, x=[-2.0, -2.0]),
        lp("lp_n2_both_free", "optimal", c=[1.0, 1.0],
           A=[[1.0, 1.0]], b=[1.0], d=[-INF, -INF], u=[INF, INF], f=1.0,
           engines=("cclp", "model")),
        lp("lp_n2_free_unbounded", "unbounded", c=[1.0, -1.0],
           A=[[1.0, 1.0]], b=[1.0], d=[-INF, -INF], u=[INF, INF],
           engines=("cclp", "model")),
        lp("lp_n2_fixed_via_eq", "optimal", c=[0.0, 1.0],
           A=[[1.0, 0.0], [0.0, 1.0]], b=[0.7, 0.2], d=[0.0, 0.0],
           u=[1.0, 1.0], f=0.2, x=[0.7, 0.2]),
        # d == u rows feeding the solver: mc=-30; the simplex gate returns -1
        # (reference SimplexLP, Simplex.jl:847-849) while criss-cross solves
        # it (reference solveLP has no gate) — split into two cases.
        lp("lp_n2_du_equal_simplex", "invalid", c=[0.0, 1.0],
           A=[[1.0, 1.0]], b=[1.0], d=[0.3, 0.0], u=[0.3, 10.0],
           engines=("simplex",)),
        lp("lp_n2_du_equal_cclp", "optimal", c=[0.0, 1.0],
           A=[[1.0, 1.0]], b=[1.0], d=[0.3, 0.0], u=[0.3, 10.0],
           f=0.7, x=[0.3, 0.7], engines=("cclp",)),
    ]
    # --- box-only (M=J=0, boxLP closed form) --------------------------------
    cases += [
        lp("lp_box_mixed_signs", "optimal", c=[1.0, -1.0, 0.0],
           d=[-1.0, -1.0, -1.0], u=[1.0, 1.0, 1.0], f=-2.0),
        lp("lp_box_zero_cost_tie", "optimal", c=[0.0, 1.0],
           d=[0.0, 0.0], u=[1.0, 1.0], f=0.0),
        lp("lp_box_unbounded_dir", "unbounded", c=[0.0, -1.0],
           d=[0.0, 0.0], u=[1.0, INF]),
    ]
    # --- slightly larger structured ----------------------------------------
    # transportation-style LP with known optimum
    cases += [
        lp("lp_transport_2x2", "optimal",
           c=[4.0, 6.0, 6.0, 4.0],
           A=[[1, 1, 0, 0], [0, 0, 1, 1], [1, 0, 1, 0], [0, 1, 0, 1]],
           b=[10.0, 15.0, 12.0, 13.0],
           d=[0.0] * 4, u=[INF] * 4, f=10 * 4 + 0 * 6 + 2 * 6 + 13 * 4),
        # diet-style with greater-than rows (negated)
        lp("lp_diet", "optimal", c=[2.0, 3.0],
           G=[[-1.0, -2.0], [-3.0, -1.0]], g=[-4.0, -6.0],
           d=[0.0, 0.0], u=[INF, INF], f=2 * (8 / 5) + 3 * (6 / 5),
           x=[8 / 5, 6 / 5]),
    ]
    return cases


# ---------------------------------------------------------------------------
# Hand-built canonical QP cases
# ---------------------------------------------------------------------------


def _hand_qps():
    cases = []
    cases += [
        qp("qp_n1_interior", "optimal", V=[[2.0]], q=[-2.0], d=[0.0],
           u=[5.0], G=[[1.0]], g=[5.0], **_noA(1), f=-1.0, x=[1.0]),
        qp("qp_n1_clamp_lower", "optimal", V=[[2.0]], q=[4.0], d=[0.0],
           u=[5.0], G=[[1.0]], g=[5.0], **_noA(1), f=0.0, x=[0.0]),
        qp("qp_n1_clamp_upper", "optimal", V=[[2.0]], q=[-20.0], d=[0.0],
           u=[5.0], G=[[1.0]], g=[5.0], **_noA(1), f=0.5 * 2 * 25 - 100,
           x=[5.0]),
        qp("qp_n1_eq_pinned", "optimal", V=[[2.0]], q=[0.0], A=[[1.0]],
           b=[3.0], d=[0.0], u=[5.0], f=9.0, x=[3.0]),
        qp("qp_n1_infeasible", "infeasible", V=[[2.0]], q=[0.0], A=[[1.0]],
           b=[9.0], d=[0.0], u=[5.0]),
        # d == u (mc=-30) -> constructor-rejected, status -1 (reference
        # solveQP guard SSQP.jl:226-228)
        qp("qp_du_equal_invalid", "invalid", V=np.eye(2), q=[0.0, 0.0],
           A=[[1.0, 1.0]], b=[1.0], d=[0.5, 0.0], u=[0.5, 1.0]),
        # indefinite V (mc=-70)
        qp("qp_not_psd_invalid", "invalid", V=[[1.0, 0.0], [0.0, -1.0]],
           q=[0.0, 0.0], A=[[1.0, 1.0]], b=[1.0], d=[0.0, 0.0],
           u=[1.0, 1.0]),
    ]
    # M=0 box-only QPs: analytic x* = clip(-q/v)
    rng = np.random.default_rng(11)
    for k in range(6):
        n = [1, 2, 3, 5, 8, 13][k]
        v = rng.uniform(0.5, 3.0, n)
        q = rng.standard_normal(n) * 2
        dd = np.full(n, -1.0)
        uu = np.full(n, 1.0)
        xs = np.clip(-q / v, dd, uu)
        f = float(0.5 * xs @ (v * xs) + q @ xs)
        cases.append(
            qp(f"qp_box_separable_{n}", "optimal", V=np.diag(v), q=q,
               **_noA(n),
               G=np.zeros((1, n)), g=[1.0],  # dummy inactive row keeps J>0 path honest
               d=dd, u=uu, f=f, x=xs)
        )
    # equality-only QPs: x* = solve KKT analytically
    for k in range(6):
        n = 3 + k
        m = 1 + (k % 2)
        rngk = np.random.default_rng(100 + k)
        H = rngk.standard_normal((n, n))
        V = H @ H.T / n + 0.7 * np.eye(n)
        A = rngk.standard_normal((m, n))
        q = rngk.standard_normal(n)
        xf = rngk.standard_normal(n)
        b = A @ xf
        Km = np.block([[V, A.T], [A, np.zeros((m, m))]])
        rhs = np.concatenate([-q, b])
        sol = np.linalg.solve(Km, rhs)
        xs = sol[:n]
        f = float(0.5 * xs @ V @ xs + q @ xs)
        # mc=-20 (no inequalities/bounds): reachable only via the Model
        # API's analytic presolve, like the reference (MOIwrapper.jl:131-160)
        cases.append(
            qp(f"qp_equality_only_{n}_{m}", "optimal", V=V, q=q, A=A, b=b,
               d=np.full(n, -INF), u=np.full(n, INF), f=f, x=xs,
               via="model")
        )
    # rank-deficient (PSD-singular) V with a box: min (x1+x2-1)^2/2 on box
    cases += [
        qp("qp_singular_V_line", "optimal",
           V=[[1.0, 1.0], [1.0, 1.0]], q=[-1.0, -1.0],
           G=[[1.0, 0.0]], g=[1.0], d=[0.0, 0.0], u=[1.0, 1.0],
           f=-0.5),  # any x1+x2=1 point: f = 0.5*1 - 1 = -0.5
        # maximize sense handled by negation at the API boundary: the
        # MAX problem max -x'x + 2x1 == MIN x'x - 2x1
        qp("qp_max_sense_negated", "optimal", V=2 * np.eye(2),
           q=[-2.0, 0.0], G=[[1.0, 1.0]], g=[2.0], d=[0.0, 0.0],
           u=[2.0, 2.0], f=-1.0, x=[1.0, 0.0]),
        # redundant equality rows (rank-deficient A)
        qp("qp_redundant_eq", "optimal", V=np.eye(3),
           q=[0.0, 0.0, 0.0], A=[[1.0, 1.0, 1.0], [2.0, 2.0, 2.0]],
           b=[1.0, 2.0], d=[0.0] * 3, u=[1.0] * 3, f=1.0 / 6.0,
           x=[1 / 3] * 3),
        # inconsistent equality rows
        qp("qp_inconsistent_eq", "infeasible", V=np.eye(2),
           q=[0.0, 0.0], A=[[1.0, 1.0], [1.0, 1.0]], b=[1.0, 2.0],
           d=[0.0] * 2, u=[2.0] * 2),
        # duplicate G rows (rank-deficient active set at optimum)
        qp("qp_duplicate_G", "optimal", V=2 * np.eye(2), q=[-4.0, -4.0],
           G=[[1.0, 1.0], [1.0, 1.0], [1.0, 0.0]], g=[1.0, 1.0, 1.0],
           d=[0.0, 0.0], u=[INF, INF], f=2 * 0.25 - 4 + 0.0,
           x=[0.5, 0.5]),
    ]
    return cases


# ---------------------------------------------------------------------------
# Generated families
# ---------------------------------------------------------------------------


def _generated_qps():
    """Constructed-optimum QPs across the (N, M, J, actives) grid."""
    from ssqp_tpu.utils.problems import generate_qp_known_opt

    cases = []
    grid = []
    for N, M, J in [(3, 1, 0), (4, 0, 2), (5, 2, 3), (8, 1, 4), (8, 3, 0),
                    (13, 2, 5), (16, 4, 6), (21, 1, 2), (32, 5, 8),
                    (6, 0, 0), (40, 2, 3), (10, 2, 10)]:
        for s in range(5):
            grid.append((N, M, J, s))
    for N, M, J, s in grid:
        n_dn = min(2, N - M - 1) if N - M - 1 > 0 else 0
        n_up = 1 if N - M - n_dn - 1 > 0 else 0
        j_act = min(1, J)
        p = generate_qp_known_opt(
            seed=1000 + 17 * s + N * 7 + M * 3 + J,
            N=N, M=M, J=J, n_dn=n_dn, n_up=n_up, j_act=j_act,
        )
        cases.append(
            qp(f"qp_gen_N{N}_M{M}_J{J}_s{s}", "optimal", V=p.V, q=p.q,
               A=p.A, b=p.b, G=p.G, g=p.g, d=p.d, u=p.u,
               f=p.f_opt, x=p.x_opt)
        )
    return cases


def _generated_lps():
    """Random LPs cross-checked against scipy.optimize.linprog (HiGHS)."""
    from scipy.optimize import linprog

    cases = []
    k = 0
    for seed in range(40):
        rng = np.random.default_rng(300 + seed)
        N = int(rng.integers(2, 12))
        M = int(rng.integers(0, min(N, 4)))
        J = int(rng.integers(0, 5))
        if M + J == 0:
            J = 1
        c = rng.standard_normal(N)
        A = rng.standard_normal((M, N)) if M else np.zeros((0, N))
        G = rng.standard_normal((J, N)) if J else np.zeros((0, N))
        x_feas = rng.uniform(-0.5, 0.5, N)
        b = A @ x_feas
        g = G @ x_feas + rng.uniform(0.0, 1.0, J)
        kind = seed % 4
        if kind == 0:
            d = np.full(N, -2.0); u = np.full(N, 2.0)
        elif kind == 1:
            d = np.full(N, -2.0); u = np.full(N, INF)
        elif kind == 2:
            d = np.full(N, -INF); u = np.full(N, 2.0)
        else:
            d = np.where(np.arange(N) % 2 == 0, -2.0, -INF)
            u = np.where(np.arange(N) % 3 == 0, 2.0, INF)
        res = linprog(
            c, A_ub=G if J else None, b_ub=g if J else None,
            A_eq=A if M else None, b_eq=b if M else None,
            bounds=list(zip(np.where(np.isinf(d), None, d),
                            np.where(np.isinf(u), None, u))),
            method="highs",
        )
        if res.status == 0:
            cases.append(lp(f"lp_rand_{k}_opt", "optimal", c=c, A=A, b=b,
                            G=G, g=g, d=d, u=u, f=float(res.fun),
                            atol=1e-6))
        elif res.status == 3:
            cases.append(lp(f"lp_rand_{k}_unbdd", "unbounded", c=c, A=A,
                            b=b, G=G, g=g, d=d, u=u))
        k += 1
    # infeasible family: feasible system + one conflicting row
    for seed in range(10):
        rng = np.random.default_rng(800 + seed)
        N = int(rng.integers(2, 8))
        a = rng.standard_normal(N)
        G = np.stack([a, -a])
        g = np.array([1.0, -2.0])  # a'x <= 1 and a'x >= 2
        c = rng.standard_normal(N)
        cases.append(lp(f"lp_conflict_{seed}", "infeasible", c=c, G=G, g=g,
                        d=np.full(N, -5.0), u=np.full(N, 5.0)))
    return cases


def _frontier_qps():
    """Small dense frontier QPs vs a scipy ground truth (the reference's
    Ungil-style dataset shape: boxed portfolio with equalities+inequalities,
    SSQPspeed.jl:41-52)."""
    from scipy.optimize import minimize, LinearConstraint

    cases = []
    rng = np.random.default_rng(42)
    N = 14
    H = rng.standard_normal((N, N))
    V = H @ H.T / N + 0.3 * np.eye(N)
    mu = rng.uniform(0.0, 0.2, N)
    Gm = rng.standard_normal((2, N))
    gv = Gm @ np.full(N, 1.0 / N) + np.array([0.3, 0.5])
    for i, lam in enumerate(np.linspace(0.0, 2.0, 15)):
        q = -lam * mu
        f = lambda x, q=q: 0.5 * x @ V @ x + q @ x
        gr = lambda x, q=q: V @ x + q
        m = minimize(
            f, np.full(N, 1.0 / N), jac=gr,
            bounds=[(0.0, 4.0 / N)] * N,
            constraints=[LinearConstraint(np.ones((1, N)), 1.0, 1.0),
                         LinearConstraint(Gm, -np.inf, gv)],
            method="SLSQP", options={"maxiter": 800, "ftol": 1e-16},
        )
        if not m.success:
            # a scipy-version-dependent SLSQP bail-out must not kill the
            # collection of the whole battery — drop just this grid point
            import warnings

            warnings.warn(f"conformance: SLSQP failed on frontier point {i}; "
                          "case skipped")
            continue
        cases.append(
            qp(f"qp_frontier_ungil_{i}", "optimal", V=V, q=q,
               A=np.ones((1, N)), b=[1.0], G=Gm, g=gv,
               d=np.zeros(N), u=np.full(N, 4.0 / N),
               f=float(m.fun), atol=5e-6)
        )
    return cases


def build_registry():
    cases = (_hand_lps() + _hand_qps() + _generated_qps() + _generated_lps()
             + _frontier_qps())
    names = [c.name for c in cases]
    assert len(names) == len(set(names)), "duplicate case names"
    return cases


REGISTRY = build_registry()
