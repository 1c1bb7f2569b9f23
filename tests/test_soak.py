"""Differential soak: random LP/QP batteries against scipy (VERDICT r2
weak #5 — the round-2 /tmp soak pattern, now checked in).

Opt-in (deselected by default via addopts): run with

    python -m pytest tests/test_soak.py -m soak -q

120 random LPs x {simplex, criss-cross} vs scipy.linprog(highs) + 60 random
QPs x {f64, refined-f32} vs scipy SLSQP. Shapes are QUANTIZED to a few
buckets so the whole soak compiles ~a dozen programs, and jax caches are
cleared every ~10 solves — the XLA-CPU compiler state OOMs/segfaults
otherwise (same reason as conftest's per-module clear). This battery caught
the feasibility-cheating refinement acceptance bug in round 2 (fab0279).
"""

import numpy as np
import pytest

import jax

from ssqp_tpu.types import Settings, make_lp, make_qp

pytestmark = pytest.mark.soak

# shape buckets: (N, M, J) — quantized so compiles are reused across draws
LP_SHAPES = [(8, 2, 3), (16, 3, 5), (32, 4, 8)]
QP_SHAPES = [(8, 1, 2), (16, 2, 4), (24, 3, 6)]


def _rand_lp(rng, N, M, J):
    A = rng.standard_normal((M, N))
    G = rng.standard_normal((J, N))
    x0 = rng.uniform(0.2, 0.8, N)
    b = A @ x0
    g = G @ x0 + rng.uniform(0.05, 1.0, J)
    c = rng.standard_normal(N)
    return make_lp(c, A, b, G=G, g=g, d=np.zeros(N), u=np.ones(N),
                   dtype=np.float64)


def _rand_qp(rng, N, M, J):
    H = rng.standard_normal((N, N))
    V = H @ H.T / N + 0.3 * np.eye(N)
    A = np.vstack([np.ones(N), rng.standard_normal((M - 1, N))]) if M > 1 \
        else np.ones((1, N))
    G = rng.standard_normal((J, N))
    x0 = rng.uniform(0.05, 0.9, N)
    x0 = x0 / x0.sum()
    b = A @ x0
    g = G @ x0 + rng.uniform(0.05, 0.5, J)
    q = rng.standard_normal(N)
    return make_qp(V, q, A, b, G=G, g=g, d=np.zeros(N), u=np.ones(N),
                   dtype=np.float64)


def test_soak_lp_vs_linprog():
    from scipy.optimize import linprog

    from ssqp_tpu.solvers.cclp import solve_lp
    from ssqp_tpu.solvers.lp import simplex_lp

    rng = np.random.default_rng(2024)
    n_checked = 0
    for i in range(120):
        N, M, J = LP_SHAPES[i % len(LP_SHAPES)]
        P = _rand_lp(rng, N, M, J)
        ref = linprog(np.asarray(P.c), A_ub=np.asarray(P.G),
                      b_ub=np.asarray(P.g), A_eq=np.asarray(P.A),
                      b_eq=np.asarray(P.b),
                      bounds=list(zip(np.asarray(P.d), np.asarray(P.u))),
                      method="highs")
        for engine, solver in (("simplex", simplex_lp), ("cclp", solve_lp)):
            r = solver(P)
            st = int(r.status)
            if ref.success:
                assert st > 0, (i, engine, st)
                f = float(np.asarray(P.c) @ np.asarray(r.x, float))
                assert abs(f - ref.fun) < 1e-7 * (1 + abs(ref.fun)), \
                    (i, engine, f, ref.fun)
            else:
                # HiGHS infeasible: our engines must not claim optimal
                assert st <= 0 or int(r.status) == 2, (i, engine, st)
            n_checked += 1
        if i % 10 == 9:
            jax.clear_caches()
    assert n_checked == 240


def test_soak_qp_vs_slsqp():
    from scipy.optimize import minimize

    from ssqp_tpu.solvers.refine import solve_qp_refined
    from ssqp_tpu.solvers.ssqp import solve_qp

    import jax.numpy as jnp

    rng = np.random.default_rng(4048)
    for i in range(60):
        N, M, J = QP_SHAPES[i % len(QP_SHAPES)]
        Q = _rand_qp(rng, N, M, J)
        V, q = np.asarray(Q.V), np.asarray(Q.q)
        A, b = np.asarray(Q.A), np.asarray(Q.b)
        G, g = np.asarray(Q.G), np.asarray(Q.g)
        fobj = lambda x: 0.5 * x @ V @ x + q @ x
        ref = minimize(
            fobj, np.full(N, 1.0 / N), jac=lambda x: V @ x + q,
            method="SLSQP",
            bounds=[(0.0, 1.0)] * N,
            constraints=[
                {"type": "eq", "fun": lambda x: A @ x - b,
                 "jac": lambda x: A},
                {"type": "ineq", "fun": lambda x: g - G @ x,
                 "jac": lambda x: -G},
            ],
            options={"maxiter": 300, "ftol": 1e-12},
        )
        r64 = solve_qp(Q)
        r32 = solve_qp_refined(Q, search_dtype=jnp.float32)
        if not ref.success:
            continue  # SLSQP gave up; nothing to compare against
        fref = float(ref.fun)
        for tag, r in (("f64", r64), ("refined-f32", r32)):
            assert int(r.status) > 0, (i, tag, int(r.status))
            f = float(fobj(np.asarray(r.x, float)))
            # ours must be at least as good (SLSQP often stops early)
            assert f <= fref + 1e-6 * (1 + abs(fref)), (i, tag, f, fref)
        if i % 10 == 9:
            jax.clear_caches()


def test_soak_diff_gradients_vs_fd():
    """Gradient soak for the differentiable layer: jax.grad of random linear
    functionals of x*(theta) vs central finite differences, over random QPs
    and every leaf the layer claims exact gradients for. Catches active-set
    purge desynchronization (wrong keep-mask => wrong multipliers => wrong
    IFT jacobian) that the point tests' fixed seeds could miss."""
    import dataclasses

    import jax.numpy as jnp

    from ssqp_tpu.solvers.diff import solve_qp_diff
    from ssqp_tpu.solvers.ssqp import solve_qp

    S = Settings()
    rng = np.random.default_rng(515)
    checked = 0
    for i in range(20):
        N, M, J = QP_SHAPES[i % len(QP_SHAPES)]
        Q = _rand_qp(rng, N, M, J)
        if int(solve_qp(Q).status) <= 0:
            continue
        w = rng.standard_normal(N)
        for leaf in ("q", "b", "u"):
            def loss(arr, leaf=leaf):
                Qi = dataclasses.replace(Q, **{leaf: arr})
                return w @ solve_qp_diff(Qi, S).x

            base = np.asarray(getattr(Q, leaf), np.float64)
            g_ad = np.asarray(jax.grad(loss)(jnp.asarray(base)))
            h = 1e-6
            g_fd = np.zeros_like(base)
            for k in range(base.size):
                e = np.zeros_like(base)
                e[k] = h
                g_fd[k] = (float(loss(jnp.asarray(base + e)))
                           - float(loss(jnp.asarray(base - e)))) / (2 * h)
            # FD steps near an active-set boundary straddle a kink — allow
            # a few coordinates to disagree (the derivative is one-sided
            # there); the bulk must match tightly
            bad = np.abs(g_ad - g_fd) > 2e-4 * (1 + np.abs(g_fd))
            assert bad.mean() <= 0.15, (i, leaf, bad.sum(), base.size)
            checked += 1
        if i % 5 == 4:
            jax.clear_caches()
    assert checked >= 30  # enough problems actually exercised
