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


# ---------------------------------------------------------------------------
# hard classes (VERDICT r4 item 7): the original sweeps draw well-conditioned
# problems; these target the adversarial structure MOI.Test-style batteries
# probe — rank-deficient objectives, degenerate active sets / duplicated
# rows, and near-singular sample covariances.
# ---------------------------------------------------------------------------

def _rand_qp_hard(rng, N, M, J, klass):
    if klass == 0:
        # rank-deficient V (PSD, rank ~N/3): the strictly-convex assumption
        # gone; optimum face can be flat (objective still unique)
        H = rng.standard_normal((N, max(N // 3, 2)))
        V = H @ H.T / N
    elif klass == 1:
        # near-singular sample covariance (T barely above N => cond ~1e6+,
        # the sp500_like failure mode at small scale)
        T = N + 8
        R = rng.standard_normal((T, N)) @ np.diag(rng.uniform(0.1, 3.0, N))
        Rc = R - R.mean(0)
        V = Rc.T @ Rc / (T - 1)
    else:
        H = rng.standard_normal((N, N))
        V = H @ H.T / N + 0.3 * np.eye(N)
    # degenerate geometry for every class: x0 sits ON several bounds, the
    # row set contains a DUPLICATED equality row (rank-deficient working
    # sets; the purge path must drop it), and one inequality is exactly
    # active at x0
    x0 = rng.uniform(0.05, 0.9, N)
    x0[rng.choice(N, max(N // 4, 1), replace=False)] = 0.0  # on the bound
    s = x0.sum()
    x0 = x0 / s if s > 0 else np.full(N, 1.0 / N)
    A1 = np.vstack([np.ones(N), rng.standard_normal((max(M - 2, 0), N))])
    A = np.vstack([A1, A1[-1]])  # duplicated last row
    G = rng.standard_normal((J, N))
    b = A @ x0
    g = G @ x0 + np.concatenate([[0.0], rng.uniform(0.05, 0.5, J - 1)])
    q = rng.standard_normal(N)
    return make_qp(V, q, A, b, G=G, g=g, d=np.zeros(N), u=np.ones(N),
                   dtype=np.float64)


def test_soak_qp_hard_classes():
    from scipy.optimize import minimize

    from ssqp_tpu.solvers.refine import solve_qp_refined
    from ssqp_tpu.solvers.ssqp import solve_qp

    import jax.numpy as jnp

    rng = np.random.default_rng(7071)
    checked = 0
    for i in range(45):
        N, M, J = QP_SHAPES[i % len(QP_SHAPES)]
        klass = i % 3
        Q = _rand_qp_hard(rng, N, max(M, 2), max(J, 2), klass)
        V, q = np.asarray(Q.V), np.asarray(Q.q)
        A, b = np.asarray(Q.A), np.asarray(Q.b)
        G, g = np.asarray(Q.G), np.asarray(Q.g)
        fobj = lambda x: 0.5 * x @ V @ x + q @ x
        ref = minimize(
            fobj, np.full(N, 1.0 / N), jac=lambda x: V @ x + q,
            method="SLSQP", bounds=[(0.0, 1.0)] * N,
            constraints=[
                {"type": "eq", "fun": lambda x: A @ x - b,
                 "jac": lambda x: A},
                {"type": "ineq", "fun": lambda x: g - G @ x,
                 "jac": lambda x: -G},
            ],
            options={"maxiter": 400, "ftol": 1e-12},
        )
        r64 = solve_qp(Q)
        r32 = solve_qp_refined(Q, search_dtype=jnp.float32)
        if not ref.success:
            continue
        fref = float(ref.fun)
        for tag, r in (("f64", r64), ("refined-f32", r32)):
            assert int(r.status) > 0, (i, klass, tag, int(r.status))
            x = np.asarray(r.x, float)
            # primal feasibility at the returned point
            assert np.abs(A @ x - b).max() < 1e-6, (i, klass, tag)
            assert (G @ x - g).max() < 1e-6, (i, klass, tag)
            assert x.min() > -1e-8 and x.max() < 1 + 1e-8, (i, klass, tag)
            f = float(fobj(x))
            assert f <= fref + 1e-6 * (1 + abs(fref)), (i, klass, tag, f, fref)
            checked += 1
        if i % 10 == 9:
            jax.clear_caches()
    # SLSQP gives up (ref.success False) on a good share of the hard draws
    # — those skip the comparison; require enough survivors to be meaningful
    assert checked >= 40  # enough hard instances actually compared


def test_soak_lp_hard_classes():
    """LP sweep over the same adversarial geometry: duplicated equality
    rows (purge must drop them) and degenerate vertices (x0 pinned to the
    bound on a quarter of the coordinates, one inequality exactly active)."""
    from scipy.optimize import linprog

    from ssqp_tpu.solvers.cclp import solve_lp
    from ssqp_tpu.solvers.lp import simplex_lp

    rng = np.random.default_rng(9092)
    checked = 0
    for i in range(60):
        N, M, J = LP_SHAPES[i % len(LP_SHAPES)]
        x0 = rng.uniform(0.2, 0.8, N)
        x0[rng.choice(N, max(N // 4, 1), replace=False)] = 0.0
        A1 = rng.standard_normal((M, N))
        A = np.vstack([A1, A1[0]])  # duplicated row
        G = rng.standard_normal((J, N))
        b = A @ x0
        g = G @ x0 + np.concatenate([[0.0], rng.uniform(0.05, 1.0, J - 1)])
        c = rng.standard_normal(N)
        P = make_lp(c, A, b, G=G, g=g, d=np.zeros(N), u=np.ones(N),
                    dtype=np.float64)
        ref = linprog(c, A_ub=G, b_ub=g, A_eq=A, b_eq=b,
                      bounds=[(0.0, 1.0)] * N, method="highs")
        for engine, solver in (("simplex", simplex_lp), ("cclp", solve_lp)):
            r = solver(P)
            st = int(r.status)
            if ref.success:
                assert st > 0, (i, engine, st)
                f = float(c @ np.asarray(r.x, float))
                assert abs(f - ref.fun) < 1e-7 * (1 + abs(ref.fun)), \
                    (i, engine, f, ref.fun)
                checked += 1
            else:
                assert st <= 0 or st == 2, (i, engine, st)
        if i % 10 == 9:
            jax.clear_caches()
    assert checked >= 60


def test_soak_grid_protocols():
    """Protocol soak (VERDICT r5 item 6): the round-3/4 bug classes
    (tainted warm starts, rescue paths, compaction gather/scatter) live in
    the GRID protocols, not the single-instance solvers the other sweeps
    draw. Random sorted q-grids at N=128 (half with J>0 rows) run through
    waves / cascade-compaction / auto and difference against the plain
    vmapped batch: same solve verdicts, same objectives to solver tol,
    primal feasibility at every returned point."""
    import dataclasses

    import jax.numpy as jnp

    from ssqp_tpu.parallel.batch import (
        frontier_batch,
        solve_qp_batch,
        solve_qp_batch_auto,
        solve_qp_batch_compact,
        solve_qp_batch_waves,
    )

    s32 = Settings.for_dtype(jnp.float32)
    rng = np.random.default_rng(606)
    N, B = 128, 64
    for trial in range(6):
        J = 0 if trial % 2 == 0 else 3
        H = rng.standard_normal((N, N))
        V = (H @ H.T / N + 0.5 * np.eye(N)).astype(np.float32)
        mu = rng.uniform(0, 0.25, N).astype(np.float32)
        kw = {}
        if J:
            kw = dict(
                G=rng.standard_normal((J, N)).astype(np.float32),
                g=(np.abs(rng.standard_normal(J)) + 0.3).astype(np.float32),
            )
        Q = make_qp(V, mu,
                    u=np.full(N, rng.uniform(2.5, 6.0) / N, np.float32),
                    dtype=np.float32, **kw)
        lams = np.sort(rng.uniform(0.0, 2.5, B)).astype(np.float32)
        Qb, shared = frontier_batch(Q, jnp.asarray(lams))
        ref = solve_qp_batch(Qb, s32, shared=shared)
        Vj = np.asarray(Qb.V, np.float64)
        qs = np.asarray(Qb.q, np.float64)
        fobj = lambda X: (0.5 * np.einsum("bi,ij,bj->b", X, Vj, X)
                          + (qs * X).sum(1))
        xr = np.asarray(ref.x, np.float64)
        fr = fobj(xr)
        str_ = np.asarray(ref.status)
        assert (str_ > 0).all(), (trial, str_.min())
        for name, run in (
            ("waves8", lambda: solve_qp_batch_waves(Qb, s32, shared,
                                                    waves=8)),
            ("compact", lambda: solve_qp_batch_compact(
                Qb, s32, shared=shared, compact=(2, 4, 8))),
            ("auto", lambda: solve_qp_batch_auto(Qb, s32, shared)),
        ):
            r = run()
            st = np.asarray(r.status)
            assert (st > 0).all(), (trial, name, st.min())
            x = np.asarray(r.x, np.float64)
            # primal feasibility at every returned point
            assert np.abs(x.sum(1) - 1.0).max() < 1e-4, (trial, name)
            assert x.min() > -1e-5, (trial, name)
            if J:
                Gj = np.asarray(Qb.G, np.float64)
                gj = np.asarray(Qb.g, np.float64)
                assert (x @ Gj.T - gj).max() < 1e-4, (trial, name)
            # objective agreement with the plain batch at solver tol
            df = np.abs(fobj(x) - fr) / (1.0 + np.abs(fr))
            assert df.max() < 5e-5, (trial, name, df.max())
        jax.clear_caches()


def test_soak_lp_grid_protocols():
    """LP grid-protocol soak (round 5): random c-parametric and
    rhs-parametric families through the warm-wave protocols
    (solve_lp_batch_waves / solve_lp_batch_waves_rhs), differenced against
    the plain vmapped two-phase batch and spot-checked against
    scipy.linprog on a few members."""
    import dataclasses

    import jax.numpy as jnp
    from scipy.optimize import linprog

    from ssqp_tpu.parallel.batch import (
        solve_lp_batch,
        solve_lp_batch_waves,
        solve_lp_batch_waves_rhs,
    )

    s = Settings()
    rng = np.random.default_rng(7117)
    N, M, J, B = 24, 3, 6, 32
    for trial in range(4):
        A = rng.standard_normal((M, N))
        G = rng.standard_normal((J, N))
        x0 = rng.uniform(0.15, 0.9, N)
        x1 = rng.uniform(0.15, 0.9, N)
        slack = rng.uniform(0.1, 1.0, J)
        c0 = rng.standard_normal(N)
        dc = rng.standard_normal(N) * 0.5
        ts = np.linspace(0.0, 1.0, B)
        P = make_lp(c0, A, A @ x0, G=G, g=G @ x0 + slack, d=np.zeros(N),
                    u=np.full(N, 2.0))

        # c-grid family
        C = jnp.asarray(c0[None, :] + ts[:, None] * dc[None, :])
        Pc = dataclasses.replace(P, c=C)
        sh_c = ("A", "b", "G", "g", "d", "u")
        r0 = solve_lp_batch(Pc, s, shared=sh_c)
        r1 = solve_lp_batch_waves(Pc, s, sh_c, waves=8)
        assert (np.asarray(r1.status) >= 1).all(), trial
        f0 = (np.asarray(C) * np.asarray(r0.x)).sum(1)
        f1 = (np.asarray(C) * np.asarray(r1.x)).sum(1)
        np.testing.assert_allclose(f1, f0, atol=1e-7)

        # rhs-grid family
        Xc = x0[None, :] + ts[:, None] * (x1 - x0)[None, :]
        bB = jnp.asarray(Xc @ A.T)
        gB = jnp.asarray(Xc @ G.T + slack[None, :])
        Pr = dataclasses.replace(P, b=bB, g=gB)
        sh_r = ("c", "A", "G", "d", "u")
        q0 = solve_lp_batch(Pr, s, shared=sh_r)
        q1 = solve_lp_batch_waves_rhs(Pr, s, sh_r, waves=8)
        assert (np.asarray(q1.status) >= 1).all(), trial
        h0 = np.asarray(q0.x) @ c0
        h1 = np.asarray(q1.x) @ c0
        np.testing.assert_allclose(h1, h0, atol=1e-7)

        # oracle spot checks on 3 members of each family
        for k in (0, B // 2, B - 1):
            ref = linprog(np.asarray(C[k]), A_ub=G, b_ub=np.asarray(P.g),
                          A_eq=A, b_eq=np.asarray(P.b),
                          bounds=[(0.0, 2.0)] * N, method="highs")
            assert ref.success
            assert abs(f1[k] - ref.fun) < 1e-7 * (1 + abs(ref.fun)), \
                (trial, k)
            refr = linprog(c0, A_ub=G, b_ub=np.asarray(gB[k]), A_eq=A,
                           b_eq=np.asarray(bB[k]),
                           bounds=[(0.0, 2.0)] * N, method="highs")
            assert refr.success
            assert abs(h1[k] - refr.fun) < 1e-7 * (1 + abs(refr.fun)), \
                (trial, k)
        jax.clear_caches()
