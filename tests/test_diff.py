"""Differentiable-solve layer (solvers/diff.py): implicit differentiation
at the optimum. Gradients are checked against central finite differences of
full re-solves (the ground truth that needs no IFT assumptions) and against
the envelope theorem. CPU/f64 like the rest of the suite."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssqp_tpu.types import Settings, make_qp
from ssqp_tpu.solvers.diff import qp_value, solve_qp_diff
from ssqp_tpu.solvers.ssqp import solve_qp

SETTINGS = Settings()


def _mk(N=8, J=2, seed=0, tight=True):
    """Well-conditioned random portfolio QP with some active box bounds."""
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((N, N))
    V = H @ H.T / N + 0.5 * np.eye(N)
    mu = rng.uniform(0.0, 0.3, N)
    G = rng.standard_normal((J, N)) if J else None
    g = (np.abs(G).sum(axis=1) * 0.35) if J else None
    u = np.full(N, 3.0 / N if tight else 10.0)
    return make_qp(V, mu, G=G, g=g, u=u, dtype=np.float64)


def _fd(f, x0, h=1e-6):
    """Central finite-difference gradient of scalar f at 1-D numpy x0."""
    g = np.zeros_like(x0, dtype=np.float64)
    for i in range(x0.size):
        e = np.zeros_like(g)
        e[i] = h
        g[i] = (f(x0 + e) - f(x0 - e)) / (2 * h)
    return g


class TestEnvelope:
    def test_grad_value_wrt_q_is_x(self):
        # envelope theorem: d(optimal value)/dq = x*
        Q = _mk(seed=1)

        def val(q):
            Qi = dataclasses.replace(Q, q=q)
            r = solve_qp_diff(Qi, SETTINGS)
            return qp_value(Qi, r.x)

        g = jax.grad(val)(Q.q)
        r = solve_qp(Q)
        assert int(r.status) > 0
        np.testing.assert_allclose(np.asarray(g), np.asarray(r.x), atol=1e-8)

    def test_grad_value_wrt_b_is_minus_lambda(self):
        # shadow price: d(value)/db = -lam_eq at the optimum
        Q = _mk(seed=2)

        def val(b):
            Qi = dataclasses.replace(Q, b=b)
            r = solve_qp_diff(Qi, SETTINGS)
            return qp_value(Qi, r.x)

        g = jax.grad(val)(Q.b)
        r = solve_qp_diff(Q, SETTINGS)
        np.testing.assert_allclose(
            np.asarray(g), -np.asarray(r.lam[: Q.M]), atol=1e-7
        )


class TestFiniteDifferences:
    @pytest.mark.parametrize("leaf", ["q", "b", "g", "u", "V"])
    def test_grad_matches_fd(self, leaf):
        Q = _mk(seed=3)
        rng = np.random.default_rng(99)
        w = rng.standard_normal(Q.N)  # random linear functional of x*

        def loss_from(arr):
            if leaf == "V":  # symmetrize so FD perturbations stay in-domain
                A2 = (arr.reshape(Q.N, Q.N) + arr.reshape(Q.N, Q.N).T) / 2
                Qi = dataclasses.replace(Q, V=A2)
            else:
                Qi = dataclasses.replace(Q, **{leaf: arr})
            return w @ solve_qp_diff(Qi, SETTINGS).x

        base = np.asarray(getattr(Q, leaf), np.float64).ravel()
        g_ad = np.asarray(
            jax.grad(lambda a: loss_from(a))(jnp.asarray(base))
        ).ravel()
        g_fd = _fd(lambda a: float(loss_from(jnp.asarray(a))), base)
        np.testing.assert_allclose(g_ad, g_fd, rtol=2e-4, atol=5e-6)

    def test_active_upper_bound_gradient(self):
        # coordinates pinned at u move one-for-one with u (plus the KKT
        # response of the free block); FD-check du on a tight box
        Q = _mk(seed=5, tight=True)
        # force pins: sum(x)=1 with u=1.6/N needs >=5 of 8 coords at UP
        Q = dataclasses.replace(Q, u=jnp.full(Q.N, 1.6 / Q.N, Q.u.dtype))
        r = solve_qp(Q)
        S = np.asarray(r.S[: Q.N])
        assert (S == 2).any(), "fixture must pin at least one coord at UP"

        def loss(u):
            return float(
                jnp.sum(solve_qp_diff(dataclasses.replace(Q, u=u), SETTINGS).x ** 2)
            )

        base = np.asarray(Q.u, np.float64)
        g_ad = np.asarray(
            jax.grad(lambda u: jnp.sum(
                solve_qp_diff(dataclasses.replace(Q, u=u), SETTINGS).x ** 2
            ))(jnp.asarray(base))
        )
        g_fd = _fd(loss, base)
        np.testing.assert_allclose(g_ad, g_fd, rtol=2e-4, atol=5e-6)


class TestLayerSemantics:
    def test_matches_solver_x_and_duals(self):
        Q = _mk(seed=7)
        r0 = solve_qp(Q)
        r1 = solve_qp_diff(Q, SETTINGS)
        assert int(r1.status) == int(r0.status) > 0
        np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r0.x), atol=1e-8)
        # solver-independent oracle at the layer's point (NOT the identity
        # gamma := Vx + q + AG'lam, which is true by construction)
        from ssqp_tpu.utils.problems import kkt_residual

        rep = kkt_residual(*(np.asarray(getattr(Q, f)) for f in
                             ("V", "q", "A", "b", "G", "g", "d", "u")),
                           np.asarray(r1.x))
        assert max(rep.values()) < 1e-7, rep
        # the layer's own lam must satisfy stationarity on FREE coords with
        # gamma ~ 0 there (gamma on free coords is the stationarity residual)
        free = np.asarray(r1.S[: Q.N]) == 0
        np.testing.assert_allclose(np.asarray(r1.gamma)[free], 0.0, atol=1e-8)
        # and active-inequality multipliers must be >= 0 (valid certificate)
        act_ineq = np.asarray(r1.S[Q.N:]) == 4
        lam_ineq = np.asarray(r1.lam[Q.M:])
        assert (lam_ineq[act_ineq] >= -1e-9).all()

    def test_vmap_jacobian_frontier(self):
        # batched jacfwd through a frontier slice: dx*/dlam for several lam
        Q = _mk(seed=11, J=0)
        mu = -np.asarray(Q.q)

        def alloc(lam):
            Qi = dataclasses.replace(Q, q=jnp.asarray(-lam * mu))
            return solve_qp_diff(Qi, SETTINGS).x

        lams = jnp.asarray([0.3, 0.7, 1.2])
        Jx = jax.vmap(jax.jacfwd(alloc))(lams)
        assert Jx.shape == (3, Q.N)
        # FD cross-check on the middle point
        h = 1e-6
        fd = (np.asarray(alloc(0.7 + h)) - np.asarray(alloc(0.7 - h))) / (2 * h)
        np.testing.assert_allclose(np.asarray(Jx[1]), fd, rtol=2e-4, atol=5e-6)

    def test_jacfwd_jacrev_agree(self):
        # forward- and reverse-mode jacobians of the solution map must match
        # (exercises the transpose rules of the fixed-active-set re-solve)
        Q = _mk(seed=17, J=2)

        def xstar(q):
            return solve_qp_diff(dataclasses.replace(Q, q=q), SETTINGS).x

        Jf = jax.jacfwd(xstar)(Q.q)
        Jr = jax.jacrev(xstar)(Q.q)
        np.testing.assert_allclose(np.asarray(Jf), np.asarray(Jr), atol=1e-10)
        # dx*/dq is symmetric negative-semidefinite on the free block
        # (sensitivity of a strictly convex QP's minimizer w.r.t. its linear
        # term) — a structural property, not an implementation detail
        M = np.asarray(Jf)
        np.testing.assert_allclose(M, M.T, atol=1e-10)
        w = np.linalg.eigvalsh((M + M.T) / 2)
        assert w.max() <= 1e-10, w

    def test_jit_composes(self):
        Q = _mk(seed=13)
        f = jax.jit(lambda q: solve_qp_diff(
            dataclasses.replace(Q, q=q), SETTINGS).x.sum())
        g = jax.jit(jax.grad(lambda q: solve_qp_diff(
            dataclasses.replace(Q, q=q), SETTINGS).x.sum()))
        assert np.isfinite(float(f(Q.q)))
        assert np.all(np.isfinite(np.asarray(g(Q.q))))
