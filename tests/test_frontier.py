"""Efficient-frontier model family + frontier QP constructors + refinement."""

import numpy as np
import jax.numpy as jnp
import pytest

from ssqp_tpu.models.frontier import (
    frontier_batch_sweep,
    frontier_mu_sweep,
    frontier_warm_sweep,
)
from ssqp_tpu.solvers.refine import refine_result, solve_qp_refined
from ssqp_tpu.solvers.ssqp import solve_qp
from ssqp_tpu.types import (
    Settings,
    make_qp,
    qp_frontier_L,
    qp_frontier_mu,
)
from ssqp_tpu.utils.problems import generate_qp_known_opt, kkt_residual

SETTINGS = Settings()


def _market(N=10, seed=0):
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((N, N))
    V = H @ H.T / N + 0.5 * np.eye(N)
    rets = rng.uniform(0.0, 0.25, N)
    return V, rets


class TestFrontierConstructors:
    def test_L_param(self):
        V, rets = _market()
        Q = make_qp(V, rets)
        Q2 = qp_frontier_L(Q, 1.5)
        np.testing.assert_allclose(np.asarray(Q2.q), -1.5 * rets)
        r = solve_qp(Q2, settings=SETTINGS)
        assert int(r.status) > 0

    def test_mu_param(self):
        V, rets = _market()
        Q = make_qp(V, rets)
        mu = float(rets.mean())
        Q2 = qp_frontier_mu(Q, mu)
        assert Q2.M == Q.M + 1
        r = solve_qp(Q2, settings=SETTINGS)
        assert int(r.status) > 0
        x = np.asarray(r.x)
        assert abs(x @ rets - mu) < 1e-8  # return target met
        assert abs(x.sum() - 1.0) < 1e-8


class TestFrontierSweeps:
    def test_batch_vs_warm_agree(self):
        V, rets = _market(N=12, seed=3)
        Q = make_qp(V, np.zeros(12), u=np.full(12, 0.4))
        lams = jnp.linspace(0.0, 2.0, 16)
        fb = frontier_batch_sweep(Q, jnp.asarray(rets), lams, SETTINGS)
        fw = frontier_warm_sweep(Q, jnp.asarray(rets), lams, SETTINGS)
        assert np.all(np.asarray(fb.status) > 0)
        assert np.all(np.asarray(fw.status) > 0)
        np.testing.assert_allclose(
            np.asarray(fb.x), np.asarray(fw.x), atol=1e-7
        )
        # both paths converge in very few iterations per point: the warm
        # sweep by carrying the neighbor's active set, the cold batch by the
        # clipped-equality-solution guess start (which can even beat warm
        # starts — asserting warm < cold would pin an implementation detail)
        it_b = np.abs(np.asarray(fb.status)).mean()
        it_w = np.abs(np.asarray(fw.status)).mean()
        assert it_w <= 20 and it_b <= 20, (it_w, it_b)
        # the wave-parallel middle ground agrees too (headline protocol)
        from ssqp_tpu.models.frontier import frontier_waves_sweep

        fv = frontier_waves_sweep(Q, jnp.asarray(rets), lams, SETTINGS,
                                  waves=4)
        assert np.all(np.asarray(fv.status) > 0)
        np.testing.assert_allclose(
            np.asarray(fv.x), np.asarray(fb.x), atol=1e-7
        )

    def test_frontier_monotone(self):
        V, rets = _market(N=10, seed=4)
        Q = make_qp(V, np.zeros(10))
        lams = jnp.linspace(0.0, 3.0, 24)
        f = frontier_warm_sweep(Q, jnp.asarray(rets), lams, SETTINGS)
        risk = np.asarray(f.risk)
        ret = np.asarray(f.ret)
        assert np.all(np.diff(risk) > -1e-8)
        assert np.all(np.diff(ret) > -1e-8)

    def test_mu_sweep(self):
        V, rets = _market(N=10, seed=5)
        Q = make_qp(V, np.zeros(10))
        # attainable return range for 1'x=1, x>=0 is [min r, max r]
        mus = jnp.linspace(float(rets.min()) + 0.01, float(rets.max()) - 0.01, 8)
        f = frontier_mu_sweep(Q, jnp.asarray(rets), mus, SETTINGS)
        assert np.all(np.asarray(f.status) > 0)
        np.testing.assert_allclose(np.asarray(f.ret), np.asarray(mus), atol=1e-7)

    def test_mu_warm_sweep_agrees_with_cold(self):
        from ssqp_tpu.models.frontier import frontier_mu_warm_sweep

        V, rets = _market(N=12, seed=6)
        Q = make_qp(V, np.zeros(12), u=np.full(12, 0.4))
        mus = jnp.linspace(float(rets.min()) + 0.02,
                           float(rets.max()) - 0.02, 12)
        fc = frontier_mu_sweep(Q, jnp.asarray(rets), mus, SETTINGS)
        fw = frontier_mu_warm_sweep(Q, jnp.asarray(rets), mus, SETTINGS)
        assert np.all(np.asarray(fc.status) > 0)
        assert np.all(np.asarray(fw.status) > 0)
        np.testing.assert_allclose(np.asarray(fw.ret), np.asarray(mus),
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(fw.x), np.asarray(fc.x),
                                   atol=1e-6)

    def test_mu_warm_sweep_unachievable_point(self):
        from ssqp_tpu.models.frontier import frontier_mu_warm_sweep

        V, rets = _market(N=8, seed=7)
        Q = make_qp(V, np.zeros(8))
        # middle of the grid asks for a return above max(r): infeasible for
        # 1'x=1, x>=0 — that point must report 0 and NOT poison the rest
        good = float(rets.mean())
        bad = float(rets.max()) + 0.5
        mus = jnp.asarray([good, bad, good * 1.01])
        f = frontier_mu_warm_sweep(Q, jnp.asarray(rets), mus, SETTINGS)
        sts = np.asarray(f.status)
        assert sts[0] > 0
        assert sts[1] == 0, sts
        assert sts[2] > 0, sts
        np.testing.assert_allclose(float(f.ret[2]), good * 1.01, atol=1e-7)


class TestRefinement:
    def test_refine_improves_f32(self):
        g = generate_qp_known_opt(seed=11, N=16, M=2, J=3)
        Q32 = make_qp(g.V, g.q, g.A, g.b, G=g.G, g=g.g, d=g.d, u=g.u,
                      dtype=np.float32)
        s32 = Settings.for_dtype(jnp.float32)
        r = solve_qp(Q32, settings=s32)
        assert int(r.status) > 0
        err0 = np.abs(np.asarray(r.x, np.float64) - g.x_opt).max()
        rr = refine_result(Q32, r, s32, iters=2)
        err1 = np.abs(np.asarray(rr.x, np.float64) - g.x_opt).max()
        assert err1 <= err0 * 1.5  # never much worse...
        assert err1 < 5e-6  # ...and accurate in absolute terms

    def test_refined_solve_f64(self):
        g = generate_qp_known_opt(seed=12, N=16, M=2, J=4)
        Q = make_qp(g.V, g.q, g.A, g.b, G=g.G, g=g.g, d=g.d, u=g.u)
        r = solve_qp_refined(Q, settings=SETTINGS)
        assert int(r.status) > 0
        err = np.abs(np.asarray(r.x) - g.x_opt).max()
        assert err < 1e-10
        chk = kkt_residual(g.V, g.q, g.A, g.b, g.G, g.g, g.d, g.u,
                           np.asarray(r.x))
        assert chk["max"] < 1e-9

    def test_refine_noop_on_failure(self):
        # infeasible problem: refinement must hand back the original result
        Q = make_qp(np.eye(3), np.zeros(3), A=np.ones((1, 3)), b=[5.0],
                    u=np.ones(3))
        r = solve_qp(Q, settings=SETTINGS)
        assert int(r.status) == 0
        rr = refine_result(Q, r, SETTINGS)
        np.testing.assert_array_equal(np.asarray(rr.x), np.asarray(r.x))
