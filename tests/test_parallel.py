"""Batched (vmap) and sharded (shard_map over a virtual 8-device CPU mesh)
instance solving — the new-capability layer the reference has no analogue for
(SURVEY.md §4: multi-chip behavior tested on forced-host-device fakes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssqp_tpu.parallel.batch import (
    frontier_batch,
    solve_lp_batch,
    solve_qp_batch,
    solve_qp_batch_warm,
    stack_qps,
)
from ssqp_tpu.parallel.sharded import make_mesh, shard_batch, solve_qp_sharded
from ssqp_tpu.types import IN, DN, Settings, make_lp, make_qp
from ssqp_tpu.utils.problems import generate_qp_known_opt, kkt_residual


SETTINGS = Settings()


def _rand_portfolio(seed, N=8):
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((N, N))
    V = H @ H.T / N + 0.5 * np.eye(N)
    q = rng.standard_normal(N) * 0.1
    return make_qp(V, q, u=np.full(N, 0.6))


class TestBatch:
    def test_stacked_batch_matches_single(self):
        qps = [_rand_portfolio(s) for s in range(6)]
        Qb = stack_qps(qps)
        res = solve_qp_batch(Qb, SETTINGS)
        assert res.x.shape == (6, 8)
        from ssqp_tpu.solvers.ssqp import solve_qp

        for i, Q in enumerate(qps):
            ri = solve_qp(Q, settings=SETTINGS)
            assert int(res.status[i]) > 0
            np.testing.assert_allclose(res.x[i], ri.x, atol=1e-8)

    def test_known_optimum_batch(self):
        gens = [generate_qp_known_opt(seed=s, N=10, M=2, J=3) for s in range(4)]
        Qb = stack_qps([
            make_qp(g.V, g.q, g.A, g.b, G=g.G, g=g.g, d=g.d, u=g.u)
            for g in gens
        ])
        res = solve_qp_batch(Qb, SETTINGS)
        for i, g in enumerate(gens):
            assert int(res.status[i]) > 0
            np.testing.assert_allclose(res.x[i], g.x_opt, atol=1e-6)

    def test_frontier_shared_V(self):
        N = 8
        rng = np.random.default_rng(0)
        H = rng.standard_normal((N, N))
        V = H @ H.T / N + 0.5 * np.eye(N)
        mu = rng.uniform(0.0, 0.2, N)
        Q = make_qp(V, mu)  # q field holds expected returns for the frontier
        lams = jnp.linspace(0.0, 2.0, 16)
        Qb, shared = frontier_batch(Q, lams)
        res = solve_qp_batch(Qb, SETTINGS, shared=shared)
        assert res.x.shape == (16, N)
        assert np.all(np.asarray(res.status) > 0)
        # budget constraint holds for every frontier point
        np.testing.assert_allclose(np.asarray(res.x).sum(axis=1), 1.0, atol=1e-8)
        # risk is monotonically non-decreasing in L along the frontier
        risks = np.einsum("bi,ij,bj->b", np.asarray(res.x), V, np.asarray(res.x))
        assert np.all(np.diff(risks) > -1e-9)

    def test_warm_start_batch(self):
        N = 8
        gens = [generate_qp_known_opt(seed=s, N=N, M=1, J=2) for s in range(3)]
        Qb = stack_qps([
            make_qp(g.V, g.q, g.A, g.b, G=g.G, g=g.g, d=g.d, u=g.u)
            for g in gens
        ])
        # warm start from the known optimum statuses: should converge in ~1 iter
        Sx0 = jnp.stack([jnp.asarray(g.Sx_opt) for g in gens])
        Se0 = jnp.stack([jnp.asarray(g.Se_opt) for g in gens])
        x0 = jnp.stack([jnp.asarray(g.x_opt) for g in gens])
        res = solve_qp_batch_warm(Qb, Sx0, Se0, x0, SETTINGS)
        for i, g in enumerate(gens):
            assert 0 < int(res.status[i]) <= 3
            np.testing.assert_allclose(res.x[i], g.x_opt, atol=1e-7)

    def test_waves_matches_plain_batch(self):
        # wave-parallel warm protocol (strided sub-batches warm-started from
        # grid neighbors) must agree with the plain vmapped solve on a sorted
        # frontier grid
        from ssqp_tpu.parallel.batch import solve_qp_batch_waves

        N = 8
        rng = np.random.default_rng(3)
        H = rng.standard_normal((N, N))
        V = H @ H.T / N + 0.5 * np.eye(N)
        mu = rng.uniform(0.0, 0.2, N)
        Q = make_qp(V, mu)
        lams = jnp.linspace(0.0, 2.0, 32)
        Qb, shared = frontier_batch(Q, lams)
        ref = solve_qp_batch(Qb, SETTINGS, shared=shared)
        res = solve_qp_batch_waves(Qb, SETTINGS, shared, waves=4)
        assert np.all(np.asarray(res.status) > 0)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                                   atol=1e-7)
        # dual certificates from the deferred one-shot attach must agree
        # with the per-instance attach of the plain vmapped path
        np.testing.assert_allclose(np.asarray(res.lam), np.asarray(ref.lam),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.gamma),
                                   np.asarray(ref.gamma), atol=1e-6)
        # coarse-to-fine variant: same contract, one warm pass from nearest
        # coarse anchor instead of sequential waves
        from ssqp_tpu.parallel.batch import solve_qp_batch_c2f

        r2 = solve_qp_batch_c2f(Qb, SETTINGS, shared, coarse=4)
        assert np.all(np.asarray(r2.status) > 0)
        np.testing.assert_allclose(np.asarray(r2.x), np.asarray(ref.x),
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(r2.lam), np.asarray(ref.lam),
                                   atol=1e-6)

    def test_lp_batch(self):
        # min -x1-2x2 s.t. x1+x2<=4, x1<=3, x2<=3 ; optimum (1,3) f=-7... check:
        # vertices: (3,1) f=-5; (1,3) f=-7; (3,3) infeasible (sum 6>4)
        c = np.array([-1.0, -2.0])
        G = np.array([[1.0, 1.0]])
        g = np.array([4.0])
        P1 = make_lp(c, G=G, g=g, u=[3.0, 3.0])
        P2 = make_lp(2 * c, G=G, g=g, u=[3.0, 3.0])
        from ssqp_tpu.parallel.batch import lp_axes
        import jax

        Pb = jax.tree.map(lambda a, b: jnp.stack([a, b]), P1, P2)
        res = solve_lp_batch(Pb, SETTINGS)
        assert np.all(np.asarray(res.status) >= 1)
        np.testing.assert_allclose(res.x[0], [1.0, 3.0], atol=1e-8)
        np.testing.assert_allclose(res.x[1], [1.0, 3.0], atol=1e-8)

    def test_lp_batch_cclp(self):
        """Batched criss-cross agrees with batched simplex, and an infeasible
        instance inside the batch exits 0 without affecting siblings."""
        from ssqp_tpu.parallel.batch import solve_lp_batch_cclp

        c = np.array([-1.0, -2.0])
        G = np.array([[1.0, 1.0]])
        P1 = make_lp(c, G=G, g=np.array([4.0]), u=[3.0, 3.0])
        P2 = make_lp(c, G=G, g=np.array([-1.0]),
                     u=[3.0, 3.0])  # x1+x2 <= -1 with x >= 0: infeasible
        P3 = make_lp(2 * c, G=G, g=np.array([4.0]), u=[3.0, 3.0])
        Pb = jax.tree.map(lambda *xs: jnp.stack(xs), P1, P2, P3)
        res = solve_lp_batch_cclp(Pb, SETTINGS)
        st = np.asarray(res.status)
        assert st[0] >= 1 and st[2] >= 1 and st[1] == 0, st
        np.testing.assert_allclose(res.x[0], [1.0, 3.0], atol=1e-8)
        np.testing.assert_allclose(res.x[2], [1.0, 3.0], atol=1e-8)

    def test_batch_refined_mixed_precision(self):
        """f32 search + f64 refinement per instance beats the raw f32 batch
        (the config-4 accuracy tier, batched)."""
        from ssqp_tpu.parallel.batch import solve_qp_batch_refined

        qps = [_rand_portfolio(s, N=24) for s in range(4)]
        Qb = stack_qps(qps)  # float64 data
        ref = solve_qp_batch(Qb, SETTINGS)  # trusted full-f64 solve
        res = solve_qp_batch_refined(Qb, search_dtype=jnp.float32)
        assert np.all(np.asarray(res.status) > 0)
        x64 = np.asarray(ref.x)
        xr = np.asarray(res.x)
        # raw f32 search for comparison
        Q32 = jax.tree.map(lambda a: a.astype(jnp.float32), Qb)
        r32 = solve_qp_batch(Q32, Settings.for_dtype(jnp.float32))
        err_raw = np.abs(np.asarray(r32.x, np.float64) - x64).max()
        err_ref = np.abs(xr - x64).max()
        assert err_ref < 1e-9, err_ref
        assert err_ref < err_raw


def _frontier32(N=32, B=16, seed=5):
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((N, N))
    V = (H @ H.T / N + 0.5 * np.eye(N)).astype(np.float32)
    mu = rng.uniform(0, 0.2, N).astype(np.float32)
    Q = make_qp(V, mu, u=np.full(N, 4.0 / N, np.float32), dtype=np.float32)
    return frontier_batch(Q, jnp.linspace(0.0, 2.0, B).astype(jnp.float32))


class TestAutoDispatch:
    """Pins solve_qp_batch_auto's protocol choices to the measured TPU
    (N, B) grid (verdict r5 item 1; scratch/ab_scale.py rounds 3-5): the
    winner is decided by wave width alone — waves=8 iff the batch is a
    q-only grid with width B/8 >= 1024."""

    def test_measured_grid(self):
        from ssqp_tpu.parallel.batch import auto_protocol

        for N in (128, 256, 512, 1024):
            for B in (1024, 2048):
                assert auto_protocol(N, B, q_only=True) == 0, (N, B)
            assert auto_protocol(N, 8192, q_only=True) == 8, N
            # warm-start validity requires the q-only structure
            assert auto_protocol(N, 8192, q_only=False) == 0, N

    def test_tail_engages_at_scale_only(self):
        """The residual tail policy is an N>=512 f32+x64 affair."""
        import dataclasses
        from unittest import mock
        from ssqp_tpu.parallel.batch import solve_qp_batch_auto

        Qb, shared = _frontier32(B=8)
        called = {}

        def spy(Q, settings, shared=(), **kw):
            called.update(kw)
            return "dispatched"  # dispatch is all this test observes

        with mock.patch("ssqp_tpu.parallel.batch.solve_qp_batch_tail_refined",
                        side_effect=spy) as m:
            solve_qp_batch_auto(Qb, Settings.for_dtype(jnp.float32), shared)
            assert not m.called  # N=32: no tail
            Q512 = dataclasses.replace(Qb, N=512)  # dispatch looks at N only
            solve_qp_batch_auto(Q512, Settings.for_dtype(jnp.float32), shared)
            assert m.called and called["tail"] == 4 and called["iters"] == 1


class TestTailPolicy:
    """Residual-threshold tail refinement (verdict r5 item 2): the fixed
    top-K depth became a policy — refine in static-width passes while any
    instance's f64 KKT residual exceeds a calibrated bound."""

    S32 = Settings.for_dtype(jnp.float32)

    def test_bound_inf_is_base_passthrough(self):
        """Nothing above the bound -> zero refinement passes -> the base
        protocol's x comes through bit-exact."""
        from ssqp_tpu.parallel.batch import solve_qp_batch_tail_refined

        Qb, shared = _frontier32()
        r0 = solve_qp_batch(Qb, self.S32, shared=shared)
        r1 = solve_qp_batch_tail_refined(Qb, self.S32, shared, tail=4,
                                         resid_bound=1e30)
        assert bool(jnp.all(r0.status == r1.status))
        np.testing.assert_array_equal(np.asarray(r0.x), np.asarray(r1.x))

    def test_bound_zero_single_pass_is_topk(self):
        """resid_bound=0 + max_passes=1 reproduces the round-4 contract:
        exactly the top B//tail residual instances refined once."""
        from ssqp_tpu.parallel.batch import (
            batch_kkt_resid, solve_qp_batch_tail_refined,
        )
        from ssqp_tpu.solvers.refine import refine_result_cg
        from ssqp_tpu.types import Result

        Qb, shared = _frontier32()
        r0 = solve_qp_batch(Qb, self.S32, shared=shared)
        r1 = solve_qp_batch_tail_refined(Qb, self.S32, shared, tail=4,
                                         resid_bound=0.0, max_passes=1)
        resid = np.asarray(batch_kkt_resid(Qb, r0, shared=shared))
        K = 16 // 4
        idx = np.argsort(-resid)[:K]
        from ssqp_tpu.parallel.batch import qp_axes
        import dataclasses

        Qk = dataclasses.replace(Qb, q=Qb.q[idx])
        rr = jax.vmap(
            lambda p, r: refine_result_cg(p, r, self.S32, 2,
                                          with_duals=False,
                                          exact_sweeps=True),
            in_axes=(qp_axes(Qk, shared), Result(0, 0, 0)),
        )(Qk, Result(r0.x[idx], r0.S[idx], r0.status[idx]))
        expect = np.asarray(r0.x).copy()
        expect[idx] = np.asarray(rr.x, np.float32)
        np.testing.assert_array_equal(np.asarray(r1.x), expect)
        assert bool(jnp.all(r0.status == r1.status))

    def test_multi_pass_covers_whole_batch(self):
        """A tiny bound with enough passes refines every instance exactly
        once (pass coverage: ceil(B/K) static-width passes, refined
        residuals retired to -inf)."""
        from ssqp_tpu.parallel.batch import solve_qp_batch_tail_refined

        Qb, shared = _frontier32(B=16)
        # same static width (K=4): stop-by-retired-residuals (bound tiny,
        # generous pass cap) must equal stop-by-pass-cap exactly
        r_cap = solve_qp_batch_tail_refined(Qb, self.S32, shared, tail=4,
                                            resid_bound=0.0, max_passes=4)
        r_pass = solve_qp_batch_tail_refined(Qb, self.S32, shared, tail=4,
                                             resid_bound=1e-30, max_passes=8)
        np.testing.assert_array_equal(np.asarray(r_cap.x),
                                      np.asarray(r_pass.x))
        # and the schedule covers the whole batch: matches refining every
        # instance in one full-width pass (different gather width -> XLA may
        # tile reductions differently, so compare at f32-roundoff tolerance)
        r_all = solve_qp_batch_tail_refined(Qb, self.S32, shared, tail=1,
                                            resid_bound=0.0, max_passes=1)
        np.testing.assert_allclose(np.asarray(r_all.x),
                                   np.asarray(r_pass.x), atol=1e-6)

    def test_x64_off_warns_at_scale(self):
        """N>=512 f32 search without x64: the tail fix is unavailable and
        solve_qp_batch_auto must say so loudly (verdict r4 weak #2)."""
        from ssqp_tpu.parallel.batch import solve_qp_batch_auto

        with jax.enable_x64(False):
            N, B = 512, 2
            rng = np.random.default_rng(0)
            H = rng.standard_normal((N, N)).astype(np.float32)
            V = H @ H.T / N + 0.5 * np.eye(N, dtype=np.float32)
            mu = rng.uniform(0, 0.2, N).astype(np.float32)
            Q = make_qp(V, mu, u=np.full(N, 4.0 / N, np.float32),
                        dtype=np.float32)
            Qb, shared = frontier_batch(
                Q, jnp.linspace(0.5, 1.0, B).astype(jnp.float32))
            with pytest.warns(UserWarning, match="x64"):
                res = solve_qp_batch_auto(
                    Qb, Settings.for_dtype(jnp.float32), shared)
        assert np.all(np.asarray(res.status) > 0)


class TestSharded:
    def test_mesh_solve_matches_vmap(self):
        assert jax.device_count() >= 8, "conftest must force 8 host devices"
        mesh = make_mesh(8)
        qps = [_rand_portfolio(s) for s in range(16)]
        Qb = stack_qps(qps)
        ref = solve_qp_batch(Qb, SETTINGS)
        Qs = shard_batch(Qb, mesh)
        res, stats = solve_qp_sharded(Qs, SETTINGS, mesh)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x), atol=1e-10)
        assert int(stats["solved"]) == 16
        assert int(stats["infeasible"]) == 0

    def test_shared_leaves_replicated(self):
        mesh = make_mesh(8)
        N = 8
        rng = np.random.default_rng(1)
        H = rng.standard_normal((N, N))
        V = H @ H.T / N + 0.5 * np.eye(N)
        mu = rng.uniform(0.0, 0.2, N)
        Q = make_qp(V, mu)
        Qb, shared = frontier_batch(Q, jnp.linspace(0.0, 2.0, 32))
        Qs = shard_batch(Qb, mesh, shared=shared)
        res, stats = solve_qp_sharded(Qs, SETTINGS, mesh, shared=shared)
        assert int(stats["solved"]) == 32
        np.testing.assert_allclose(np.asarray(res.x).sum(axis=1), 1.0, atol=1e-8)

    def test_sharded_waves_matches_plain(self):
        # wave-parallel warm protocol inside each shard (local grid stays
        # sorted under contiguous batch sharding) must agree with the plain
        # sharded solve
        mesh = make_mesh(8)
        N = 8
        rng = np.random.default_rng(4)
        H = rng.standard_normal((N, N))
        V = H @ H.T / N + 0.5 * np.eye(N)
        mu = rng.uniform(0.0, 0.2, N)
        Q = make_qp(V, mu)
        Qb, shared = frontier_batch(Q, jnp.linspace(0.0, 2.0, 64))
        Qs = shard_batch(Qb, mesh, shared=shared)
        ref, _ = solve_qp_sharded(Qs, SETTINGS, mesh, shared=shared)
        res, stats = solve_qp_sharded(Qs, SETTINGS, mesh, shared=shared,
                                      waves=4)
        assert int(stats["solved"]) == 64
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                                   atol=1e-7)


class TestShardedLP:
    """LP batches over the device mesh (round 5): the LP twin of
    solve_qp_sharded, with both engines and the per-shard warm-wave
    protocol."""

    def _family(self, N=16, M=2, J=4, B=32, seed=9):
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
        C = jnp.asarray(c0[None, :] + ts[:, None] * dc[None, :])
        P = make_lp(c0, A, b, G=G, g=g, d=np.zeros(N), u=np.full(N, 2.0))
        return dataclasses.replace(P, c=C), ("A", "b", "G", "g", "d", "u")

    @pytest.mark.parametrize("engine,waves", [("simplex", 0),
                                              ("simplex", 4), ("cclp", 0),
                                              ("auto", None)])
    def test_sharded_matches_batch(self, engine, waves):
        from ssqp_tpu.parallel.batch import (
            solve_lp_batch, solve_lp_batch_cclp, solve_lp_batch_waves,
        )
        from ssqp_tpu.parallel.sharded import make_mesh, solve_lp_sharded

        Pb, shared = self._family()
        s = Settings()
        mesh = make_mesh(8)
        res, stats = solve_lp_sharded(Pb, s, mesh, shared=shared,
                                      engine=engine, waves=waves)
        if engine == "cclp":
            ref = solve_lp_batch_cclp(Pb, s, shared=shared)
        elif waves is not None and waves > 1:
            # per-shard waves (width 4 per device) vs the full-batch plain
            # solve: same objectives, verdicts
            ref = solve_lp_batch(Pb, s, shared=shared)
        else:
            ref = solve_lp_batch(Pb, s, shared=shared)
        st = np.asarray(res.status)
        str_ = np.asarray(ref.status)
        assert int(stats["solved"]) == int((st > 0).sum())
        assert (st >= 1).all() and (str_ >= 1).all()
        f0 = (np.asarray(Pb.c) * np.asarray(ref.x)).sum(1)
        f1 = (np.asarray(Pb.c) * np.asarray(res.x)).sum(1)
        np.testing.assert_allclose(f1, f0, atol=1e-7)

    def test_infeasible_shard_counted(self):
        import dataclasses
        from ssqp_tpu.parallel.sharded import make_mesh, solve_lp_sharded

        N, B = 6, 16
        rng = np.random.default_rng(3)
        A = np.ones((2, N))
        C = rng.standard_normal((B, N))
        bB = np.tile(np.array([1.0, 1.0]), (B, 1))
        bB[3] = [1.0, 5.0]  # contradictory rows -> infeasible instance
        P = make_lp(C[0], A, bB[0], d=np.zeros(N), u=np.ones(N))
        Pb = dataclasses.replace(P, c=jnp.asarray(C), b=jnp.asarray(bB))
        res, stats = solve_lp_sharded(Pb, Settings(), make_mesh(8),
                                      shared=("A", "G", "g", "d", "u"))
        st = np.asarray(res.status)
        assert st[3] == 0 and int(stats["infeasible"]) == 1
        ok = np.delete(np.arange(B), 3)
        assert (st[ok] >= 1).all()


class TestSharded2D:
    def test_2d_mesh_matches_1d(self):
        from ssqp_tpu.parallel.sharded import (
            make_mesh, make_mesh_2d, shard_batch, solve_qp_sharded,
            solve_qp_sharded_2d,
        )

        assert jax.device_count() >= 8
        qps = [_rand_portfolio(s) for s in range(16)]
        Qb = stack_qps(qps)
        mesh1 = make_mesh(8)
        Qs1 = shard_batch(Qb, mesh1)
        r1, st1 = solve_qp_sharded(Qs1, SETTINGS, mesh1)
        mesh2 = make_mesh_2d(2, 4)
        Qs2 = shard_batch(Qb, mesh2, axis=("host", "chip"))
        r2, st2 = solve_qp_sharded_2d(Qs2, SETTINGS, mesh2)
        assert int(st1["solved"]) == 16
        assert int(st2["solved"]) == 16
        np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                                   atol=1e-9)

    def test_2d_mesh_shapes(self):
        from ssqp_tpu.parallel.sharded import make_mesh_2d

        mesh = make_mesh_2d(4, 2)
        assert mesh.devices.shape == (4, 2)
        assert mesh.axis_names == ("host", "chip")
