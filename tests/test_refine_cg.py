"""Factorization-free refinement path (verdict r3 item 3).

The batched refined tier's LU path pays a per-instance (N+M+J)^2
factorization — the 600x cliff vs the f32 search at N=512. These tests pin
the CG twin: kkt_solve_rhs_cg solves the SAME fixed-active-set KKT system
refine.py assembles densely, and refine_result_cg reaches the same accuracy
as refine_result (reference accuracy bar: native solves at tol 2^-26,
/root/reference/src/types.jl:390-408).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssqp_tpu.types import QP, Result, Settings, make_qp
from ssqp_tpu.solvers.refine import _kkt_matrix, refine_result, refine_result_cg
from ssqp_tpu.ops.kkt import kkt_solve_rhs_cg

SETTINGS64 = Settings.for_dtype(jnp.float64)


def _rand_qp(seed, N=24, M=2, J=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((N, N))
    V = (H @ H.T / N + 0.5 * np.eye(N)).astype(dtype)
    q = (rng.standard_normal(N) * 0.1).astype(dtype)
    A = rng.standard_normal((M, N)).astype(dtype) if M else None
    b = rng.standard_normal(M).astype(dtype) if M else None
    G = rng.standard_normal((J, N)).astype(dtype) if J else None
    g = (rng.standard_normal(J) + 2.0).astype(dtype) if J else None
    return make_qp(V, q, A=A, b=b, G=G, g=g,
                   d=np.full(N, -1.0, dtype), u=np.full(N, 1.0, dtype),
                   dtype=dtype)


class TestKktSolveRhsCg:
    @pytest.mark.parametrize("seed,M,J", [(0, 2, 0), (1, 3, 4), (2, 0, 5)])
    def test_matches_dense_kkt(self, seed, M, J):
        """dx/dl from the padded CG equal the dense solve of the SAME system
        _kkt_matrix assembles, for an arbitrary explicit RHS."""
        N = 20
        rng = np.random.default_rng(seed)
        Q = _rand_qp(seed, N=N, M=M, J=J)
        M, J = Q.M, Q.J  # make_qp injects the default budget row at M=0
        free = jnp.asarray(rng.random(N) > 0.3)
        # never fully pinned
        free = free.at[0].set(True).at[1].set(True)
        keep = jnp.asarray(rng.random(M + J) > 0.2)
        r1 = jnp.asarray(rng.standard_normal(N))
        r2 = jnp.asarray(rng.standard_normal(M + J))

        # dense oracle: same block structure as the CG operator
        AG = jnp.concatenate([Q.A, Q.G], axis=0) if J > 0 else Q.A
        fm = free.astype(Q.V.dtype)
        km = keep.astype(Q.V.dtype)
        K11 = Q.V * fm[:, None] + jnp.diag(1.0 - fm)
        K12 = AG.T * (fm[:, None] * km[None, :])
        K21 = AG * km[:, None]
        K22 = jnp.diag(1.0 - km)
        K = jnp.block([[K11, K12], [K21, K22]])
        sol = jnp.linalg.solve(K, jnp.concatenate([r1, r2]))

        dx, dl, ok = kkt_solve_rhs_cg(Q.V, AG, free, keep, r1, r2,
                                      256, 1e-14)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(sol[:N]),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(dl), np.asarray(sol[N:]),
                                   rtol=1e-7, atol=1e-9)

    def test_no_rows(self):
        """M=J=0: pure bound-constrained system (Schur branch skipped)."""
        N = 16
        rng = np.random.default_rng(7)
        Q = _rand_qp(7, N=N, M=0, J=0)
        free = jnp.asarray(rng.random(N) > 0.4).at[0].set(True)
        r1 = jnp.asarray(rng.standard_normal(N))
        fm = free.astype(Q.V.dtype)
        K = Q.V * fm[:, None] + jnp.diag(1.0 - fm)
        sol = jnp.linalg.solve(K, r1)
        dx, dl, ok = kkt_solve_rhs_cg(Q.V, Q.A, free,
                                      jnp.zeros((0,), bool), r1,
                                      jnp.zeros((0,), Q.V.dtype), 256, 1e-14)
        assert bool(ok) and dl.shape == (0,)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(sol),
                                   rtol=1e-7, atol=1e-9)


class TestRefineResultCg:
    @pytest.mark.parametrize("seed,N,M,J", [
        (0, 24, 2, 0), (1, 32, 3, 5), (2, 48, 4, 0), (3, 40, 0, 6),
    ])
    def test_matches_lu_refinement(self, seed, N, M, J):
        """f32 search + CG refinement reaches the f64 solution like the LU
        path does (<=1e-9 objective gap; the config-4/8 accuracy bar)."""
        from ssqp_tpu.solvers.ssqp import solve_qp_auto

        Q64 = _rand_qp(seed, N=N, M=M, J=J)
        Q32 = jax.tree.map(lambda a: a.astype(jnp.float32), Q64)
        res32 = solve_qp_auto(Q32, Settings.for_dtype(jnp.float32))
        assert int(res32.status) > 0
        res_h = Result(res32.x.astype(jnp.float64), res32.S, res32.status)

        ref = solve_qp_auto(Q64, SETTINGS64)
        assert int(ref.status) > 0
        f = lambda x: float(0.5 * x @ (Q64.V @ x) + Q64.q @ x)
        fref = f(ref.x)

        r_cg = refine_result_cg(Q64, res_h, SETTINGS64, 6, with_duals=False)
        r_lu = refine_result(Q64, res_h, SETTINGS64, 2, with_duals=False)
        gap_cg = abs(f(r_cg.x) - fref) / (1 + abs(fref))
        gap_lu = abs(f(r_lu.x) - fref) / (1 + abs(fref))
        assert gap_cg < 1e-9, (gap_cg, gap_lu)

    def test_failed_solve_untouched(self):
        """status<=0 results pass through unchanged (acceptance guard)."""
        Q = _rand_qp(5, N=12, M=1)
        x = jnp.zeros(12, jnp.float64)
        S = jnp.zeros(13, jnp.int8)
        res = Result(x, S, jnp.asarray(0, jnp.int32))
        out = refine_result_cg(Q, res, SETTINGS64, 4, with_duals=False)
        assert int(out.status) == 0
        np.testing.assert_array_equal(np.asarray(out.x), np.asarray(x))

    def test_duals_attached(self):
        """with_duals=True re-derives lam/gamma at the refined point (the
        every-QP-solve dual-certificate invariant)."""
        from ssqp_tpu.solvers.ssqp import solve_qp_auto

        Q = _rand_qp(11, N=24, M=2, J=3)
        res = solve_qp_auto(Q, SETTINGS64)
        out = refine_result_cg(Q, res, SETTINGS64, 4, with_duals=True)
        assert out.lam is not None and out.gamma is not None
        # stationarity at the refined point: V x + q + AG' lam - gamma = 0
        AG = jnp.concatenate([Q.A, Q.G], axis=0)
        stat = Q.V @ out.x + Q.q + AG.T @ out.lam - out.gamma
        assert float(jnp.max(jnp.abs(stat))) < 1e-7


class TestBatchRefinedCg:
    def test_cg_matches_lu_batch(self):
        """solve_qp_batch_refined method='cg' (the default) agrees with
        method='lu' to the refined-tier accuracy on a stacked batch."""
        from ssqp_tpu.parallel.batch import solve_qp_batch_refined, stack_qps

        qps = [_rand_qp(s, N=24, M=2, J=0) for s in range(4)]
        Qb = stack_qps(qps)
        r_cg = solve_qp_batch_refined(Qb, search_dtype=jnp.float32)
        r_lu = solve_qp_batch_refined(Qb, search_dtype=jnp.float32,
                                      method="lu")
        assert np.all(np.asarray(r_cg.status) > 0)
        np.testing.assert_allclose(np.asarray(r_cg.x), np.asarray(r_lu.x),
                                   atol=5e-8)
