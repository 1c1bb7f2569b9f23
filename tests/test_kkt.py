"""Padded KKT solve vs a dense numpy reduced-system oracle.

Oracle mirrors the reference's gathered formulation (SSQP.jl:322-332): solve
    [ V_FF   AE_F' ] [ x_F ]   [ -(V_FB z_B + q_F) ]
    [ AE_F   0     ] [ lam ] = [ bE - AE_B z_B      ]
and compare against the mask-padded block elimination.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ssqp_tpu.ops.kkt import kkt_solve, recover_dropped_multipliers


def dense_oracle(V, q, AG, bg, z, free, keep):
    F = np.where(free)[0]
    Kp = np.where(keep)[0]
    Bc = np.where(~free)[0]
    K, W = len(F), len(Kp)
    VFF = V[np.ix_(F, F)]
    AE = AG[np.ix_(Kp, F)]
    rhs_top = -(V[np.ix_(F, Bc)] @ z[Bc] + q[F])
    rhs_bot = bg[Kp] - AG[np.ix_(Kp, Bc)] @ z[Bc]
    KKT = np.block([[VFF, AE.T], [AE, np.zeros((W, W))]])
    sol = np.linalg.solve(KKT, np.concatenate([rhs_top, rhs_bot]))
    xF, lam = sol[:K], sol[K:]
    alpha = z.copy()
    alpha[F] = xF
    alphaL = np.zeros(AG.shape[0])
    alphaL[Kp] = lam
    gamma = V @ alpha + q + AG.T @ alphaL
    return alpha, alphaL, gamma


def rand_problem(seed, N=9, M=2, J=3, nfree=5):
    rng = np.random.default_rng(seed)
    Vh = rng.standard_normal((N, N))
    V = Vh @ Vh.T + 0.5 * np.eye(N)
    q = rng.standard_normal(N)
    AG = rng.standard_normal((M + J, N))
    z = rng.standard_normal(N)
    free = np.zeros(N, bool)
    free[rng.permutation(N)[:nfree]] = True
    keep = np.ones(M + J, bool)
    # the S-loop always builds bg from a point satisfying the kept rows
    bg = AG @ z
    return V, q, AG, bg, z, free, keep


@pytest.mark.parametrize("seed", range(5))
def test_matches_dense_oracle(seed):
    V, q, AG, bg, z, free, keep = rand_problem(seed)
    res = kkt_solve(*(jnp.asarray(a) for a in (V, q, AG, bg, z)), jnp.asarray(free), jnp.asarray(keep))
    a0, l0, g0 = dense_oracle(V, q, AG, bg, z, free, keep)
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.alpha), a0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.alphaL), l0, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(res.gamma)[~free], g0[~free], atol=1e-9
    )
    # p zero on bound coordinates
    assert np.abs(np.asarray(res.p)[~free]).max() == 0.0


@pytest.mark.parametrize("seed", range(3))
def test_partial_keep_rows(seed):
    V, q, AG, bg, z, free, keep = rand_problem(100 + seed, N=10, M=2, J=4, nfree=6)
    keep[3] = False  # drop one inequality row from the working set
    res = kkt_solve(*(jnp.asarray(a) for a in (V, q, AG, bg, z)), jnp.asarray(free), jnp.asarray(keep))
    a0, l0, g0 = dense_oracle(V, q, AG, bg, z, free, keep)
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.alpha), a0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.alphaL), l0, atol=1e-9)
    assert float(res.alphaL[3]) == 0.0


def test_dropped_multiplier_recovery():
    # Duplicate an active row: purged copy must recover the same multiplier
    # mass split consistently (least-squares recovery, SSQP.jl:149-172).
    rng = np.random.default_rng(42)
    N, M, J = 8, 1, 3
    Vh = rng.standard_normal((N, N))
    V = Vh @ Vh.T + np.eye(N)
    q = rng.standard_normal(N)
    AG = rng.standard_normal((M + J, N))
    AG[M + 2] = AG[M + 0]  # inequality row 2 duplicates row 0
    z = rng.standard_normal(N)
    bg = AG @ z
    free = np.ones(N, bool)
    act = np.ones(M + J, bool)
    keep = np.array([True, True, True, False])  # duplicate purged
    res = kkt_solve(*(jnp.asarray(a) for a in (V, q, AG, bg, z)), jnp.asarray(free), jnp.asarray(keep))
    Lda = recover_dropped_multipliers(
        jnp.asarray(AG), jnp.asarray(free), jnp.asarray(keep),
        jnp.asarray(act), res.alphaL, M
    )
    # kept rows keep their own multipliers
    np.testing.assert_allclose(np.asarray(Lda)[:2], np.asarray(res.alphaL)[M:M + 2])
    # least-squares recovery of the duplicate: AE' x = G_j with G_j == row0
    # has exact solution e_{row0}; recovered multiplier = alphaL[row0 position]
    np.testing.assert_allclose(
        float(Lda[2]), float(res.alphaL[M + 0]), atol=1e-9
    )


class TestChebyshevSolve:
    """The reduction-free Chebyshev semi-iteration (ops/kkt.py::_vp_cheb_xla)
    must match CG on the masked padded operator, with shared-V spectral
    bounds that are safe (enclose the true Jacobi-scaled spectrum) so Cauchy
    interlacing covers every pin mask."""

    def _problem(self, seed=0, N=48, K=4):
        rng = np.random.default_rng(seed)
        H = rng.standard_normal((N, N))
        V = H @ H.T / N + 0.5 * np.eye(N)
        fm = (rng.random(N) > 0.4).astype(np.float64)
        B = rng.standard_normal((N, K))
        return V, fm, B

    def test_bounds_safe(self):
        from ssqp_tpu.ops.kkt import shared_jacobi_bounds

        for seed in range(5):
            V, _, _ = self._problem(seed)
            lo, hi = shared_jacobi_bounds(jnp.asarray(V))
            s = 1.0 / np.sqrt(np.diag(V))
            ev = np.linalg.eigvalsh(s[:, None] * V * s[None, :])
            assert float(lo) <= ev.min() + 1e-12, (seed, float(lo), ev.min())
            assert float(hi) >= ev.max() - 1e-12, (seed, float(hi), ev.max())
            # the padded identity block contributes eigenvalue exactly 1
            assert float(lo) <= 1.0 <= float(hi)

    def test_bounds_with_inverse(self):
        from ssqp_tpu.ops.kkt import shared_jacobi_bounds

        V, _, _ = self._problem(2)
        W = np.linalg.inv(V)
        lo, hi = shared_jacobi_bounds(jnp.asarray(V), jnp.asarray(W))
        s = 1.0 / np.sqrt(np.diag(V))
        ev = np.linalg.eigvalsh(s[:, None] * V * s[None, :])
        assert float(lo) <= ev.min() + 1e-12
        assert float(hi) >= ev.max() - 1e-12

    def test_matches_cg_on_masked_operator(self):
        from ssqp_tpu.ops.kkt import (
            _vp_cg_xla, _vp_cheb_xla, shared_jacobi_bounds,
        )

        V, fm, B = self._problem(1)
        Vj, fmj, Bj = jnp.asarray(V), jnp.asarray(fm), jnp.asarray(B)
        lo, hi = shared_jacobi_bounds(Vj)
        dinv = 1.0 / (fmj * jnp.diag(Vj) + (1.0 - fmj))
        X0 = jnp.zeros_like(Bj)
        tol2 = 1e-20 * jnp.sum(Bj * Bj, axis=0)
        Xc, _ = _vp_cg_xla(Vj, fmj, Bj, dinv, tol2,
                           jnp.asarray(300, jnp.int32), X0)
        Xh, rr = _vp_cheb_xla(Vj, fmj, Bj, dinv, lo, hi, tol2,
                              jnp.asarray(600, jnp.int32), X0)
        np.testing.assert_allclose(np.asarray(Xh), np.asarray(Xc),
                                   atol=1e-8, rtol=1e-8)
        # returned residual corresponds to the returned iterate
        R = Bj - (fmj[:, None] * (Vj @ (Xh * fmj[:, None]))
                  + (1.0 - fmj)[:, None] * Xh)
        np.testing.assert_allclose(np.asarray(jnp.sum(R * R, axis=0)),
                                   np.asarray(rr), rtol=1e-6, atol=1e-18)

    def test_pdas_cheb_end_to_end_parity(self):
        """Full batched solve with pdas_cheb on/off: same statuses and
        solutions (the PDAS guess identifies the same active set; the exact
        S-loop then produces identical iterates)."""
        import dataclasses

        from ssqp_tpu.parallel.batch import frontier_batch, solve_qp_batch
        from ssqp_tpu.types import Settings, make_qp

        rng = np.random.default_rng(3)
        N, Bn = 32, 48
        H = rng.standard_normal((N, N))
        V = H @ H.T / N + 0.5 * np.eye(N)
        mu = rng.uniform(0, 0.2, N)
        Q = make_qp(V.astype(np.float32), mu.astype(np.float32),
                    u=np.full(N, 4.0 / N, np.float32), dtype=np.float32)
        Qb, shared = frontier_batch(
            Q, jnp.linspace(0.0, 2.0, Bn).astype(jnp.float32))
        s0 = Settings.for_dtype(jnp.float32)
        s1 = dataclasses.replace(s0, pdas_cheb=True)
        r0 = solve_qp_batch(Qb, s0, shared=shared)
        r1 = solve_qp_batch(Qb, s1, shared=shared)
        assert int(jnp.sum(r1.status > 0)) == Bn
        assert bool(jnp.all(r0.S == r1.S))
        np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r0.x),
                                   atol=5e-6)
