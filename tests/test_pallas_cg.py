"""Fused Pallas CG kernel (ops/pallas_cg.py) vs the XLA reference loop.

Runs the kernel in interpreter mode on CPU (the TPU dispatch path is gated
inside ops/kkt.py::_vp_cg_vmap and exercised by the benchmarks)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssqp_tpu.ops.kkt import _vp_cg_xla, cg_solve_padded
from ssqp_tpu.ops.pallas_cg import cg_padded_batch, cg_padded_rows


def _problem(rng, N, K, hard=False):
    H = rng.standard_normal((N, N))
    V = (H @ H.T / N + (0.05 if hard else 0.5) * np.eye(N)).astype(np.float32)
    fm = (rng.uniform(size=N) < 0.7).astype(np.float32)
    B = rng.standard_normal((N, K)).astype(np.float32)
    dinv = (1.0 / (fm * np.diag(V) + (1.0 - fm))).astype(np.float32)
    bnorm2 = np.maximum((B * B).sum(0), 1e-30)
    tol2 = (1e-10 * bnorm2).astype(np.float32)
    return V, fm, B, dinv, tol2


class TestFusedCG:
    @pytest.mark.parametrize("N,K", [(8, 1), (16, 3), (40, 2), (256, 2)])
    def test_matches_xla_cold(self, N, K):
        rng = np.random.default_rng(N + K)
        batch = 3
        V, _, _, _, _ = _problem(rng, N, K)
        FM, Bs, DINV, TOL2 = [], [], [], []
        for _ in range(batch):
            _, fm, B, dinv, tol2 = _problem(rng, N, K)
            FM.append(fm), Bs.append(B), DINV.append(dinv), TOL2.append(tol2)
        FM, Bs = jnp.asarray(np.stack(FM)), jnp.asarray(np.stack(Bs))
        DINV, TOL2 = jnp.asarray(np.stack(DINV)), jnp.asarray(np.stack(TOL2))
        X0 = jnp.zeros_like(Bs)
        it = jnp.asarray(200, jnp.int32)

        Xp, rrp = cg_padded_batch(jnp.asarray(V), FM, Bs, DINV, TOL2, it, X0,
                                  interpret=True)
        Xx, rrx = jax.vmap(_vp_cg_xla, in_axes=(None, 0, 0, 0, 0, None, 0))(
            jnp.asarray(V), FM, Bs, DINV, TOL2, it, X0)
        # both converge to the same solution of the same SPD system
        np.testing.assert_allclose(np.asarray(Xp), np.asarray(Xx),
                                   rtol=0, atol=5e-4)
        assert (np.asarray(rrp) <= np.asarray(TOL2) * 1.01 + 1e-12).all()
        assert (np.asarray(rrx) <= np.asarray(TOL2) * 1.01 + 1e-12).all()

    def test_solves_padded_system(self):
        """Solution satisfies vp(X) = B to the requested residual."""
        rng = np.random.default_rng(0)
        N, K = 24, 2
        V, fm, B, dinv, tol2 = _problem(rng, N, K)
        Xp, rr = cg_padded_rows(
            jnp.asarray(V), jnp.asarray(np.tile(fm[None, :], (K, 1))),
            jnp.asarray(np.tile(dinv[None, :], (K, 1))), jnp.asarray(B.T),
            jnp.asarray(tol2[:, None]), jnp.asarray(500, jnp.int32),
            jnp.zeros((K, N), jnp.float32), interpret=True)
        X = np.asarray(Xp).T
        Vp = np.outer(fm, fm) * V + np.diag(1.0 - fm)
        res = ((Vp @ X - B) ** 2).sum(0)
        assert (res <= tol2 * 1.05 + 1e-12).all(), res

    def test_warm_start_converged_columns_frozen(self):
        """A system whose warm start already solves it never moves."""
        rng = np.random.default_rng(3)
        N, K = 16, 2
        V, fm, B, dinv, tol2 = _problem(rng, N, K)
        Vp = np.outer(fm, fm) * V + np.diag(1.0 - fm)
        Xstar = np.linalg.solve(Vp.astype(np.float64), B.astype(np.float64))
        X0 = Xstar.astype(np.float32).T  # (K, N) rows
        Xp, rr = cg_padded_rows(
            jnp.asarray(V), jnp.asarray(np.tile(fm[None, :], (K, 1))),
            jnp.asarray(np.tile(dinv[None, :], (K, 1))), jnp.asarray(B.T),
            jnp.asarray((tol2 * 1e4)[:, None]), jnp.asarray(100, jnp.int32),
            jnp.asarray(X0), interpret=True)
        np.testing.assert_allclose(np.asarray(Xp), X0, rtol=0, atol=1e-6)

    def test_nonaligned_shapes_padded(self):
        """N not a multiple of 8 and C not a multiple of 128 both pad clean."""
        rng = np.random.default_rng(9)
        N, K, batch = 13, 3, 5  # C = 15 columns
        V, _, _, _, _ = _problem(rng, N, K)
        FM, Bs, DINV, TOL2 = [], [], [], []
        for _ in range(batch):
            _, fm, B, dinv, tol2 = _problem(rng, N, K)
            FM.append(fm), Bs.append(B), DINV.append(dinv), TOL2.append(tol2)
        FM, Bs = jnp.asarray(np.stack(FM)), jnp.asarray(np.stack(Bs))
        DINV, TOL2 = jnp.asarray(np.stack(DINV)), jnp.asarray(np.stack(TOL2))
        it = jnp.asarray(300, jnp.int32)
        Xp, rrp = cg_padded_batch(jnp.asarray(V), FM, Bs, DINV, TOL2, it,
                                  jnp.zeros_like(Bs), interpret=True)
        Xx, _ = jax.vmap(_vp_cg_xla, in_axes=(None, 0, 0, 0, 0, None, 0))(
            jnp.asarray(V), FM, Bs, DINV, TOL2, it, jnp.zeros_like(Bs))
        np.testing.assert_allclose(np.asarray(Xp), np.asarray(Xx),
                                   rtol=0, atol=5e-4)

    def test_cg_solve_padded_wrapper_unchanged(self):
        """The public wrapper (CPU path) still solves and reports rel."""
        rng = np.random.default_rng(1)
        N, K = 32, 3
        V, fm, B, dinv, tol2 = _problem(rng, N, K)
        X, rel = cg_solve_padded(jnp.asarray(V), jnp.asarray(fm),
                                 jnp.asarray(B), 500, 1e-6)
        Vp = np.outer(fm, fm) * V + np.diag(1.0 - fm)
        res = np.abs(Vp @ np.asarray(X) - B).max()
        assert res < 1e-4
        assert (np.asarray(rel) < 1e-5).all()
