"""Padded equality-constrained KKT solve for the status-switching loop.

This is the TPU-native form of the reference's per-iteration block elimination
(reference: src/SSQP.jl:322-332). The reference gathers the free submatrices
``V[F,F]`` and ``AE = [A[:,F]; G[EO,F]]`` (dynamic shapes) and runs two dense
Cholesky factorizations. Here the same elimination is done at full (N, M+J)
shape with *mask padding*, so it jits once and `vmap`s over instance batches:

  * bound variables are pinned through an identity block:
        Vp = f f' ⊙ V + diag(1-f)
  * inactive / purged working rows are disabled through an identity block on
    the Schur complement:
        C̃ = Ap Vp⁻¹ Ap' + diag(1-keep)
    which forces their multiplier to exactly zero.

With ``w = Vp⁻¹ cp`` and ``mT = Vp⁻¹ Ap'`` the reference quantities become

    alphaL = -C̃⁻¹ (Ap w + bp)          (SSQP.jl:351)
    alpha  = -(mT alphaL + w)           (equals TC·bE - VQ·c, SSQP.jl:331)
    gamma  = V alpha_full + q + AG' (keep ⊙ alphaL)   (SSQP.jl:352)

restricted to the appropriate masks. All solves are Cholesky-based
(jax.lax.linalg on the MXU); a fused Pallas variant lives in pallas_chol.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve, cholesky as _chol


class KKTResult(NamedTuple):
    alpha: jax.Array  # (N,) candidate minimizer: free coords solved, bound = z
    p: jax.Array  # (N,) step direction alpha - z (zero on bound coords)
    alphaL: jax.Array  # (R,) working-row multipliers (zero on non-kept rows)
    gamma: jax.Array  # (N,) reduced gradient at alpha (meaningful on bound coords)
    ok: jax.Array  # () bool — factorization produced finite results


def kkt_solve(V, q, AG, bg, z, free, keep) -> KKTResult:
    """Solve the working-set equality QP at full padded shape.

    Args:
      V: (N, N) symmetric PSD objective matrix.
      q: (N,) linear term.
      AG: (R, N) stacked [A; G] rows, R = M + J.
      bg: (R,) stacked [b; g].
      z: (N,) current (feasible) point.
      free: (N,) bool — variables with status IN.
      keep: (R,) bool — active working rows that survived the redundancy purge.

    Returns a :class:`KKTResult`. If ``V[F,F]`` is not positive definite the
    Cholesky produces NaNs; ``ok`` is False and the caller maps that to the
    reference's numerical-error status -1 (the reference throws instead,
    SSQP.jl:322).
    """
    dtype = V.dtype
    fm = free.astype(dtype)
    bm = 1.0 - fm
    km = keep.astype(dtype)

    zB = z * bm
    c_full = V @ zB + q
    cp = fm * c_full

    Vp = V * (fm[:, None] * fm[None, :]) + jnp.diag(bm)
    Ap = AG * (km[:, None] * fm[None, :])
    bp = km * (bg - AG @ zB)

    L = _chol(Vp, lower=True)
    if AG.shape[0] == 0:  # unconstrained working set (M = J = 0)
        w = cho_solve((L, True), cp)
        alphaL = jnp.zeros((0,), dtype)
        alpha_f = -w
    else:
        # w = Vp^{-1} cp ; mT = Vp^{-1} Ap'
        rhs = jnp.concatenate([cp[:, None], Ap.T], axis=1)
        sol = cho_solve((L, True), rhs)
        w, mT = sol[:, 0], sol[:, 1:]

        C = Ap @ mT
        C = (C + C.T) / 2 + jnp.diag(1.0 - km)
        Lc = _chol(C, lower=True)
        alphaL = -cho_solve((Lc, True), Ap @ w + bp)

        alpha_f = -(mT @ alphaL + w)
    alpha = fm * alpha_f + bm * z
    p = fm * (alpha_f - z)

    gamma = V @ alpha + q + AG.T @ (km * alphaL)

    ok = jnp.all(jnp.isfinite(alpha)) & jnp.all(jnp.isfinite(alphaL))
    return KKTResult(alpha, p, alphaL, gamma, ok)


def recover_dropped_multipliers(AG, free, keep, act_rows, alphaL, M: int):
    """Multipliers for active-but-purged inequality rows.

    The reference recovers the multiplier of an active row that was purged as
    redundant by a least-squares solve ``AE' \\ GE[j, F]`` and dotting with the
    kept multipliers (SSQP.jl:149-172). Padded normal-equations form: with
    ``Ap`` the kept f-masked working rows,

        X = (Ap Ap' + diag(1-keep))^{-1} Ap Gp',   lambda_j = alphaL' X[:, j]

    Rows that were kept keep their own multiplier (identity alignment — padding
    never compacts row indices).

    Args:
      AG: (R, N) stacked [A; G]; rows M..R-1 are the inequality rows.
      free, keep: masks as in :func:`kkt_solve`.
      act_rows: (R,) bool — rows currently held as equalities (EO + equality A).
      alphaL: (R,) multipliers from :func:`kkt_solve`.
      M: number of equality rows (static).

    Returns (J,) inequality multipliers Lda (reference's `Lda`, SSQP.jl:155-163).
    """
    dtype = AG.dtype
    fm = free.astype(dtype)
    km = keep.astype(dtype)
    Ap = AG * (km[:, None] * fm[None, :])
    Gp = AG[M:] * fm[None, :]  # (J, N) inequality rows, free columns

    M1 = Ap @ Ap.T + jnp.diag(1.0 - km)
    M1 = (M1 + M1.T) / 2
    Lm = _chol(M1, lower=True)
    X = cho_solve((Lm, True), Ap @ Gp.T)  # (R, J)
    recovered = X.T @ (km * alphaL)  # (J,)

    kept_ineq = keep[M:]
    own = alphaL[M:]
    dropped_active = act_rows[M:] & ~kept_ineq
    return jnp.where(kept_ineq, own, jnp.where(dropped_active, recovered, 0.0))
