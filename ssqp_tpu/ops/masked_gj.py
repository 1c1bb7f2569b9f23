"""Masked Gauss-Jordan elimination with fixed shapes.

TPU-native replacement for the reference's rank/redundancy machinery
(reference: src/utils.jl:2-86, `getRowsGJ`/`getRowsGJr`). The reference purges
redundant working-set rows by gathering an index subset — a dynamic shape. Here
the elimination runs with a *fixed trip count* and returns a boolean `keep`
mask instead of shrinking, so it stays `jit`/`vmap`/`shard_map` compatible.

Semantics of :func:`masked_gj_purge` match `getRowsGJr([AE bE], tol)`
(utils.jl:49-86) as used by the S-loop (SSQP.jl:310-319): a row is kept iff it
is linearly independent of the kept rows above it (row-pivoted elimination,
max-abs column pivot, absolute tolerance). A dropped row whose eliminated
right-hand side still exceeds `tol` marks the system inconsistent — the
analogue of rank([A b]) > rank(A) detected by `getRowsGJ`'s `l1` bookkeeping
(utils.jl:36-38).

Not ported on purpose: the reference's `getRows` (utils.jl:89-126, an
incremental least-squares independence test) is unused in live paths and has
a latent bug (its default tol references an undefined variable); `SSLP.jl` is
dead code the reference itself disabled (StatusSwitchingQP.jl:26-30).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gj_sweep(E: jax.Array, tol, ncols_pivot: int):
    """Run row-ordered Gauss-Jordan over `E`, pivoting only in the first
    `ncols_pivot` columns. Returns (eliminated E, keep mask).

    Rows that are (numerically) zero in the pivot columns at their turn are
    skipped and marked not-kept. Elimination zeroes the pivot column in every
    other row, so the "unused columns" bookkeeping of the reference
    (utils.jl:54, 65) is implicit.
    """
    R, C = E.shape
    col_ids = jnp.arange(C)
    pivot_zone = (col_ids < ncols_pivot).astype(E.dtype)

    def step(i, carry):
        E, keep = carry
        row = E[i]
        absrow = jnp.abs(row) * pivot_zone
        j = jnp.argmax(absrow)
        piv_ok = absrow[j] > tol
        # Normalized pivot row (safe divide when not pivoting).
        denom = jnp.where(piv_ok, row[j], jnp.ones((), E.dtype))
        r = row / denom
        # Eliminate column j from all other rows.
        factors = jnp.where(piv_ok, E[:, j], jnp.zeros((), E.dtype))
        factors = factors.at[i].set(0.0)
        E = E - factors[:, None] * r[None, :]
        E = E.at[i].set(jnp.where(piv_ok, r, row))
        keep = keep.at[i].set(piv_ok)
        return E, keep

    keep0 = jnp.zeros((R,), dtype=bool)
    E, keep = jax.lax.fori_loop(0, R, step, (E, keep0))
    return E, keep


def masked_gj_purge(A: jax.Array, b: jax.Array, row_mask: jax.Array, tol):
    """Independent-row selection on the augmented system [A | b].

    Args:
      A: (R, C) working constraint matrix (inactive rows may be arbitrary).
      b: (R,) right-hand side.
      row_mask: (R,) bool — rows participating (active working rows).
      tol: absolute pivot tolerance (reference default 2**-33, utils.jl:49).

    Returns:
      keep: (R,) bool — independent active rows (keep ⊆ row_mask).
      inconsistent: () bool — some active row reduced to [~0 | beta], |beta|>tol.
      bad_rows: (R,) bool — the offending rows themselves (dependent AND with
        conflicting right-hand side; dependent-but-consistent rows are not
        flagged).
    """
    rm = row_mask.astype(A.dtype)
    E = jnp.concatenate([A * rm[:, None], (b * rm)[:, None]], axis=1)
    E, keep = _gj_sweep(E, tol, A.shape[1])
    dropped = row_mask & ~keep
    bad_rows = dropped & (jnp.abs(E[:, -1]) > tol)
    inconsistent = jnp.any(bad_rows)
    return keep, inconsistent, bad_rows


def masked_gj_purge_col(A: jax.Array, b: jax.Array, row_mask: jax.Array, tol):
    """Column-pivoted flavor of :func:`masked_gj_purge` (reference
    `getRowsGJ`, utils.jl:2-45): sweep columns left to right, the pivot row
    of column j is the max-|entry| among still-unused active rows. The
    reference's `Settings.pivot` selects between the two flavors; they keep
    different (equally valid) independent row subsets on rank-deficient
    input.

    Returns (keep, inconsistent, bad_rows) like :func:`masked_gj_purge`.
    """
    R, C = A.shape
    dtype = A.dtype
    rm = row_mask.astype(dtype)
    E = jnp.concatenate([A * rm[:, None], (b * rm)[:, None]], axis=1)

    def col_step(j, carry):
        E, keep = carry
        colv = jnp.abs(E[:, j]) * jnp.where(keep, 0.0, rm)  # unused rows only
        i = jnp.argmax(colv)
        piv_ok = colv[i] > tol
        piv = E[i]
        denom = jnp.where(piv_ok, piv[j], jnp.ones((), dtype))
        r = piv / denom
        factors = jnp.where(piv_ok, E[:, j], jnp.zeros((), dtype))
        factors = factors.at[i].set(0.0)
        E = E - factors[:, None] * r[None, :]
        E = E.at[i].set(jnp.where(piv_ok, r, piv))
        keep = keep.at[i].set(keep[i] | piv_ok)
        return E, keep

    keep0 = jnp.zeros((R,), dtype=bool)
    E, keep = jax.lax.fori_loop(0, C, col_step, (E, keep0))
    dropped = row_mask & ~keep
    bad_rows = dropped & (jnp.abs(E[:, -1]) > tol)
    return keep, jnp.any(bad_rows), bad_rows


def masked_purge_qr(A: jax.Array, b: jax.Array, row_mask: jax.Array, tol):
    """One-shot QR replacement for :func:`masked_gj_purge` (same contract).

    The GJ sweep is an R-step sequential `fori_loop` — at R~100 working rows
    that is ~100 latency-bound dependent dispatches per S-loop iteration,
    which dominated the N=512 single-instance latency. Here the same greedy
    row-order keep rule ("keep iff independent of the kept rows above", the
    getRowsGJr semantics, utils.jl:49-86) comes from ONE Householder QR of
    the masked rows transposed: |R_jj| is the norm of row j's residual
    against the span of ALL previous rows, and dropped rows never extend
    that span, so span(previous) == span(previous kept) — the criteria
    coincide. Consistency of dropped rows (the rank([A b]) > rank(A) test)
    is a ridge-stabilized least-squares reconstruction of their right-hand
    sides from the kept rows.

    Tolerance metric differs from GJ (2-norm residual vs max-abs pivot) by
    at most a sqrt(C) factor — both flavors are "numerical rank at tol"
    decisions the reference itself treats as tolerance-bounded.
    """
    R, C = A.shape
    dtype = A.dtype
    rm = row_mask.astype(dtype)
    Am = A * rm[:, None]
    # Reduced QR of (C, R); Rm is (min(C,R), R) upper-triangular.
    Rm = jnp.linalg.qr(Am.T, mode="r")
    diag = jnp.abs(jnp.diagonal(Rm))
    if diag.shape[0] < R:  # more rows than columns: the tail cannot be kept
        diag = jnp.concatenate(
            [diag, jnp.zeros((R - diag.shape[0],), dtype)]
        )
    keep = (diag > tol) & row_mask

    km = keep.astype(dtype)
    Ak = Am * km[:, None]
    ridge = jnp.asarray(float(jnp.finfo(dtype).eps), dtype)
    M1 = Ak @ Ak.T + jnp.diag((1.0 - km) + ridge * km)
    M1 = (M1 + M1.T) / 2
    # coeffs[:, j] expresses row j in the kept-row basis
    from ssqp_tpu.ops.kkt import spd_solve

    X = spd_solve(M1, Ak @ Am.T)  # (R, R)
    pred_b = X.T @ (km * b)
    dropped = row_mask & ~keep
    bad_rows = dropped & (jnp.abs(b * rm - pred_b) > tol)
    return keep, jnp.any(bad_rows), bad_rows


def independent_rows_gs(A: jax.Array, row_mask: jax.Array, tol):
    """Greedy independent-row subset via modified Gram-Schmidt.

    Fixed-shape stand-in for the reference's rank-revealing pivoted-QR
    helpers `getRowsQR`/`getColumnsQR` (utils.jl:129-155): a row is kept iff
    its residual after projection onto the span of previously kept rows
    exceeds ``tol`` in norm. (JAX has no pivoted QR; greedy MGS keeps the
    same kind of well-conditioned subset.) Returns a bool keep mask; use on
    ``A.T`` for independent columns.
    """
    R, C = A.shape
    dtype = A.dtype
    rm = row_mask.astype(dtype)

    def step(i, carry):
        Q, keep = carry  # Q holds orthonormalized kept rows (zero otherwise)
        v = A[i] * rm[i]
        proj = Q @ v  # (R,) coefficients against kept rows
        v = v - Q.T @ proj
        # re-orthogonalize once for numerical robustness
        v = v - Q.T @ (Q @ v)
        nrm = jnp.sqrt(jnp.sum(v * v))
        ok = (nrm > tol) & row_mask[i]
        qrow = jnp.where(ok, v / jnp.where(nrm > 0, nrm, 1.0), jnp.zeros_like(v))
        Q = Q.at[i].set(qrow)
        keep = keep.at[i].set(ok)
        return Q, keep

    Q0 = jnp.zeros((R, C), dtype)
    keep0 = jnp.zeros((R,), bool)
    _, keep = jax.lax.fori_loop(0, R, step, (Q0, keep0))
    return keep


def masked_row_rank(A: jax.Array, row_mask: jax.Array, tol):
    """Number of independent active rows of A (masked rank)."""
    rm = row_mask.astype(A.dtype)
    _, keep = _gj_sweep(A * rm[:, None], tol, A.shape[1])
    return jnp.sum(keep.astype(jnp.int32)), keep


def masked_independent_cols(
    A: jax.Array, col_mask: jax.Array, priority: jax.Array, tol
):
    """Greedy maximal independent column subset, lowest `priority` first.

    TPU-native equivalent of the basis-repair step `getRowsGJr(A0[:, ic]')`
    in SimplexLP's artificial-variable drive-out (reference Simplex.jl:962-977):
    columns are visited in ascending (priority, index) order and kept iff
    independent of the kept set. Returns a bool mask over columns.

    Implemented by permuting columns, running the row-wise sweep on the
    transpose, and scattering the keep mask back.
    """
    C = A.shape[1]
    order = jnp.argsort(priority, stable=True)
    At = A.T[order]  # (C, R) rows in priority order
    cm = col_mask[order].astype(A.dtype)
    _, keep_perm = _gj_sweep(At * cm[:, None], tol, A.shape[0])
    keep = jnp.zeros((C,), bool).at[order].set(keep_perm)
    return keep & col_mask


def select_purge(pivot: str, R: int):
    """The redundancy-purge flavor shared by every engine that rebuilds a
    working set (S-loop, refine sweeps, diff re-solve): ``Settings.pivot``
    chooses the reference's row- vs column-pivoting semantics
    (getRowsGJr/getRowsGJ, utils.jl:2-86); the row flavor switches to the
    one-shot QR twin at R >= 16 working rows (identical greedy keep
    semantics, far lower sequential latency — the round-1 latency fix).

    Keep this the ONLY place the dispatch rule lives: the diff layer's
    fixed-active-set re-solve must purge with exactly the S-loop's rule or
    its multipliers silently desynchronize from the solver's.
    """
    if pivot != "row":
        return masked_gj_purge_col
    return masked_purge_qr if R >= 16 else masked_gj_purge
