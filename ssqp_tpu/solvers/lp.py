"""Two-phase bounded-variable simplex LP driver, fixed shapes.

TPU-native re-design of the reference's `SimplexLP` (reference:
src/Simplex.jl:831-1034): standardize (slacks, free-variable split, one-sided
flip), purge redundant equality rows, Phase-1 from a +-identity artificial
basis, drive artificial variables out of the basis, Phase-2 on the real cost,
then recover x and statuses.

Fixed-shape translation notes:
  * the redundancy purge (Simplex.jl:889-902) zeroes dependent rows instead of
    deleting them; the artificial column of a zeroed row stays basic at 0 and
    its +-1 identity entry keeps every basis nonsingular;
  * the artificial drive-out `getRowsGJr(A0[:, ic]')` (Simplex.jl:962-977)
    becomes a priority-ordered masked independent-column selection
    (ops/masked_gj.py), preferring current real basic columns;
  * Phase-2 pins artificials with d=u=0 and excludes them from candidacy, so a
    degenerate artificial left basic for a purged row stays at 0 forever;
  * the free-variable infinitely-many re-check (Simplex.jl:995-1021) is only
    applied to optimal outcomes — the reference would overwrite an unbounded
    status there, which is unintended.

Returns the reference contract (x, S, status): S of length N+J over variables
and inequality rows, status 1 unique / 2 infinitely many / 3 unbounded /
0 infeasible / -1 numerical error / -max_iter iteration limit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ssqp_tpu.ops.masked_gj import masked_gj_purge, masked_independent_cols
from ssqp_tpu.solvers.phase1 import recover_x_status, standardize_bounded
from ssqp_tpu.solvers.simplex import bounded_simplex
from ssqp_tpu.types import DN, EO, IN, LP, OE, Result, Settings, UP
from ssqp_tpu.utils.precision import highest_matmul


from typing import NamedTuple


class _LPPrep(NamedTuple):
    """Cost-independent pieces of the two-phase simplex: the standardized
    system, its row purge, and the artificial columns. For a c-parametric
    LP family (fixed constraints, varying cost) everything here — and
    Phase-1, which minimizes the artificials and never sees ``c`` — is
    SHARED across the family; only Phase-2 depends on the instance."""
    std: object
    A1: jax.Array
    b0p: jax.Array
    keep_rows: jax.Array
    inconsistent: jax.Array


class _LPStart(NamedTuple):
    """A feasible Phase-2 start: basis positions/statuses/point in
    standardized coordinates, plus the Phase-1 outcome flags (a Phase-1
    failure or infeasibility verdict applies to every member of a
    c-parametric family)."""
    B: jax.Array
    S: jax.Array
    x: jax.Array
    p1_fail: jax.Array
    p1_code: jax.Array
    infeasible: jax.Array


def _lp_prep(A, G, b, g, d, u, settings: Settings) -> _LPPrep:
    dtype = A.dtype
    N = d.shape[0]
    J = G.shape[0]
    R = A.shape[0] + J
    N0 = 2 * N + J
    std = standardize_bounded(A, G, b, g, d, u)
    A0 = std.A1[:, :N0]
    b0 = std.b0
    # purge redundant rows of the standardized system
    keep_rows, inconsistent, _ = masked_gj_purge(
        A0, b0, jnp.ones((R,), bool), settings.tol)
    rm = keep_rows.astype(dtype)
    A0p = A0 * rm[:, None]
    b0p = b0 * rm
    q0 = A0p @ std.d1[:N0]
    sigma = jnp.where(b0p >= q0, 1.0, -1.0).astype(dtype)
    A1 = jnp.concatenate([A0p, jnp.diag(sigma)], axis=1)
    return _LPPrep(std, A1, b0p, keep_rows, inconsistent)


def _lp_phase1(prep: _LPPrep, settings: Settings,
               pre_done=None) -> _LPStart:
    std, A1, b0p = prep.std, prep.A1, prep.b0p
    dtype = A1.dtype
    Nt = A1.shape[1]
    R = b0p.shape[0]
    N0 = Nt - R
    tol = settings.tol
    c1 = jnp.concatenate([jnp.zeros((N0,), dtype), jnp.ones((R,), dtype)])
    st1, x1, B1, S1, _ = bounded_simplex(
        c1, A1, b0p, std.d1, std.u1, std.B0, std.S0, std.d1, std.real,
        tol=tol, max_iter=settings.max_iter, rule=settings.rule,
        pre_done=pre_done,
    )
    f_art = jnp.sum(x1[N0:])
    # A Phase-1 failure is NOT infeasibility: -max_iter means the artificial
    # objective was not driven down within budget (feasibility undecided) and
    # -1 means numerical error; both must propagate as-is rather than read a
    # meaningless f_art. Phase-1's objective (sum of artificials) is bounded
    # below by 0, so a status-3 "unbounded" can only arise from numerics.
    p1_fail = (st1 <= 0) | (st1 == 3)
    p1_code = jnp.where(st1 == 3, -1, st1)
    infeasible = (~p1_fail & (f_art > tol)) | prep.inconsistent

    # ---- drive artificials out of the basis --------------------------------
    col_ids = jnp.arange(Nt)
    basic_cols = jnp.zeros((Nt,), bool).at[B1].set(True)
    nonart = col_ids < N0
    art_row = jnp.clip(col_ids - N0, 0, R - 1)
    art_for_purged = (col_ids >= N0) & ~prep.keep_rows[art_row]
    col_mask = nonart | (art_for_purged & basic_cols)
    priority = jnp.where(basic_cols & col_mask, 0, jnp.where(nonart, 1, 2))
    keep_cols = masked_independent_cols(A1, col_mask, priority, tol)
    B2 = jnp.nonzero(keep_cols, size=R, fill_value=0)[0].astype(jnp.int32)
    need = jnp.any(B1 >= N0)
    B2 = jnp.where(need, B2, B1)
    newly = keep_cols & ~basic_cols
    dropped = basic_cols & ~keep_cols
    S2 = jnp.where(
        need & newly, IN, jnp.where(need & dropped, DN, S1)
    ).astype(jnp.int8)
    return _LPStart(B2, S2, x1, p1_fail, p1_code, infeasible)


def _lp_cost(prep: _LPPrep, c, N: int, J: int, minimize: bool):
    """Phase-2 cost vector in standardized coordinates."""
    std = prep.std
    dtype = prep.A1.dtype
    R = prep.b0p.shape[0]
    sgn = jnp.where(std.flip, -1.0, 1.0).astype(dtype)
    c0 = jnp.concatenate([
        c * sgn,
        jnp.zeros((J,), dtype),
        jnp.where(std.fv, -c, 0.0),
        jnp.zeros((R,), dtype),
    ])
    return -c0 if not minimize else c0


def _lp_phase2(prep: _LPPrep, c0, B, S, x, settings: Settings,
               pre_done=None):
    """Phase-2 from a feasible standardized start. Returns the RAW exit
    (st2, x2, B3, S3) so grid protocols can carry the basis to a neighbor
    (reference warm-startable kernels, Simplex.jl:426-445)."""
    std, A1, b0p = prep.std, prep.A1, prep.b0p
    Nt = A1.shape[1]
    R = b0p.shape[0]
    N0 = Nt - R
    d2 = std.d1  # artificials already have d = 0
    u2 = std.u1.at[N0:].set(0.0)  # pin artificials
    real2 = std.real.at[N0:].set(False)
    st2, x2, B3, S3, _ = bounded_simplex(
        c0, A1, b0p, d2, u2, B, S, x, real2,
        tol=settings.tol, max_iter=settings.max_iter, rule=settings.rule,
        pre_done=pre_done,
    )
    return st2, x2, B3, S3


def _lp_phase2_dual(prep: _LPPrep, c0, b0p_i, B, S, x, settings: Settings,
                    pre_done=None):
    """Phase-2 via the DUAL simplex (solvers/simplex.py::
    dual_simplex_bounded) from an optimal basis of the SAME cost but a
    DIFFERENT right-hand side — the Phase-1-skipping restart for
    RHS-parametric families. ``prep`` supplies the rhs-independent pieces
    (A1, bounds, masks); ``b0p_i`` is the member's purged standardized rhs
    (concat(b, g) masked by the family's keep rows). Artificial columns
    stay pinned at [0, 0]: a basic artificial whose value moves off zero
    under the new rhs simply violates its bounds and is pivoted out — the
    dual method's built-in drive-out."""
    from ssqp_tpu.solvers.simplex import dual_simplex_bounded

    std, A1 = prep.std, prep.A1
    Nt = A1.shape[1]
    R = prep.b0p.shape[0]
    N0 = Nt - R
    d2 = std.d1
    u2 = std.u1.at[N0:].set(0.0)
    real2 = std.real.at[N0:].set(False)
    st2, x2, B3, S3, _ = dual_simplex_bounded(
        c0, A1, b0p_i, d2, u2, B, S, x, real2,
        tol=settings.tol, max_iter=settings.max_iter, pre_done=pre_done,
    )
    return st2, x2, B3, S3


def _lp_finish(prep: _LPPrep, start: _LPStart, c, c0, st2, x2, B3, S3,
               N: int, J: int, settings: Settings, minimize: bool,
               A, G) -> Result:
    std, A1 = prep.std, prep.A1
    dtype = A1.dtype
    tol = settings.tol
    Nt = A1.shape[1]
    R = prep.b0p.shape[0]
    N0 = Nt - R

    # ---- recovery -----------------------------------------------------------
    xo, So, Se = recover_x_status(x2, S3, std, N, J)

    # free-variable infinitely-many re-check (Simplex.jl:995-1021).
    # Artificials left basic for PURGED rows (their all-zero row means they
    # can never leave the basis) must not enter the dual solve: their
    # equations are replaced by identity rows pinning the purged row's w
    # component to 0, mirroring the mask-padded convention everywhere else —
    # otherwise the zeroed row makes the solve singular and a unique optimum
    # is misreported as status 2.
    any_fv = jnp.any(std.fv)
    nj = N + J
    Bm = jnp.where((B3 >= nj) & (B3 < nj + N), B3 - nj, B3)
    sel = B3 < N0  # real-column basis positions (artificials excluded)
    A_nj = A1[:, :nj]
    c_nj = c0[:nj]
    Bc = jnp.clip(Bm, 0, nj - 1)
    # duplicate real indices => both split parts of a free var are basic
    Bdup = jnp.where(sel, Bm, nj + jnp.arange(R))  # artificials -> distinct
    Bs = jnp.sort(Bdup)
    dup = jnp.any(Bs[1:] == Bs[:-1])
    art_row_ix = jnp.clip(B3 - N0, 0, R - 1)
    eye_rows = (art_row_ix[:, None] == jnp.arange(R)[None, :]).astype(dtype)
    K1 = jnp.where(sel[:, None], A_nj[:, Bc].T, eye_rows)
    rhs1 = jnp.where(sel, c_nj[Bc], 0.0)
    wv = jnp.linalg.solve(K1, rhs1)
    h_nj = c_nj - A_nj.T @ wv
    in_b = (jnp.zeros((nj,), jnp.int32)
            .at[jnp.where(sel, Bc, 0)].max(sel.astype(jnp.int32))) > 0
    ms = jnp.any((jnp.abs(h_nj) < tol) & ~in_b) | dup | ~jnp.all(jnp.isfinite(wv))
    recheck = jnp.where(ms, 2, 1)
    optimal = (st2 == 1) | (st2 == 2)
    status = jnp.where(any_fv & optimal, recheck, st2)

    status = jnp.where(
        start.infeasible, 0, jnp.where(start.p1_fail, start.p1_code, status)
    ).astype(jnp.int32)
    S = jnp.concatenate([So, Se]) if J > 0 else So
    return _attach_lp_duals(Result(xo, S, status), c, A, G, minimize)


def _std_basis_from_result(prep: _LPPrep, S_prior, x_prior, N: int, J: int,
                           tol):
    """Map a user-facing ``(S, x)`` back to a standardized basis, status
    vector and point — the inverse of phase1.recover_x_status, with
    degenerate basis cardinality repaired by the masked independent-column
    selection (preferring the columns the prior statuses mark basic).
    Used by the warm-restart API: the returned basis feeds the DUAL
    simplex, which tolerates primal infeasibility by construction."""
    from ssqp_tpu.types import UP

    std, A1 = prep.std, prep.A1
    dtype = A1.dtype
    Nt = A1.shape[1]
    R = prep.b0p.shape[0]
    N0 = Nt - R
    Sx = S_prior[:N]
    Se = S_prior[N:]
    x = x_prior.astype(dtype)
    # standardized orientation (flip: (-inf, u] vars were negated; fv: free
    # vars were split into positive/negative parts)
    xs = jnp.where(std.flip, -x, x)
    xpos = jnp.where(std.fv, jnp.maximum(xs, 0.0), xs)
    xneg = jnp.where(std.fv, jnp.maximum(-xs, 0.0), 0.0)
    Sv = jnp.where(std.flip & (Sx == UP), DN, Sx)
    pos_in = (Sv == IN) & (~std.fv | (xs >= 0))
    neg_in = std.fv & (Sv == IN) & (xs < 0)
    # inactive inequality rows carry a basic (strictly positive) slack
    slack_in = (Se == OE) if J > 0 else jnp.zeros((0,), bool)
    want = jnp.concatenate(
        [pos_in, slack_in, neg_in, jnp.zeros((R,), bool)])
    prio = jnp.where(want, 0, jnp.where(jnp.arange(Nt) < N0, 1, 2))
    keep = masked_independent_cols(A1, jnp.ones((Nt,), bool), prio,
                                   jnp.asarray(tol, dtype))
    B0 = jnp.nonzero(keep, size=R, fill_value=0)[0].astype(jnp.int32)
    # nonbasic statuses follow the prior where meaningful (a nonbasic var
    # at its upper bound must carry UP so the dual reduced-cost signs and
    # values line up); everything else sits at DN
    nb_var = jnp.where((Sv == UP) & ~std.flip, UP, DN)
    nb = jnp.concatenate([
        nb_var, jnp.full((J,), DN, jnp.int8).astype(nb_var.dtype),
        jnp.full((N,), DN, nb_var.dtype), jnp.full((R,), DN, nb_var.dtype),
    ])
    S0 = jnp.where(keep, IN, nb).astype(jnp.int8)
    # slack/artificial entries start at 0: the dual loop only reads
    # NONBASIC values (snapped onto their bounds below); basic values are
    # recomputed from the fresh inverse every iteration
    x0 = jnp.concatenate([xpos, jnp.zeros((J,), dtype), xneg,
                          jnp.zeros((R,), dtype)])
    # snap nonbasic entries exactly onto the bound their status names
    x0 = jnp.where(S0 == DN, std.d1,
                   jnp.where(S0 == UP, jnp.where(jnp.isfinite(std.u1),
                                                 std.u1, x0), x0))
    return B0, S0, x0


@partial(jax.jit, static_argnames=("settings", "minimize"))
@highest_matmul
def simplex_lp_warm(P: LP, S_prior, x_prior, settings: Settings,
                    minimize: bool = True) -> Result:
    """Warm-restarted LP solve from a prior solution's statuses
    (reference-style solveQP(Q, S, x0) ergonomics for the LP side — the
    reference's SimplexLP never exposes its kernels' warm-start state,
    Simplex.jl:831).

    The prior basis is rebuilt in standardized coordinates and handed to
    the DUAL simplex: against a problem with the same cost row it is
    dual-feasible regardless of how b/g moved, so the solve skips Phase-1
    entirely and just re-pivots to feasibility (typically a handful of
    pivots for a small rhs change). If the warm start is rejected (cost
    row changed -> dual-infeasible entry gate) or stalls, one full
    two-phase solve runs under `lax.cond` as the fallback — the result is
    never worse than calling :func:`simplex_lp` cold."""
    N, J = P.N, P.J
    prep = _lp_prep(P.A, P.G, P.b, P.g, P.d, P.u, settings)
    c0 = _lp_cost(prep, P.c, N, J, minimize)
    B0, S0, x0 = _std_basis_from_result(prep, jnp.asarray(S_prior, jnp.int8),
                                        jnp.asarray(x_prior), N, J,
                                        settings.tol)
    st2, x2, B3, S3 = _lp_phase2_dual(prep, c0, prep.b0p, B0, S0, x0,
                                      settings)

    # post-exit dual certificate: the dual loop maintains reduced-cost
    # signs by its ratio test, but accumulated pivot drift could leave the
    # exit basis dual-infeasible beyond tolerance — and a primal-feasible,
    # dual-infeasible basis shipped as "optimal" is the silent-wrong-answer
    # mode the docstring guarantee rules out. One (R, R) solve verifies the
    # exit; violation joins the fallback predicate. (Review finding, r5.)
    from ssqp_tpu.solvers.simplex import (
        dual_feasibility_violation, dual_gate_tol,
    )

    A1 = prep.A1
    Nt = A1.shape[1]
    R = prep.b0p.shape[0]
    N0 = Nt - R
    std = prep.std
    dtype = A1.dtype
    w3 = jnp.linalg.solve(A1[:, B3].T, c0[B3])
    in_b3 = jnp.zeros((Nt,), bool).at[B3].set(True)
    u2 = std.u1.at[N0:].set(0.0)
    real2 = std.real.at[N0:].set(False)
    dviol3 = dual_feasibility_violation(c0, A1, w3, S3, ~in_b3, real2,
                                        u2 - std.d1)
    exit_bad = ((st2 == 1) | (st2 == 2)) & (
        (dviol3 > dual_gate_tol(c0, jnp.asarray(settings.tol, dtype)))
        | ~jnp.all(jnp.isfinite(w3)))

    def cold(_):
        start = _lp_phase1(prep, settings)
        st, xx, Bb, Sb = _lp_phase2(prep, c0, start.B, start.S, start.x,
                                    settings)
        return (st, xx, Bb, Sb, start.p1_fail, start.p1_code,
                start.infeasible)

    def warm(_):
        f = jnp.asarray(False)
        return (st2, x2, B3, S3, f, jnp.asarray(0, jnp.int32),
                prep.inconsistent)

    st, xx, Bb, Sb, pf, pc, infz = jax.lax.cond(
        (st2 < 0) | exit_bad, cold, warm, None)
    return _lp_finish(prep, _LPStart(Bb, Sb, xx, pf, pc, infz), P.c, c0,
                      st, xx, Bb, Sb, N, J, settings, minimize, P.A, P.G)


@partial(jax.jit, static_argnames=("settings", "minimize"))
@highest_matmul
def simplex_lp_traced(P: LP, settings: Settings, minimize: bool = True) -> Result:
    N, J = P.N, P.J
    prep = _lp_prep(P.A, P.G, P.b, P.g, P.d, P.u, settings)
    start = _lp_phase1(prep, settings)
    c0 = _lp_cost(prep, P.c, N, J, minimize)
    st2, x2, B3, S3 = _lp_phase2(prep, c0, start.B, start.S, start.x,
                                 settings)
    return _lp_finish(prep, start, P.c, c0, st2, x2, B3, S3, N, J,
                      settings, minimize, P.A, P.G)


def _attach_lp_duals(res: Result, c, A, G, minimize: bool) -> Result:
    """Least-squares dual certificates at the labeled active set — the LP
    twin of the QP path's recovery (Result.lam/.gamma; the reference
    produces no duals at all, MOIwrapper.jl:255-257).

    MIN-sense convention regardless of ``minimize``: the certificate is for
    the objective actually minimized (``-c`` when maximizing), so
    stationarity reads ``c_eff + [A;G]'lam = gamma`` with lam >= 0 on active
    inequality rows, gamma >= 0 at lower / <= 0 at upper bounds. Zeroed on
    non-optimal exits.
    """
    from ssqp_tpu.ops.kkt import recover_duals_grad

    M, J = A.shape[0], G.shape[0]
    N = c.shape[0]
    ceff = c if minimize else -c
    AG = jnp.concatenate([A, G], axis=0) if J > 0 else A
    free = res.S[:N] == IN
    act = (
        jnp.concatenate([jnp.ones((M,), bool), res.S[N:] == EO])
        if J > 0 else jnp.ones((M,), bool)
    )
    lam, gamma = recover_duals_grad(ceff, AG, free, act)
    ok = res.status > 0
    lam = jnp.where(ok, lam, jnp.zeros_like(lam)) if lam.shape[0] else lam
    gamma = jnp.where(ok, gamma, jnp.zeros_like(gamma))
    return Result(res.x, res.S, res.status, lam, gamma)


def simplex_lp(P: LP, *, settings: Settings | None = None,
               minimize: bool = True, warm_from: Result | None = None) -> Result:
    """Solve an LP by two-phase simplex (reference SimplexLP, Simplex.jl:831).

    ``warm_from`` accepts a prior :class:`Result` (e.g. of a related
    problem with a different right-hand side): the solve then restarts the
    DUAL simplex from the prior basis, skipping Phase-1, with a traced
    full two-phase fallback if the warm start is rejected (see
    :func:`simplex_lp_warm`)."""
    settings = settings or Settings.for_dtype(P.c.dtype)
    if P.mc <= 0:
        S = jnp.concatenate(
            [jnp.full((P.N,), DN, jnp.int8), jnp.full((P.J,), OE, jnp.int8)]
        ) if P.J > 0 else jnp.full((P.N,), DN, jnp.int8)
        return Result(jnp.zeros((P.N,), P.c.dtype), S, jnp.asarray(-1, jnp.int32))
    if P.M + P.J == 0:
        from ssqp_tpu.solvers.boxlp import box_lp

        return box_lp(P, settings=settings, minimize=minimize)
    if warm_from is not None:
        return simplex_lp_warm(P, warm_from.S, warm_from.x, settings,
                               minimize)
    return simplex_lp_traced(P, settings, minimize)


def simplex_lp_standard(c, A, b, d, u, *, settings=None, minimize=True) -> Result:
    """Pre-standardized variant (reference SimplexLP(c,A,b,d,u),
    Simplex.jl:1036): no inequality rows, bounds may be infinite."""
    from ssqp_tpu.types import make_lp

    P = make_lp(c, A, b, d=d, u=u)
    return simplex_lp(P, settings=settings, minimize=minimize)
