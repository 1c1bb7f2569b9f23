"""Fixed-shape standard-form reduction ``min c'x, Ax=b, x>=0``.

TPU-native re-design of the reference's `cAb` (reference: src/utils.jl:202-279):
purge redundant equality rows, slack-convert Gx<=g, split free variables,
sign-flip (-inf, u] variables, shift finite lower bounds to zero, and convert
finite upper bounds into extra equality rows with a bound-slack identity block.

The reference emits dynamically-sized output (row/column counts depend on the
data). Here every size is static in (N, M, J):

  rows    [ M original equalities | J slack-converted inequalities | N bound rows ]
  columns [ y (N) | G slacks (J) | negative parts (N) | bound slacks (N) | row anchors (M+J) ]

with masks marking which are "real":
  * the negative-part column of a non-free variable is a zero dummy;
  * the bound row of a non-boxed variable i degenerates to ``s_i = 0``
    (identity on its bound-slack column, rhs 0) — the slack doubles as the
    row's anchor, keeping every maximal independent column set full-rank;
  * a redundant [A|b] row is zeroed and its anchor column carries the row
    (``a_k = 0``); inconsistent rows mark the whole problem infeasible.

All anchors/dummies have zero cost, so they are never dual-violated and never
pivot (see solvers/cclp.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ssqp_tpu.ops.masked_gj import masked_gj_purge


class StandardForm(NamedTuple):
    c1: jax.Array  # (Nt,) costs
    A1: jax.Array  # (R2, Nt) equality matrix, R2 = M + J + N
    b1: jax.Array  # (R2,) rhs
    d0: jax.Array  # (N + J,) lower-bound shift of [y | G slacks]
    sgn: jax.Array  # (N,) +-1 flip signs
    free: jax.Array  # (N,) bool — split variables
    flip: jax.Array  # (N,) bool — (-inf, u] variables
    boxed: jax.Array  # (N,) bool — finite d and u
    keep_rows: jax.Array  # (M+J,) bool — non-redundant [A;G-slack] rows
    inconsistent: jax.Array  # () bool — rank([A b]) > rank(A)


def standard_form(c, A, b, G, g, d, u, tol=None) -> StandardForm:
    """Build the fixed-shape standard form (see module docstring).

    Shapes: c (N,), A (M, N), b (M,), G (J, N), g (J,), d/u (N,).
    ``tol`` is the redundancy-purge tolerance — pass the caller's
    Settings.tol so the rank decisions match the solving dtype tier (the
    f64-tier default 2**-26 sits below f32 arithmetic noise, which would
    leave duplicate rows unpurged and the standard system rank-deficient).
    """
    dtype = c.dtype
    M, N = A.shape
    J = G.shape[0]
    MJ = M + J
    tol = jnp.asarray(2.0**-26 if tol is None else tol, dtype)

    fu_inf = ~jnp.isfinite(u)
    fd_inf = ~jnp.isfinite(d)
    free = fu_inf & fd_inf
    flip = fd_inf & ~fu_inf  # (-inf, u] -> [-u, +inf)
    boxed = ~fd_inf & ~fu_inf
    sgn = jnp.where(flip, -1.0, 1.0).astype(dtype)

    # flipped data, finite lower bounds, shift to zero
    dq = jnp.where(free, 0.0, jnp.where(flip, -u, d))
    uq = jnp.where(flip, jnp.inf, u)  # upper bounds post-flip
    cs = c * sgn

    AG = jnp.concatenate([A, G], axis=0) if J > 0 else A
    AGs = AG * sgn[None, :]
    bg = jnp.concatenate([b, g]) if J > 0 else b

    # purge redundant/inconsistent rows of the original equality block [A b]
    # (reference purges only A rows: G rows get independent slack columns)
    if M > 0:
        keepA, inconsistent, _ = masked_gj_purge(A, b, jnp.ones((M,), bool), tol)
    else:
        keepA, inconsistent = jnp.ones((0,), bool), jnp.asarray(False)
    keep_rows = jnp.concatenate([keepA, jnp.ones((J,), bool)]) if J > 0 else keepA
    km = keep_rows.astype(dtype)

    slackA = (
        jnp.concatenate([jnp.zeros((M, J), dtype), jnp.eye(J, dtype=dtype)], axis=0)
        if J > 0
        else jnp.zeros((MJ, 0), dtype)
    )
    negA = jnp.where(free[None, :], -AGs, 0.0)
    d0 = jnp.concatenate([dq, jnp.zeros((J,), dtype)])

    # kept rows carry the problem; purged rows become `a_k = 0` anchor rows
    anchors = jnp.diag(1.0 - km)
    top = jnp.concatenate(
        [AGs * km[:, None], slackA * km[:, None], negA * km[:, None],
         jnp.zeros((MJ, N), dtype), anchors],
        axis=1,
    )
    b_top = km * (bg - AGs @ dq)

    # bound rows: boxed i -> y_i + s_i = u_i - d_i ; else s_i = 0
    bxm = boxed.astype(dtype)
    eyeN = jnp.eye(N, dtype=dtype)
    bound = jnp.concatenate(
        [eyeN * bxm[:, None], jnp.zeros((N, J), dtype),
         jnp.zeros((N, N), dtype), eyeN, jnp.zeros((N, MJ), dtype)],
        axis=1,
    )
    b_bound = jnp.where(boxed, uq - dq, 0.0)

    A1 = jnp.concatenate([top, bound], axis=0)
    b1 = jnp.concatenate([b_top, b_bound])
    c1 = jnp.concatenate(
        [cs, jnp.zeros((J,), dtype), jnp.where(free, -c, 0.0),
         jnp.zeros((N + MJ,), dtype)]
    )
    return StandardForm(
        c1, A1, b1, d0, sgn, free, flip, boxed, keep_rows, inconsistent
    )


def recover_solution(y_full, S1, sf: StandardForm, N: int, J: int):
    """Map a standard-form solution/status back to the original variables
    (reference CCLP.jl:315-367, with the intended free-variable semantics —
    the reference's own path references an undefined ``x0``, CCLP.jl:331).

    Args:
      y_full: (Nt,) standard-form point (nonbasic entries zero).
      S1: (Nt,) int8 statuses, IN = basic.
    Returns (x, Sx, Se): original solution, variable and inequality statuses.
    """
    from ssqp_tpu.types import DN, EO, IN, OE, UP

    xo = y_full[:N] + sf.d0[:N]
    neg = y_full[N + J : N + J + N]
    xo = jnp.where(sf.free, xo - neg, xo)
    xo = jnp.where(sf.flip, -xo, xo)

    So = S1[:N]
    # free variables are always IN: they have no bounds to sit at, and a DN
    # label (either split part nonbasic) would read as x = d = -inf to
    # status consumers (warm starts, reconstruction) — same convention as
    # phase1.recover_x_status
    So = jnp.where(sf.free, IN, So)
    So = jnp.where(sf.flip & (So == DN), UP, So)
    # boxed variable whose bound slack is nonbasic sits at its upper bound
    # (unconditional override like the reference, CCLP.jl:358-359)
    bs = S1[N + J + N : N + J + 2 * N]
    So = jnp.where(sf.boxed & (bs == DN), UP, So).astype(jnp.int8)

    # slack DN -> row tight (EO); slack basic -> inactive (OE)
    Se = jnp.where(S1[N : N + J] == IN, OE, EO).astype(jnp.int8)
    return xo, So.astype(jnp.int8), Se
