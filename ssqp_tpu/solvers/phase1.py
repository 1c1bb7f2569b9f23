"""Phase-1 feasibility via big-M-free bounded simplex, fixed shapes.

TPU-native re-design of the reference's `initQP` (reference: src/SSQP.jl:461-560)
and the standardization shared with `SimplexLP` (Simplex.jl:861-921):

  * slack columns convert Gx<=g rows to equalities;
  * free variables (-inf, +inf) are split x = x+ - x-;
  * one-sided (-inf, u] variables are sign-flipped to [-u, +inf);
  * an artificial +-identity basis with cost = sum(artificials) gives a
    feasible Phase-1 start without big-M.

The reference's free-variable split appends a *dynamic* number of columns
(SSQP.jl:495). To stay fixed-shape every variable gets a negative-part column
here; for non-free variables it is a dummy (zero column, d=u=0) excluded from
candidacy via the kernel's `real` mask. Column layout:

    [ original N | slacks J | negative parts N | artificials M+J ]

Note: the reference's flip-back loop has a latent no-op bug (`S[k] == UP`
comparison instead of assignment, and mis-indexed k — SSQP.jl:552-557); the
intended semantics (as implemented correctly in Simplex.jl:1023-1032) are
implemented here.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ssqp_tpu.solvers.simplex import bounded_simplex
from ssqp_tpu.types import DN, EO, IN, OE, QP, UP, Settings
from ssqp_tpu.utils.precision import highest_matmul


class Standardized(NamedTuple):
    A1: jax.Array  # (R, Nt) with Nt = 2N + J + R
    b0: jax.Array  # (R,)
    d1: jax.Array
    u1: jax.Array
    real: jax.Array  # (Nt,) bool — excludes dummy negative parts
    fv: jax.Array  # (N,) bool — free variables (split)
    flip: jax.Array  # (N,) bool — (-inf, u] variables (sign-flipped)
    B0: jax.Array  # (R,) initial (artificial) basis
    S0: jax.Array  # (Nt,) initial statuses
    # NOTE: the Phase-1 start point is d1 itself (every nonbasic variable at
    # its lower bound; basic values are recomputed from the maintained
    # inverse on the first simplex iteration), so no separate x0 is stored.


def standardize_bounded(A, G, b, g, d, u):
    """Build the fixed-shape standardized LP data (see module docstring)."""
    dtype = A.dtype
    M, N = A.shape
    J = G.shape[0]
    R = M + J
    AG = jnp.concatenate([A, G], axis=0) if J > 0 else A
    b0 = jnp.concatenate([b, g]) if J > 0 else b

    fu_inf = ~jnp.isfinite(u)
    fd_inf = ~jnp.isfinite(d)
    fv = fu_inf & fd_inf  # free: split
    flip = fd_inf & ~fv  # (-inf, u]: flip sign
    sgn = jnp.where(flip, -1.0, 1.0).astype(dtype)

    AGs = AG * sgn[None, :]
    d_o = jnp.where(fv, 0.0, jnp.where(flip, -u, d))
    u_o = jnp.where(flip, jnp.inf, u)

    slackA = (
        jnp.concatenate([jnp.zeros((M, J), dtype), jnp.eye(J, dtype=dtype)], axis=0)
        if J > 0
        else jnp.zeros((R, 0), dtype)
    )
    negA = jnp.where(fv[None, :], -AGs, 0.0)
    u_n = jnp.where(fv, jnp.inf, 0.0)

    A0 = jnp.concatenate([AGs, slackA, negA], axis=1)
    d0 = jnp.concatenate([d_o, jnp.zeros((J,), dtype), jnp.zeros((N,), dtype)])
    u0 = jnp.concatenate([u_o, jnp.full((J,), jnp.inf, dtype), u_n])

    q0 = A0 @ d0
    sigma = jnp.where(b0 >= q0, 1.0, -1.0).astype(dtype)
    A1 = jnp.concatenate([A0, jnp.diag(sigma)], axis=1)
    d1 = jnp.concatenate([d0, jnp.zeros((R,), dtype)])
    u1 = jnp.concatenate([u0, jnp.full((R,), jnp.inf, dtype)])

    N0 = 2 * N + J
    real = jnp.concatenate(
        [jnp.ones((N + J,), bool), fv, jnp.ones((R,), bool)]
    )
    B0 = N0 + jnp.arange(R, dtype=jnp.int32)
    S0 = jnp.full((N0 + R,), DN, jnp.int8).at[B0].set(IN)
    return Standardized(A1, b0, d1, u1, real, fv, flip, B0, S0)


def recover_x_status(x1, S1, std: Standardized, N: int, J: int):
    """Map standardized solution back to original variables and statuses
    (reference SSQP.jl:540-559 / Simplex.jl:989-1032)."""
    xo = x1[:N]
    xneg = x1[N + J : N + J + N]
    xo = jnp.where(std.fv, xo - xneg, xo)
    xo = jnp.where(std.flip, -xo, xo)

    So = S1[:N]
    So = jnp.where(std.fv, IN, So)
    So = jnp.where(std.flip & (So == DN), UP, So).astype(jnp.int8)
    # slack IN (strictly positive or degenerate-basic) -> row inactive OE
    Se = jnp.where(S1[N : N + J] == IN, OE, EO).astype(jnp.int8)
    return xo, So, Se


@partial(jax.jit, static_argnames=("settings",))
@highest_matmul
def init_qp_traced(Q: QP, settings: Settings, skip=None):
    """Phase-1 for the QP path. Returns (x0, Sx, Se, status) as traced arrays;
    status: 1 feasible, 0 infeasible, -1 numerical error.

    ``skip`` (traced bool): the caller already has an accepted start for
    this instance and will discard this result — the simplex enters its
    while_loop pre-done so fully-skipped batches pay ~nothing (the
    PDAS-guess fast path, solvers/ssqp.py::solve_qp_auto_core)."""
    N, M, J = Q.N, Q.M, Q.J
    dtype = Q.V.dtype
    if M + J == 0:
        # no rows: clip any point into the box (reference requires M>=1 via
        # the QP constructor; this widens capability, not narrows it)
        x0 = jnp.clip(jnp.zeros((N,), dtype), Q.d, Q.u)
        Sx = jnp.where(
            jnp.isfinite(Q.d) & (x0 == Q.d),
            DN,
            jnp.where(jnp.isfinite(Q.u) & (x0 == Q.u), UP, IN),
        ).astype(jnp.int8)
        return x0, Sx, jnp.zeros((0,), jnp.int8), jnp.asarray(1, jnp.int32)

    std = standardize_bounded(Q.A, Q.G, Q.b, Q.g, Q.d, Q.u)
    R = M + J
    N0 = 2 * N + J
    c1 = jnp.concatenate([jnp.zeros((N0,), dtype), jnp.ones((R,), dtype)])
    lp_status, x1, B1, S1, _ = bounded_simplex(
        c1, std.A1, std.b0, std.d1, std.u1, std.B0, std.S0, std.d1, std.real,
        tol=settings.tol, max_iter=settings.max_iter, rule=settings.rule,
        pre_done=skip,
    )
    f_art = jnp.sum(x1[N0:])
    xo, Sx, Se = recover_x_status(x1, S1, std, N, J)
    status = jnp.where(
        lp_status < 0, -1, jnp.where(f_art > settings.tol, 0, 1)
    ).astype(jnp.int32)
    return xo, Sx, Se, status


def init_qp(Q: QP, settings: Settings):
    """Host-convenience Phase-1 (reference initQP, SSQP.jl:461-560)."""
    return init_qp_traced(Q, settings)


@partial(jax.jit, static_argnames=("settings",))
def init_ssqp_traced(Q: QP, settings: Settings):
    """Simpler Phase-1 requiring finite lower bounds (reference initSSQP,
    SSQP.jl:386-453, used by the EfficientFrontier sister package): no
    free-variable split or sign flip — columns are just
    [originals | G slacks | +-identity artificials]. Returns
    (x0, Sx, Se, status) with status 1 feasible / 0 infeasible / -1 error.
    """
    N, M, J = Q.N, Q.M, Q.J
    dtype = Q.V.dtype
    Ms = M + J
    Ns = N + J
    AG = jnp.concatenate([Q.A, Q.G], axis=0) if J > 0 else Q.A
    bs = jnp.concatenate([Q.b, Q.g]) if J > 0 else Q.b
    slackA = (
        jnp.concatenate([jnp.zeros((M, J), dtype), jnp.eye(J, dtype=dtype)], axis=0)
        if J > 0 else jnp.zeros((Ms, 0), dtype)
    )
    As = jnp.concatenate([AG, slackA], axis=1)
    ds = jnp.concatenate([Q.d, jnp.zeros((J,), dtype)])
    us = jnp.concatenate([Q.u, jnp.full((J,), jnp.inf, dtype)])

    q0 = As @ ds
    sigma = jnp.where(bs >= q0, 1.0, -1.0).astype(dtype)
    A1 = jnp.concatenate([As, jnp.diag(sigma)], axis=1)
    c1 = jnp.concatenate([jnp.zeros((Ns,), dtype), jnp.ones((Ms,), dtype)])
    d1 = jnp.concatenate([ds, jnp.zeros((Ms,), dtype)])
    u1 = jnp.concatenate([us, jnp.full((Ms,), jnp.inf, dtype)])
    B0 = Ns + jnp.arange(Ms, dtype=jnp.int32)
    S0 = jnp.full((Ns + Ms,), DN, jnp.int8).at[B0].set(IN)
    real = jnp.ones((Ns + Ms,), bool)

    lp_status, x1, B1, S1, _ = bounded_simplex(
        c1, A1, bs, d1, u1, B0, S0, d1, real,
        tol=settings.tol, max_iter=settings.max_iter, rule=settings.rule,
    )
    f_art = jnp.sum(x1[Ns:])
    x0 = x1[:N]
    Sx = S1[:N]
    Se = (jnp.where(S1[N:Ns] == IN, OE, EO).astype(jnp.int8)
          if J > 0 else jnp.zeros((0,), jnp.int8))
    status = jnp.where(
        lp_status < 0, -1, jnp.where(f_art > settings.tol, 0, 1)
    ).astype(jnp.int32)
    return x0, Sx, Se, status
