"""Observability: batched KKT diagnostics and profiling helpers.

The reference's observability surface is minimal — iteration counts returned
as the status value and `@warn` logging (SURVEY.md §5). The TPU-native
framework returns everything as device arrays so nothing forces a host sync:
:func:`kkt_report` computes per-instance optimality/feasibility measures for
a whole batch in one jitted call, and :func:`trace` wraps a solve in a
`jax.profiler` trace for TensorBoard.
"""

from __future__ import annotations

import contextlib
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ssqp_tpu.types import DN, EO, IN, QP, Result, UP
from ssqp_tpu.utils.precision import highest_matmul


class KKTReport(NamedTuple):
    feas_eq: jax.Array  # max |Ax - b|
    feas_ineq: jax.Array  # max(0, max (Gx - g))
    feas_bounds: jax.Array  # max bound violation
    stationarity: jax.Array  # free-coordinate projected-gradient norm
    complementarity: jax.Array  # max |(g - Gx)| over rows labeled EO
    iters: jax.Array  # iteration count (status if > 0, else 0)
    solved: jax.Array  # status > 0


def _one_report(Q: QP, res: Result) -> KKTReport:
    x = res.x
    N, M, J = Q.N, Q.M, Q.J
    Sx = res.S[:N]
    feas_eq = (jnp.max(jnp.abs(Q.A @ x - Q.b)) if M > 0
               else jnp.zeros((), x.dtype))
    feas_in = (jnp.maximum(jnp.max(Q.G @ x - Q.g), 0.0) if J > 0
               else jnp.zeros((), x.dtype))
    feas_bd = jnp.maximum(
        jnp.max(jnp.maximum(Q.d - x, 0.0)), jnp.max(jnp.maximum(x - Q.u, 0.0))
    )
    # stationarity on the free coordinates: the gradient projected onto the
    # null space of the working equalities must vanish
    grad = Q.V @ x + Q.q
    fm = (Sx == IN).astype(x.dtype)
    AG = jnp.concatenate([Q.A, Q.G], axis=0) if J > 0 else Q.A
    act = (jnp.concatenate(
        [jnp.ones((M,), bool), res.S[N:] == EO]
    ) if J > 0 else jnp.ones((M,), bool)).astype(x.dtype)
    Ap = AG * (act[:, None] * fm[None, :])
    gf = grad * fm
    # least-squares multipliers through the normal equations (+ tiny ridge),
    # then SIGN-projected: with y = -lam the stationarity reads
    # grad + AG'y = gamma, and optimality demands y >= 0 on active
    # inequality rows plus gamma >= 0 at DN / <= 0 at UP pins. Without the
    # projection (and the pinned-coordinate check below) a suboptimal vertex
    # — e.g. every variable pinned, fm all zero — reported stat = 0 and
    # masqueraded as optimal.
    R = AG.shape[0]
    ineq_row = (jnp.arange(R) >= M)
    if R > 0:
        Mn = Ap @ Ap.T + 1e-12 * jnp.eye(R, dtype=x.dtype)
        lam = jnp.linalg.solve(Mn, Ap @ gf)
        lam = jnp.where(ineq_row, jnp.minimum(lam, 0.0), lam)  # y_ineq >= 0
        stat_free = jnp.max(jnp.abs(gf - Ap.T @ lam) * fm)
        gamma_b = grad - AG.T @ (act * lam)
    else:
        stat_free = jnp.max(jnp.abs(gf))
        gamma_b = grad
    viol_dn = jnp.max(jnp.maximum(-gamma_b, 0.0) * (Sx == DN))
    viol_up = jnp.max(jnp.maximum(gamma_b, 0.0) * (Sx == UP))
    stat = jnp.maximum(stat_free, jnp.maximum(viol_dn, viol_up))
    comp = (jnp.max(jnp.abs((Q.g - Q.G @ x)) * (res.S[N:] == EO))
            if J > 0 else jnp.zeros((), x.dtype))
    if J > 0 and res.lam is not None:
        # two-sided complementarity: an INACTIVE (OE) row carrying a
        # spurious attached multiplier was invisible to the EO-tightness
        # check above — the classic product |mu_j * slack_j| catches it
        # (near-zero on legitimately-active rows where slack ~ 0)
        mu = res.lam[M:]
        comp = jnp.maximum(comp, jnp.max(jnp.abs(mu * (Q.g - Q.G @ x))))
    it = jnp.maximum(res.status, 0)
    return KKTReport(feas_eq, feas_in, feas_bd, stat, comp, it,
                     res.status > 0)


import functools


@functools.partial(jax.jit, static_argnames=("batched",))
@highest_matmul
def kkt_report(Q: QP, res: Result, batched: bool = False) -> KKTReport:
    """Per-instance optimality diagnostics, device-resident (one jitted
    call — eager dispatch would cost dozens of host round trips through the
    dev tunnel per report).

    With ``batched=True`` every leaf of ``Q``/``res`` carries a leading batch
    axis and the report fields come back batched.
    """
    if batched:
        return jax.vmap(_one_report)(Q, res)
    return _one_report(Q, res)


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a solve region for TensorBoard:

    >>> with trace("/tmp/ssqp_trace"):
    ...     res = solve_qp_batch(Qb, settings)
    ...     jax.block_until_ready(res)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
