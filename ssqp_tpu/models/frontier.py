"""Efficient-frontier portfolio model family — the reference's headline
workload (reference: examples/SSQPspeed.jl protocol; QP frontier constructors
types.jl:303-339).

Given a covariance V, expected returns r and portfolio constraints, the
frontier is traced either

  * L-parameterized: ``min 1/2 z'Vz - L r'z`` for a grid of risk-tolerance
    values L (types.jl:303-319), or
  * mu-parameterized: ``min 1/2 z'Vz  s.t. r'z = mu`` for a grid of target
    returns (types.jl:321-339).

Two TPU execution strategies:

  * :func:`frontier_batch_sweep` — all grid points solved concurrently via
    `vmap` (one cold Phase-1 each). Maximum parallelism; best on large grids.
  * :func:`frontier_warm_sweep` — `lax.scan` along the grid carrying the
    previous optimum's (S, x) as a warm start (the reference's killer trick
    for speed, SURVEY.md §7 "hard parts"): adjacent frontier points share
    most of their active set, so each solve takes a handful of iterations.
    Sequential in L but each step is nearly free; best for long fine grids.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ssqp_tpu.solvers.phase1 import init_qp_traced
from ssqp_tpu.solvers.ssqp import solve_qp_loop
from ssqp_tpu.types import QP, Result, Settings
from ssqp_tpu.utils.precision import highest_matmul


class FrontierResult(NamedTuple):
    x: jax.Array  # (B, N) weights per grid point
    S: jax.Array  # (B, N+J) statuses
    status: jax.Array  # (B,) solver status codes
    ret: jax.Array  # (B,) expected return r'x
    risk: jax.Array  # (B,) sqrt(x'Vx)


def _with_q(Q: QP, q) -> QP:
    return QP(Q.V, Q.A, Q.G, q, Q.b, Q.g, Q.d, Q.u, Q.N, Q.M, Q.J, Q.mc)


def _with_mu_row(Q: QP, rets, mu) -> QP:
    """Template with the return row ``r'z = mu`` appended to A and a zero
    objective (the mu-parameterized frontier constructor, reference
    QP(mu, P), types.jl:321-339) — the single traced twin of
    types.py::qp_frontier_mu, shared by the cold and warm mu-sweeps."""
    dtype = Q.V.dtype
    A = jnp.concatenate([Q.A, rets[None, :].astype(dtype)], axis=0)
    b = jnp.concatenate([Q.b, jnp.reshape(jnp.asarray(mu, dtype), (1,))])
    return QP(Q.V, A, Q.G, jnp.zeros((Q.N,), dtype), b, Q.g, Q.d, Q.u,
              Q.N, Q.M + 1, Q.J, Q.mc)


def _stats(Q: QP, rets, x):
    ret = x @ rets
    risk = jnp.sqrt(jnp.maximum(jnp.einsum("...i,ij,...j->...", x, Q.V, x), 0.0))
    return ret, risk


@partial(jax.jit, static_argnames=("settings",))
@highest_matmul
def frontier_batch_sweep(Q: QP, rets, lams, settings: Settings) -> FrontierResult:
    """Solve every L-grid point concurrently (vmap, cold starts).

    ``Q`` is the constraint template (its q field is ignored); ``rets`` the
    expected-return vector; ``lams`` the (B,) risk-tolerance grid.
    """
    from ssqp_tpu.solvers.ssqp import solve_qp_auto

    dtype = Q.V.dtype
    lams = jnp.asarray(lams, dtype)
    rets = jnp.asarray(rets, dtype)
    qb = -lams[:, None] * rets[None, :]

    def one(qi):
        return solve_qp_auto(_with_q(Q, qi), settings)

    res = jax.vmap(one)(qb)
    ret, risk = _stats(Q, rets, res.x)
    return FrontierResult(res.x, res.S, res.status, ret, risk)


@partial(jax.jit, static_argnames=("settings", "waves"))
@highest_matmul
def frontier_waves_sweep(Q: QP, rets, lams, settings: Settings,
                         waves: int = 8) -> FrontierResult:
    """Wave-parallel warm sweep — the middle ground between
    :func:`frontier_batch_sweep` (all-cold vmap, maximum parallelism, no
    warm starts) and :func:`frontier_warm_sweep` (sequential scan, maximum
    warm reuse, B steps of latency): a strided coarse wave solves cold,
    the remaining waves warm-start from grid neighbors
    (parallel/batch.py::solve_qp_batch_waves — the headline protocol,
    ~1.35x the cold batch at N=256). ``len(lams)`` must be divisible by
    ``waves``; the grid should be sorted so neighbors are related.
    """
    from ssqp_tpu.parallel.batch import solve_qp_batch_waves

    dtype = Q.V.dtype
    lams = jnp.asarray(lams, dtype)
    rets = jnp.asarray(rets, dtype)
    Qb = _with_q(Q, -lams[:, None] * rets[None, :])
    res = solve_qp_batch_waves(
        Qb, settings, ("V", "A", "G", "b", "g", "d", "u"), waves=waves)
    ret, risk = _stats(Q, rets, res.x)
    return FrontierResult(res.x, res.S, res.status, ret, risk)


def _warm_step(Q: QP, settings: Settings, st1, mk):
    """Build the scan step shared by the warm L- and mu-sweeps: warm S-loop
    from the carried (S, x); on failure, a full cold re-solve of that point
    (guess + Phase-1 + fast/exact passes) under `lax.cond`, so one bad grid
    point neither stalls the sweep nor silently degrades the carried warm
    state (it used to carry the last good state forward without retrying).
    ``mk`` maps the scanned grid scalar to the point's QP (built inside the
    step — scanning pre-built QPs would replicate V per grid point)."""
    from ssqp_tpu.solvers.ssqp import solve_qp_auto_core

    N, J = Q.N, Q.J

    def step(carry, inputs):
        Sx, Se, x = carry
        Qi = mk(inputs)
        res = solve_qp_loop(Qi, Sx, Se, x, settings, pre_status=st1)
        res = jax.lax.cond(
            res.status > 0,
            lambda r: r,
            lambda _: solve_qp_auto_core(Qi, settings),
            res,
        )
        ok = res.status > 0
        Sxn = jnp.where(ok, res.S[:N], Sx).astype(jnp.int8)
        Sen = (jnp.where(ok, res.S[N:], Se).astype(jnp.int8)
               if J > 0 else Se)
        xn = jnp.where(ok, res.x, x)
        return (Sxn, Sen, xn), (res.x, res.S, res.status)

    return step


@partial(jax.jit, static_argnames=("settings",))
@highest_matmul
def frontier_warm_sweep(Q: QP, rets, lams, settings: Settings) -> FrontierResult:
    """Sweep the L grid sequentially, warm-starting each point from the
    previous optimum's (S, x) (reference protocol, SSQPspeed.jl:128-163).

    A failed point is re-solved cold (Phase-1 + full strategy) before the
    sweep moves on; only if that also fails does the carry keep the last
    good state.
    """
    N, J = Q.N, Q.J
    dtype = Q.V.dtype
    lams = jnp.asarray(lams, dtype)
    rets = jnp.asarray(rets, dtype)

    q0 = -lams[0] * rets
    x0, Sx0, Se0, st1 = init_qp_traced(_with_q(Q, q0), settings)

    step = _warm_step(Q, settings, st1, lambda lam: _with_q(Q, -lam * rets))
    (_, _, _), (xs, Ss, sts) = jax.lax.scan(step, (Sx0, Se0, x0), lams)
    ret, risk = _stats(Q, rets, xs)
    return FrontierResult(xs, Ss, sts, ret, risk)


@partial(jax.jit, static_argnames=("settings",))
@highest_matmul
def frontier_mu_sweep(Q: QP, rets, mus, settings: Settings) -> FrontierResult:
    """mu-parameterized frontier: ``min 1/2 z'Vz s.t. r'z = mu`` per grid
    point (reference QP(mu, P), types.jl:321-339), solved concurrently with
    the return row appended to A and only b varying across the batch."""
    from ssqp_tpu.solvers.ssqp import solve_qp_auto

    dtype = Q.V.dtype
    rets = jnp.asarray(rets, dtype)

    def one(mu):
        return solve_qp_auto(_with_mu_row(Q, rets, mu), settings)

    res = jax.vmap(one)(jnp.asarray(mus, dtype))
    ret, risk = _stats(Q, rets, res.x)
    return FrontierResult(res.x, res.S, res.status, ret, risk)


@partial(jax.jit, static_argnames=("settings",))
@highest_matmul
def frontier_mu_warm_sweep(Q: QP, rets, mus, settings: Settings) -> FrontierResult:
    """mu-parameterized sweep with scan-carry warm starts — the second half
    of the reference's warm protocol (SSQPspeed.jl:190-227; the L-sweep
    already had it).

    The carried x from the previous grid point violates the new return row
    ``r'z = mu`` by (mu_prev - mu); the first S-loop iteration's KKT solve
    re-solves the free coordinates against the new right-hand side, which
    restores feasibility exactly (the active set, which is what the warm
    start actually transfers, drifts slowly along the frontier). A point the
    warm solve cannot crack is re-solved cold (Phase-1 included — unlike
    the L-sweep, feasibility here DEPENDS on mu, so a per-point Phase-1 is
    the only sound fallback; a genuinely unachievable mu stays status 0).
    """
    dtype = Q.V.dtype
    mus = jnp.asarray(mus, dtype)
    rets = jnp.asarray(rets, dtype)
    Qt = _with_mu_row(Q, rets, mus[0])

    def mk(mu):
        return _with_mu_row(Q, rets, mu)

    x0, Sx0, Se0, st1 = init_qp_traced(mk(mus[0]), settings)
    step = _warm_step(Qt, settings, st1, mk)
    (_, _, _), (xs, Ss, sts) = jax.lax.scan(step, (Sx0, Se0, x0), mus)
    ret, risk = _stats(Q, rets, xs)
    return FrontierResult(xs, Ss, sts, ret, risk)
