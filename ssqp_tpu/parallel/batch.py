"""Instance batching: `vmap` over QP/LP problem batches.

The reference solves one problem per call on one CPU core; the TPU-native
scaling dimension is the *instance batch* (SURVEY.md §5 "long-context" row:
the scaling axes here are N, M+J, and the number of QP instances). A batch is
a QP/LP pytree whose array leaves carry a leading batch axis; leaves may also
be shared across the batch (e.g. one covariance V, many linear terms q for an
efficient-frontier sweep) by marking their axis as None.

Everything stays fixed-shape, so one compilation serves the whole batch and
convergence is per-instance via the solver's internal done flags (a finished
instance keeps its state frozen while `lax.while_loop` drains stragglers).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ssqp_tpu.types import LP, QP, Result, Settings
from ssqp_tpu.utils.precision import highest_matmul


def qp_axes(Q: QP, shared=()) -> QP:
    """Build a `vmap` in_axes pytree for a QP batch.

    ``shared`` names fields replicated across the batch (no leading batch
    axis), e.g. ``("V", "A", "b")`` for a frontier sweep with varying q.
    """
    ax = {f: (None if f in shared else 0) for f in
          ("V", "A", "G", "q", "b", "g", "d", "u")}
    return QP(ax["V"], ax["A"], ax["G"], ax["q"], ax["b"], ax["g"],
              ax["d"], ax["u"], Q.N, Q.M, Q.J, Q.mc)


def lp_axes(P: LP, shared=()) -> LP:
    """`vmap` in_axes pytree for an LP batch (see :func:`qp_axes`)."""
    ax = {f: (None if f in shared else 0) for f in
          ("c", "A", "b", "G", "g", "d", "u")}
    return LP(ax["c"], ax["A"], ax["b"], ax["G"], ax["g"], ax["d"], ax["u"],
              P.N, P.M, P.J, P.mc)


@partial(jax.jit, static_argnames=("settings", "shared"))
@highest_matmul
def solve_qp_batch(Q: QP, settings: Settings, shared: tuple = ()) -> Result:
    """Solve a batch of QPs (Phase-1 + S-loop per instance, all on-device).

    Batched analogue of the reference's one-call-per-problem `solveQP`
    (SSQP.jl:224); per-instance status codes come back in ``Result.status``.
    """
    from ssqp_tpu.solvers.ssqp import solve_qp_auto

    ax = qp_axes(Q, shared)
    return jax.vmap(lambda p: solve_qp_auto(p, settings), in_axes=(ax,))(Q)


@partial(jax.jit, static_argnames=("settings", "shared"))
@highest_matmul
def solve_qp_batch_warm(
    Q: QP, Sx0, Se0, x0, settings: Settings, shared: tuple = ()
) -> Result:
    """Warm-started batch solve: per-instance status vectors + feasible points
    (batched analogue of solveQP(Q, S, x0), SSQP.jl:237) — the reference's
    frontier-sweep trick, where adjacent instances reuse the previous active
    set."""
    from ssqp_tpu.solvers.ssqp import solve_qp_warm2

    ax = qp_axes(Q, shared)
    return jax.vmap(
        lambda p, s, e, x: solve_qp_warm2(p, s, e, x, settings),
        in_axes=(ax, 0, 0, 0),
    )(Q, Sx0, Se0, x0)


@partial(jax.jit, static_argnames=("settings", "shared", "minimize"))
@highest_matmul
def solve_lp_batch(
    P: LP, settings: Settings, shared: tuple = (), minimize: bool = True
) -> Result:
    """Solve a batch of LPs by the two-phase simplex (SimplexLP per instance)."""
    from ssqp_tpu.solvers.lp import simplex_lp_traced

    ax = lp_axes(P, shared)
    return jax.vmap(
        lambda p: simplex_lp_traced(p, settings, minimize), in_axes=(ax,)
    )(P)


@partial(jax.jit, static_argnames=("settings", "shared"))
@highest_matmul
def solve_lp_batch_cclp(P: LP, settings: Settings, shared: tuple = ()) -> Result:
    """Solve a batch of LPs by the least-index criss-cross method — the
    batched analogue of the reference's exported `solveLP` (CCLP.jl:289).
    No Phase-1: each instance starts from its projected-reduced-cost basis,
    so infeasible instances exit with status 0 without a feasibility pass."""
    from ssqp_tpu.solvers.cclp import solve_lp_traced

    ax = lp_axes(P, shared)
    return jax.vmap(lambda p: solve_lp_traced(p, settings), in_axes=(ax,))(P)


@partial(jax.jit, static_argnames=("settings", "shared"))
@highest_matmul
def _solve_qp_batch_nodual(Q: QP, settings: Settings, shared: tuple = ()):
    """Batched auto solve WITHOUT dual attachment — the search stage of the
    refined pipeline, where lam/gamma would be computed per instance (an
    (M+J)-sized normal-equations Cholesky each) only to be discarded."""
    from ssqp_tpu.solvers.ssqp import solve_qp_auto_core

    ax = qp_axes(Q, shared)
    return jax.vmap(
        lambda p: solve_qp_auto_core(p, settings), in_axes=(ax,)
    )(Q)


def solve_qp_batch_refined(
    Q: QP,
    *,
    settings: Optional[Settings] = None,
    iters: int = 2,
    search_dtype=None,
    shared: tuple = (),
) -> Result:
    """Batched high-accuracy solve: fast-dtype active-set search + per-instance
    iterative refinement of the final KKT system against the full-precision
    data (the BigFloat-tier recipe of solvers/refine.py, vmapped).

    ``search_dtype=jnp.float32`` on a float64 batch runs the combinatorial
    search at TPU speed and recovers f64 accuracy in the refinement sweeps.
    Dual certificates are not derived (the search stage skips the
    per-instance dual attachment entirely — its lam/gamma would be discarded
    by the refinement); call ``recover_duals`` on the output if needed.
    """
    from ssqp_tpu.solvers.refine import refine_result

    settings = settings or Settings.for_dtype(Q.V.dtype)
    if search_dtype is not None and jnp.dtype(search_dtype) != Q.V.dtype:
        Qs = jax.tree.map(lambda a: a.astype(search_dtype), Q)
        s_search = Settings.for_dtype(search_dtype)
    else:
        Qs, s_search = Q, settings
    res = _solve_qp_batch_nodual(Qs, s_search, shared=shared)
    res = Result(res.x.astype(Q.V.dtype), res.S, res.status)
    ax = qp_axes(Q, shared)
    return jax.vmap(
        lambda p, r: refine_result(p, r, settings, iters, with_duals=False),
        in_axes=(ax, Result(0, 0, 0)),
    )(Q, res)


def stack_qps(qps) -> QP:
    """Stack a list of same-shape QPs into one batched QP pytree."""
    q0 = qps[0]
    leaves = [jnp.stack([getattr(q, f) for q in qps])
              for f in ("V", "A", "G", "q", "b", "g", "d", "u")]
    return QP(*leaves, q0.N, q0.M, q0.J, q0.mc)


def frontier_batch(Q: QP, lambdas) -> tuple[QP, tuple]:
    """Batch the L-parameterized frontier family ``min 1/2 z'Vz - L q'z``
    (reference QP(P, L), types.jl:303-319) over a vector of L values.

    Returns (batched QP, shared fields) ready for :func:`solve_qp_batch`.
    """
    lam = jnp.asarray(lambdas, Q.V.dtype)
    qb = -lam[:, None] * Q.q[None, :]
    Qb = QP(Q.V, Q.A, Q.G, qb, Q.b, Q.g, Q.d, Q.u, Q.N, Q.M, Q.J, Q.mc)
    return Qb, ("V", "A", "G", "b", "g", "d", "u")
