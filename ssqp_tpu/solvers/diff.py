"""Differentiable QP solves — implicit differentiation at the optimum.

New capability beyond the reference (StatusSwitchingQP.jl has no AD story):
the solution map ``theta -> x*(theta)`` of

    min (1/2) x'Vx + q'x   s.t.  Ax = b, Gx <= g, d <= x <= u

made differentiable w.r.t. EVERY problem datum (V, q, A, b, G, g, d, u), so
the solver composes with ``jax.grad``/``jax.jacobian``/``jax.vmap`` as a
layer inside larger TPU programs (end-to-end trained allocation layers,
frontier sensitivities, calibration of risk parameters). This is the
OptNet / implicit-function-theorem recipe done the JAX-native way:

  1. **identify** — run the full (nondifferentiable) status-switching solver
     on ``stop_gradient``-ed data to obtain the optimal statuses ``S*``. No
     gradients flow into the `lax.while_loop`s.
  2. **re-solve** — with the active set FIXED at ``S*``, the optimum solves
     ONE equality-constrained KKT system (the same mask-padded block
     elimination as ops/kkt.py::kkt_solve, reference SSQP.jl:322-332) built
     from the ORIGINAL (differentiable) data: plain XLA Cholesky algebra
     that JAX forward- and reverse-differentiates through its built-in
     rules. Bound pins enter as ``where(S==DN, d, u)``, so gradients flow
     into the box bounds too.

At a nondegenerate optimum (strict complementarity) the active set is
locally constant in ``theta``, so this derivative is exact; at degenerate
points it returns a valid directional/subgradient choice — the standard
contract of active-set implicit differentiation.

The re-solve is one extra padded KKT solve per instance OUTSIDE the solver
loops (batched XLA Cholesky is only pathological *inside* `lax.while_loop`,
see ops/kkt.py), so the layer costs one factorization on top of the solve.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve, cholesky as _chol

from ssqp_tpu.types import DN, EO, IN, OE, UP, QP, Result, Settings
from ssqp_tpu.utils.precision import highest_matmul


def _spd(A, rhs):
    """Differentiable SPD solve (XLA Cholesky — NOT ops/kkt.py::spd_solve,
    whose custom_vmap/Pallas dispatch carries no AD rules)."""
    L = _chol(A, lower=True)
    return cho_solve((L, True), rhs)


def kkt_resolve(Q: QP, Sx, Se, settings: Settings):
    """Differentiable fixed-active-set KKT re-solve at statuses (Sx, Se).

    Mirrors ops/kkt.py::kkt_solve's mask-padded block elimination (reference
    SSQP.jl:322-332) with differentiable primitives. The redundancy purge
    (a discrete row selection) runs on ``stop_gradient``-ed data — its keep
    mask is piecewise constant in theta, exactly like the active set.

    Returns (x, lam, gamma): the optimum, the (M+J,) working-row multipliers
    (zero on inactive/purged rows — stationarity holds with zero there
    because purged rows are linear combinations of kept ones), and the
    reduced gradient. All three are differentiable w.r.t. Q's leaves.
    """
    dtype = Q.V.dtype
    N, M, J = Q.N, Q.M, Q.J
    R = M + J

    free = jax.lax.stop_gradient(Sx == IN)
    fm = free.astype(dtype)
    bm = 1.0 - fm
    # pinned coordinates take their bound value: d on DN, u on UP — this is
    # where du-gradients enter the solution map. A status pinned at an
    # infinite bound cannot occur at a valid optimum; guard it anyway so a
    # corrupt status vector cannot poison gradients with inf (see
    # solve_qp_diff's where-grad note).
    zB = jnp.where(Sx == DN, Q.d, jnp.where(Sx == UP, Q.u, 0.0)) * bm
    zB = jnp.where(jnp.isfinite(zB), zB, 0.0)

    c_full = Q.V @ zB + Q.q
    cp = fm * c_full
    Vp = Q.V * (fm[:, None] * fm[None, :]) + jnp.diag(bm)

    if R == 0:
        alpha_f = -_spd(Vp, cp)
        x = fm * alpha_f + zB
        lam = jnp.zeros((0,), dtype)
        gamma = Q.V @ x + Q.q
        return x, lam, gamma

    AG = jnp.concatenate([Q.A, Q.G], axis=0)
    bg = jnp.concatenate([Q.b, Q.g])
    act = (
        jnp.concatenate([jnp.ones((M,), bool), Se == EO])
        if J > 0
        else jnp.ones((M,), bool)
    )
    bE = bg - AG @ zB

    # discrete keep-mask: same purge flavor selection as the S-loop
    # (shared dispatch, ops/masked_gj.py::select_purge) on
    # non-differentiating copies
    from ssqp_tpu.ops.masked_gj import select_purge

    purge = select_purge(settings.pivot, R)
    sg = jax.lax.stop_gradient
    keep, _, _ = purge(sg(AG * fm[None, :]), sg(bE), act, settings.tol)
    keep = jax.lax.stop_gradient(keep)
    km = keep.astype(dtype)

    Ap = AG * (km[:, None] * fm[None, :])
    bp = km * bE

    rhs = jnp.concatenate([cp[:, None], Ap.T], axis=1)
    sol = _spd(Vp, rhs)
    w, mT = sol[:, 0], sol[:, 1:]
    C = Ap @ mT
    C = (C + C.T) / 2 + jnp.diag(1.0 - km)
    alphaL = -_spd(C, Ap @ w + bp)
    alpha_f = -(mT @ alphaL + w)

    x = fm * alpha_f + zB
    lam = km * alphaL
    gamma = Q.V @ x + Q.q + AG.T @ lam
    return x, lam, gamma


@highest_matmul
def solve_qp_diff(
    Q: QP,
    settings: Optional[Settings] = None,
    settings_lp: Optional[Settings] = None,
) -> Result:
    """Solve a QP with a solution differentiable w.r.t. the problem data.

    Drop-in for :func:`ssqp_tpu.solve_qp` inside differentiated/jitted
    programs: identification runs the full three-stage solver (PDAS guess +
    Phase-1 + S-loop) on ``stop_gradient``-ed data, then the returned
    ``x``/``lam``/``gamma`` come from one differentiable fixed-active-set
    KKT re-solve on the live data (see :func:`kkt_resolve`). ``vmap`` over
    instance batches works; failed instances (status <= 0) pass the solver's
    own output through untouched (their "gradient" is zero).

    Example — risk-aversion sensitivity of a frontier allocation::

        def alloc(lam):
            Qi = dataclasses.replace(Q, q=-lam * mu)
            return solve_qp_diff(Qi, settings).x
        jax.jacfwd(alloc)(0.5)        # dx*/dlambda, exact under strict
                                      # complementarity

    and the envelope theorem falls out: ``jax.grad`` of the optimal VALUE
    w.r.t. ``q`` equals ``x*`` (tests/test_diff.py pins both).
    """
    from ssqp_tpu.solvers.ssqp import solve_qp, solve_qp_auto

    if settings is None:
        settings = Settings.for_dtype(Q.V.dtype)
    if Q.mc <= 0:  # invalid model — same contract as solve_qp (SSQP.jl:226)
        return solve_qp(Q, settings=settings, settings_lp=settings_lp)
    res = solve_qp_auto(jax.lax.stop_gradient(Q), settings, settings_lp)
    ok = res.status > 0
    # Failed instances must not poison gradients: jnp.where's reverse rule
    # multiplies the ZERO cotangent of the untaken branch by that branch's
    # derivative, so a NaN/inf from re-solving a garbage active set would
    # still propagate (0 * nan = nan). Sanitize the statuses of failed
    # instances to the benign all-free set (finite for PD V) before the
    # re-solve; their outputs are then discarded by the where below and
    # their gradient contribution is a true zero.
    Sx = jnp.where(ok, res.S[: Q.N], IN).astype(res.S.dtype)
    Se = jnp.where(ok, res.S[Q.N :], OE).astype(res.S.dtype)
    x, lam, gamma = kkt_resolve(Q, Sx, Se, settings)
    x = jnp.where(ok, x, res.x)
    if res.lam is not None:
        lam = jnp.where(ok, lam, res.lam)
        gamma = jnp.where(ok, gamma, res.gamma)
    return Result(x, res.S, res.status, lam, gamma)


def qp_value(Q: QP, x) -> jax.Array:
    """Objective value ``(1/2) x'Vx + q'x`` (differentiable convenience)."""
    return 0.5 * x @ (Q.V @ x) + Q.q @ x
