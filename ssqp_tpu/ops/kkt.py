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
from jax.custom_batching import custom_vmap
from jax.scipy.linalg import cho_solve, cholesky as _chol


def _spd_solve_xla(A, rhs):
    L = _chol(A, lower=True)
    return cho_solve((L, True), rhs)


@custom_vmap
def spd_solve(A, rhs):
    """Solve the SPD system ``A x = rhs`` (rhs may have trailing columns).

    Unbatched: XLA Cholesky. Batched (under `vmap`, i.e. the instance-batched
    solver loops): dispatched to the fused Pallas factorize-and-solve kernel —
    XLA's batched `cholesky` collapses ~500x inside `lax.while_loop` on TPU
    (see ops/pallas_chol.py), which made the batched KKT solve the entire
    iteration cost before this dispatch.
    """
    return _spd_solve_xla(A, rhs)


@spd_solve.def_vmap
def _spd_solve_vmap(axis_size, in_batched, A, rhs):
    A_b, r_b = in_batched
    if not A_b:
        A = jnp.broadcast_to(A, (axis_size,) + A.shape)
    if not r_b:
        rhs = jnp.broadcast_to(rhs, (axis_size,) + rhs.shape)
    N = A.shape[-1]
    import os

    # honor an explicit CPU default device (e.g. a CPU audit solve inside a
    # TPU process): default_backend() stays "tpu" there, but dispatching the
    # Pallas kernel to CPU arrays fails
    dd = jax.config.jax_default_device
    on_cpu = dd is not None and getattr(dd, "platform", None) == "cpu"
    use_pallas = (
        jax.default_backend() == "tpu"
        and not on_cpu
        and A.dtype == jnp.float32
        and N >= 16
        and not os.environ.get("SSQP_NO_PALLAS")
    )
    if use_pallas:
        from ssqp_tpu.ops.pallas_chol import chol_solve_batch

        squeeze = rhs.ndim == 2
        r3 = rhs[..., None] if squeeze else rhs
        out = chol_solve_batch(A, r3)
        out = out[..., 0] if squeeze else out
    else:
        out = jax.vmap(_spd_solve_xla)(A, rhs)
    return out, True


class KKTResult(NamedTuple):
    alpha: jax.Array  # (N,) candidate minimizer: free coords solved, bound = z
    p: jax.Array  # (N,) step direction alpha - z (zero on bound coords)
    alphaL: jax.Array  # (R,) working-row multipliers (zero on non-kept rows)
    gamma: jax.Array  # (N,) reduced gradient at alpha (meaningful on bound coords)
    ok: jax.Array  # () bool — factorization produced finite results


def _vp_apply(V, fm, x):
    """Apply the mask-padded operator ``Vp = f f' ⊙ V + diag(1-f)`` without
    materializing it. ``x`` is (N, K); the V product is a shared-matrix GEMM
    (MXU), which is the whole point: no (N, N) build, no factorization."""
    bmx = (1.0 - fm)[:, None] * x
    return fm[:, None] * (V @ (x * fm[:, None])) + bmx


def _vp_cg_xla(V, fm, B, dinv, tol2, iters, X0):
    """XLA while-loop CG on ``Vp X = B`` (multi-rhs) from warm start ``X0``.
    Returns (X, final squared residual per column)."""
    r = B - _vp_apply(V, fm, X0)
    zp = r * dinv[:, None]
    p = zp
    rz = jnp.sum(r * zp, axis=0)

    def body(carry):
        i, X, r, p, rz = carry
        alive = jnp.sum(r * r, axis=0) > tol2
        Ap = _vp_apply(V, fm, p)
        pAp = jnp.sum(p * Ap, axis=0)
        alpha = jnp.where(alive & (pAp > 0), rz / jnp.maximum(pAp, 1e-30), 0.0)
        X = X + alpha[None, :] * p
        r = r - alpha[None, :] * Ap
        zn = r * dinv[:, None]
        rzn = jnp.sum(r * zn, axis=0)
        beta = jnp.where(alive, rzn / jnp.maximum(rz, 1e-30), 0.0)
        p = zn + beta[None, :] * p
        return i + 1, X, r, p, rzn

    def cond(carry):
        i, X, r, p, rz = carry
        return (i < iters) & jnp.any(jnp.sum(r * r, axis=0) > tol2)

    _, X, r, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), X0, r, p, rz)
    )
    return X, jnp.sum(r * r, axis=0)


@custom_vmap
def _vp_cg(V, fm, B, dinv, tol2, iters, X0):
    """CG core with a batching rule: instance-batched calls with a SHARED
    operator can dispatch to the fused Pallas kernel (ops/pallas_cg.py),
    which keeps the CG state VMEM-resident across iterations. Measured at
    the headline shape (N=256, batch 8192, 64 cold iterations) the fused
    kernel is PARITY with the XLA loop (7.0 vs 6.6 ms per solve — XLA
    already fuses the elementwise chain and the loop is MXU-bound, not
    HBM-bound as the per-iteration state sizes suggested), so the Pallas
    path is opt-IN via SSQP_PALLAS_CG=1 rather than the default."""
    return _vp_cg_xla(V, fm, B, dinv, tol2, iters, X0)


@_vp_cg.def_vmap
def _vp_cg_vmap(axis_size, in_batched, V, fm, B, dinv, tol2, iters, X0):
    import os

    V_b, fm_b, B_b, dinv_b, tol2_b, it_b, X0_b = in_batched
    dd = jax.config.jax_default_device
    on_cpu = dd is not None and getattr(dd, "platform", None) == "cpu"
    # NOTE: the SSQP_PALLAS_CG / SSQP_NO_PALLAS env vars are read at TRACE
    # time and baked into the jit-cached program — toggling them after the
    # first dispatch of a given shape has no effect until caches are cleared
    # (jax.clear_caches()). Same for SSQP_NO_PALLAS in spd_solve above.
    use_pallas = (
        jax.default_backend() == "tpu"
        and not on_cpu
        and V.dtype == jnp.float32
        and not V_b  # shared operator only: the batch flattens into rows
        and not it_b
        and V.shape[0] <= 768  # the double-buffered V block must fit VMEM
        and bool(os.environ.get("SSQP_PALLAS_CG"))
        and not os.environ.get("SSQP_NO_PALLAS")
    )
    bcast = lambda x, b: x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)
    if use_pallas:
        from ssqp_tpu.ops.pallas_cg import cg_padded_batch

        X, rr = cg_padded_batch(
            V, bcast(fm, fm_b), bcast(B, B_b), bcast(dinv, dinv_b),
            bcast(tol2, tol2_b), iters, bcast(X0, X0_b),
        )
    else:
        axes = tuple(0 if b else None for b in
                     (V_b, fm_b, B_b, dinv_b, tol2_b, it_b, X0_b))
        X, rr = jax.vmap(_vp_cg_xla, in_axes=axes)(
            V, fm, B, dinv, tol2, iters, X0
        )
    return (X, rr), (True, True)


def _vp_pcg_xla(V, fm, B, W, tol2, iters, X0):
    """XLA while-loop PCG on ``Vp X = B`` with the shared-inverse
    preconditioner ``M^{-1} r = f.(W @ (f.r)) + (1-f).r`` (W ~= V^{-1},
    hoisted out of `vmap` on shared-V batches). Each iteration costs TWO
    shared GEMMs (operator + preconditioner) vs Jacobi's one — pays off only
    when it at least halves the iteration count (low pin fractions)."""
    prec = lambda r: fm[:, None] * (W @ (r * fm[:, None])) \
        + (1.0 - fm)[:, None] * r
    r = B - _vp_apply(V, fm, X0)
    z = prec(r)
    p = z
    rz = jnp.sum(r * z, axis=0)

    def body(carry):
        i, X, r, p, rz = carry
        alive = jnp.sum(r * r, axis=0) > tol2
        Ap = _vp_apply(V, fm, p)
        pAp = jnp.sum(p * Ap, axis=0)
        alpha = jnp.where(alive & (pAp > 0), rz / jnp.maximum(pAp, 1e-30), 0.0)
        X = X + alpha[None, :] * p
        r = r - alpha[None, :] * Ap
        zn = prec(r)
        rzn = jnp.sum(r * zn, axis=0)
        beta = jnp.where(alive, rzn / jnp.maximum(rz, 1e-30), 0.0)
        p = zn + beta[None, :] * p
        return i + 1, X, r, p, rzn

    def cond(carry):
        i, X, r, p, rz = carry
        return (i < iters) & jnp.any(jnp.sum(r * r, axis=0) > tol2)

    _, X, r, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), X0, r, p, rz)
    )
    return X, jnp.sum(r * r, axis=0)


def _vp_cheb_xla(V, fm, B, dinv, lo, hi, tol2, iters, X0):
    """Preconditioned Chebyshev semi-iteration on ``Vp X = B`` (multi-rhs).

    Unlike CG, the step scalars come from a fixed two-term recurrence on the
    spectral interval ``[lo, hi]`` of the Jacobi-preconditioned operator —
    NO per-column dot products. Each iteration is one shared GEMM plus two
    axpys; the only reduction left is the early-exit residual check in the
    loop cond (CG pays four: pAp, r'z, the alive mask, and the cond). The
    experiment targets the measured headline floor: the CG per-iteration cost
    at batch 8192 was shown precision- and HBM-layout-independent —
    structural VPU reduction + loop-sequencing work (see CLAUDE.md negative
    results) — which is exactly what this recurrence removes.

    Valid because headline batches share one V: by Cauchy interlacing every
    masked sub-operator's Jacobi-preconditioned spectrum lies inside the full
    matrix's ``[λmin, λmax]`` (the padded identity block contributes exactly
    1, and a Jacobi-scaled SPD matrix has unit trace-average so
    ``λmin <= 1 <= λmax``). Requires ``lo <= λmin``: the Chebyshev polynomial
    grows outside the interval, so the bound estimator applies a safety
    margin downward and callers keep the residual acceptance gate.

    Saad, Iterative Methods for Sparse Linear Systems, alg. 12.1 recurrence:
    ``rho_k = 1/(2 sigma - rho_{k-1})``, ``d_k = rho_k rho_{k-1} d_{k-1} +
    (2 rho_k / delta) z_k`` with ``sigma = theta/delta``.
    Returns (X, final squared residual per column).
    """
    dtype = B.dtype
    theta = (hi + lo) / 2.0
    delta = jnp.maximum((hi - lo) / 2.0, jnp.asarray(1e-30, dtype))
    sigma = theta / delta

    R = B - _vp_apply(V, fm, X0)
    Z = R * dinv[:, None]
    D = Z / theta
    rho0 = 1.0 / sigma

    def body(carry):
        i, X, R, D, rho = carry
        X = X + D
        R = R - _vp_apply(V, fm, D)
        Z = R * dinv[:, None]
        rho_n = 1.0 / (2.0 * sigma - rho)
        D = (rho_n * rho) * D + (2.0 * rho_n / delta) * Z
        return i + 1, X, R, D, rho_n

    def cond(carry):
        i, X, R, D, rho = carry
        return (i < iters) & jnp.any(jnp.sum(R * R, axis=0) > tol2)

    _, X, R, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), X0, R, D, jnp.asarray(rho0, dtype)),
    )
    return X, jnp.sum(R * R, axis=0)


def shared_jacobi_bounds(V, W=None, power_iters: int = 32):
    """One-time spectral interval of the Jacobi-scaled operator
    ``S = D^{-1/2} V D^{-1/2}`` for the Chebyshev solve, with safety margins.

    λmax: power iteration (Rayleigh quotient converges from below) capped by
    the Gershgorin row-sum bound (a GUARANTEED upper bound — overestimating
    λmax only slows Chebyshev, underestimating diverges it, so the cap keeps
    the unsafe direction impossible while the Rayleigh estimate keeps the
    interval tight).

    λmin: the unsafe direction is OVERestimating (the Chebyshev polynomial
    grows below ``lo``), and every convergent-from-inside estimator
    overestimates — so a 0.8 margin is applied. When ``W ~= V^{-1}`` is
    available (Settings.pdas_precond computes it anyway) the estimate runs
    as power iteration on ``D^{1/2} W D^{1/2}`` — the inverse's TOP
    eigenvalue ``1/λmin`` is well-separated precisely when λmin is small,
    where the estimate matters most. Fallback: shifted power iteration on
    ``hi·I - S``.

    All work is ~2·power_iters shared GEMVs — trivial one-time cost, and on
    shared-V instance batches it hoists out of `vmap` entirely.
    Returns scalars (lo, hi) with ``lo <= 1 <= hi`` enforced (the padded
    identity block always contributes eigenvalue 1).
    """
    dtype = V.dtype
    N = V.shape[0]
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    dg = jnp.maximum(jnp.diag(V), tiny)
    s = jnp.sqrt(dg)
    sinv = 1.0 / s

    def smv(v):
        return sinv * (V @ (sinv * v))

    def _power(mv, v0, n):
        def body(_, v):
            w = mv(v)
            return w / jnp.maximum(jnp.linalg.norm(w), tiny)
        v = jax.lax.fori_loop(0, n, body, v0)
        return jnp.vdot(v, mv(v)) / jnp.maximum(jnp.vdot(v, v), tiny)

    # Deterministic start with all-sign content so no extreme eigenvector is
    # orthogonal to it by symmetry.
    i = jnp.arange(N, dtype=dtype)
    v0 = jnp.cos(0.7 * i + 0.3) + 0.01
    v0 = v0 / jnp.linalg.norm(v0)

    ray_hi = _power(smv, v0, power_iters)
    gersh = jnp.max(jnp.sum(jnp.abs(sinv[:, None] * V * sinv[None, :]),
                            axis=1))
    hi = jnp.minimum(1.1 * ray_hi, gersh)
    hi = jnp.maximum(hi, jnp.asarray(1.0, dtype))

    if W is not None:
        def wmv(v):
            return s * (W @ (s * v))
        mu = _power(wmv, v0, power_iters)  # ~ 1/λmin, from below
        lo = 0.8 / jnp.maximum(mu, jnp.asarray(1.0, dtype))
    else:
        ray_shift = _power(lambda v: hi * v - smv(v), v0, power_iters)
        lo = 0.8 * jnp.maximum(hi - ray_shift, tiny)
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    lo = jnp.clip(lo, eps * hi, jnp.asarray(1.0, dtype))
    return lo, hi


def cg_solve_padded(V, fm, B, iters, rtol, X0=None, W=None, cheb=None):
    """Jacobi-preconditioned conjugate gradients on ``Vp X = B`` (multi-rhs).

    The padded operator's spectrum is {eigs of V_FF} ∪ {1}; with the usual
    PSD-plus-ridge objectives its condition number is small, so a few dozen
    MXU matvec iterations reach f32 accuracy — on TPU this beats any
    factorization: there is no N-sequential dependency at all, and batching
    over instances turns the matvecs into one big GEMM (shared-operator
    batches further dispatch to the fused VMEM-resident Pallas CG, see
    :func:`_vp_cg`). Iteration count is a TRACED bound (the fast/exact
    solver passes share one compiled body); per-column convergence freezing
    keeps extra iterations free of drift.

    ``X0`` warm-starts the iteration (columns already within tolerance do
    zero work thanks to the per-column convergence freeze) — used by the
    PDAS warm-start heuristic, whose successive rounds solve nearly the same
    system (solvers/ssqp.py::_guess_start).

    ``cheb=(lo, hi)`` switches the iteration to the preconditioned Chebyshev
    semi-iteration on that shared spectral interval (see
    :func:`shared_jacobi_bounds`) — reduction-free loop body; ``W`` switches
    to the shared-inverse PCG. Default is Jacobi-CG.

    Returns (X, rel_residual (K,)).
    """
    dinv = 1.0 / (fm * jnp.diag(V) + (1.0 - fm))
    # div-by-zero floor at the dtype's smallest normal, NOT an absolute
    # constant: flooring at 1e-30 under-reported the relative residual of
    # tiny-but-nonzero f64 columns by up to 1e5, letting badly-converged
    # solves through the ok gate (review finding, round 5); finfo.tiny
    # only engages for columns that are zero to machine resolution, whose
    # exact solution is 0 anyway.
    tiny = jnp.asarray(jnp.finfo(B.dtype).tiny, B.dtype)
    bnorm2 = jnp.maximum(jnp.sum(B * B, axis=0), tiny)
    tol2 = (rtol * rtol) * bnorm2

    if X0 is None:
        X = jnp.zeros_like(B)
    else:
        # A (near-)zero RHS column's exact solution is 0; a stale warm-start
        # there would leave a residual that can never reach rtol*||b|| and
        # burn the whole iteration budget, so such columns restart at 0.
        live = (jnp.sum(B * B, axis=0) > tiny)[None, :]
        X = jnp.where(live, X0, 0.0)
    if cheb is not None:
        lo, hi = cheb
        X, rr = _vp_cheb_xla(V, fm, B, dinv, lo, hi, tol2,
                             jnp.asarray(iters, jnp.int32), X)
    elif W is not None:
        X, rr = _vp_pcg_xla(V, fm, B, W, tol2,
                            jnp.asarray(iters, jnp.int32), X)
    else:
        X, rr = _vp_cg(V, fm, B, dinv, tol2,
                       jnp.asarray(iters, jnp.int32), X)
    rel = jnp.sqrt(rr / bnorm2)
    return X, rel


def kkt_solve_cg(V, q, AG, bg, z, free, keep, cg_iters, rtol,
                 ok_rtol=1e-3, ridge=0.0, x0=None, return_sol=False,
                 W=None, cheb=None):
    """CG variant of :func:`kkt_solve` — same contract, factorization-free.

    ``cg_iters``/``rtol`` may be traced. The (R, R) Schur system still uses a
    direct solve (R = M+J working rows is small in the target regime).

    ``ok_rtol`` is the acceptance gate on the CG relative residual: above it
    the result is flagged not-ok and the caller maps that to the reference's
    numerical-error path (settings-derived; see Settings.cg_ok_rtol).
    ``ridge`` adds a Tikhonov term to the Schur complement — used only by the
    warm-start heuristic, where the working set may momentarily leave the
    equality system rank-deficient (an exact solver run never passes ridge).
    ``x0`` warm-starts the multi-RHS CG ((N, 1+R) — the previous round's raw
    solution), and ``return_sol`` additionally returns that raw solution so
    a caller iterating on nearby systems can carry it (PDAS rounds).
    """
    dtype = V.dtype
    fm = free.astype(dtype)
    bm = 1.0 - fm
    km = keep.astype(dtype)

    zB = z * bm
    c_full = V @ zB + q
    cp = fm * c_full

    Ap = AG * (km[:, None] * fm[None, :])
    bp = km * (bg - AG @ zB)

    if AG.shape[0] == 0:
        sol, rel = cg_solve_padded(V, fm, cp[:, None], cg_iters, rtol, X0=x0,
                                   W=W, cheb=cheb)
        w = sol[:, 0]
        alphaL = jnp.zeros((0,), dtype)
        alpha_f = -w
        relmax = jnp.max(rel, initial=0.0)
    else:
        rhs = jnp.concatenate([cp[:, None], Ap.T], axis=1)
        sol, rel = cg_solve_padded(V, fm, rhs, cg_iters, rtol, X0=x0, W=W,
                                   cheb=cheb)
        relmax = jnp.max(rel, initial=0.0)
        w, mT = sol[:, 0], sol[:, 1:]
        C = Ap @ mT
        C = (C + C.T) / 2 + jnp.diag((1.0 - km) + ridge * km)
        rhsC = Ap @ w + bp
        alphaL = -spd_solve(C, rhsC)
        alpha_f = -(mT @ alphaL + w)
        # Schur residual gate (the (R,R) direct solve's accuracy was
        # previously unchecked — only the CG residual was).
        rS = C @ alphaL + rhsC
        sS = 1.0 + jnp.max(jnp.abs(rhsC), initial=0.0)
        relmax = jnp.maximum(relmax, jnp.max(jnp.abs(rS), initial=0.0) / sS)

    alpha = fm * alpha_f + bm * z
    p = fm * (alpha_f - z)
    gamma = V @ alpha + q + AG.T @ (km * alphaL)
    ok = (
        jnp.all(jnp.isfinite(alpha))
        & jnp.all(jnp.isfinite(alphaL))
        & (relmax < ok_rtol)
    )
    res = KKTResult(alpha, p, alphaL, gamma, ok)
    return (res, sol) if return_sol else res


def kkt_solve_rhs_cg(V, AG, free, keep, r1, r2, cg_iters, rtol,
                     ok_rtol=1e-3, ridge=0.0, x0=None, return_sol=False):
    """Solve the fixed-active-set KKT system with an EXPLICIT right-hand side
    (factorization-free block elimination, same padded operator as
    :func:`kkt_solve_cg`).

    The system is the one solvers/refine.py assembles densely
    (`_kkt_matrix`): with ``f`` the free mask and ``k`` the kept-row mask,

        free rows:      (V dx)_i + (AG' (k .* dl))_i = r1_i
        bound rows:      dx_i                        = r1_i
        kept rows:      (AG dx)_j                    = r2_j
        non-kept rows:   dl_j                        = r2_j

    Solving it against a HIGH-PRECISION residual of that same system is one
    iterative-refinement sweep — without ever materializing or factoring the
    (N+R)^2 matrix (the refined-tier throughput cliff the dense LU caused;
    reference accuracy bar: native-f64 solves, types.jl:390-408). The
    correction CG warm-starts from ``x0`` exactly like :func:`kkt_solve_cg`
    (the ``mT = Vp^{-1} Ap'`` columns are sweep-invariant, so sweeps 2+ only
    re-converge the single residual column).

    Returns ``(dx, dl, ok)`` (and the raw CG solution when ``return_sol``).
    """
    dtype = V.dtype
    fm = free.astype(dtype)
    bm = 1.0 - fm
    km = keep.astype(dtype)

    dxB = bm * r1  # bound coordinates are identity rows
    r1p = fm * (r1 - V @ dxB)
    r2p = km * (r2 - AG @ dxB) if AG.shape[0] else r2

    if AG.shape[0] == 0:
        sol, rel = cg_solve_padded(V, fm, r1p[:, None], cg_iters, rtol, X0=x0)
        dxF = sol[:, 0]
        dl = jnp.zeros((0,), dtype)
        relmax = jnp.max(rel, initial=0.0)
    else:
        Ap = AG * (km[:, None] * fm[None, :])
        rhs = jnp.concatenate([r1p[:, None], Ap.T], axis=1)
        sol, rel = cg_solve_padded(V, fm, rhs, cg_iters, rtol, X0=x0)
        relmax = jnp.max(rel, initial=0.0)
        w, mT = sol[:, 0], sol[:, 1:]
        C = Ap @ mT
        C = (C + C.T) / 2 + jnp.diag((1.0 - km) + ridge * km)
        rhsC = Ap @ w - r2p
        dlk = spd_solve(C, rhsC)
        dxF = w - mT @ dlk
        dl = km * dlk + (1.0 - km) * r2
        rS = C @ dlk - rhsC
        sS = 1.0 + jnp.max(jnp.abs(rhsC), initial=0.0)
        relmax = jnp.maximum(relmax, jnp.max(jnp.abs(rS), initial=0.0) / sS)

    dx = fm * dxF + dxB
    ok = (
        jnp.all(jnp.isfinite(dx))
        & jnp.all(jnp.isfinite(dl))
        & (relmax < ok_rtol)
    )
    return (dx, dl, ok, sol) if return_sol else (dx, dl, ok)


def kkt_allfree_shared(V, W, q, AG, bg, keep, ridge):
    """All-free KKT solve through a precomputed ``W ~= V^{-1}``.

    PDAS round 1 (solvers/ssqp.py::_guess_start) always starts from the
    all-IN / all-OE status vector, so its KKT system is the UNMASKED
    equality solve: ``V`` and the kept rows are shared across an instance
    batch (only ``q``/``bg`` vary on the headline frontier sweeps). With a
    one-time ``W = (V + ridge I)^{-1}`` every quantity that does not depend
    on ``q`` — ``mT = W Ap'``, the Schur complement ``C`` and its Cholesky
    factor — is batch-invariant and hoists out of `vmap`: the whole round
    costs a handful of shared-matrix GEMMs instead of the ~14+ Jacobi-CG
    iterations the padded operator needs cold (measured: cond(Vp) ~ 9 on
    the headline covariance => 14 CG iterations at rtol 1e-4; this path
    replaces them with 2 GEMM-equivalents). Replaces the hot-kernel role of
    the reference's first factorization (SSQP.jl:276-332) for round 1 only.

    Returns ``(KKTResult, sol)`` with the same contract/layout as
    ``kkt_solve_cg(..., return_sol=True)`` so round 2 warm-starts from it.
    """
    dtype = V.dtype
    km = keep.astype(dtype)
    cp = q  # z_bound = 0 and free = all-ones at round 1
    w = W @ cp
    if AG.shape[0] == 0:
        alphaL = jnp.zeros((0,), dtype)
        alpha = -w
        sol = w[:, None]
    else:
        Ap = AG * km[:, None]
        bp = km * bg
        mT = W @ Ap.T
        C = Ap @ mT
        C = (C + C.T) / 2 + jnp.diag((1.0 - km) + ridge * km)
        # plain XLA Cholesky (NOT spd_solve: its batching rule broadcasts
        # unbatched operands to full batch, defeating the hoist this path
        # exists for). C is shared => one factorization per dispatch.
        L = _chol(C, lower=True)
        alphaL = -cho_solve((L, True), Ap @ w + bp)
        alpha = -(mT @ alphaL + w)
        sol = jnp.concatenate([w[:, None], mT], axis=1)
    gamma = V @ alpha + q + (AG.T @ (km * alphaL) if AG.shape[0] else 0.0)
    ok = jnp.all(jnp.isfinite(alpha)) & jnp.all(jnp.isfinite(alphaL))
    res = KKTResult(alpha, alpha, alphaL, gamma, ok)
    return res, sol


def kkt_solve(V, q, AG, bg, z, free, keep, ok_rtol=1e-8) -> KKTResult:
    """Solve the working-set equality QP at full padded shape.

    Args:
      V: (N, N) symmetric PSD objective matrix.
      q: (N,) linear term.
      AG: (R, N) stacked [A; G] rows, R = M + J.
      bg: (R,) stacked [b; g].
      z: (N,) current (feasible) point.
      free: (N,) bool — variables with status IN.
      keep: (R,) bool — active working rows that survived the redundancy purge.
      ok_rtol: relative-residual acceptance gate (Settings.cg_ok_rtol).

    Returns a :class:`KKTResult`. If ``V[F,F]`` is not positive definite the
    XLA Cholesky produces NaNs, while the Pallas kernel floors the pivot and
    returns finite garbage — either way the stationarity/primal residual
    check below exceeds ``ok_rtol``, ``ok`` comes back False, and the caller
    maps that to the reference's numerical-error status -1 (the reference
    throws instead, SSQP.jl:322).
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

    if AG.shape[0] == 0:  # unconstrained working set (M = J = 0)
        w = spd_solve(Vp, cp)
        alphaL = jnp.zeros((0,), dtype)
        alpha_f = -w
        res_primal = jnp.zeros((0,), dtype)
    else:
        # w = Vp^{-1} cp ; mT = Vp^{-1} Ap'   (one fused factor+multi-solve)
        rhs = jnp.concatenate([cp[:, None], Ap.T], axis=1)
        sol = spd_solve(Vp, rhs)
        w, mT = sol[:, 0], sol[:, 1:]

        C = Ap @ mT
        C = (C + C.T) / 2 + jnp.diag(1.0 - km)
        alphaL = -spd_solve(C, Ap @ w + bp)

        alpha_f = -(mT @ alphaL + w)
        res_primal = Ap @ alpha_f - bp
    alpha = fm * alpha_f + bm * z
    p = fm * (alpha_f - z)

    gamma = V @ alpha + q + AG.T @ (km * alphaL)

    # Residual gate: in exact arithmetic Vp alpha_f + Ap'(keep.alphaL) + cp = 0
    # (stationarity) and Ap alpha_f = bp (primal). A non-PD Vp silently
    # "solved" by a floored pivot violates these by O(1).
    res_stat = Vp @ alpha_f + Ap.T @ (km * alphaL) + cp
    s_stat = 1.0 + jnp.max(jnp.abs(cp), initial=0.0)
    s_prim = 1.0 + jnp.max(jnp.abs(bp), initial=0.0)
    relmax = jnp.maximum(
        jnp.max(jnp.abs(res_stat), initial=0.0) / s_stat,
        jnp.max(jnp.abs(res_primal), initial=0.0) / s_prim,
    )
    ok = (
        jnp.all(jnp.isfinite(alpha))
        & jnp.all(jnp.isfinite(alphaL))
        & (relmax < ok_rtol)
    )
    return KKTResult(alpha, p, alphaL, gamma, ok)


def recover_duals(V, q, AG, z, free, act_rows, ridge=None):
    """Least-squares dual recovery at a solution (new capability — the
    reference cannot produce duals at all, MOIwrapper.jl:255-257).

    Given the final point ``z`` and its active set, fit the working-row
    multipliers ``y`` so stationarity holds on the free coordinates:

        minimize_y  || free ⊙ (V z + q + AG_act' y) ||

    via ridge-stabilized normal equations (the ridge covers dependent active
    rows, where the multiplier split is non-unique — any valid split is a
    correct dual certificate). The bound multiplier is then the reduced
    gradient ``gamma = V z + q + AG'(act ⊙ y)``: at optimum ``gamma >= 0``
    on DN coordinates and ``<= 0`` on UP (same sign convention as the
    S-loop's KKT check, reference SSQP.jl:139-147).

    Returns (y, gamma) with y zero on inactive rows.
    """
    return recover_duals_grad(V @ z + q, AG, free, act_rows, ridge=ridge)


def recover_duals_grad(grad, AG, free, act_rows, ridge=None):
    """Gradient-form of :func:`recover_duals` — shared by the QP path
    (``grad = V z + q``) and the LP engines (``grad = c``), which makes every
    solve return dual certificates (capability the reference lacks,
    MOIwrapper.jl:255-257)."""
    dtype = grad.dtype
    fm = free.astype(dtype)
    if AG.shape[0] == 0:
        return jnp.zeros((0,), dtype), grad
    am = act_rows.astype(dtype)
    if ridge is None:
        ridge = 100.0 * float(jnp.finfo(dtype).eps)
    Apf = AG * (am[:, None] * fm[None, :])
    M1 = Apf @ Apf.T + jnp.diag((1.0 - am) + ridge * am)
    M1 = (M1 + M1.T) / 2
    y = -spd_solve(M1, Apf @ (fm * grad))
    y = am * y
    gamma = grad + AG.T @ y
    return y, gamma


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
    X = spd_solve(M1, Ap @ Gp.T)  # (R, J)
    recovered = X.T @ (km * alphaL)  # (J,)

    kept_ineq = keep[M:]
    own = alphaL[M:]
    dropped_active = act_rows[M:] & ~kept_ineq
    return jnp.where(kept_ineq, own, jnp.where(dropped_active, recovered, 0.0))
