"""Problem containers, status codes and solver settings.

TPU-native re-design of the reference's L0 layer (reference: src/types.jl).
Everything is a fixed-shape JAX pytree so problems can be `vmap`-batched and
`pjit`-sharded; statuses are int8 codes instead of a Julia enum; model-condition
(`mc`) validation is a host-side construction step (reference types.jl:47-57).

Problem form (reference README.md:20-34):

    min (1/2) x'Vx + q'x   s.t.  Ax = b (M rows),  Gx <= g (J rows),  d <= x <= u

Status codes (reference types.jl:17-23, same integer values as the Julia enum):

    IN = 0  variable strictly inside its bounds ("free")
    DN = 1  variable at its lower bound
    UP = 2  variable at its upper bound
    OE = 3  inequality row inactive (original `<=`)
    EO = 4  inequality row active (held as equality)

The reference's `Event{T}` record (a status transition (From, To, id, L)
collected into sorted queues, types.jl:39-44) has no analogue here by design:
fixed-shape masked argmin / threshold masks replace event queues entirely
(SURVEY.md §7 design translation).

Solver status convention (reference SSQP.jl:205-209, Simplex.jl:826-828):

    > 0 success (iteration count), 1 unique / 2 infinitely-many for LP engines,
    3 unbounded, 0 infeasible, -1 numerical error, -maxIter iteration limit.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Status codes
# ---------------------------------------------------------------------------

IN: int = 0
DN: int = 1
UP: int = 2
OE: int = 3
EO: int = 4

STATUS_NAMES = {IN: "IN", DN: "DN", UP: "UP", OE: "OE", EO: "EO"}

# Model-condition codes set at construction time (reference types.jl:47-57).
MC_OK = 1
MC_INFEASIBLE = 0
MC_NUMERICAL = -1
MC_REDUNDANT = -10
MC_NO_CONSTRAINTS = -20  # no inequalities and no finite bounds
MC_DEGENERATE_BOUNDS = -30  # d == u detected
MC_NOT_PSD = -70  # V not positive semi-definite


def _as2d(x, dtype) -> np.ndarray:
    a = np.asarray(x, dtype=dtype)
    if a.ndim != 2:
        a = a.reshape((-1, a.shape[-1]) if a.size else (0, 0))
    return a


# ---------------------------------------------------------------------------
# Settings
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Settings:
    """Solver configuration (reference types.jl:390-417).

    Static under `jit`: pass as a static argument or close over it. Tolerance
    defaults follow the reference: ``tol=2**-26``, ``tolG=2**-33`` for float64.
    For float32 those are below machine epsilon, so `for_dtype` loosens them;
    the reference's BigFloat tier maps to float64 + iterative refinement
    (see solvers/refine.py).
    """

    max_iter: int = 7777
    tol: float = 2.0**-26
    tolG: float = 2.0**-33
    rule: str = "dantzig"  # 'dantzig' | 'max_improvement' | 'steepest_edge'
    pivot: str = "row"  # redundancy-purge flavor (row pivoting, utils.jl:49)
    dtype: Any = jnp.float64
    # Release every violated status per KKT check instead of the reference's
    # single most-violated flip (falls back to single-flip after N+J+16
    # iterations for anti-cycling). Fixed-price full-shape iterations make
    # this strictly cheaper on TPU; disable for exact reference semantics.
    multi_free: bool = True
    # Experimental: projected clipped full steps in the first iterations
    # (pins every violated bound at once). Fast when its guesses are right
    # but cycle-prone through infeasible intermediates; off by default.
    clip_step: bool = False
    # Solve the padded free-variable system by Jacobi-preconditioned CG
    # (factorization-free, pure MXU matvecs — on TPU this removes the
    # N-sequential dependency that makes batched Cholesky the entire
    # iteration cost). The exact fallback pass runs 4x the iterations;
    # set False for direct Cholesky solves.
    kkt_cg: bool = True
    cg_iters: int = 128
    cg_rtol: float = 1e-14  # must sit well below tolG; see for_dtype
    # CG budget for the PDAS warm-start heuristic's rounds (solvers/ssqp.py::
    # _guess_start). PDAS only needs the sign/threshold structure of the
    # equality solve — not solver-accuracy residuals — and its outcome is
    # validated (converged + primal feasible) before acceptance, so it runs
    # a much cheaper solve than the S-loop's. These dominate headline cost:
    # profiling shows the PDAS rounds are ~100% of the N=256 batch solve.
    pdas_cg_iters: int = 128
    pdas_rtol: float = 1e-10
    # Solve PDAS round 1 (always all-free) in closed form through a one-time
    # W ~= V^{-1} (ops/kkt.py::kkt_allfree_shared). On shared-V instance
    # batches (the headline frontier protocol) W and the round-1 Schur factor
    # hoist out of `vmap` and the round costs a couple of shared GEMMs
    # instead of ~14+ cold CG iterations. Batch drivers TURN THIS OFF when V
    # is per-instance (parallel/batch.py) — a batched (B, N, N) inverse
    # would dwarf the saving.
    pdas_precond: bool = True
    # Seed PDAS identification with the EXACT active set of the separable
    # (diagonal) model when the problem is a single-equality box QP
    # (solvers/ssqp.py::_waterfill_seed — SORT-FREE parallel bracket
    # subdivision on the dual; a sorted-breakpoint variant was measured
    # ~15 ms slower in batched TPU sorts and rejected). Cuts the
    # full-activity identification rounds from
    # ~5 to ~2 on tight-box frontier batches (measured still-changing
    # profile 256/249/237/202/127/14 -> 256/236/55/2 at N=256, identical
    # final statuses); instances where the model does not apply (M != 1,
    # J > 0, nonpositive diag, unbracketed dual) keep the standard start.
    pdas_waterfill: bool = True
    # Experimental: ALSO precondition the PDAS rounds' CG with W (two shared
    # GEMMs per iteration instead of Jacobi's one). Off by default — the
    # iteration-count saving only beats the 2x per-iteration cost at low pin
    # fractions (measured study in solvers/ssqp.py history); A/B via
    # BENCH_PDAS_PCG=1.
    pdas_pcg: bool = False
    # Experimental: run the PDAS rounds' inner solve as a preconditioned
    # CHEBYSHEV semi-iteration instead of CG (ops/kkt.py::_vp_cheb_xla).
    # Scalar recurrence coefficients replace CG's per-column dot products —
    # the loop body has ZERO reductions (only the early-exit cond keeps one)
    # — targeting the measured reduction/loop-sequencing floor of the
    # headline batch. Spectral bounds come one-time from the shared V/W
    # (ops/kkt.py::shared_jacobi_bounds, hoisted out of vmap on shared-V
    # batches); requires pdas_precond for the W-based λmin estimate. A/B via
    # BENCH_PDAS_CHEB=1.
    pdas_cheb: bool = False
    # Acceptance gate on the KKT solve's relative residual (CG residual and
    # the Schur/primal residuals of either path). Above it the iteration is
    # flagged a numerical error (status -1) exactly like a failed reference
    # factorization (SSQP.jl:322). Dtype-scaled: f64 solves reach ~eps-level
    # residuals, so the f64 gate sits near tolG; the f32 gate tolerates
    # normal f32 noise but still catches garbage (O(1) residuals from a
    # floored pivot).
    cg_ok_rtol: float = 1e-8
    # When the CG path flags a numerical error, re-run the instance with
    # direct (Cholesky) KKT solves before giving up — the escalation the
    # reference doesn't need because it always factorizes. Compiles one
    # extra loop body; disabled in the f32 speed recipe (f32 accuracy comes
    # from the f64 refinement wrapper instead, solvers/refine.py).
    escalate_direct: bool = True

    @staticmethod
    def for_dtype(dtype) -> "Settings":
        dtype = jnp.dtype(dtype)
        if dtype == jnp.float32:
            # f32 eps ~ 1.19e-7; reference f64 tolerances are unreachable.
            return Settings(tol=2.0**-16, tolG=2.0**-20, dtype=jnp.float32,
                            cg_iters=64, cg_rtol=1e-7, cg_ok_rtol=2e-3,
                            pdas_cg_iters=24, pdas_rtol=1e-4,
                            escalate_direct=False)
        return Settings(dtype=dtype)


# ---------------------------------------------------------------------------
# Problem pytrees
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LP:
    """Linear program ``min c'x  s.t. Ax=b, Gx<=g, d<=x<=u``.

    Reference: the `LP{T}` struct and kwarg constructor (types.jl:84-182).
    Fields are JAX arrays; (N, M, J, mc) ride along as aux data so the pytree
    is `vmap`/`jit` friendly. Use :func:`make_lp` for validated construction.
    """

    c: jax.Array
    A: jax.Array
    b: jax.Array
    G: jax.Array
    g: jax.Array
    d: jax.Array
    u: jax.Array
    N: int = dataclasses.field(metadata=dict(static=True))
    M: int = dataclasses.field(metadata=dict(static=True))
    J: int = dataclasses.field(metadata=dict(static=True))
    mc: int = dataclasses.field(default=MC_OK, metadata=dict(static=True))

    def tree_flatten(self):
        return (self.c, self.A, self.b, self.G, self.g, self.d, self.u), (
            self.N,
            self.M,
            self.J,
            self.mc,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        c, A, b, G, g, d, u = children
        N, M, J, mc = aux
        return cls(c, A, b, G, g, d, u, N, M, J, mc)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class QP:
    """Quadratic program ``min (1/2)x'Vx + q'x  s.t. Ax=b, Gx<=g, d<=x<=u``.

    Reference: the `QP{T}` struct and kwarg constructor (types.jl:214-301).
    Use :func:`make_qp` for validated construction (symmetrization, PSD check,
    d/u swap, mc codes).
    """

    V: jax.Array
    A: jax.Array
    G: jax.Array
    q: jax.Array
    b: jax.Array
    g: jax.Array
    d: jax.Array
    u: jax.Array
    N: int = dataclasses.field(metadata=dict(static=True))
    M: int = dataclasses.field(metadata=dict(static=True))
    J: int = dataclasses.field(metadata=dict(static=True))
    mc: int = dataclasses.field(default=MC_OK, metadata=dict(static=True))

    def tree_flatten(self):
        return (self.V, self.A, self.G, self.q, self.b, self.g, self.d, self.u), (
            self.N,
            self.M,
            self.J,
            self.mc,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        V, A, G, q, b, g, d, u = children
        N, M, J, mc = aux
        return cls(V, A, G, q, b, g, d, u, N, M, J, mc)


# ---------------------------------------------------------------------------
# Validated constructors (host-side, numpy; mirrors reference semantics)
# ---------------------------------------------------------------------------


def _prep_bounds(d, u, N, dtype):
    """d/u defaulting plus the reference's swap-if-reversed rule.

    Reference types.jl:173-179 swaps u/d where u < d (with a warning) and
    types.jl:125-128 flags d == u as mc=-30.
    """
    d = np.full(N, 0.0, dtype) if d is None else np.asarray(d, dtype).reshape(N).copy()
    u = np.full(N, np.inf, dtype) if u is None else np.asarray(u, dtype).reshape(N).copy()
    mc = MC_OK
    swap = u < d
    if swap.any():
        d[swap], u[swap] = u[swap].copy(), d[swap].copy()
    if (d == u).any():
        mc = MC_DEGENERATE_BOUNDS
    return d, u, mc


def _check_dtype_realizable(dtype):
    """Warn on the silent f64->f32 downcast trap: requesting float64 without
    jax_enable_x64 produces f32 device arrays while the default Settings()
    keeps f64-tier tolerances (below f32 eps) — mass non-convergence. The
    constructors are the right choke point to catch it."""
    if np.dtype(dtype) == np.float64 and jnp.zeros(0).dtype != jnp.float64:
        import warnings

        warnings.warn(
            "dtype=float64 requested but jax_enable_x64 is OFF: device "
            "arrays will silently be float32 while float64-tier Settings "
            "tolerances are unreachable. Enable x64 (jax.config.update("
            "'jax_enable_x64', True)) or build the problem with "
            "dtype=np.float32 and Settings.for_dtype(jnp.float32).",
            stacklevel=3,
        )


def make_lp(c, A=None, b=None, *, G=None, g=None, d=None, u=None, dtype=None) -> LP:
    """Build a validated LP (reference LP kwarg constructor, types.jl:99-182)."""
    dtype = np.dtype(jnp.zeros(0).dtype if dtype is None else dtype)
    _check_dtype_realizable(dtype)
    c = np.asarray(c, dtype).reshape(-1)
    N = c.shape[0]
    A = np.zeros((0, N), dtype) if A is None else _as2d(A, dtype)
    b = np.zeros((0,), dtype) if b is None else np.asarray(b, dtype).reshape(-1)
    G = np.zeros((0, N), dtype) if G is None else _as2d(G, dtype)
    g = np.zeros((0,), dtype) if g is None else np.asarray(g, dtype).reshape(-1)
    M, J = b.shape[0], g.shape[0]
    if A.shape != (M, N):
        raise ValueError(f"incompatible dimension: A {A.shape} != {(M, N)}")
    if G.shape != (J, N):
        raise ValueError(f"incompatible dimension: G {G.shape} != {(J, N)}")
    d, u, mc = _prep_bounds(d, u, N, dtype)
    if mc == MC_OK and J == 0 and not (np.isfinite(d).any() or np.isfinite(u).any()):
        # no inequalities and no finite bounds at all (types.jl:132-135)
        mc = MC_NO_CONSTRAINTS
    return LP(
        jnp.asarray(c), jnp.asarray(A), jnp.asarray(b), jnp.asarray(G),
        jnp.asarray(g), jnp.asarray(d), jnp.asarray(u), N, M, J, mc,
    )


def make_qp(
    V,
    q=None,
    A=None,
    b=None,
    *,
    G=None,
    g=None,
    d=None,
    u=None,
    dtype=None,
    check_psd=True,
) -> QP:
    """Build a validated QP.

    Defaults reproduce the reference's portfolio problem
    ``min (1/2) z'Vz  s.t. 1'z = 1, z >= 0`` (types.jl:229-236); V is
    symmetrized (types.jl:243) and optionally PSD-checked via the smallest
    eigenvalue (types.jl:247-249, mc=-70 on failure).
    """
    dtype = np.dtype(jnp.zeros(0).dtype if dtype is None else dtype)
    _check_dtype_realizable(dtype)
    V = _as2d(V, dtype)
    N = V.shape[0]
    if V.shape != (N, N):
        raise ValueError("V must be square")
    V = (V + V.T) / 2
    q = np.zeros(N, dtype) if q is None else np.asarray(q, dtype).reshape(N)
    A = np.ones((1, N), dtype) if A is None else _as2d(A, dtype)
    b = np.ones((1,), dtype) if b is None else np.asarray(b, dtype).reshape(-1)
    G = np.zeros((0, N), dtype) if G is None else _as2d(G, dtype)
    g = np.zeros((0,), dtype) if g is None else np.asarray(g, dtype).reshape(-1)
    M, J = b.shape[0], g.shape[0]
    if A.shape != (M, N):
        raise ValueError(f"incompatible dimension: A {A.shape} != {(M, N)}")
    if G.shape != (J, N):
        raise ValueError(f"incompatible dimension: G {G.shape} != {(J, N)}")
    if d is None:
        d = np.zeros(N, dtype)
    d, u, mc = _prep_bounds(d, u, N, dtype)
    if mc == MC_OK and J == 0 and not (np.isfinite(d).any() or np.isfinite(u).any()):
        # no inequalities and no finite bounds (types.jl:132-135)
        mc = MC_NO_CONSTRAINTS
    if mc == MC_OK and check_psd and N > 0:
        w = np.linalg.eigvalsh(V.astype(np.float64))
        if w[0] < -1e-9 * max(1.0, abs(w[-1])):
            mc = MC_NOT_PSD
    return QP(
        jnp.asarray(V), jnp.asarray(A), jnp.asarray(G), jnp.asarray(q),
        jnp.asarray(b), jnp.asarray(g), jnp.asarray(d), jnp.asarray(u),
        N, M, J, mc,
    )


def qp_frontier_L(P: QP, L) -> QP:
    """L-parameterized frontier QP: objective ``1/2 z'Vz - L q'z`` where
    ``P.q`` holds expected returns (reference QP(P::QP, L), types.jl:303-319)."""
    L = float(L)
    return QP(P.V, P.A, P.G, -L * P.q, P.b, P.g, P.d, P.u,
              P.N, P.M, P.J, P.mc)


def qp_frontier_mu(P: QP, mu) -> QP:
    """mu-parameterized frontier QP: appends the expected-return equality
    ``q'z = mu`` to Az=b and zeroes the linear term (reference QP(mu, P),
    types.jl:321-339)."""
    A = jnp.concatenate([P.A, P.q[None, :]], axis=0)
    b = jnp.concatenate([P.b, jnp.asarray([mu], P.b.dtype)])
    return QP(P.V, A, P.G, jnp.zeros_like(P.q), b, P.g, P.d, P.u,
              P.N, P.M + 1, P.J, P.mc)


def qp_from_lp(P: LP) -> QP:
    """Lift an LP to a QP with ``V = diag(|c| + 0.5)`` (types.jl:341-356)."""
    c = np.asarray(P.c)
    V = np.diag(np.abs(c) + 0.5)
    return QP(
        jnp.asarray(V), P.A, P.G, P.c, P.b, P.g, P.d, P.u, P.N, P.M, P.J, P.mc
    )


def lp_from_qp(Q: QP, c=None) -> LP:
    """Drop the quadratic term (types.jl:358-373)."""
    c = Q.q if c is None else jnp.asarray(c, Q.q.dtype)
    return LP(c, Q.A, Q.b, Q.G, Q.g, Q.d, Q.u, Q.N, Q.M, Q.J, Q.mc)


# ---------------------------------------------------------------------------
# Result container
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Result:
    """Solver output (x, S, status[, lam, gamma]) as a pytree.

    Matches the reference contract: `x` the solution (N,), `S` int8 statuses of
    length N+J, `status` an int32 code (SSQP.jl:205-209). Batched solves carry
    a leading batch axis on every leaf.

    ``lam``/``gamma`` are dual certificates the reference cannot produce
    (ConstraintDual unsupported, MOIwrapper.jl:255-257): ``lam`` holds the
    M+J working-row multipliers (sign: stationarity is
    ``Vx + q + [A;G]'lam = gamma``; lam is free-sign on equality rows,
    >= 0 on active inequality rows, 0 on inactive ones) and ``gamma`` the
    reduced gradient (>= 0 at lower bounds, <= 0 at upper, ~0 on free
    coordinates). ``None`` on engines/paths that do not compute them.
    """

    x: jax.Array
    S: jax.Array
    status: jax.Array
    lam: Any = None
    gamma: Any = None

    def tree_flatten(self):
        return (self.x, self.S, self.status, self.lam, self.gamma), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)
