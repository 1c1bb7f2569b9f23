"""Status Switching Method for convex QP — fixed-shape JAX implementation.

TPU-native re-design of the reference's core engine (reference: src/SSQP.jl).
Each variable carries a status in {IN, DN, UP} and each inequality a status in
{OE, EO}; every iteration solves the equality-constrained KKT system on the IN
variables and flips statuses until the KKT conditions hold (SSQP.jl:237-377).

Design translation (SURVEY.md §7):
  * status vectors -> int8 arrays, flips are `jnp.where` mask rebuilds;
  * the dynamic-size gathered KKT system -> full-shape mask-padded block
    elimination (ops/kkt.py);
  * `getRowsGJr` purge-and-shrink -> fixed-shape masked Gauss-Jordan keep mask
    (ops/masked_gj.py);
  * event queues + `sort!` -> masked argmin / threshold masks (multi-blocking
    = all events within tol of the smallest, SSQP.jl:98-127);
  * the whole loop runs under `lax.while_loop`, so it jits once per (N, M, J)
    and `vmap`s over instance batches.

Status codes returned match the reference contract (SSQP.jl:205-209):
  > 0 success (= iteration count), 0 infeasible (Phase-1), -1 numerical error,
  -max_iter not converged.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ssqp_tpu.ops.kkt import kkt_solve, recover_dropped_multipliers
from ssqp_tpu.ops.masked_gj import masked_gj_purge
from ssqp_tpu.types import DN, EO, IN, OE, QP, UP, Result, Settings
from ssqp_tpu.utils.precision import highest_matmul

_BIG = jnp.inf


class _LoopState(NamedTuple):
    z: jax.Array
    Sx: jax.Array  # (N,) int8 variable statuses
    Se: jax.Array  # (J,) int8 inequality statuses
    it: jax.Array  # int32 iteration counter
    done: jax.Array  # bool
    status: jax.Array  # int32 result code (valid when done)


def _polish(z, Sx, Se, d, u, G, g, tol):
    """Final cleanup (reference polishSz!, SSQP.jl:10-32): pin bound statuses,
    snap IN variables within tol of a bound, recompute inequality statuses."""
    z1 = jnp.where(Sx == DN, d, jnp.where(Sx == UP, u, z))
    snap_dn = (Sx == IN) & (jnp.abs(z - d) < tol)
    snap_up = (Sx == IN) & ~snap_dn & (jnp.abs(z - u) < tol)
    z1 = jnp.where(snap_dn, d, jnp.where(snap_up, u, z1))
    Sx1 = jnp.where(snap_dn, DN, jnp.where(snap_up, UP, Sx)).astype(Sx.dtype)
    if g.shape[0] > 0:
        Se1 = jnp.where(jnp.abs(g - G @ z1) < tol, EO, OE).astype(Se.dtype)
    else:
        Se1 = Se
    return z1, Sx1, Se1


def _free_k(z, Sx, V, q, tol):
    """K=0 handler (reference freeK!, SSQP.jl:35-59): free bound variables
    whose gradient sign permits improvement; optimal if none (with the
    restore-if-already-optimal refinement)."""
    p = V @ z + q
    can_free = ((p >= -tol) & (Sx == UP)) | ((p <= tol) & (Sx == DN))
    any_free = jnp.any(can_free)
    # all freed variables have ~zero gradient -> already optimal, restore
    freed_max = jnp.max(jnp.where(can_free, jnp.abs(p), 0.0))
    optimal = ~any_free | (any_free & (freed_max <= tol))
    Sx_new = jnp.where(optimal, Sx, jnp.where(can_free, IN, Sx)).astype(Sx.dtype)
    return Sx_new, optimal


@partial(jax.jit, static_argnames=("settings",))
@highest_matmul
def solve_qp_loop(Q: QP, Sx0, Se0, x0, settings: Settings, pre_status=None) -> Result:
    """Run the S-loop from a warm start (reference solveQP(Q, S, x0),
    SSQP.jl:237-377). ``Sx0``/``Se0`` are int8 status arrays, ``x0`` a feasible
    point consistent with them. ``pre_status`` (traced int32) lets a fused
    Phase-1 short-circuit the loop: <= 0 means already done with that code."""
    V, A, G, q, b, g = Q.V, Q.A, Q.G, Q.q, Q.b, Q.g
    d, u = Q.d, Q.u
    N, M, J = Q.N, Q.M, Q.J
    dtype = V.dtype
    tol = jnp.asarray(settings.tol, dtype)
    tolG = jnp.asarray(settings.tolG, dtype)

    AG = jnp.concatenate([A, G], axis=0) if J > 0 else A
    bg = jnp.concatenate([b, g]) if J > 0 else b
    R = M + J

    fu = jnp.isfinite(u)
    fd = jnp.isfinite(d)

    def body(st: _LoopState) -> _LoopState:
        z, Sx, Se, it = st.z, st.Sx, st.Se, st.it
        it = it + 1
        free = Sx == IN
        K = jnp.sum(free)

        # ---- K == 0 path (cheap, computed unconditionally for vmap) -------
        SxK, optK = _free_k(z, Sx, V, q, tol)

        # ---- main path -----------------------------------------------------
        fm = free.astype(dtype)
        act = jnp.concatenate([jnp.ones((M,), bool), Se == EO]) if J > 0 else jnp.ones((M,), bool)
        bE = bg - AG @ (z * (1.0 - fm))
        if R > 0:
            keep, inconsistent = masked_gj_purge(AG * fm[None, :], bE, act, tol)
        else:
            keep, inconsistent = jnp.ones((0,), bool), jnp.asarray(False)

        res = kkt_solve(V, q, AG, bg, z, free, keep)
        alpha, p, gamma = res.alpha, res.p, res.gamma
        numerr = inconsistent | ~res.ok

        # ---- aStep ratio test (SSQP.jl:61-134) ------------------------------
        safe_p = jnp.where(p == 0, jnp.ones((), dtype), p)
        up_ev = free & (p > tol) & fu
        dn_ev = free & (p < -tol) & fd
        L_up = jnp.where(up_ev, (u - z) / safe_p, _BIG)
        L_dn = jnp.where(dn_ev, (d - z) / safe_p, _BIG)
        if J > 0:
            Og = Se == OE
            po = G @ p
            zo = g - G @ z
            row_ev = Og & (po > tol)
            L_row = jnp.where(row_ev, zo / jnp.where(po == 0, 1.0, po), _BIG)
            Lmin_rows = jnp.min(L_row, initial=_BIG)
        else:
            L_row = jnp.zeros((0,), dtype)
            Lmin_rows = _BIG
        L1 = jnp.minimum(
            1.0, jnp.minimum(jnp.min(L_up, initial=_BIG),
                             jnp.minimum(jnp.min(L_dn, initial=_BIG), Lmin_rows))
        )
        do_step = jnp.max(jnp.abs(p)) > tolG
        partial_step = do_step & (L1 < 1.0)

        # partial-step outcome: advance, flip ALL events within tol of L1
        zA = z + L1 * p
        fl_up = up_ev & (L_up <= L1 + tol)
        fl_dn = dn_ev & (L_dn <= L1 + tol)
        zA = jnp.where(fl_up, u, jnp.where(fl_dn, d, zA))
        SxA = jnp.where(fl_up, UP, jnp.where(fl_dn, DN, Sx)).astype(Sx.dtype)
        if J > 0:
            SeA = jnp.where(row_ev & (L_row <= L1 + tol), EO, Se).astype(Se.dtype)
        else:
            SeA = Se

        # full/zero-step outcome: KKT multiplier check (SSQP.jl:136-188)
        zB = jnp.where(do_step, alpha, z)
        viol_up = (Sx == UP) & (gamma > tolG)
        viol_dn = (Sx == DN) & (gamma < -tolG)
        var_key = jnp.where(viol_up, -gamma, jnp.where(viol_dn, gamma, _BIG))
        if J > 0:
            Lda = recover_dropped_multipliers(AG, free, keep, act, res.alphaL, M)
            row_key = jnp.where((Se == EO) & (Lda < -tolG), Lda, _BIG)
            keys = jnp.concatenate([var_key, row_key])
        else:
            keys = var_key
        kmin = jnp.argmin(keys)
        found = keys[kmin] < _BIG
        # flip exactly the most-violated status (SSQP.jl:174-187)
        SxB = jnp.where((jnp.arange(N) == kmin) & found, IN, Sx).astype(Sx.dtype)
        if J > 0:
            SeB = jnp.where((jnp.arange(J) == (kmin - N)) & found, OE, Se).astype(Se.dtype)
        else:
            SeB = Se
        zP, SxP, SeP = _polish(zB, SxB, SeB, d, u, G, g, tol)
        optB = ~found

        # ---- combine outcomes -----------------------------------------------
        is_free_k = K == 0

        def sel(freek_v, err_v, partial_v, chk_v, opt_v):
            """freeK -> numerical-error -> partial step -> KKT flip -> optimal."""
            x = jnp.where(found, chk_v, opt_v)
            x = jnp.where(partial_step, partial_v, x)
            x = jnp.where(numerr, err_v, x)
            return jnp.where(is_free_k, freek_v, x)

        z_n = sel(z, z, zA, zB, zP)
        Sx_n = sel(SxK, Sx, SxA, SxB, SxP).astype(Sx.dtype)
        Se_n = sel(Se, Se, SeA, SeB, SeP).astype(Se.dtype)
        done_n = sel(optK, jnp.array(True), jnp.array(False), jnp.array(False), jnp.array(True))
        status_n = sel(
            jnp.where(optK, it, 0),
            jnp.asarray(-1, jnp.int32),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
            it,
        ).astype(jnp.int32)
        return _LoopState(z_n, Sx_n, Se_n, it, done_n, status_n)

    def cond(st: _LoopState):
        return (~st.done) & (st.it < settings.max_iter)

    pre = jnp.asarray(1 if pre_status is None else pre_status, jnp.int32)
    st0 = _LoopState(
        x0.astype(dtype),
        Sx0.astype(jnp.int8),
        Se0.astype(jnp.int8),
        jnp.asarray(0, jnp.int32),
        pre <= 0,
        jnp.where(pre <= 0, pre, 0).astype(jnp.int32),
    )
    st = jax.lax.while_loop(cond, body, st0)
    status = jnp.where(st.done, st.status, -settings.max_iter).astype(jnp.int32)
    S = jnp.concatenate([st.Sx, st.Se]) if J > 0 else st.Sx
    return Result(st.z, S, status)


def solve_qp(
    Q: QP,
    S=None,
    x0=None,
    *,
    settings: Optional[Settings] = None,
    settings_lp: Optional[Settings] = None,
) -> Result:
    """Solve a convex QP (reference solveQP, SSQP.jl:213-234).

    With ``S``/``x0`` given this is a warm start straight into the S-loop
    (reference solveQP(Q, S, x0)); otherwise Phase-1 (a bounded-variable
    big-M-free simplex, solvers/phase1.py) finds a feasible starting point.
    """
    settings = settings or Settings.for_dtype(Q.V.dtype)
    if Q.mc <= 0:
        # invalid model (reference SSQP.jl:226-228)
        S_out = jnp.concatenate(
            [jnp.full((Q.N,), DN, jnp.int8), jnp.full((Q.J,), OE, jnp.int8)]
        ) if Q.J > 0 else jnp.full((Q.N,), DN, jnp.int8)
        return Result(jnp.zeros((Q.N,), Q.V.dtype), S_out, jnp.asarray(-1, jnp.int32))

    if S is None or x0 is None:
        return solve_qp_auto(Q, settings=settings, settings_lp=settings_lp)
    S = jnp.asarray(S, jnp.int8)
    Sx0, Se0 = S[: Q.N], S[Q.N :]
    x0 = jnp.asarray(x0, Q.V.dtype)
    return solve_qp_loop(Q, Sx0, Se0, x0, settings)


@partial(jax.jit, static_argnames=("settings", "settings_lp"))
@highest_matmul
def solve_qp_auto(Q: QP, settings: Settings, settings_lp: Optional[Settings] = None) -> Result:
    """Fully-traced Phase-1 + S-loop (reference solveQP(Q::QP), SSQP.jl:224-234).

    Jit-compatible end to end, so it `vmap`s over instance batches and
    `shard_map`s over device meshes: an infeasible Phase-1 short-circuits the
    S-loop through its ``pre_status`` flag rather than a host branch.
    """
    from ssqp_tpu.solvers.phase1 import init_qp_traced

    x0, Sx0, Se0, st1 = init_qp_traced(Q, settings_lp or settings)
    return solve_qp_loop(Q, Sx0, Se0, x0, settings, pre_status=st1)
