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

from ssqp_tpu.ops.kkt import (
    kkt_allfree_shared, kkt_solve, kkt_solve_cg,
    recover_dropped_multipliers, recover_duals,
)
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
    sol: jax.Array  # (N, 1+R) raw multi-RHS CG solution of the last KKT
    # solve — warm-starts the next iteration's CG (successive working sets
    # differ in a few mask entries, so most columns start near-converged;
    # per-column freezing in cg_solve_padded makes stale columns cheap).


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


@partial(jax.jit, static_argnames=("settings", "return_sol"))
@highest_matmul
def solve_qp_loop(
    Q: QP, Sx0, Se0, x0, settings: Settings, pre_status=None,
    mf_flag=None, max_iter=None, cg_iters=None, sol0=None,
    return_sol: bool = False,
) -> Result:
    """Run the S-loop from a warm start (reference solveQP(Q, S, x0),
    SSQP.jl:237-377). ``Sx0``/``Se0`` are int8 status arrays, ``x0`` a feasible
    point consistent with them. ``pre_status`` (traced int32) lets a fused
    Phase-1 short-circuit the loop: <= 0 means already done with that code.

    ``mf_flag``/``max_iter`` are TRACED overrides of settings.multi_free /
    settings.max_iter: the fast and exact passes of the two-loop strategy in
    :func:`solve_qp_auto` then share one compiled loop body (XLA deduplicates
    the identical while computations), halving compile time."""
    V, A, G, q, b, g = Q.V, Q.A, Q.G, Q.q, Q.b, Q.g
    d, u = Q.d, Q.u
    N, M, J = Q.N, Q.M, Q.J
    dtype = V.dtype
    tol = jnp.asarray(settings.tol, dtype)
    tolG = jnp.asarray(settings.tolG, dtype)
    mf_v = jnp.asarray(
        settings.multi_free if mf_flag is None else mf_flag, bool
    )
    max_it = jnp.asarray(
        settings.max_iter if max_iter is None else max_iter, jnp.int32
    )
    cg_it = jnp.asarray(
        settings.cg_iters if cg_iters is None else cg_iters, jnp.int32
    )

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
            # Settings.pivot selects the redundancy-purge flavor
            # (reference getRowsGJr row pivoting vs getRowsGJ column
            # pivoting, utils.jl:2-86); dispatch rule shared with the refine
            # and diff layers in ops/masked_gj.py::select_purge.
            from ssqp_tpu.ops.masked_gj import select_purge

            purge = select_purge(settings.pivot, R)
            keep, inconsistent, bad_rows = purge(AG * fm[None, :], bE, act, tol)
        else:
            keep, inconsistent, bad_rows = (
                jnp.ones((0,), bool), jnp.asarray(False), jnp.ones((0,), bool)
            )

        # Anti-cycling window for the aggressive policies below: after it
        # expires the loop is exactly the reference algorithm.
        aggr = mf_v & (it <= N + J + 16)

        if settings.kkt_cg:
            res, sol_n = kkt_solve_cg(V, q, AG, bg, z, free, keep,
                                      cg_it, settings.cg_rtol,
                                      ok_rtol=settings.cg_ok_rtol,
                                      x0=st.sol, return_sol=True)
        else:
            res = kkt_solve(V, q, AG, bg, z, free, keep,
                            ok_rtol=settings.cg_ok_rtol)
            sol_n = st.sol
        alpha, p, gamma = res.alpha, res.p, res.gamma
        # An inconsistent working system is a numerical error in reference
        # semantics (SSQP.jl:310-319). Aggressive row activation can
        # transiently over-activate (activate rows whose residual conflicts
        # with the rest of the working set), and the resulting state can
        # persist past the anti-cycling window — so whenever multi_free is
        # on, TRULY conflicting purged inequality rows are released back to
        # OE. Dependent-but-consistent rows stay EO with recovered
        # multipliers exactly like the reference (releasing those would undo
        # the ratio test's activation and cycle). An inconsistent *equality*
        # row cannot be repaired and stays a numerical error. With
        # multi_free=False the reference's fail-fast behavior is exact.
        mf = mf_v
        numerr = (inconsistent & ~mf) | ~res.ok
        # Working-set repair (multi_free mode only; the reference fails fast
        # with -1 instead, SSQP.jl:310-319). A "bad" row — active but
        # unsatisfiable given the pinned variables and the kept rows — can
        # only arise after an aggressive clip. Repair frees every pinned
        # variable in the support of the bad rows: K grows strictly, so this
        # cannot cycle. If no variable can be freed, bad inequality rows are
        # released to OE (they genuinely conflict with the kept rows); a bad
        # equality row with nothing to free is a real numerical error.
        any_bad = jnp.any(bad_rows)
        brm = bad_rows.astype(dtype)
        supp = (brm @ jnp.abs(AG)) > 0 if R > 0 else jnp.zeros((N,), bool)
        can_emerg = supp & ~free
        emerg = mf & any_bad & jnp.any(can_emerg)
        SxE = jnp.where(can_emerg, IN, Sx).astype(Sx.dtype)
        # Releasing is itself cycle-prone (a released violated row re-activates
        # through the zero-ratio rule below), so it is confined to the
        # anti-cycling window; afterwards an unrepairable conflict is the
        # reference's numerical error.
        last_resort = mf & any_bad & ~jnp.any(can_emerg)
        if J > 0:
            Se = jnp.where(last_resort & aggr & bad_rows[M:], OE, Se).astype(Se.dtype)
        numerr = numerr | (last_resort & ~aggr)
        bad_eq = jnp.any(bad_rows[:M]) if M > 0 else jnp.asarray(False)
        numerr = numerr | (last_resort & bad_eq)

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
            # A violated OE row (zo < 0, only possible transiently after an
            # aggressive clip; the reference's feasibility invariant makes
            # zo >= 0 always) blocks immediately: zero ratio, so it activates
            # at L1 = 0 and the next EQP projects back onto it.
            L_row = jnp.where(
                row_ev, jnp.maximum(zo, 0.0) / jnp.where(po == 0, 1.0, po), _BIG
            )
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

        # Blocking policy. Exact mode is the reference semantics: advance to
        # the first blocking event L1 and flip ALL events within tol of it
        # (multi-blocking, SSQP.jl:98-127) — one partial step per distinct
        # blocking distance, so a candidate minimizer violating m bounds
        # costs m iterations. Aggressive mode instead takes the full step to
        # the candidate alpha CLIPPED into the box, pinning every violated
        # bound and activating every inequality violated at the clipped
        # point in one iteration (projected-step style). The clipped point
        # may be equality-infeasible, but the next iteration's KKT solve
        # re-solves the free coordinates from the pinned values, restoring
        # feasibility exactly; monotone-descent is sacrificed, so the same
        # anti-cycling switch as the status-release policy falls back to
        # exact stepping after `aggr` expires.

        # exact partial-step outcome
        zE = z + L1 * p
        fl_up_e = up_ev & (L_up <= L1 + tol)
        fl_dn_e = dn_ev & (L_dn <= L1 + tol)
        # Degenerate-step guard (multi_free mode): at a zero-length step the
        # multi-blocking tie flip can pin several variables without moving z,
        # which together with the working-set repair can close a cycle
        # (pin-many -> repair-frees -> pin-many ...). Flipping only the
        # single least-index event at degenerate steps (Bland-style) breaks
        # such cycles. With multi_free=False ties flip together exactly like
        # the reference (SSQP.jl:98-127).
        # Only active after the aggressive window: within it, degenerate
        # multi-flips are part of the speed and any cycle dies at expiry.
        degen = mf & ~aggr & (L1 <= tol)
        ev_all = fl_up_e | fl_dn_e
        first_ev = jnp.argmax(ev_all)
        single = jnp.arange(N) == first_ev
        fl_up_e = jnp.where(degen & jnp.any(ev_all), fl_up_e & single, fl_up_e)
        fl_dn_e = jnp.where(degen & jnp.any(ev_all), fl_dn_e & single, fl_dn_e)
        zE = jnp.where(fl_up_e, u, jnp.where(fl_dn_e, d, zE))

        # Experimental clipped-full-step outcome (Settings.clip_step, OFF by
        # default — compiled out entirely when off). It converges in ~10
        # iterations when its pin guesses are right, but the
        # equality-infeasible intermediate states it creates send a third of
        # instances into orbits the exact machinery cannot reliably recover
        # from (measured on the N=256 frontier batch: 97/256 solved with
        # clipping vs 256/256 without, while the release policy alone
        # already cuts iterations ~4x).
        if settings.clip_step:
            # Pinning capped so at least M + J + 1 variables stay free
            # (more can leave the working equalities unsatisfiable), most-
            # violated bounds first (an index-ordered cap cycles badly).
            cl_up = free & fu & (alpha > u)
            cl_dn = free & fd & (alpha < d)
            kcap = jnp.maximum(K - (M + J + 1), 0)
            sev = jnp.where(cl_up, alpha - u,
                            jnp.where(cl_dn, d - alpha, -_BIG))
            order = jnp.argsort(-sev)
            rank = jnp.zeros((N,), jnp.int32).at[order].set(
                jnp.arange(N, dtype=jnp.int32))
            pin_ok = rank < kcap
            zG = jnp.where(cl_up, u, jnp.where(cl_dn, d, alpha))
            zG = jnp.where(free, zG, z)
            cl_up = cl_up & pin_ok
            cl_dn = cl_dn & pin_ok
            aggr_clip = aggr & (it <= 12)
            fl_up = jnp.where(aggr_clip, cl_up, fl_up_e)
            fl_dn = jnp.where(aggr_clip, cl_dn, fl_dn_e)
            zA = jnp.where(aggr_clip, zG, zE)
        else:
            aggr_clip = jnp.asarray(False)
            fl_up, fl_dn, zA = fl_up_e, fl_dn_e, zE
        SxA = jnp.where(fl_up, UP, jnp.where(fl_dn, DN, Sx)).astype(Sx.dtype)
        if J > 0:
            act_e = row_ev & (L_row <= L1 + tol)
            # degenerate-step guard, row part: variables take precedence;
            # otherwise activate only the first tied row
            first_row = jnp.arange(J) == jnp.argmax(act_e)
            act_e = jnp.where(
                degen & jnp.any(ev_all), jnp.zeros_like(act_e),
                jnp.where(degen, act_e & first_row, act_e),
            )
            if settings.clip_step:
                act_g = Og & (G @ zA > g + tol)
                act_sel = jnp.where(aggr_clip, act_g, act_e)
            else:
                act_sel = act_e
            SeA = jnp.where(act_sel, EO, Se).astype(Se.dtype)
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
        # Status release policy. The reference flips only THE most violated
        # single status per iteration (SSQP.jl:174-187) — at most one variable
        # joins the free set per KKT check, which costs O(#IN-at-optimum)
        # iterations from a Phase-1 vertex start. TPU-natively each iteration
        # is a fixed-price full-shape KKT solve, so releasing *every*
        # violated status at once ("multi-free") converges in far fewer
        # iterations for the same per-iteration cost. Multi-release can cycle
        # on degenerate problems, so after `aggr_limit` iterations the loop
        # falls back to the reference's single-flip rule (the same
        # switch-to-Bland escape the reference uses in its simplex,
        # Simplex.jl:486-490).
        one_hot_v = (jnp.arange(N) == kmin) & found
        free_v = jnp.where(aggr, viol_up | viol_dn, one_hot_v)
        SxB = jnp.where(free_v & found, IN, Sx).astype(Sx.dtype)
        if J > 0:
            one_hot_r = (jnp.arange(J) == (kmin - N)) & found
            row_viol = (Se == EO) & (Lda < -tolG)
            free_r = jnp.where(aggr, row_viol, one_hot_r)
            SeB = jnp.where(free_r & found, OE, Se).astype(Se.dtype)
        else:
            SeB = Se
        zP, SxP, SeP = _polish(zB, SxB, SeB, d, u, G, g, tol)
        optB = ~found

        # ---- combine outcomes -----------------------------------------------
        is_free_k = K == 0

        def sel(freek_v, emerg_v, err_v, partial_v, chk_v, opt_v):
            """freeK -> emergency release -> numerical-error -> partial step
            -> KKT flip -> optimal."""
            x = jnp.where(found, chk_v, opt_v)
            x = jnp.where(partial_step, partial_v, x)
            x = jnp.where(numerr, err_v, x)
            x = jnp.where(emerg, emerg_v, x)
            return jnp.where(is_free_k, freek_v, x)

        z_n = sel(z, z, z, zA, zB, zP)
        Sx_n = sel(SxK, SxE, Sx, SxA, SxB, SxP).astype(Sx.dtype)
        Se_n = sel(Se, Se, Se, SeA, SeB, SeP).astype(Se.dtype)
        done_n = sel(optK, jnp.array(False), jnp.array(True), jnp.array(False),
                     jnp.array(False), jnp.array(True))
        status_n = sel(
            jnp.where(optK, it, 0),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(-1, jnp.int32),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
            it,
        ).astype(jnp.int32)
        return _LoopState(z_n, Sx_n, Se_n, it, done_n, status_n, sol_n)

    def cond(st: _LoopState):
        return (~st.done) & (st.it < max_it)

    pre = jnp.asarray(1 if pre_status is None else pre_status, jnp.int32)
    st0 = _LoopState(
        x0.astype(dtype),
        Sx0.astype(jnp.int8),
        Se0.astype(jnp.int8),
        jnp.asarray(0, jnp.int32),
        pre <= 0,
        jnp.where(pre <= 0, pre, 0).astype(jnp.int32),
        (jnp.zeros((N, 1 + R), dtype) if sol0 is None
         else sol0.astype(dtype)),
    )
    st = jax.lax.while_loop(cond, body, st0)
    status = jnp.where(st.done, st.status, -max_it).astype(jnp.int32)
    S = jnp.concatenate([st.Sx, st.Se]) if J > 0 else st.Sx
    res = Result(st.z, S, status)
    # ``return_sol`` exposes the exit KKT CG solution so a caller solving a
    # NEARBY system next (grid warm protocols) can warm-start its CG —
    # cg_solve_padded's early exit then skips most of the sequential matvec
    # chain instead of re-converging every column from zero.
    return (res, st.sol) if return_sol else res


def _attach_duals(Q: QP, res: Result, settings: Optional[Settings] = None) -> Result:
    """Finalize a solved QP: re-solve the free coordinates on the labeled
    active set and attach least-squares dual certificates.

    The loop's exit polish snaps coordinates within ``tol`` of a bound onto
    it WITHOUT re-solving (reference polishSz!, SSQP.jl:10-32) — at f32
    tolerances that alone injects ~1e-6-scale objective error into ~1% of
    frontier instances. One extra working-set KKT solve from the snapped
    pins restores equality feasibility and optimality on the labeled set;
    it is accepted only if finite, primally feasible and not worse."""
    J = Q.J
    dtype = Q.V.dtype
    AG = jnp.concatenate([Q.A, Q.G], axis=0) if J > 0 else Q.A
    bg = jnp.concatenate([Q.b, Q.g]) if J > 0 else Q.b
    Sx = res.S[: Q.N]
    free = Sx == IN
    act = (
        jnp.concatenate([jnp.ones((Q.M,), bool), res.S[Q.N:] == EO])
        if J > 0 else jnp.ones((Q.M,), bool)
    )
    x = res.x
    ok = res.status > 0
    if settings is not None:
        ridge = jnp.asarray(100.0 * float(jnp.finfo(dtype).eps), dtype)
        rp = kkt_solve_cg(Q.V, Q.q, AG, bg, x, free, act,
                          jnp.asarray(settings.cg_iters, jnp.int32),
                          settings.cg_rtol, ridge=ridge)
        xp = jnp.clip(rp.alpha, Q.d, Q.u)
        fobj = lambda xx: 0.5 * xx @ (Q.V @ xx) + Q.q @ xx
        tol = jnp.asarray(settings.tol, dtype)
        accept = (
            ok & jnp.all(jnp.isfinite(xp))
            & _primal_feasible(Q, xp, 10.0 * tol)
            & (fobj(xp) <= fobj(x) + tol)
        )
        x = jnp.where(accept, xp, x)
    lam, gamma = recover_duals(Q.V, Q.q, AG, x, free, act)
    lam = jnp.where(ok, lam, jnp.zeros_like(lam)) if lam.shape[0] else lam
    gamma = jnp.where(ok, gamma, jnp.zeros_like(gamma))
    return Result(x, res.S, res.status, lam, gamma)


@partial(jax.jit, static_argnames=("settings", "with_duals", "return_sol"))
@highest_matmul
def solve_qp_warm2(Q: QP, Sx0, Se0, x0, settings: Settings, pre_status=None,
                   with_duals: bool = True, sol0=None,
                   return_sol: bool = False) -> Result:
    """Two-pass warm-started solve: fast multi-free loop with a capped
    iteration budget, then an exact reference-semantics loop from the same
    start for instances the fast pass failed to converge (cycling is possible
    once feasibility is traded away). Both passes share one compiled loop body
    via traced flags. Fully traced, so it vmaps/shard_maps.

    ``sol0``/``return_sol`` thread the raw KKT CG solution through, so a grid
    protocol solving adjacent instances in sequence (parallel/batch.py's
    waves) carries it as a CG warm start — adjacent grid points solve
    near-identical KKT systems, and cg_solve_padded's per-column early exit
    turns that into a shorter sequential matvec chain."""
    if not settings.multi_free:
        r, sol = solve_qp_loop(Q, Sx0, Se0, x0, settings,
                               pre_status=pre_status, sol0=sol0,
                               return_sol=True)
        r = _attach_duals(Q, r, settings) if with_duals else r
        return (r, sol) if return_sol else r
    cap = min(settings.max_iter, Q.N + Q.J + 64)
    r1, sol1 = solve_qp_loop(Q, Sx0, Se0, x0, settings,
                             pre_status=pre_status,
                             mf_flag=True, max_iter=cap,
                             cg_iters=settings.cg_iters, sol0=sol0,
                             return_sol=True)
    ok1 = r1.status > 0
    pre = jnp.asarray(1 if pre_status is None else pre_status, jnp.int32)
    pre2 = jnp.where(ok1, jnp.asarray(-9, jnp.int32), pre)
    # exact pass: reference stepping semantics + a 4x CG budget, so an
    # instance that failed on solver noise gets a higher-accuracy retry
    r2, sol2 = solve_qp_loop(Q, Sx0, Se0, x0, settings, pre_status=pre2,
                             mf_flag=False, max_iter=settings.max_iter,
                             cg_iters=4 * settings.cg_iters, sol0=sol0,
                             return_sol=True)
    x = jnp.where(ok1, r1.x, r2.x)
    S = jnp.where(ok1, r1.S, r2.S)
    status = jnp.where(ok1, r1.status, r2.status).astype(jnp.int32)
    sol = jnp.where(ok1, sol1, sol2)
    if settings.kkt_cg and settings.escalate_direct:
        # Escalation: an instance the CG path flagged as a numerical error
        # (stalled CG / failed acceptance gate) gets one direct-Cholesky
        # rerun before -1 is final. Instances already solved pass through the
        # while_loop with done pre-set, so the extra pass costs nothing at
        # runtime when unused (one extra loop-body compile).
        import dataclasses as _dc

        direct = _dc.replace(settings, kkt_cg=False)
        pre3 = jnp.where(status == -1, pre, jnp.asarray(-9, jnp.int32))
        r3 = solve_qp_loop(Q, Sx0, Se0, x0, direct, pre_status=pre3,
                           mf_flag=False, max_iter=settings.max_iter)
        esc = (status == -1) & (r3.status > 0)
        x = jnp.where(esc, r3.x, x)
        S = jnp.where(esc, r3.S, S)
        status = jnp.where(esc, r3.status, status).astype(jnp.int32)
        # the direct path never updates the CG carry; sol stays from r1/r2
    r = Result(x, S, status)
    r = _attach_duals(Q, r, settings) if with_duals else r
    return (r, sol) if return_sol else r


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
    return solve_qp_warm2(Q, Sx0, Se0, x0, settings)


def _pdas_update(Q: QP, fu, fd, Sx, Se, res):
    """Semismooth-Newton status rebuild from a KKT candidate (shared by
    the closed-form round 1 and the CG rounds; Hintermüller-Ito-Kunisch
    update — see :func:`_guess_start`)."""
    M = Q.M
    alpha, gamma = res.alpha, res.gamma
    free = Sx == IN
    up = (free & fu & (alpha >= Q.u)) | ((Sx == UP) & (gamma <= 0))
    dn = (free & fd & (alpha <= Q.d)) | ((Sx == DN) & (gamma >= 0))
    Sx_new = jnp.where(up, UP, jnp.where(dn, DN, IN)).astype(jnp.int8)
    if Q.J > 0:
        # Inequality rows get the same semismooth update: activate
        # rows the candidate violates, keep active rows whose
        # multiplier sign is valid (mu >= 0, same convention as the
        # S-loop's Lda check, SSQP.jl:149-172).
        viol = Q.G @ alpha >= Q.g
        muJ = res.alphaL[M:]
        Se_new = jnp.where(
            ((Se == OE) & viol) | ((Se == EO) & (muJ >= 0)), EO, OE
        ).astype(jnp.int8)
    else:
        Se_new = Se
    return Sx_new, Se_new, jnp.clip(alpha, Q.d, Q.u)


def _pdas_round(Q: QP, settings: Settings, Sx, Se, sol,
                W_loop=None, cheb_bounds=None):
    """One PDAS identification round: KKT solve on the current pinned set
    (CG, warm-started from ``sol``) + semismooth status rebuild. Extracted
    from :func:`_guess_start`'s loop body so the batch-level compacted PDAS
    (:func:`_guess_start_batch`) runs the IDENTICAL per-instance round on a
    gathered sub-batch. Returns (Sx', Se', z', sol', changed)."""
    N, M, J = Q.N, Q.M, Q.J
    dtype = Q.V.dtype
    AG = jnp.concatenate([Q.A, Q.G], axis=0) if J > 0 else Q.A
    bg = jnp.concatenate([Q.b, Q.g]) if J > 0 else Q.b
    cg_it = jnp.asarray(settings.pdas_cg_iters, jnp.int32)
    fu = jnp.isfinite(Q.u)
    fd = jnp.isfinite(Q.d)
    ridge = jnp.asarray(100.0 * float(jnp.finfo(dtype).eps), dtype)
    free = Sx == IN
    keep = (
        jnp.concatenate([jnp.ones((M,), bool), Se == EO])
        if J > 0 else jnp.ones((M,), bool)
    )
    zb = jnp.where(Sx == UP, Q.u, jnp.where(Sx == DN, Q.d, 0.0))
    res, sol = kkt_solve_cg(Q.V, Q.q, AG, bg, zb, free, keep,
                            cg_it, settings.pdas_rtol, ridge=ridge,
                            x0=sol, return_sol=True, W=W_loop,
                            cheb=cheb_bounds)
    Sx_new, Se_new, z_new = _pdas_update(Q, fu, fd, Sx, Se, res)
    changed = jnp.any(Sx_new != Sx) | jnp.any(Se_new != Se)
    return Sx_new, Se_new, z_new, sol, changed


def _pdas_shared_W(V, settings: Settings):
    """One-time shared ``W ~= V^{-1}`` for the PDAS closed-form round 1
    (plus optional Chebyshev spectral bounds). Hoisted out of `vmap` on
    shared-V batches — the whole point of Settings.pdas_precond."""
    from jax.scipy.linalg import cho_solve, cholesky as _chol

    dtype = V.dtype
    N = V.shape[0]
    eye = jnp.eye(N, dtype=dtype)
    # W only preconditions/identifies — a small spectral shift keeps the
    # Cholesky stable on merely-PSD V without hurting sign decisions.
    scale = jnp.maximum(jnp.mean(jnp.diag(V)), jnp.asarray(1.0, dtype))
    Lw = _chol(V + (100.0 * float(jnp.finfo(dtype).eps)) * scale * eye,
               lower=True)
    W = cho_solve((Lw, True), eye)
    cheb_bounds = None
    if settings.pdas_cheb:
        # One-time shared spectral interval for the Chebyshev rounds
        # (reduction-free loop body — see ops/kkt.py::_vp_cheb_xla).
        # Valid for every pin mask by Cauchy interlacing; hoists out of
        # vmap on shared-V batches like W itself.
        from ssqp_tpu.ops.kkt import shared_jacobi_bounds

        cheb_bounds = shared_jacobi_bounds(V, W)
    return W, cheb_bounds


def _pdas_round1(Q: QP, settings: Settings, W, Sx0, Se0, z0, sol0):
    """Closed-form PDAS round 1 through the shared ``W ~= V^{-1}``
    (ops/kkt.py::kkt_allfree_shared). From the all-IN start the KKT system
    is the unmasked equality solve, shared across an instance batch except
    for the linear terms. Returns the updated (it, Sx, Se, z, sol) carry —
    unchanged (it=0) when the shifted Cholesky produced non-finite
    candidates, so the CG loop starts cold instead of poisoned."""
    N, M, J = Q.N, Q.M, Q.J
    dtype = Q.V.dtype
    AG = jnp.concatenate([Q.A, Q.G], axis=0) if J > 0 else Q.A
    bg = jnp.concatenate([Q.b, Q.g]) if J > 0 else Q.b
    fu = jnp.isfinite(Q.u)
    fd = jnp.isfinite(Q.d)
    ridge = jnp.asarray(100.0 * float(jnp.finfo(dtype).eps), dtype)
    keep0 = (
        jnp.concatenate([jnp.ones((M,), bool), jnp.zeros((J,), bool)])
        if J > 0 else jnp.ones((M,), bool)
    )
    res1, sol1 = kkt_allfree_shared(Q.V, W, Q.q, AG, bg, keep0, ridge)
    Sx1, Se1, z1 = _pdas_update(Q, fu, fd, Sx0, Se0, res1)
    good = res1.ok
    Sx = jnp.where(good, Sx1, Sx0)
    Se = jnp.where(good, Se1, Se0)
    z = jnp.where(good, z1, z0)
    sol = jnp.where(good, sol1, sol0)
    it = jnp.where(good, 1, 0).astype(jnp.int32)
    return it, Sx, Se, z, sol


def _waterfill_seed(Q: QP):
    """Exact active set of the SEPARABLE model of a single-equality box QP —
    the water-filling seed for PDAS identification (Settings.pdas_waterfill).

    For ``min 1/2 x'Dx + q'x  s.t.  a'x = beta, d <= x <= u`` with
    D = diag(V), stationarity gives x_i(lam) = clip((-q_i - lam*a_i)/D_i,
    d_i, u_i) and h(lam) = a'x(lam) is continuous, piecewise linear and
    strictly decreasing wherever a variable is free — the seed solves the
    dual root h(lam*) = beta and reads the active set off the clip
    pattern at lam*.

    Why it helps: PDAS round 1 from all-IN pins by the UNCONSTRAINED-box
    violations of the equality-only solve, which over/under-pins under tight
    boxes and takes ~5 full-activity rounds to settle (measured still-
    changing profile at N=256 tight-box: 256/249/237/202/127/14 per round).
    The water-filling set already accounts for the budget row jointly with
    the box, and seeding it drops the profile to 256/236/55/2 with 100%
    final-status agreement (scratch/seed_study.py, round 5). No reference
    analogue (the reference starts from a Phase-1 vertex, SSQP.jl:461).

    Handles any sign pattern of ``a`` and infinite bounds. Root finding is
    SORT-FREE: a first implementation sorted the 2N breakpoints and
    prefix-summed segment deltas, but a batched (1024, 512) sort costs
    ~15 ms on TPU (bitonic) — measured to ERASE the seed's entire win at
    the headline cold wave. Instead the dual root is isolated by LEVELS
    rounds of 33-point parallel bracket subdivision (each one fused
    broadcast-clip-reduce op, no data-dependent control flow) and finished
    with one false-position step, exact once the final bracket spans a
    single linear segment (resolution 32^6 ~ 1e9 of the initial bracket).

    Returns ``(valid, Sx, z)``; callers must gate on ``valid`` (False when
    D has nonpositive entries or the dual root is not bracketed) and use it
    only when M == 1 and J == 0 (static caller gate).
    """
    LEVELS, K = 6, 32
    dtype = Q.V.dtype
    a = Q.A[0]
    beta = Q.b[0]
    D = jnp.diag(Q.V)
    ok_D = jnp.all(D > 0)
    Ds = jnp.where(D > 0, D, jnp.ones((), dtype))
    az = a == 0
    asafe = jnp.where(az, jnp.ones((), dtype), a)

    def h(lam):
        # a'x(lam) summed over eventful vars only (a_i == 0 contributes 0)
        t = (-Q.q - lam[..., None] * a) / Ds
        return jnp.sum(jnp.where(az, 0.0, a * jnp.clip(t, Q.d, Q.u)),
                       axis=-1)

    # breakpoints of each variable's clip window (used only for the initial
    # bracket; infinite-bound breakpoints are masked out)
    lo_i = (-Q.q - Ds * jnp.where(a > 0, Q.u, Q.d)) / asafe
    hi_i = (-Q.q - Ds * jnp.where(a > 0, Q.d, Q.u)) / asafe
    bp = jnp.concatenate([lo_i, hi_i])
    bp_ok = jnp.isfinite(bp) & jnp.concatenate([~az, ~az])
    lmin = jnp.min(jnp.where(bp_ok, bp, jnp.inf))
    lmax = jnp.max(jnp.where(bp_ok, bp, -jnp.inf))
    # beyond the finite breakpoints h is linear; when a side still has free
    # variables (infinite start/end bounds) the crossing may lie outside
    # [lmin, lmax] — its analytic root extends the bracket
    free_lo = ~az & ~jnp.isfinite(jnp.where(a > 0, Q.u, Q.d))
    free_hi = ~az & ~jnp.isfinite(jnp.where(a > 0, Q.d, Q.u))
    S_lo = jnp.sum(jnp.where(free_lo, a * a / Ds, 0.0))
    S_hi = jnp.sum(jnp.where(free_hi, a * a / Ds, 0.0))
    # h(lam) = h(anchor) - (lam - anchor) * S on the outer linear pieces
    root_lo = lmin - (beta - h(lmin)) / jnp.where(S_lo > 0, S_lo, 1.0)
    root_hi = lmax + (h(lmax) - beta) / jnp.where(S_hi > 0, S_hi, 1.0)
    span = jnp.maximum(lmax - lmin, 1.0)
    lo = jnp.where((S_lo > 0) & (root_lo < lmin), root_lo, lmin) - 1e-3 * span
    hi = jnp.where((S_hi > 0) & (root_hi > lmax), root_hi, lmax) + 1e-3 * span
    have_bp = jnp.any(bp_ok)
    lo = jnp.where(have_bp, lo, -1.0)
    hi = jnp.where(have_bp, hi, 1.0)
    valid = ok_D & have_bp & (h(lo) >= beta) & (beta >= h(hi))

    grid01 = jnp.linspace(0.0, 1.0, K + 1).astype(dtype)

    def level(carry, _):
        lo, hi = carry
        lam_g = lo + (hi - lo) * grid01
        cnt = jnp.sum(h(lam_g) >= beta)  # h non-increasing along the grid
        k = jnp.clip(cnt - 1, 0, K - 1)
        return (lam_g[k], lam_g[k + 1]), None

    (lo, hi), _ = jax.lax.scan(level, (lo, hi), None, length=LEVELS)
    # false-position finish: exact when [lo, hi] spans one linear segment
    hlo, hhi = h(lo), h(hi)
    lam = jnp.where(hlo > hhi, lo + (hlo - beta) * (hi - lo)
                    / jnp.where(hlo > hhi, hlo - hhi, 1.0),
                    0.5 * (lo + hi))
    valid = valid & jnp.isfinite(lam)
    t = (-Q.q - lam * a) / Ds
    Sx = jnp.where(t >= Q.u, UP, jnp.where(t <= Q.d, DN, IN)).astype(jnp.int8)
    z = jnp.clip(t, Q.d, Q.u)
    z = jnp.where(jnp.isfinite(z), z, 0.0)
    return valid, Sx, z


def _guess_start(Q: QP, settings: Settings, rounds: int = 12,
                 return_state: bool = False):
    """Active-set guess by primal-dual active-set (PDAS) identification.

    Each round solves the equality-constrained QP with the current pinned
    set, then rebuilds the whole status vector with the semismooth-Newton
    update rule (Hintermüller-Ito-Kunisch):

        pin UP   iff (free and alpha >= u)  or (pinned UP and gamma <= 0)
        pin DN   iff (free and alpha <= d)  or (pinned DN and gamma >= 0)

    Unlike accumulate-only clipping, a wrong pin is RELEASED the next round
    by its multiplier sign — this is what survives tight boxes, where the
    first clip over-pins (even to an empty free set) and only the dual
    feedback can walk it back. The Schur complement gets a small ridge so a
    momentarily rank-deficient working equality system (e.g. every variable
    pinned) still produces finite, correctly-signed multipliers instead of
    NaNs: an over-pinned budget row then yields a large-magnitude alphaL
    whose sign releases the right side of the box. Rounds stop early when
    the status vector reaches a fixed point. Purely a heuristic: the caller
    validates the outcome (converged + primal feasible) and falls back to
    Phase-1.

    Cost control (this heuristic is ~all of the headline batch solve time):
    the rounds run on the cheap CG budget (Settings.pdas_cg_iters /
    pdas_rtol — identification needs signs, not solver-accuracy residuals),
    and each round warm-starts its multi-RHS CG from the previous round's
    raw solution (successive rounds differ only in a few mask entries).
    Round 1 is special-cased: from the all-IN start its KKT system is the
    unmasked equality solve, shared across an instance batch except for the
    linear terms, so with Settings.pdas_precond it is solved in closed form
    through a one-time W ~= V^{-1} (ops/kkt.py::kkt_allfree_shared) whose
    factorizations hoist out of `vmap` — replacing the most expensive cold
    CG round with a couple of shared GEMMs."""
    N, M, J = Q.N, Q.M, Q.J
    dtype = Q.V.dtype
    AG = jnp.concatenate([Q.A, Q.G], axis=0) if J > 0 else Q.A
    bg = jnp.concatenate([Q.b, Q.g]) if J > 0 else Q.b
    fu = jnp.isfinite(Q.u)
    fd = jnp.isfinite(Q.d)
    # Heuristic-only regularization (see docstring); scaled well above
    # dtype eps so the f32 Schur solve stays stably invertible.
    ridge = jnp.asarray(100.0 * float(jnp.finfo(dtype).eps), dtype)

    def round_body(carry):
        it, Sx, Se, z, sol, _ = carry
        Sx_new, Se_new, z_new, sol, changed = _pdas_round(
            Q, settings, Sx, Se, sol, W_loop=W_loop, cheb_bounds=cheb_bounds)
        return it + 1, Sx_new, Se_new, z_new, sol, changed

    def round_cond(carry):
        it, _, _, _, _, changed = carry
        return (it < rounds) & changed

    Sx0 = jnp.full((N,), IN, jnp.int8)
    Se0 = jnp.full((J,), OE, jnp.int8)
    z0 = jnp.zeros((N,), dtype)
    sol0 = jnp.zeros((N, 1 + M + J), dtype)
    it0 = jnp.asarray(0, jnp.int32)
    W_loop = None
    cheb_bounds = None
    if settings.pdas_precond:
        W, cheb_bounds = _pdas_shared_W(Q.V, settings)
        if settings.pdas_pcg:
            W_loop = W
        it0, Sx0, Se0, z0, sol0 = _pdas_round1(
            Q, settings, W, Sx0, Se0, z0, sol0)
    if settings.pdas_waterfill and M == 1 and J == 0:
        # water-filling seed (see :func:`_waterfill_seed`): the separable
        # model's exact active set replaces round 1's unconstrained-clip
        # statuses where applicable; the closed-form round-1 sol (when
        # computed) is KEPT as the CG warm start — the hybrid measured the
        # same activity profile as a cold waterfill seed
        okw, Sxw, zw = _waterfill_seed(Q)
        Sx0 = jnp.where(okw, Sxw, Sx0)
        z0 = jnp.where(okw, zw, z0)
    it, Sx, Se, z, sol, changed = jax.lax.while_loop(
        round_cond, round_body,
        (it0, Sx0, Se0, z0, sol0, jnp.asarray(True)),
    )
    # ``sol`` is the final round's raw CG solution: the S-loop's first
    # iteration solves (nearly) the same system at full accuracy, so it
    # warm-starts from here (solve_qp_auto_core passes it as sol0).
    if return_state:
        # (it, changed) expose the loop carry so _guess_start_batch can
        # CONTINUE the identification from here at compacted width with the
        # per-instance round budget intact.
        return z, Sx, Se, sol, it, changed
    return z, Sx, Se, sol


def _guess_start_batch(Q: QP, settings: Settings, shared: tuple = (),
                       rounds: int = 12, compact: int = 4):
    """Batch-level PDAS identification with STATIC-WIDTH COMPACTION.

    Runs exactly the per-instance rounds of :func:`_guess_start`
    (:func:`_pdas_round1` + :func:`_pdas_round`), but scheduled at batch
    level on ``(B, ...)`` arrays instead of per-instance `vmap`+`while`:

      1. the closed-form round 1 and subsequent CG rounds run at full
         width B while MORE than ``B // levels[0]`` instances are still
         changing;
      2. once at most that many are still changing, each step GATHERS them
         (stable argsort of the active mask) into a fixed C-column buffer,
         advances that sub-batch ONE round, and SCATTERS the results back —
         all shapes static, so it stays jit/vmap-clean. ``compact`` may be
         an int (one level, C = B // compact) or a tuple of increasing
         divisors (a CASCADE, e.g. ``(2, 4, 8)``: width halves as the
         still-changing count crosses each B // level threshold — motivated
         by the measured round profile at N=256 B=8192, which stays ~100%
         active through round 5 and then decays 46/28/19/14/11/9% —
         scratch/pdas_hist.py).

    Rationale (the round-3 profile): PDAS identification is ~all of the
    headline device time and its floor is sum-over-rounds(max-over-batch
    CG iterations) — late rounds run full-width GEMMs for a handful of
    still-changing instances. Compaction cuts the GEMM width by
    ``compact``x exactly on those rounds. Per-instance semantics are
    IDENTICAL to `vmap(_guess_start)`: each instance sees the same round
    sequence, warm starts, and `rounds` budget (a vmapped while_loop
    already masks converged instances — this just stops paying lanes for
    them). Accelerates the reference's hot identification loop
    (SSQP.jl:276-332) without changing its semantics.

    Returns batched ``(z, Sx, Se, sol)`` like :func:`_guess_start`.
    """
    import dataclasses

    from ssqp_tpu.parallel.batch import qp_axes, settings_for_shared

    settings = settings_for_shared(settings, shared)
    N, M, J = Q.N, Q.M, Q.J
    dtype = Q.V.dtype
    ax = qp_axes(Q, shared)
    B = Q.q.shape[0]
    levels = (compact,) if isinstance(compact, int) else tuple(compact)
    assert all(k >= 1 for k in levels) and list(levels) == sorted(levels)
    R = M + J

    Sx0 = jnp.full((B, N), IN, jnp.int8)
    Se0 = jnp.full((B, J), OE, jnp.int8)
    z0 = jnp.zeros((B, N), dtype)
    sol0 = jnp.zeros((B, N, 1 + R), dtype)
    it0 = jnp.zeros((B,), jnp.int32)

    W_loop = None
    cheb_bounds = None
    if settings.pdas_precond:
        # V is shared here (settings_for_shared guarantees it): W and the
        # optional Chebyshev bounds are computed ONCE outside the vmap.
        W, cheb_bounds = _pdas_shared_W(Q.V, settings)
        if settings.pdas_pcg:
            W_loop = W
        it0, Sx0, Se0, z0, sol0 = jax.vmap(
            lambda p, sx, se, zz, so: _pdas_round1(
                p, settings, W, sx, se, zz, so),
            in_axes=(ax, 0, 0, 0, 0),
        )(Q, Sx0, Se0, z0, sol0)
    if settings.pdas_waterfill and M == 1 and J == 0:
        # identical per-instance water-filling override as _guess_start
        okw, Sxw, zw = jax.vmap(_waterfill_seed, in_axes=(ax,))(Q)
        Sx0 = jnp.where(okw[:, None], Sxw, Sx0)
        z0 = jnp.where(okw[:, None], zw, z0)

    vround = jax.vmap(
        lambda p, sx, se, so: _pdas_round(
            p, settings, sx, se, so, W_loop=W_loop, cheb_bounds=cheb_bounds),
        in_axes=(ax, 0, 0, 0),
    )

    # the per-instance loop seeds changed=True, so round 1 never concludes
    active0 = it0 < rounds

    def full_body(carry):
        it, Sx, Se, z, sol, active = carry
        Sxn, Sen, zn, soln, ch = vround(Q, Sx, Se, sol)
        upd = active[:, None]
        Sx = jnp.where(upd, Sxn, Sx)
        Se = jnp.where(upd, Sen, Se)
        z = jnp.where(upd, zn, z)
        sol = jnp.where(active[:, None, None], soln, sol)
        it = it + active.astype(jnp.int32)
        active = active & ch & (it < rounds)
        return it, Sx, Se, z, sol, active

    def full_cond(carry):
        active = carry[-1]
        return jnp.sum(active) > max(B // levels[0], 1)

    carry = jax.lax.while_loop(
        full_cond, full_body, (it0, Sx0, Se0, z0, sol0, active0))

    batched_fields = tuple(
        f for f in ("V", "A", "G", "q", "b", "g", "d", "u")
        if f not in shared)

    def gather_Q(idx):
        return dataclasses.replace(
            Q, **{f: getattr(Q, f)[idx] for f in batched_fields})

    def make_comp_body(C):
        def comp_body(carry):
            it, Sx, Se, z, sol, active = carry
            # stable sort puts still-active instances first; mask guards the
            # scatter for steps where fewer than C remain active
            idx = jnp.argsort(~active)[:C]
            mask = active[idx]
            Sxn, Sen, zn, soln, ch = vround(gather_Q(idx), Sx[idx], Se[idx],
                                            sol[idx])
            mm = mask[:, None]
            Sx = Sx.at[idx].set(jnp.where(mm, Sxn, Sx[idx]))
            Se = Se.at[idx].set(jnp.where(mm, Sen, Se[idx]))
            z = z.at[idx].set(jnp.where(mm, zn, z[idx]))
            sol = sol.at[idx].set(
                jnp.where(mask[:, None, None], soln, sol[idx]))
            it = it.at[idx].add(mask.astype(jnp.int32))
            active = active.at[idx].set(mask & ch & (it[idx] < rounds))
            return it, Sx, Se, z, sol, active
        return comp_body

    for i, k in enumerate(levels):
        C = max(B // k, 1)
        if i + 1 < len(levels):
            nxt = max(B // levels[i + 1], 1)
            cond = (lambda nxt: lambda c: jnp.sum(c[-1]) > nxt)(nxt)
        else:
            cond = lambda c: jnp.any(c[-1])
        carry = jax.lax.while_loop(cond, make_comp_body(C), carry)

    it, Sx, Se, z, sol, active = carry
    return z, Sx, Se, sol


def _primal_violation(Q: QP, x):
    """Max primal constraint violation at ``x`` (0 when feasible; +inf on
    non-finite points). Shared by the feasibility gates here and the
    refinement acceptance guard (solvers/refine.py)."""
    v = jnp.where(jnp.all(jnp.isfinite(x)), 0.0, jnp.inf).astype(x.dtype)
    if Q.M > 0:
        v = jnp.maximum(v, jnp.max(jnp.abs(Q.A @ x - Q.b)))
    if Q.J > 0:
        v = jnp.maximum(v, jnp.max(Q.G @ x - Q.g))
    v = jnp.maximum(v, jnp.max(Q.d - x))
    v = jnp.maximum(v, jnp.max(x - Q.u))
    return jnp.maximum(v, 0.0)


def _primal_feasible(Q: QP, x, ftol):
    return _primal_violation(Q, x) <= ftol


def solve_qp_auto_core(
    Q: QP, settings: Settings, settings_lp: Optional[Settings] = None,
    return_sol: bool = False, guess=None,
) -> Result:
    """Three-stage auto solve, duals not attached (see :func:`solve_qp_auto`).
    Split out so internal callers (frontier rescue branches) get a Result
    whose pytree matches :func:`solve_qp_loop` outputs under `lax.cond`
    (``return_sol=False`` keeps that contract; True additionally returns the
    exit KKT CG solution for grid protocols to carry, see solve_qp_warm2).
    ``guess`` optionally injects a precomputed PDAS identification
    ``(z, Sx, Se, sol)`` — used by the batch-level compacted PDAS
    (:func:`_guess_start_batch`), which runs the identification OUTSIDE the
    per-instance vmap and hands each instance its slice here."""
    from ssqp_tpu.solvers.phase1 import init_qp_traced

    dtype = Q.V.dtype
    if not settings.multi_free:
        x0, Sx0, Se0, st1 = init_qp_traced(Q, settings_lp or settings)
        r, sol = solve_qp_loop(Q, Sx0, Se0, x0, settings, pre_status=st1,
                               return_sol=True)
        return (r, sol) if return_sol else r

    cap = min(settings.max_iter, Q.N + Q.J + 64)
    # The guess start either converges almost immediately (loose bounds:
    # the clipped set IS the active set) or churns (tight bounds pin far too
    # much) — so give it a short budget and fail over quickly.
    guess_cap = min(cap, 16)
    zg, Sxg, Seg, solg = guess if guess is not None else _guess_start(
        Q, settings)
    rg, sol_g = solve_qp_loop(Q, Sxg, Seg, zg, settings,
                              mf_flag=True, max_iter=guess_cap,
                              cg_iters=settings.cg_iters, sol0=solg,
                              return_sol=True)
    ftol = jnp.asarray(10.0 * settings.tol, dtype)
    okg = (rg.status > 0) & _primal_feasible(Q, rg.x, ftol)

    x0, Sx0, Se0, st1 = init_qp_traced(Q, settings_lp or settings, skip=okg)
    pre1 = jnp.where(okg, jnp.asarray(-9, jnp.int32), st1)
    r2, sol_2 = solve_qp_warm2(Q, Sx0, Se0, x0, settings, pre_status=pre1,
                               with_duals=False, return_sol=True)
    x = jnp.where(okg, rg.x, r2.x)
    S = jnp.where(okg, rg.S, r2.S)
    status = jnp.where(okg, rg.status, r2.status).astype(jnp.int32)
    r = Result(x, S, status)
    return (r, jnp.where(okg, sol_g, sol_2)) if return_sol else r


@partial(jax.jit, static_argnames=("settings", "settings_lp"))
@highest_matmul
def solve_qp_auto(Q: QP, settings: Settings, settings_lp: Optional[Settings] = None) -> Result:
    """Fully-traced auto solve (reference solveQP(Q::QP), SSQP.jl:224-234).

    Jit-compatible end to end, so it `vmap`s over instance batches and
    `shard_map`s over device meshes. Three-stage strategy (all stages share
    ONE compiled loop body via traced flags; a finished instance passes
    through later `lax.while_loop`s with its done flag already set):

      1. guess pass — S-loop from the PDAS-identified active set
         (:func:`_guess_start`); accepted only if the result converged AND is
         primally feasible (the guess start cannot certify feasibility);
      2. fast pass — Phase-1 simplex start + aggressive multi-free loop
         (capped iterations);
      3. exact pass — reference-semantics loop from the same Phase-1 state
         with a 4x CG budget, for anything still unconverged.

    Attaches least-squares dual certificates (Result.lam/.gamma).
    """
    return _attach_duals(Q, solve_qp_auto_core(Q, settings, settings_lp), settings)
