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


def settings_for_shared(settings: Settings, shared: tuple) -> Settings:
    """Disable the PDAS round-1 closed form when V is per-instance: its
    one-time W ~= V^{-1} only amortizes when it hoists out of `vmap` as a
    shared leaf — batched, the (B, N, N) inverse would dwarf the CG rounds
    it replaces (and at headline batch sizes not even fit HBM)."""
    import dataclasses

    if "V" not in shared and settings.pdas_precond:
        settings = dataclasses.replace(settings, pdas_precond=False)
    return settings


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

    settings = settings_for_shared(settings, shared)
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
    so infeasible instances exit with status 0 without a feasibility pass.

    Composed from the staged pieces (cclp_pre / cclp_repair / cclp_post)
    rather than vmapping solve_lp_traced: the second-chance basis repair
    must sit behind a BATCH-level `lax.cond` — under vmap a per-instance
    cond lowers to select and the repair's sequential GJ sweep would tax
    every clean solve (~24% measured on the config2 class)."""
    from ssqp_tpu.solvers.cclp import cclp_post, cclp_pre, cclp_repair

    ax = lp_axes(P, shared)
    N, J = P.N, P.J
    sf_b, st_b = jax.vmap(lambda p: cclp_pre(p, settings), in_axes=(ax,))(P)
    Nt = sf_b.c1.shape[-1]

    def do_repair(args):
        sfb, stb = args
        return jax.vmap(
            lambda sf, st: cclp_repair(
                sf.c1, sf.A1, sf.b1, st, tol=settings.tol,
                max_iter=settings.max_iter,
                ms_mask=jnp.arange(Nt) < (N + J)),
            in_axes=(0, 0),
        )(sfb, stb)

    st_b = jax.lax.cond(
        jnp.any(st_b.status == -1), do_repair, lambda args: args[1],
        (sf_b, st_b))
    return jax.vmap(
        lambda p, sf, st: cclp_post(p, sf, st, settings),
        in_axes=(ax, 0, 0),
    )(P, sf_b, st_b)


@partial(jax.jit, static_argnames=("settings", "shared"))
@highest_matmul
def _solve_qp_batch_nodual(Q: QP, settings: Settings, shared: tuple = ()):
    """Batched auto solve WITHOUT dual attachment — the search stage of the
    refined pipeline, where lam/gamma would be computed per instance (an
    (M+J)-sized normal-equations Cholesky each) only to be discarded."""
    from ssqp_tpu.solvers.ssqp import solve_qp_auto_core

    settings = settings_for_shared(settings, shared)
    ax = qp_axes(Q, shared)
    return jax.vmap(
        lambda p: solve_qp_auto_core(p, settings), in_axes=(ax,)
    )(Q)


def batch_kkt_resid(Q: QP, res: Result, shared: tuple = (), hi=None):
    """Per-instance relative KKT residual (stationarity scaled by
    1 + max|q|, max'd with absolute primal violations), evaluated with the
    attached duals in ``hi`` precision (float64 when x64 is on). This is
    the tail-refinement policy's selection statistic — kept as a public
    helper so its calibration against true objective gaps
    (scratch/calib_tail.py) exercises exactly the shipped formula. Failed
    instances report -inf (not refinable on their labeled set)."""
    if hi is None:
        hi = jnp.float64 if jax.config.jax_enable_x64 else Q.V.dtype
    M, J = Q.M, Q.J
    ax = qp_axes(Q, shared)

    def resid_one(p, r):
        x = r.x.astype(hi)
        AG = (jnp.concatenate([p.A, p.G], axis=0) if J > 0 else p.A).astype(hi)
        stat = p.V.astype(hi) @ x + p.q.astype(hi) + AG.T @ r.lam.astype(hi) \
            - r.gamma.astype(hi)
        e = jnp.max(jnp.abs(stat)) / (1.0 + jnp.max(jnp.abs(p.q.astype(hi))))
        if M > 0:
            e = jnp.maximum(
                e, jnp.max(jnp.abs(p.A.astype(hi) @ x - p.b.astype(hi))))
        if J > 0:
            e = jnp.maximum(
                e, jnp.max(p.G.astype(hi) @ x - p.g.astype(hi)))
        return jnp.where(r.status > 0, e, -jnp.inf)

    return jax.vmap(resid_one, in_axes=(ax, Result(0, 0, 0, 0, 0)))(Q, res)


def _tail_resid_bound(N: int) -> float:
    """Default f64-KKT-residual threshold above which an f32-searched
    instance gets tail-refined (see :func:`solve_qp_batch_tail_refined`).

    Calibrated on the frontier class, 3 covariance seeds x 256 f64
    references at each of N=512 and N=1024 (scratch/calib_tail.py,
    round 5 — the resid->gap map is N-stable):

        bound    frac refined   max gap left unrefined (512 / 1024)
        1.0e-6   ~72%           1.4e-7 / 1.6e-7
        2.0e-6   ~43%           3.8e-7 / 3.9e-7   <- default
        2.5e-6   ~30%           6.8e-7 / 6.3e-7
        4.0e-6   ~0.5%          1.2e-6 (the round-3 breach returns)

    2.0e-6 holds the worst unrefined instance under the 5e-7 line with the
    audit's 1e-6 bar at 2.5x margin; on unseen classes a shifted relation
    degrades throughput (more passes), not accuracy, since every instance
    above the bound is refined up to max_passes coverage.
    """
    return 2.0e-6


def auto_protocol(N: int, B: int, q_only: bool) -> int:
    """The waves dispatch rule, split out so the measured (N, B) protocol
    grid can be pinned by a regression test (tests/test_parallel.py).

    Measured same-session alternating TPU A/Bs (best-of-3, QP/s):

        cell (N, B)      plain     waves=8   winner   wave width
        (128, 1024) r3   45.8k     36.0k     plain    128
        (256, 2048) r5   62.8k     57.6k     plain    256
        (512, 2048) r4   60.6k     45.8k     plain    256
        (1024,1024) r4   18.8k      6.5k     plain    128
        (1024,2048) r5   25.1k     13.8k     plain    256
        (128, 8192) r5  185.9k    225.7k     waves    1024
        (256, 8192) r4  ~175k     ~230k      waves    1024
        (512, 8192) r5   67.6k    104.1k     waves    1024
        (1024,8192) r5   23.3k     41.4k     waves    1024

    The winner is decided by WAVE WIDTH alone, at every N measured: the
    cold wave must clear the ~20-26 ms latency floor (width >= ~1024), else
    waves pays W-1 warm launches on top of a floor-bound cold solve. Round
    4's "waves loses at scale" was a width artifact (B=2048 cells), not an
    N effect — and the N=1024 warm-S-walk blowup (maxSit 36 r4 / 16-19 r5)
    appears only at widths <= 256; at width 1024 the warm walks stay <= 4
    S-iterations even at N=1024 (scratch/ab_scale.py, round 5).
    """
    return 8 if (q_only and B % 8 == 0 and B // 8 >= 1024) else 0


def solve_qp_batch_auto(
    Q: QP, settings: Settings = None, shared: tuple = (),
    waves: int = None, tail: int = None,
) -> Result:
    """ONE batch entry point that applies the measured protocol cost model
    (VERDICT r3 weak #4: protocol selection was manual, and picking waves at
    the wrong scale silently loses ~25%).

    The model (scratch/prof_waves.py round 3 + scratch/ab_scale.py round 5):
    a cold batch solve has a ~20-26 ms latency floor for any width <= ~2048
    (the PDAS sequential CG chain is latency-bound there), and each warm
    wave costs a flat ~3.5 ms, so T(W) ~ cold(B/W) + (W-1)*3.5ms. Waves
    therefore WIN only when the batch is a q-only grid (warm-start
    validity) AND the wave width B/8 clears the floor — see
    :func:`auto_protocol` for the measured (N, B) grid. Rule: waves=8 iff
    q-only shared and B/8 >= 1024; else plain vmap.

    ``tail`` (residual-thresholded refinement,
    solve_qp_batch_tail_refined) defaults ON at N >= 512 when x64 is
    available — the f32 search's objective gap brushes past 1e-6 there.
    The round-5 policy refines every instance whose f64 KKT residual
    exceeds the calibrated bound (~43% of frontier instances at N>=512),
    in up to 4 static-width B/4 passes of ONE f64-residual sweep each,
    which holds the max gap near ~4e-7 (scratch/calib_tail.py: bound
    2e-6 -> max unrefined gap 3.8e-7/3.9e-7 at N=512/1024 across 3 seeds).

    Both knobs accept explicit overrides; `None` means "apply the model".
    """
    settings = settings or Settings.for_dtype(Q.V.dtype)
    B = Q.q.shape[0]
    q_only = {"V", "A", "G", "b", "g", "d", "u"} <= set(shared)
    if waves is None:
        waves = auto_protocol(Q.N, B, q_only)
    if tail is None:
        needs_tail = (Q.N >= 512 and jnp.dtype(Q.V.dtype) != jnp.float64)
        if needs_tail and jax.config.jax_enable_x64:
            # residual-threshold tail policy (round 5): refine in
            # B//tail-wide passes until no instance's f64 KKT residual
            # exceeds _tail_resid_bound (max_passes caps the cost); the
            # fixed round-4 depths (8 at N=512 / 4 at N=1024) left the max
            # objective gap calibrated rather than controlled (7.5e-7 /
            # 8.8e-7 on one seed). B/4-wide passes: the bound selects ~43%
            # of frontier instances, so 2 passes typically cover it.
            tail = 4
        else:
            tail = 0
            if needs_tail:
                # Without x64 the f64 residuals (and f64-residual sweeps)
                # that restore the <1e-6 objective-gap bar at N >= 512 are
                # unavailable — and a compensated-f32 fallback is NOT an
                # option on this stack: XLA reassociates away error-free-
                # transformation terms under whole-graph compilation
                # (measured in solvers/refine.py::solve_qp_refined_dd's
                # history: ~9e-32 eager vs 1.4e-17 jitted). Warn loudly
                # instead of silently shipping ~1e-6-gap solutions.
                import warnings

                warnings.warn(
                    "solve_qp_batch_auto: N >= 512 float32 search without "
                    "jax_enable_x64 — worst-instance objective gaps can "
                    "exceed 1e-6 (tail refinement needs float64 residuals; "
                    "enable x64 or use solve_qp_batch_refined on a float64 "
                    "problem).",
                    stacklevel=2,
                )
    # static-width PDAS compaction pays only where identification runs at
    # full throughput-bound width: plain protocol, B >= 4096 (round-4 TPU
    # map at plain B=8192 N=256 — cascade (2,4,8) 188.5k vs flat-4 178.3k
    # vs none 168.1k; it LOSES under waves (222 vs 238k; the cold wave is
    # latency-bound) and at B=2048 N=512 (53.4 vs 56.8k)
    compact = (2, 4, 8) if (waves == 0 and B >= 4096) else 0
    if tail > 0:
        # iters=1: one f64-residual sweep per refined instance measured
        # accuracy-identical to two at the calibrated bound (max gap
        # 2.34e-7 both, scratch/check_sweeps.py) at half the sweep cost
        return solve_qp_batch_tail_refined(Q, settings, shared, waves=waves,
                                           tail=tail, iters=1,
                                           compact=compact)
    if waves > 1:
        return solve_qp_batch_waves(Q, settings, shared, waves=waves)
    if compact:
        return solve_qp_batch_compact(Q, settings, shared=shared,
                                      compact=compact)
    return solve_qp_batch(Q, settings, shared=shared)


@partial(jax.jit,
         static_argnames=("settings", "shared", "waves", "tail", "iters",
                          "compact", "resid_bound", "max_passes"))
@highest_matmul
def solve_qp_batch_tail_refined(
    Q: QP, settings: Settings, shared: tuple = (), waves: int = 0,
    tail: int = 16, iters: int = 2, compact: int = 0,
    resid_bound: float = None, max_passes: int = 4,
) -> Result:
    """Batch solve + residual-thresholded refinement of the worst tail.

    At N>=512 the f32 search's worst-instance objective gap brushes past the
    1e-6 audit line (round-3 scale sweep: 1.08e-6 at N=512, 1.23e-6 at
    N=1024) — an artifact of f32 KKT solve accuracy, not of the identified
    active set. Rather than paying the full refined tier, this re-polishes
    instances whose float64 KKT residual (stationarity + primal, evaluated
    with the attached duals) exceeds ``resid_bound``
    (default :func:`_tail_resid_bound`, calibrated to predict objective
    gaps above ~2.5e-7): a `lax.while_loop` of static-width passes, each
    gathering the ``B // tail`` worst-residual instances, running ``iters``
    factorization-free f64-residual sweeps
    (solvers/refine.py::refine_result_cg with exact_sweeps) and scattering
    back, until nothing is left above the bound or ``max_passes`` is
    reached. All shapes static; zero passes run when the batch is already
    clean. ``resid_bound=0.0`` forces exactly the round-4 behavior of
    refining the top ``B // tail`` unconditionally (one pass at
    ``max_passes=1``). Requires x64 for the f64 residuals (degrades to a
    no-op-accuracy polish without it — solve_qp_batch_auto warns).
    Reference accuracy bar: native tol=2^-26 solves at every size
    (types.jl:390-408).
    """
    from ssqp_tpu.solvers.refine import refine_result_cg

    settings = settings_for_shared(settings, shared)
    if waves > 1:
        res = solve_qp_batch_waves(Q, settings, shared, waves=waves,
                                   compact=compact)
    elif compact:
        res = solve_qp_batch_compact(Q, settings, shared=shared,
                                     compact=compact)
    else:
        res = solve_qp_batch(Q, settings, shared=shared)

    B = res.x.shape[0]
    K = max(B // max(tail, 1), 1)
    N, M, J = Q.N, Q.M, Q.J
    hi = jnp.float64 if jax.config.jax_enable_x64 else Q.V.dtype
    ax = qp_axes(Q, shared)
    if resid_bound is None:
        resid_bound = _tail_resid_bound(Q.N)
    bound = jnp.asarray(resid_bound, hi)
    resid = batch_kkt_resid(Q, res, shared=shared, hi=hi)

    batched_fields = tuple(
        f for f in ("V", "A", "G", "q", "b", "g", "d", "u")
        if f not in shared)
    import dataclasses

    def pass_body(carry):
        x, rs, p = carry
        # static width: a pass may gather below-bound or failed (-inf)
        # instances as fill. Harmless either way: refine_result_cg's
        # acceptance guard (refine.py: ok requires res.status > 0, primal
        # feasibility and a not-worse objective) returns the ORIGINAL x
        # for failed instances and can only improve valid ones; fill only
        # costs sweeps, and passes stop as soon as nothing exceeds the
        # bound.
        idx = jnp.argsort(-rs)[:K]
        Qk = dataclasses.replace(
            Q, **{f: getattr(Q, f)[idx] for f in batched_fields})
        rk = Result(x[idx], res.S[idx], res.status[idx])
        rr = jax.vmap(
            lambda pp, r: refine_result_cg(pp, r, settings, iters,
                                           with_duals=False,
                                           exact_sweeps=True),
            in_axes=(ax, Result(0, 0, 0)),
        )(Qk, rk)
        x = x.at[idx].set(rr.x.astype(Q.V.dtype))
        # a refined instance got the full treatment — further passes move on
        # (refinement at a fixed active set is idempotent; this also
        # guarantees termination in <= ceil(B/K) passes)
        rs = rs.at[idx].set(-jnp.inf)
        return x, rs, p + 1

    def pass_cond(carry):
        _, rs, p = carry
        return jnp.any(rs > bound) & (p < max_passes)

    x, _, _ = jax.lax.while_loop(
        pass_cond, pass_body, (res.x, resid, jnp.asarray(0, jnp.int32)))
    return Result(x, res.S, res.status, res.lam, res.gamma)


@partial(jax.jit, static_argnames=("settings", "shared", "compact"))
@highest_matmul
def solve_qp_batch_compact(
    Q: QP, settings: Settings, shared: tuple = (), compact: int = 4
) -> Result:
    """Batched auto solve with batch-level compacted PDAS identification
    (solvers/ssqp.py::_guess_start_batch): identification rounds where at
    most B/compact instances are still changing gather them into a fixed
    C-column buffer instead of paying full-width GEMMs. Semantics identical
    to :func:`solve_qp_batch` (same rounds per instance, same validation
    and fallbacks, duals attached)."""
    from ssqp_tpu.solvers.ssqp import (
        _attach_duals, _guess_start_batch, solve_qp_auto_core,
    )

    settings = settings_for_shared(settings, shared)
    if not settings.multi_free:
        # the PDAS guess stage only exists on the multi-free path
        return solve_qp_batch(Q, settings, shared)
    guess = _guess_start_batch(Q, settings, shared=shared, compact=compact)
    ax = qp_axes(Q, shared)

    def one(p, zg, sx, se, so):
        r = solve_qp_auto_core(p, settings, guess=(zg, sx, se, so))
        return _attach_duals(p, r, settings)

    return jax.vmap(one, in_axes=(ax, 0, 0, 0, 0))(Q, *guess)


@partial(jax.jit, static_argnames=("settings", "shared", "waves", "minimize"))
@highest_matmul
def solve_lp_batch_waves(
    P: LP, settings: Settings, shared: tuple, waves: int = 8,
    minimize: bool = True,
) -> Result:
    """Wave-parallel warm simplex for a c-parametric LP family (fixed
    constraints, varying cost — the LP analogue of the QP frontier grid).

    Two structural savings over the plain vmapped two-phase simplex
    (VERDICT r4 weak #5: LP batching had no warm protocol):

      1. everything cost-independent is SHARED and computed once — the
         standardization, the row purge, and crucially PHASE-1 itself
         (it minimizes the artificials and never sees ``c``;
         solvers/lp.py::_lp_phase1), where the plain batch re-runs an
         identical Phase-1 per instance;
      2. a SORTED c-grid is split into ``waves`` strided sub-batches; wave 0
         runs Phase-2 from the shared Phase-1 basis, waves 1..W-1 from the
         SAME SLOT of the previous wave — its grid neighbor's optimal
         basis. Feasibility depends only on the constraints, so any carried
         basis is a valid Phase-2 start (reference warm-startable kernels,
         Simplex.jl:426-445); adjacent costs move it by a few pivots.

    Per-slot safety: only optimal exits (status 1/2) update the carry —
    a failed or unbounded slot's neighbor keeps warm-starting downstream
    slots from the last good basis, and failed slots re-run once from the
    Phase-1 start in a skip-gated rescue pass.
    """
    from ssqp_tpu.solvers.lp import (
        _lp_cost, _lp_finish, _lp_phase1, _lp_phase2, _lp_prep,
    )

    assert {"A", "b", "G", "g", "d", "u"} <= set(shared), (
        "solve_lp_batch_waves needs a c-only batch (constraints shared)")
    B = P.c.shape[0]
    assert B % waves == 0
    N, J = P.N, P.J
    prep = _lp_prep(P.A, P.G, P.b, P.g, P.d, P.u, settings)
    start = _lp_phase1(prep, settings)

    cg = P.c.reshape(B // waves, waves, -1).transpose(1, 0, 2)
    W = B // waves
    vcost = jax.vmap(lambda c: _lp_cost(prep, c, N, J, minimize))
    vp2 = jax.vmap(
        lambda c0, Bb, Sb, xb, pd: _lp_phase2(prep, c0, Bb, Sb, xb,
                                              settings, pre_done=pd),
        in_axes=(0, 0, 0, 0, 0),
    )

    bc = lambda a: jnp.broadcast_to(a, (W,) + a.shape)
    no_skip = jnp.zeros((W,), bool)
    st0, x0, B0, S0 = vp2(vcost(cg[0]), bc(start.B), bc(start.S),
                          bc(start.x), no_skip)

    def upd(ok, new, old):
        return jnp.where(ok.reshape((-1,) + (1,) * (new.ndim - 1)), new, old)

    ok0 = (st0 == 1) | (st0 == 2)
    carry0 = (upd(ok0, B0, bc(start.B)), upd(ok0, S0, bc(start.S)),
              upd(ok0, x0, bc(start.x)))

    def step(carry, ck):
        Bb, Sb, xb = carry
        st, xw, Bw, Sw = vp2(vcost(ck), Bb, Sb, xb, no_skip)
        ok = (st == 1) | (st == 2)
        return ((upd(ok, Bw, Bb), upd(ok, Sw, Sb), upd(ok, xw, xb)),
                (st, xw, Bw, Sw))

    _, rest = jax.lax.scan(step, carry0, cg[1:])

    def merge(a0, ar):
        allw = jnp.concatenate([a0[None], ar], axis=0)
        return jnp.swapaxes(allw, 0, 1).reshape((B,) + allw.shape[2:])

    st2 = merge(st0, rest[0])
    x2 = merge(x0, rest[1])
    B3 = merge(B0, rest[2])
    S3 = merge(S0, rest[3])

    # rescue: a failed warm slot (numerical/-max_iter; NOT unbounded — that
    # verdict is legitimate from any feasible basis) re-runs Phase-2 once
    # from the Phase-1 start; solved slots pass through pre-done
    bad = st2 <= 0
    str_, xr, Br, Sr = jax.vmap(
        lambda c0, pd: _lp_phase2(prep, c0, start.B, start.S, start.x,
                                  settings, pre_done=pd),
        in_axes=(0, 0),
    )(jax.vmap(lambda c: _lp_cost(prep, c, N, J, minimize))(P.c), ~bad)
    fix = bad & ((str_ == 1) | (str_ == 2) | (str_ == 3))
    st2 = jnp.where(fix, str_, st2)
    x2 = upd(fix, xr, x2)
    B3 = upd(fix, Br, B3)
    S3 = upd(fix, Sr, S3)

    return jax.vmap(
        lambda c, st, xx, Bb, Sb: _lp_finish(
            prep, start, c, _lp_cost(prep, c, N, J, minimize), st, xx, Bb,
            Sb, N, J, settings, minimize, P.A, P.G),
        in_axes=(0, 0, 0, 0, 0),
    )(P.c, st2, x2, B3, S3)


def solve_lp_batch_auto(
    P: LP, settings: Settings = None, shared: tuple = (),
    waves: int = None, minimize: bool = True,
) -> Result:
    """ONE LP batch entry point applying the measured protocol map (the LP
    twin of :func:`solve_qp_batch_auto`):

    * c-parametric grid (everything but ``c`` shared) -> warm-wave simplex
      (:func:`solve_lp_batch_waves`: shared Phase-1 + neighbor-basis
      Phase-2; measured 1.53-1.57x at N=100 B=256);
    * rhs-parametric grid (everything but ``b``/``g`` shared) ->
      dual-simplex waves (:func:`solve_lp_batch_waves_rhs`; measured 2.3x);
    * anything else -> the plain vmapped two-phase batch.

    ``waves=None`` applies the rule (8 when the family structure allows and
    the width divides); an explicit value forces it; ``waves=0`` forces the
    plain batch. Unlike the QP protocol there is no cold-latency-floor
    condition: the warm LP waves win at modest widths already (the Phase-1
    sharing is structural, not latency amortization).
    """
    settings = settings or Settings.for_dtype(P.c.dtype)
    sh = set(shared)
    c_only = {"A", "b", "G", "g", "d", "u"} <= sh and "c" not in sh
    rhs_only = ({"c", "A", "G", "d", "u"} <= sh
                and ("b" not in sh or "g" not in sh))
    # families batched over something else entirely (d/u or A/G) have no
    # warm structure here — B stays None and the plain batch handles them
    B = next((getattr(P, f).shape[0] for f in ("c", "b", "g")
              if f not in sh), None)
    if waves is None:
        waves = 8 if (B is not None and (c_only or rhs_only)
                      and B % 8 == 0 and B // 8 >= 4) else 0
    if waves > 1 and c_only:
        return solve_lp_batch_waves(P, settings, shared, waves=waves,
                                    minimize=minimize)
    if waves > 1 and rhs_only:
        return solve_lp_batch_waves_rhs(P, settings, shared, waves=waves,
                                        minimize=minimize)
    return solve_lp_batch(P, settings, shared=shared, minimize=minimize)


@partial(jax.jit, static_argnames=("settings", "shared", "waves", "minimize"))
@highest_matmul
def solve_lp_batch_waves_rhs(
    P: LP, settings: Settings, shared: tuple, waves: int = 8,
    minimize: bool = True,
) -> Result:
    """Wave-parallel warm simplex for RHS-parametric LP families (b and/or
    g vary over a sorted grid; c and the constraint matrices are shared).

    The complement of :func:`solve_lp_batch_waves`: when only the
    right-hand side moves, a neighbor's OPTIMAL basis stays DUAL-feasible
    (reduced costs depend on c and A alone), so waves 1..W-1 restart the
    DUAL simplex from the same-slot basis of the previous wave
    (solvers/lp.py::_lp_phase2_dual) — no Phase-1, typically a few
    bound-restoring pivots per step. Wave 0 solves its slice cold through
    the full two-phase pipeline (per-instance prep: the artificial signs
    and the row-purge consistency flag depend on the rhs). The standardized
    rhs of every member is built against the FAMILY's keep-row mask; a
    member whose rhs is inconsistent on a purged dependent row cannot be
    seen by the purged system, so every claimed-optimal solution is
    re-checked against its ORIGINAL constraints and demoted to infeasible
    on material violation. Failed slots (-1 invalid warm start /
    -max_iter) re-solve cold in a batch-level `lax.cond` rescue pass that
    costs one predicate when nothing failed. No reference analogue (the
    reference has no dual method, Simplex.jl).
    """
    from ssqp_tpu.solvers.lp import (
        _lp_cost, _lp_finish, _lp_phase1, _lp_phase2, _lp_phase2_dual,
        _lp_prep, _LPStart,
    )

    assert {"c", "A", "G", "d", "u"} <= set(shared), (
        "solve_lp_batch_waves_rhs needs an rhs-only batch (c/A/G/d/u "
        "shared)")
    bat = tuple(f for f in ("b", "g") if f not in shared)
    assert bat, "at least one of b/g must vary"
    B = getattr(P, bat[0]).shape[0]
    assert B % waves == 0
    N, M, J = P.N, P.M, P.J

    def member(f, i):
        a = getattr(P, f)
        return a[i] if f in bat else a

    prep = _lp_prep(P.A, P.G, member("b", 0), member("g", 0), P.d, P.u,
                    settings)
    c0 = _lp_cost(prep, P.c, N, J, minimize)
    rm = prep.keep_rows.astype(P.c.dtype)

    def b0p_of(b_i, g_i):
        b0 = jnp.concatenate([b_i, g_i]) if J > 0 else b_i
        return b0 * rm

    def cold(b_i, g_i, pd):
        prep_i = _lp_prep(P.A, P.G, b_i, g_i, P.d, P.u, settings)
        start_i = _lp_phase1(prep_i, settings, pre_done=pd)
        st2, x2, B3, S3 = _lp_phase2(prep_i, c0, start_i.B, start_i.S,
                                     start_i.x, settings, pre_done=pd)
        return st2, x2, B3, S3, start_i.p1_fail, start_i.p1_code, \
            start_i.infeasible

    W = B // waves
    bg = [jnp.reshape(getattr(P, f), (W, waves) + getattr(P, f).shape[1:])
          .transpose(1, 0, *range(2, getattr(P, f).ndim + 1))
          if f in bat else None for f in ("b", "g")]

    def slice_bg(k):
        b_k = bg[0][k] if bg[0] is not None else jnp.broadcast_to(
            P.b, (W,) + P.b.shape)
        g_k = bg[1][k] if bg[1] is not None else jnp.broadcast_to(
            P.g, (W,) + P.g.shape)
        return b_k, g_k

    no_skip = jnp.zeros((W,), bool)
    b0w, g0w = slice_bg(0)
    st0, x0, B0, S0, pf0, pc0, inf0 = jax.vmap(cold, in_axes=(0, 0, 0))(
        b0w, g0w, no_skip)

    def upd(ok, new, old):
        return jnp.where(ok.reshape((-1,) + (1,) * (new.ndim - 1)), new, old)

    carry0 = (B0, S0, x0)  # failed slots carry their own exit; the dual
    # entry gate + rescue protect downstream warm starts

    def step(carry, k):
        Bb, Sb, xb = carry
        b_k, g_k = slice_bg(k)
        st, xw, Bw, Sw = jax.vmap(
            lambda bi, gi, Bc, Sc, xc: _lp_phase2_dual(
                prep, c0, b0p_of(bi, gi), Bc, Sc, xc, settings),
            in_axes=(0, 0, 0, 0, 0),
        )(b_k, g_k, Bb, Sb, xb)
        ok = (st == 1) | (st == 2)
        return ((upd(ok, Bw, Bb), upd(ok, Sw, Sb), upd(ok, xw, xb)),
                (st, xw, Bw, Sw))

    _, rest = jax.lax.scan(step, carry0, jnp.arange(1, waves))

    def merge(a0, ar):
        allw = jnp.concatenate([a0[None], ar], axis=0)
        return jnp.swapaxes(allw, 0, 1).reshape((B,) + allw.shape[2:])

    st2 = merge(st0, rest[0])
    x2 = merge(x0, rest[1])
    B3 = merge(B0, rest[2])
    S3 = merge(S0, rest[3])
    zf = jnp.zeros((B // waves,), bool)
    p1f = merge(pf0, jnp.broadcast_to(zf[None], (waves - 1, W)))
    p1c = merge(pc0, jnp.broadcast_to(
        jnp.zeros((W,), jnp.int32)[None], (waves - 1, W)))
    infs = merge(inf0, jnp.broadcast_to(zf[None], (waves - 1, W)))

    # rescue: numerical / budget-exhausted / invalid-warm-start exits
    # re-solve cold; batch-level cond keeps the all-clean dispatch free
    bad = st2 < 0
    bB = (getattr(P, "b") if "b" in bat else
          jnp.broadcast_to(P.b, (B,) + P.b.shape))
    gB = (getattr(P, "g") if "g" in bat else
          jnp.broadcast_to(P.g, (B,) + P.g.shape))

    def do_rescue(args):
        st2, x2, B3, S3, p1f, p1c, infs = args
        str_, xr, Br, Sr, pfr, pcr, infr = jax.vmap(
            cold, in_axes=(0, 0, 0))(bB, gB, ~bad)
        fix = bad  # every rescue verdict (incl. a genuine 0) replaces a
        # failed warm exit
        return (jnp.where(fix, str_, st2), upd(fix, xr, x2),
                upd(fix, Br, B3), upd(fix, Sr, S3),
                jnp.where(fix, pfr, p1f), jnp.where(fix, pcr, p1c),
                jnp.where(fix, infr, infs))

    st2, x2, B3, S3, p1f, p1c, infs = jax.lax.cond(
        jnp.any(bad), do_rescue, lambda a: a,
        (st2, x2, B3, S3, p1f, p1c, infs))

    res = jax.vmap(
        lambda st, xx, Bb, Sb, pf, pc, inf: _lp_finish(
            prep, _LPStart(Bb, Sb, xx, pf, pc, inf), P.c, c0, st, xx, Bb,
            Sb, N, J, settings, minimize, P.A, P.G),
        in_axes=(0, 0, 0, 0, 0, 0, 0),
    )(st2, x2, B3, S3, p1f, p1c, infs)

    # original-constraint guard (see docstring): demote claimed-optimal
    # members violating their OWN rhs (invisible to the family-purged
    # system) to infeasible
    tol = jnp.asarray(settings.tol, P.c.dtype)

    def guard(r, b_i, g_i):
        x = r.x
        v = jnp.zeros((), P.c.dtype)
        scale = jnp.ones((), P.c.dtype)
        if M > 0:
            v = jnp.maximum(v, jnp.max(jnp.abs(P.A @ x - b_i)))
            scale = jnp.maximum(scale, jnp.max(jnp.abs(b_i)))
        if J > 0:
            v = jnp.maximum(v, jnp.max(P.G @ x - g_i))
            # the residual is measured against g too: a b-only scale
            # falsely demoted genuine optima on large-|g| families
            # (review finding, round 5)
            scale = jnp.maximum(scale, jnp.max(jnp.abs(g_i)))
        # only OPTIMAL verdicts (1/2) certify a point to re-check; an
        # unbounded exit's x is the last iterate, not a certificate —
        # demoting a 3 to "infeasible" would be categorically wrong
        bad_i = ((r.status == 1) | (r.status == 2)) & (
            v > 100.0 * tol * (1.0 + scale))
        status = jnp.where(bad_i, 0, r.status).astype(jnp.int32)
        zero = jnp.zeros_like(x)
        return Result(
            jnp.where(bad_i, zero, x), r.S, status,
            None if r.lam is None else jnp.where(bad_i, 0.0, r.lam),
            None if r.gamma is None else jnp.where(bad_i, 0.0, r.gamma),
        )

    return jax.vmap(guard, in_axes=(0, 0, 0))(res, bB, gB)


def solve_lp_batch_cclp_rescued(
    P: LP, settings: Settings, shared: tuple = ()
) -> Result:
    """Batched criss-cross with per-instance float64 rescue (VERDICT r2
    weak #1): instances exiting -1 (numerical, e.g. an f32 basis-inverse
    drift gate) or -max_iter are gathered host-side, re-solved once as a
    float64 sub-batch, and scattered back. The sub-batch is padded to the
    next power of two so repeated rescues reuse compiled programs. No-op
    (zero extra dispatches) when every instance solved, when the batch is
    already float64, or when x64 is disabled."""
    import numpy as np

    res = solve_lp_batch_cclp(P, settings, shared=shared)
    if P.c.dtype != jnp.float32 or jnp.zeros(0, jnp.float64).dtype != jnp.float64:
        return res
    st = np.asarray(res.status)
    need = (st == -1) | (st == -settings.max_iter)
    if not need.any():
        return res
    idx = np.nonzero(need)[0]
    pad = 1 << (len(idx) - 1).bit_length()  # shape-quantized sub-batch
    sel = np.concatenate([idx, np.full(pad - len(idx), idx[0])])

    def pick(f, arr):
        a = jnp.asarray(np.asarray(arr), jnp.float64)
        return a if f in shared else a[sel]

    # f64 batched LU is unsupported on TPU: run the retry on the CPU backend
    import contextlib

    cpu_ctx = (
        contextlib.nullcontext() if jax.default_backend() == "cpu"
        else jax.default_device(jax.devices("cpu")[0])
    )
    with cpu_ctx:
        sub = LP(*(pick(f, getattr(P, f)) for f in
                   ("c", "A", "b", "G", "g", "d", "u")), P.N, P.M, P.J, P.mc)
        r64 = solve_lp_batch_cclp(sub, Settings(), shared=shared)
    ok64 = np.asarray(r64.status)[: len(idx)] > 0
    fix = idx[ok64]
    if len(fix) == 0:
        return res
    take = np.nonzero(ok64)[0]
    x = np.asarray(res.x).copy()
    S = np.asarray(res.S).copy()
    stat = st.copy()
    x[fix] = np.asarray(r64.x, np.float32)[take]
    S[fix] = np.asarray(r64.S)[take]
    stat[fix] = np.asarray(r64.status)[take]
    lam, gam = res.lam, res.gamma
    if lam is not None:
        lam = np.asarray(lam).copy()
        gam = np.asarray(gam).copy()
        lam[fix] = np.asarray(r64.lam, np.float32)[take]
        gam[fix] = np.asarray(r64.gamma, np.float32)[take]
    return Result(jnp.asarray(x), jnp.asarray(S), jnp.asarray(stat),
                  None if lam is None else jnp.asarray(lam),
                  None if gam is None else jnp.asarray(gam))


@partial(jax.jit, static_argnames=("settings", "shared", "waves", "compact"))
@highest_matmul
def solve_qp_batch_waves(
    Q: QP, settings: Settings, shared: tuple, waves: int = 8,
    compact: int = 0,
) -> Result:
    """Wave-parallel warm solve of a q-only batch (frontier grids).

    The reference's killer speed trick is warm-starting adjacent frontier
    points from each other (SSQPspeed.jl's sweep; solveQP(Q,S,x0)); a pure
    `vmap` batch cannot use it — every instance pays full identification.
    This splits a SORTED q-grid into ``waves`` STRIDED sub-batches
    (wave k holds grid points k, k+W, k+2W, ...), solves wave 0 cold
    (PDAS + validation, vmapped), then scans the remaining waves with each
    instance warm-started from the SAME SLOT of the previous wave — its
    grid-adjacent neighbor. Since only q varies (the constraint set is
    shared), the carried x stays primal-feasible for the next wave and the
    active set drifts by at most a few flips, so waves 1..W-1 converge in
    ~1-2 S-iterations instead of re-identifying from scratch.

    Requires every leaf except ``q`` shared (asserted): warm-start validity
    depends on it. Per-instance safety: a failed wave solve keeps the last
    good carry for the next wave (like models/frontier.py's sweeps).

    ``compact > 0`` routes wave 0's PDAS identification through the
    batch-level static-width compaction (solvers/ssqp.py::_guess_start_batch
    with C = wave_size // compact) — late identification rounds then pay
    GEMM width only for the instances still changing.
    """
    from ssqp_tpu.solvers.ssqp import (
        _attach_duals,
        _guess_start_batch,
        solve_qp_auto_core,
        solve_qp_warm2,
    )

    assert {"V", "A", "G", "b", "g", "d", "u"} <= set(shared), (
        "solve_qp_batch_waves needs a q-only batch (constraints shared)")
    settings = settings_for_shared(settings, shared)
    # Cold-stage PDAS budget: the cold wave runs at width B/W, where the PDAS
    # sequential CG chain is LATENCY-bound (the ~20-26 ms floor in the waves
    # cost model) — so unlike the full-width plain protocol (where 24->16 was
    # measured as tunnel noise), a shorter per-round chain shows directly.
    # Round-4 alternating TPU A/B at N=256 B=8192 waves=8: iters=16 gave
    # 226.9k & 229.2k QP/s vs iters=24's 217.4k & 221.9k (+~4%), identical
    # audit quantiles and 24576/24576 solved. Gated to the measured regime:
    # f32 tier, box-only inequalities (J==0 — general-inequality PDAS wants
    # the deeper budget; a failed guess only costs the Phase-1 fallback, not
    # correctness, but the fallback is the slow path). The clamp applies
    # ONLY when pdas_cg_iters is still the f32-tier default (24): an
    # explicitly configured budget (Settings or bench.py's BENCH_PDAS_ITERS
    # A/B knob) is honored as given. Unmeasured outside N~256 wave widths
    # ~1024; elsewhere a too-short cold budget costs only the Phase-1
    # fallback rate, never correctness.
    import dataclasses

    _f32_default_iters = Settings.for_dtype(jnp.float32).pdas_cg_iters
    cold_settings = settings
    if (Q.J == 0 and jnp.dtype(settings.dtype) == jnp.float32
            and settings.pdas_cg_iters == _f32_default_iters
            and settings.pdas_cg_iters > 16):
        cold_settings = dataclasses.replace(settings, pdas_cg_iters=16)
    B = Q.q.shape[0]
    assert B % waves == 0
    ax = qp_axes(Q, shared)
    with_q = lambda qv: QP(Q.V, Q.A, Q.G, qv, Q.b, Q.g, Q.d, Q.u,
                           Q.N, Q.M, Q.J, Q.mc)
    # strided split: grid point g = i*waves + k -> qg[k, i]
    qg = Q.q.reshape(B // waves, waves, -1).transpose(1, 0, 2)

    # Dual attachment (+ its polish re-solve) is DEFERRED to one batched
    # pass over the merged result: per-wave attachment would pay the
    # sequential CG latency of _attach_duals `waves` times instead of once
    # (the attach work is per-instance independent, so moving it is exact).
    if compact:
        Q0 = with_q(qg[0])
        g0 = _guess_start_batch(Q0, cold_settings, shared=shared,
                                compact=compact)
        r0, sol0 = jax.vmap(
            lambda p, zg, sx, se, so: solve_qp_auto_core(
                p, cold_settings, return_sol=True, guess=(zg, sx, se, so)),
            in_axes=(ax, 0, 0, 0, 0))(Q0, *g0)
    else:
        r0, sol0 = jax.vmap(
            lambda p: solve_qp_auto_core(p, cold_settings, return_sol=True),
            in_axes=(ax,))(with_q(qg[0]))
    carry0 = (r0.S[:, :Q.N], r0.S[:, Q.N:], r0.x, sol0)

    def step(carry, qk):
        Sx, Se, x, sol = carry
        # the carried raw KKT CG solution warm-starts each slot's CG: the
        # neighbor solved a near-identical system, so the per-column early
        # exit in cg_solve_padded cuts the wave's sequential matvec chain
        rk, solk = jax.vmap(
            lambda p, sx, se, xx, s0: solve_qp_warm2(
                p, sx, se, xx, settings, with_duals=False, sol0=s0,
                return_sol=True),
            in_axes=(ax, 0, 0, 0, 0),
        )(with_q(qk), Sx, Se, x, sol)
        ok = (rk.status > 0)[:, None]
        # carry only good states forward; failed slots keep the neighbor
        carry = (
            jnp.where(ok, rk.S[:, :Q.N], Sx).astype(jnp.int8),
            jnp.where(ok, rk.S[:, Q.N:], Se).astype(jnp.int8),
            jnp.where(ok, rk.x, x),
            jnp.where(ok[:, :, None], solk, sol),
        )
        return carry, rk

    _, rest = jax.lax.scan(step, carry0, qg[1:])
    # restack: wave k slot i -> grid point i*waves + k
    def merge(a0, ar):
        allw = jnp.concatenate([a0[None], ar], axis=0)  # (W, B/W, ...)
        return jnp.swapaxes(allw, 0, 1).reshape((B,) + allw.shape[2:])

    merged = Result(merge(r0.x, rest.x), merge(r0.S, rest.S),
                    merge(r0.status, rest.status))
    # a failed wave-0 slot taints every downstream point it warm-started
    bad0 = r0.status <= 0  # (B/waves,)
    force = merge(bad0, jnp.broadcast_to(bad0[None, :],
                                         (waves - 1, B // waves)))
    return _rescue_and_attach(Q, ax, merged, settings, force=force)


def _rescue_and_attach(Q: QP, ax, merged: Result, settings: Settings,
                       force=None) -> Result:
    """Shared tail of the grid warm protocols (waves / coarse-to-fine).

    Cold rescue of failed slots: a cold-stage failure would otherwise
    cascade through every point it warm-started. Failed instances re-solve
    cold through Phase-1 + warm2; solved ones enter every loop pre-done, so
    the pass costs ~nothing when the batch fully converged (the same skip
    machinery as solve_qp_auto_core's guess acceptance). ``force`` marks
    instances that must re-solve even if their warm exit claims success —
    a warm start seeded from a FAILED cold anchor may be infeasible, and
    the S-loop's convergence contract assumes a feasible start. Then one
    batched dual attach over the final points (deferring it here rather
    than per-stage avoids paying _attach_duals' sequential CG latency per
    wave).
    """
    from ssqp_tpu.solvers.phase1 import init_qp_traced
    from ssqp_tpu.solvers.ssqp import _attach_duals, solve_qp_warm2

    need = merged.status <= 0
    if force is not None:
        need = need | force

    def do_rescue(args):
        Qb, nd, m = args

        def rescue_one(p, ndi):
            x0, Sx0, Se0, st1 = init_qp_traced(p, settings, skip=~ndi)
            pre = jnp.where(ndi, st1, jnp.asarray(-9, jnp.int32))
            return solve_qp_warm2(p, Sx0, Se0, x0, settings, pre_status=pre,
                                  with_duals=False)

        rr = jax.vmap(rescue_one, in_axes=(ax, 0))(Qb, nd)
        fix = nd & (rr.status > 0)
        return Result(
            jnp.where(fix[:, None], rr.x, m.x),
            jnp.where(fix[:, None], rr.S, m.S).astype(m.S.dtype),
            jnp.where(fix, rr.status, m.status).astype(jnp.int32),
        )

    # batch-level cond: the rescue branch (Phase-1 + warm2 over the whole
    # batch, cheap-but-not-free even fully skipped) runs ONLY when some
    # instance actually needs it — the common all-solved dispatch pays one
    # predicate reduction
    merged = Result(merged.x, merged.S, merged.status.astype(jnp.int32))
    merged = jax.lax.cond(
        jnp.any(need), do_rescue, lambda args: args[2], (Q, need, merged))
    return jax.vmap(lambda p, r: _attach_duals(p, r, settings),
                    in_axes=(ax, 0))(Q, merged)


@partial(jax.jit, static_argnames=("settings", "shared", "coarse"))
@highest_matmul
def solve_qp_batch_c2f(
    Q: QP, settings: Settings, shared: tuple, coarse: int = 8
) -> Result:
    """Coarse-to-fine warm solve of a q-only sorted grid.

    Two stages instead of :func:`solve_qp_batch_waves`' W-1 sequential
    waves: the coarse subgrid (every ``coarse``-th point) solves cold, then
    EVERY grid point warm-starts from its nearest coarse point in ONE
    batched warm pass. Wall time = cold(B/coarse) + one warm2(B) — the warm
    pass may take a few more S-iterations than a single wave step (warm
    distance up to coarse/2 grid steps instead of 1), but it replaces
    (W-1) sequential wave launches whose ~3.5 ms apiece is latency, not
    work. Same contract as waves: q-only batch (asserted), sorted grid,
    failed slots cold-rescued.
    """
    from ssqp_tpu.solvers.ssqp import solve_qp_auto_core, solve_qp_warm2

    assert {"V", "A", "G", "b", "g", "d", "u"} <= set(shared), (
        "solve_qp_batch_c2f needs a q-only batch (constraints shared)")
    settings = settings_for_shared(settings, shared)
    B = Q.q.shape[0]
    assert B % coarse == 0
    C = B // coarse
    ax = qp_axes(Q, shared)
    with_q = lambda qv: QP(Q.V, Q.A, Q.G, qv, Q.b, Q.g, Q.d, Q.u,
                           Q.N, Q.M, Q.J, Q.mc)

    rc = jax.vmap(lambda p: solve_qp_auto_core(p, settings), in_axes=(ax,))(
        with_q(Q.q[::coarse]))
    # nearest coarse anchor per grid point (round i/coarse, clipped)
    near = jnp.clip(
        jnp.round(jnp.arange(B) / coarse).astype(jnp.int32), 0, C - 1)
    rw = jax.vmap(
        lambda p, sx, se, xx: solve_qp_warm2(p, sx, se, xx, settings,
                                             with_duals=False),
        in_axes=(ax, 0, 0, 0),
    )(with_q(Q.q), rc.S[near, : Q.N], rc.S[near, Q.N:], rc.x[near])
    # points warm-started from a failed coarse anchor must re-solve cold
    return _rescue_and_attach(Q, ax, rw, settings,
                              force=(rc.status <= 0)[near])


def solve_qp_batch_refined(
    Q: QP,
    *,
    settings: Optional[Settings] = None,
    iters: int = 2,
    search_dtype=None,
    shared: tuple = (),
    method: str = "cg",
) -> Result:
    """Batched high-accuracy solve: fast-dtype active-set search + per-instance
    iterative refinement of the final KKT system against the full-precision
    data (the BigFloat-tier recipe of solvers/refine.py, vmapped).

    ``search_dtype=jnp.float32`` on a float64 batch runs the combinatorial
    search at TPU speed and recovers f64 accuracy in the refinement sweeps.
    Dual certificates are not derived (the search stage skips the
    per-instance dual attachment entirely — its lam/gamma would be discarded
    by the refinement); call ``recover_duals`` on the output if needed.

    ``method="cg"`` (default) refines through the factorization-free padded
    CG (refine_result_cg) — batched, the LU path pays a per-instance
    (N+M+J)^2 factorization that made the refined tier ~140x slower than the
    f32 search at N=512 (round-3 cliff); the CG sweeps collapse to shared
    GEMMs on shared-V batches. ``method="lu"`` keeps the dense-factor path.
    """
    from ssqp_tpu.solvers.refine import refine_result, refine_result_cg

    refine = refine_result_cg if method == "cg" else refine_result
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
        lambda p, r: refine(p, r, settings, iters, with_duals=False),
        in_axes=(ax, Result(0, 0, 0)),
    )(Q, res)


def stack_qps(qps) -> QP:
    """Stack a list of same-shape QPs into one batched QP pytree."""
    q0 = qps[0]
    leaves = [jnp.stack([getattr(q, f) for q in qps])
              for f in ("V", "A", "G", "q", "b", "g", "d", "u")]
    return QP(*leaves, q0.N, q0.M, q0.J, q0.mc)


def stack_lps(lps) -> LP:
    """Stack a list of same-shape LPs into one batched LP pytree."""
    p0 = lps[0]
    leaves = [jnp.stack([getattr(p, f) for p in lps])
              for f in ("c", "A", "b", "G", "g", "d", "u")]
    return LP(*leaves, p0.N, p0.M, p0.J, p0.mc)


def frontier_batch(Q: QP, lambdas) -> tuple[QP, tuple]:
    """Batch the L-parameterized frontier family ``min 1/2 z'Vz - L q'z``
    (reference QP(P, L), types.jl:303-319) over a vector of L values.

    Returns (batched QP, shared fields) ready for :func:`solve_qp_batch`.
    """
    lam = jnp.asarray(lambdas, Q.V.dtype)
    qb = -lam[:, None] * Q.q[None, :]
    Qb = QP(Q.V, Q.A, Q.G, qb, Q.b, Q.g, Q.d, Q.u, Q.N, Q.M, Q.J, Q.mc)
    return Qb, ("V", "A", "G", "b", "g", "d", "u")
