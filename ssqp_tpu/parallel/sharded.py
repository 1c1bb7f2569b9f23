"""Device-mesh sharding of instance batches via `shard_map` + collectives.

The reference has no distributed backend (SURVEY.md §2: single-threaded Julia);
multi-chip instance throughput is *new* capability mandated by the north star.
Design: the batch axis is sharded over a 1-D mesh axis ``"i"`` (data-parallel
over ICI); problem data that is shared across instances is replicated. Each
device runs the fixed-shape batched solver on its local shard; convergence
statistics (#solved, max iterations, max KKT residual proxy) are aggregated
with `psum`/`pmax` over the mesh, and solutions come back sharded (gather is
the caller's choice — keep results device-resident when feeding a downstream
sharded computation).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

from ssqp_tpu.types import LP, QP, Result, Settings
from ssqp_tpu.utils.precision import highest_matmul


def make_mesh(n_devices: Optional[int] = None, axis: str = "i") -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _spec_tree(Q: QP, shared: tuple, axis: str) -> QP:
    sp = {f: (P() if f in shared else P(axis)) for f in
          ("V", "A", "G", "q", "b", "g", "d", "u")}
    return QP(sp["V"], sp["A"], sp["G"], sp["q"], sp["b"], sp["g"],
              sp["d"], sp["u"], Q.N, Q.M, Q.J, Q.mc)


@partial(jax.jit, static_argnames=("settings", "shared", "mesh", "axis",
                                   "waves"))
@highest_matmul
def solve_qp_sharded(
    Q: QP,
    settings: Settings,
    mesh: Mesh,
    shared: tuple = (),
    axis="i",
    waves="auto",
):
    """Solve a QP batch sharded over a device mesh.

    ``axis`` is a mesh axis name or a TUPLE of axis names: with a tuple the
    batch dimension shards over all of them (host-major on a (host, chip)
    mesh), and the statistic reductions run over the same group — XLA lowers
    a multi-axis psum hierarchically given the host-major device order (ICI
    within a host row first, DCN across rows), so only scalars cross DCN.

    The leading batch dimension of every non-shared leaf must be divisible by
    the mesh size. Returns ``(Result, stats)`` where ``Result`` leaves are
    sharded along the batch axis and ``stats`` is a replicated dict with
    mesh-wide aggregates: ``solved`` (#status>0, psum), ``iters_max`` (pmax),
    ``infeasible`` (#status==0, psum).

    ``waves > 1`` runs the wave-parallel warm protocol on each device's
    local shard (grid-neighbor warm starts, see
    parallel/batch.py::solve_qp_batch_waves — measured ~1.35x on the N=256
    frontier headline): requires a q-only batch (every other leaf shared)
    sorted so adjacent instances are related, and a local shard size
    divisible by ``waves``. Sharding is contiguous along the batch axis, so
    a sorted grid stays sorted within each shard. The default ``"auto"``
    applies the measured protocol cost model PER SHARD
    (parallel/batch.py::solve_qp_batch_auto — waves/compaction/tail by
    local width and N); ``waves=0`` forces the plain vmap.
    """
    from ssqp_tpu.solvers.ssqp import solve_qp_auto
    from ssqp_tpu.parallel.batch import (
        qp_axes,
        settings_for_shared,
        solve_qp_batch_auto,
        solve_qp_batch_waves,
    )

    settings = settings_for_shared(settings, shared)
    ax = qp_axes(Q, shared)
    in_specs = _spec_tree(Q, shared, axis)
    out_specs = (
        Result(P(axis), P(axis), P(axis), P(axis), P(axis)),
        dict(solved=P(), iters_max=P(), infeasible=P()),
    )

    def local(Qs: QP):
        if waves == "auto":
            res = solve_qp_batch_auto(Qs, settings, shared)
        elif waves > 1:
            res = solve_qp_batch_waves(Qs, settings, shared, waves=waves)
        else:
            res = jax.vmap(lambda p: solve_qp_auto(p, settings),
                           in_axes=(ax,))(Qs)
        solved = jax.lax.psum(jnp.sum(res.status > 0), axis)
        infeas = jax.lax.psum(jnp.sum(res.status == 0), axis)
        iters = jax.lax.pmax(jnp.max(jnp.abs(res.status)), axis)
        return res, dict(solved=solved, iters_max=iters, infeasible=infeas)

    # check_vma=False: while_loop carries are initialized from unvarying
    # constants inside the shard; the varying-axis propagation check would
    # demand explicit pcasts with no semantic difference for this map.
    fn = shard_map(
        local, mesh=mesh, in_specs=(in_specs,), out_specs=out_specs,
        check_vma=False,
    )
    return fn(Q)


def shard_batch(Q: QP, mesh: Mesh, shared: tuple = (), axis="i") -> QP:
    """Place a batched QP on the mesh: batch-sharded leaves, replicated shared
    leaves. Amortizes host->device transfer before a sharded solve.
    ``axis`` may be a tuple of mesh axis names to shard the batch dimension
    over several axes at once (2-D meshes)."""
    parts = {}
    for f in ("V", "A", "G", "q", "b", "g", "d", "u"):
        arr = getattr(Q, f)
        spec = P() if f in shared else P(axis)
        parts[f] = jax.device_put(arr, NamedSharding(mesh, spec))
    return QP(parts["V"], parts["A"], parts["G"], parts["q"], parts["b"],
              parts["g"], parts["d"], parts["u"], Q.N, Q.M, Q.J, Q.mc)


def _lp_spec_tree(Pb: LP, shared: tuple, axis) -> LP:
    sp = {f: (P() if f in shared else P(axis)) for f in
          ("c", "A", "b", "G", "g", "d", "u")}
    return LP(sp["c"], sp["A"], sp["b"], sp["G"], sp["g"], sp["d"], sp["u"],
              Pb.N, Pb.M, Pb.J, Pb.mc)


@partial(jax.jit, static_argnames=("settings", "shared", "mesh", "axis",
                                   "engine", "waves", "minimize"))
@highest_matmul
def solve_lp_sharded(
    Pb: LP,
    settings: Settings,
    mesh: Mesh,
    shared: tuple = (),
    axis="i",
    engine: str = "auto",
    waves: int = None,
    minimize: bool = True,
):
    """Solve an LP batch sharded over a device mesh — the LP twin of
    :func:`solve_qp_sharded` (the reference has no distributed backend at
    all; this is new capability, SURVEY §2).

    ``engine`` selects the local solver: ``"auto"`` (default — routes each
    shard by family structure through
    parallel/batch.py::solve_lp_batch_auto: c-grids to the warm-wave
    simplex, rhs-grids to the dual-simplex waves, else the plain two-phase
    batch), ``"simplex"`` (plain two-phase / explicit ``waves``), or
    ``"cclp"`` (least-index criss-cross, incl. its conditional basis
    repair). Contiguous sharding keeps a sorted parameter grid sorted per
    shard, so the per-shard warm protocols stay valid. Returns
    ``(Result, stats)`` with batch-sharded Result leaves and replicated
    mesh-wide aggregates: ``solved`` (#status>0 —
    optimal/infinitely-many/unbounded verdicts), ``infeasible``
    (#status==0).
    """
    from ssqp_tpu.parallel.batch import (
        solve_lp_batch,
        solve_lp_batch_auto,
        solve_lp_batch_cclp,
        solve_lp_batch_waves,
    )

    if engine not in ("auto", "simplex", "cclp"):
        raise ValueError(f"unknown engine {engine!r}: "
                         "expected 'auto', 'simplex' or 'cclp'")
    if engine == "cclp" and not minimize:
        # the criss-cross path has no sense flag (reference solveLP only
        # minimizes, CCLP.jl); silently returning the minimizer for a
        # maximize request would be a wrong answer with status 1
        raise ValueError("engine='cclp' only minimizes; negate c or use "
                         "engine='simplex'/'auto' for maximize")

    in_specs = _lp_spec_tree(Pb, shared, axis)
    out_specs = (
        Result(P(axis), P(axis), P(axis), P(axis), P(axis)),
        dict(solved=P(), infeasible=P()),
    )

    def local(Ps: LP):
        if engine == "cclp":
            res = solve_lp_batch_cclp(Ps, settings, shared=shared)
        elif engine == "auto":
            res = solve_lp_batch_auto(Ps, settings, shared, waves=waves,
                                      minimize=minimize)
        elif waves is not None and waves > 1:
            res = solve_lp_batch_waves(Ps, settings, shared, waves=waves,
                                       minimize=minimize)
        else:
            res = solve_lp_batch(Ps, settings, shared=shared,
                                 minimize=minimize)
        solved = jax.lax.psum(jnp.sum(res.status > 0), axis)
        infeas = jax.lax.psum(jnp.sum(res.status == 0), axis)
        return res, dict(solved=solved, infeasible=infeas)

    fn = shard_map(
        local, mesh=mesh, in_specs=(in_specs,), out_specs=out_specs,
        check_vma=False,
    )
    return fn(Pb)


# ---------------------------------------------------------------------------
# 2-D (host, chip) mesh — multi-host scale-out
# ---------------------------------------------------------------------------


def make_mesh_2d(
    n_hosts: Optional[int] = None,
    chips_per_host: Optional[int] = None,
    axes: tuple = ("host", "chip"),
) -> Mesh:
    """2-D device mesh shaped (hosts, chips-per-host).

    The BASELINE north star is linear instance-throughput scaling to a pod:
    instance parallelism wants the batch axis laid out so that the inner
    ("chip") axis rides ICI and only the small psum'd statistics ever cross
    the DCN ("host") axis. On a real multi-host deployment jax orders
    `jax.devices()` host-major, so reshaping to (hosts, chips) puts each
    row's devices on one host — XLA then lowers reductions hierarchically
    (ICI within a row first, DCN across rows). Defaults infer the shape from
    `jax.process_count()`.
    """
    devs = jax.devices()
    if n_hosts is None:
        n_hosts = max(jax.process_count(), 1)
    if chips_per_host is None:
        chips_per_host = len(devs) // n_hosts
    devs = devs[: n_hosts * chips_per_host]
    grid = np.asarray(devs).reshape(n_hosts, chips_per_host)
    return Mesh(grid, axes)


def solve_qp_sharded_2d(
    Q: QP,
    settings: Settings,
    mesh: Mesh,
    shared: tuple = (),
    axes: tuple = ("host", "chip"),
):
    """Solve a QP batch sharded over a 2-D (host, chip) mesh.

    The batch dimension is sharded over BOTH axes (host-major), so each
    device owns batch/(hosts*chips) instances and runs the identical local
    program as the 1-D path; statistic reductions lower hierarchically (ICI
    within a host row, then DCN across rows — only scalars cross DCN, which
    is what makes the scaling linear). Thin alias of
    :func:`solve_qp_sharded` with a tuple axis."""
    return solve_qp_sharded(Q, settings, mesh, shared=shared, axis=axes)
