"""Stage-level wall-time breakdown of the headline solve (N=256 frontier).

Measurement hygiene (see bench.py): inputs are pre-transferred and synced
BEFORE the timed region (jax.device_put is async — timing a fresh batch's
first use measures the axon tunnel's ~40 MB/s host->device path, not the
solver), every rep uses different data (the backend memoizes identical
dispatches), and materialization inside the timed region is a small
device-side checksum (block_until_ready does not block through axon).

Stages:
  1. PDAS guess identification alone (_guess_start)
  2. guess pass = PDAS + capped S-loop
  3. full auto core (guess + Phase-1[skip] + warm2 passes)
  4. full auto with dual attachment (what bench.py runs)
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from ssqp_tpu.types import Settings, make_qp
from ssqp_tpu.parallel.batch import frontier_batch, qp_axes
from ssqp_tpu.solvers import ssqp as S
from ssqp_tpu.utils.precision import highest_matmul

N = int(os.environ.get("PROF_N", 256))
batch = int(os.environ.get("PROF_BATCH", 8192))
REPS = int(os.environ.get("PROF_REPS", 3))
dtype = jnp.float32

settings = Settings.for_dtype(dtype)
rng = np.random.default_rng(7)
H = rng.standard_normal((N, N))
V = H @ H.T / N + 0.5 * np.eye(N)
mu = rng.uniform(0.0, 0.2, N)
Q = make_qp(np.asarray(V, np.float32), np.asarray(mu, np.float32),
            u=np.full(N, 4.0 / N, np.float32), dtype=np.float32)
AX = qp_axes(Q, ("V", "A", "G", "b", "g", "d", "u"))


def make_b(i):
    lams = jnp.linspace(0.001 * i, 2.0 + 0.001 * i, batch, dtype=dtype)
    Qb, _ = frontier_batch(Q, lams)
    return jax.device_put(Qb)


BATCHES = [make_b(i) for i in range(REPS + 1)]
for b in BATCHES:
    np.asarray(b.q.sum())  # force transfer completion before timing

# stacked q-grids for the chained timer (one dispatch per stage measurement;
# a host round trip through the axon tunnel costs ~40 ms — comparable to the
# stages themselves — so per-dispatch stage timing mostly measures the
# harness; see bench.py)
QSTACK = jax.device_put(jnp.stack([b.q for b in BATCHES[1:]]))
np.asarray(QSTACK.sum())
import dataclasses

Q0 = BATCHES[0]


def chained_timer(stage_fn):
    """Time REPS runs of stage_fn inside one dispatch; return s/batch."""

    @jax.jit
    def run(qstack):
        def body(i, acc):
            out = stage_fn(dataclasses.replace(Q0, q=qstack[i]))
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    warm = jnp.broadcast_to(Q0.q, (REPS,) + Q0.q.shape)
    np.asarray(run(warm))
    ts = []
    for rep in range(2):
        t0 = time.perf_counter()
        np.asarray(run(QSTACK + 1e-5 * rep))
        ts.append((time.perf_counter() - t0) / REPS)
    return min(ts)


@jax.jit
@highest_matmul
def stage_pdas(Qb):
    z = jax.vmap(lambda q: S._guess_start(q, settings)[0], in_axes=(AX,))(Qb)
    return z.sum(axis=1)


@jax.jit
@highest_matmul
def stage_guess(Qb):
    def one(q):
        zg, Sxg, Seg, solg = S._guess_start(q, settings)
        cap = min(settings.max_iter, q.N + q.J + 64)
        r = S.solve_qp_loop(q, Sxg, Seg, zg, settings,
                            mf_flag=True, max_iter=min(cap, 16),
                            cg_iters=settings.cg_iters, sol0=solg)
        return r.x, r.status
    x, status = jax.vmap(one, in_axes=(AX,))(Qb)
    return x.sum(axis=1), status


@jax.jit
@highest_matmul
def stage_core(Qb):
    r = jax.vmap(lambda q: S.solve_qp_auto_core(q, settings), in_axes=(AX,))(Qb)
    return r.x.sum(axis=1), r.status


@jax.jit
@highest_matmul
def stage_full(Qb):
    r = jax.vmap(lambda q: S.solve_qp_auto(q, settings), in_axes=(AX,))(Qb)
    return r.x.sum(axis=1), r.status


def timeit(name, fn):
    t = chained_timer(fn)
    print(f"{name:12s} {t*1e3:8.1f} ms/batch (chained, min of 2)")
    return t


t1 = timeit("pdas", stage_pdas)
t2 = timeit("guess_pass", stage_guess)
t3 = timeit("auto_core", stage_core)
t4 = timeit("auto+duals", stage_full)
gout = stage_guess(BATCHES[1])
st = np.asarray(gout[1])
ok = st > 0
print(f"guess-pass accepted (converged, pre-feas-check): {ok.sum()}/{batch}; "
      f"S-loop iters med {np.median(st[ok]):.0f} max {st[ok].max() if ok.any() else -1}")
print(f"breakdown: pdas {t1*1e3:.0f} | +loop16 {(t2-t1)*1e3:.0f} | "
      f"+p1/warm2 {(t3-t2)*1e3:.0f} | +duals {(t4-t3)*1e3:.0f} ms")
