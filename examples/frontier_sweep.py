"""Efficient-frontier sweep at TPU scale (reference: examples/SSQPspeed.jl).

Traces a 256-point efficient frontier four ways and compares:
  * batched cold solves (vmap, guess-started) — maximum parallelism;
  * warm-started scan along the grid — the reference's sequential trick;
  * wave-parallel warm sweep — both at once (the headline protocol);
  * sharded across the available device mesh with psum statistics.

Run: python examples/frontier_sweep.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

import ssqp_tpu
from ssqp_tpu.models.frontier import frontier_batch_sweep, frontier_warm_sweep
from ssqp_tpu.parallel.batch import frontier_batch
from ssqp_tpu.parallel.sharded import make_mesh, shard_batch, solve_qp_sharded


def main():
    rng = np.random.default_rng(1)
    N, points = 64, 256
    H = rng.standard_normal((N, N))
    V = (H @ H.T / N + 0.5 * np.eye(N)).astype(np.float32)
    rets = rng.uniform(0.0, 0.25, N).astype(np.float32)

    settings = ssqp_tpu.Settings.for_dtype(jnp.float32)
    Q = ssqp_tpu.make_qp(V, np.zeros(N, np.float32),
                         u=np.full(N, 8.0 / N, np.float32), dtype=np.float32)
    lams = jnp.linspace(0.0, 2.0, points, dtype=jnp.float32)

    from ssqp_tpu.models.frontier import frontier_waves_sweep

    for name, fn in [
        ("batched cold", lambda: frontier_batch_sweep(Q, jnp.asarray(rets), lams, settings)),
        ("warm scan   ", lambda: frontier_warm_sweep(Q, jnp.asarray(rets), lams, settings)),
        ("wave-warm   ", lambda: frontier_waves_sweep(Q, jnp.asarray(rets), lams, settings, waves=8)),
    ]:
        f = fn()
        jax.block_until_ready(f)  # includes compile on first call
        t0 = time.perf_counter()
        f = fn()
        jax.block_until_ready(f)
        dt = time.perf_counter() - t0
        ok = int((np.asarray(f.status) > 0).sum())
        print(f"{name}: {ok}/{points} solved in {dt * 1e3:.1f} ms "
              f"(risk range {float(f.risk.min()):.4f}-{float(f.risk.max()):.4f})")

    # sharded over every available device (1 on a single-chip host; the same
    # code scales to a pod slice)
    mesh = make_mesh()
    Qb, shared = frontier_batch(ssqp_tpu.make_qp(
        V, rets, u=np.full(N, 8.0 / N, np.float32), dtype=np.float32), lams)
    Qs = shard_batch(Qb, mesh, shared=shared)
    res, stats = solve_qp_sharded(Qs, settings, mesh, shared=shared)
    jax.block_until_ready(res)
    print(f"sharded over {jax.device_count()} device(s): "
          f"solved={int(stats['solved'])}/{points} "
          f"max_iters={int(stats['iters_max'])}")


if __name__ == "__main__":
    main()
