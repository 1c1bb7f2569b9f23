"""Driver-config benchmark suite (BASELINE.md "driver configs").

Runs one of the five BASELINE configurations and prints a JSON line per
config. The headline metric lives in bench.py; this suite covers the wider
matrix:

  1  single dense portfolio QP, N=50 (CPU-runnable correctness/latency probe)
  2  LP-only path: two-phase simplex on an N=100 LP with eq + ineq rows
  3  batched frontier: vmap 1024 QPs, N=128, shared V, varying q
  4  large dense QP: N=512, M=10, J=100 — f32 active-set search + f64
     iterative refinement (the mixed-precision accuracy tier)
  5  many-instance sharded sweep: independent N=256 QPs sharded over the
     available device mesh with psum convergence stats (65k instances on a
     pod; scaled to the local device count here)

Usage: python bench_suite.py [1|2|3|4|5|all]

Measurement hygiene: every timed repetition uses fresh problem data and
materializes results (the TPU runtime memoizes identical dispatches).
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _emit(metric, value, unit, baseline=None):
    rec = {"metric": metric, "value": round(float(value), 3), "unit": unit}
    if baseline:
        rec["vs_baseline"] = round(float(value) / baseline, 4)
    print(json.dumps(rec))


def _market(N, seed=7, dtype=np.float32):
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((N, N))
    V = (H @ H.T / N + 0.5 * np.eye(N)).astype(dtype)
    mu = rng.uniform(0.0, 0.2, N).astype(dtype)
    return V, mu


def config1():
    """Single N=50 portfolio QP (SSQPspeed style), solve latency."""
    from ssqp_tpu.types import Settings, make_qp
    from ssqp_tpu.solvers.ssqp import solve_qp

    N = 50
    s = Settings.for_dtype(jnp.float32)
    lat = []
    for i in range(6):
        V, mu = _market(N, seed=10 + i)
        Q = make_qp(V, -mu, u=np.full(N, 0.2, np.float32), dtype=np.float32)
        t0 = time.perf_counter()
        r = solve_qp(Q, settings=s)
        np.asarray(r.x)
        if i:  # first call pays compile
            lat.append(time.perf_counter() - t0)
        assert int(r.status) > 0
    _emit("single_n50_qp_latency", float(np.mean(lat)) * 1e3, "ms")


def config2():
    """LP path: two-phase simplex, N=100, 5 equalities + 20 inequalities."""
    from ssqp_tpu.types import Settings, make_lp
    from ssqp_tpu.solvers.lp import simplex_lp

    N, M, J = 100, 5, 20
    s = Settings.for_dtype(jnp.float32)
    lat = []
    for i in range(4):
        rng = np.random.default_rng(20 + i)
        A = rng.standard_normal((M, N)).astype(np.float32)
        x0 = rng.uniform(0.1, 1.0, N).astype(np.float32)
        b = A @ x0
        G = rng.standard_normal((J, N)).astype(np.float32)
        g = G @ x0 + rng.uniform(0.1, 1.0, J).astype(np.float32)
        c = rng.standard_normal(N).astype(np.float32)
        P = make_lp(c, A, b, G=G, g=g, d=np.zeros(N, np.float32),
                    u=np.full(N, 2.0, np.float32), dtype=np.float32)
        t0 = time.perf_counter()
        r = simplex_lp(P, settings=s)
        np.asarray(r.x)
        if i:
            lat.append(time.perf_counter() - t0)
        assert int(r.status) >= 1, int(r.status)
    _emit("lp_n100_simplex_latency", float(np.mean(lat)) * 1e3, "ms")


def config3():
    """Batched frontier: 1024 QPs, N=128, shared V, varying q."""
    from ssqp_tpu.types import Settings, make_qp
    from ssqp_tpu.parallel.batch import frontier_batch, solve_qp_batch

    N, batch = 128, 1024
    s = Settings.for_dtype(jnp.float32)
    V, mu = _market(N)
    Q = make_qp(V, mu, u=np.full(N, 6.0 / N, np.float32), dtype=np.float32)
    times = []
    solved = 0
    for i in range(4):
        lams = jnp.linspace(0.001 * i, 2.0 + 0.001 * i, batch,
                            dtype=jnp.float32)
        Qb, shared = frontier_batch(Q, lams)
        Qb = jax.device_put(Qb)
        t0 = time.perf_counter()
        r = solve_qp_batch(Qb, s, shared=shared)
        np.asarray(r.x)
        if i:
            times.append(time.perf_counter() - t0)
        solved += int((np.asarray(r.status) > 0).sum())
    qps = batch / float(np.mean(times))
    print(f"config3 solved {solved}/{4 * batch}", file=sys.stderr)
    _emit("frontier_n128_batch1024_qps", qps, "QP/s")


def config4():
    """N=512 dense QP with general inequalities, mixed-precision pipeline:
    f32 active-set search on TPU + f64 refinement; accuracy vs a full-f64
    CPU reference solve."""
    from ssqp_tpu.types import Settings, make_qp
    from ssqp_tpu.solvers.refine import solve_qp_refined
    from ssqp_tpu.solvers.ssqp import solve_qp

    N, M, J = 512, 10, 100

    def problem(seed, dtype):
        rng = np.random.default_rng(seed)
        H = rng.standard_normal((N, N))
        V = H @ H.T / N + 0.5 * np.eye(N)
        A = rng.standard_normal((M, N))
        x0 = rng.uniform(0.0, 1.0, N)
        b = A @ x0
        G = rng.standard_normal((J, N))
        g = G @ x0 + rng.uniform(0.1, 1.0, J)
        q = rng.standard_normal(N)
        return (make_qp(V, q, A, b, G=G, g=g, d=x0 - 2.0, u=x0 + 2.0,
                        dtype=dtype), V, q)

    lat, gaps = [], []
    for i, seed in enumerate((4, 5, 6)):
        Q, V, q = problem(seed, np.float64)
        t0 = time.perf_counter()
        r = solve_qp_refined(Q, search_dtype=jnp.float32)
        x = np.asarray(r.x)
        if i:  # first call pays compile
            lat.append(time.perf_counter() - t0)
        assert int(r.status) > 0, int(r.status)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            r64 = solve_qp(problem(seed, np.float64)[0])
        x64 = np.asarray(r64.x)
        f = lambda xx: 0.5 * xx @ V @ xx + q @ xx
        gaps.append(abs(f(x) - f(x64)) / max(1.0, abs(f(x64))))
    print(f"config4 max objective gap vs f64 {max(gaps):.2e}", file=sys.stderr)
    _emit("dense_n512_mixed_latency", float(np.mean(lat)) * 1e3, "ms")
    _emit("dense_n512_mixed_objgap", max(gaps), "rel")


def config5():
    """Sharded many-instance sweep with psum stats over the local mesh."""
    from ssqp_tpu.types import Settings, make_qp
    from ssqp_tpu.parallel.batch import frontier_batch
    from ssqp_tpu.parallel.sharded import make_mesh, shard_batch, solve_qp_sharded

    N = 256
    ndev = jax.device_count()
    batch = 256 * ndev
    s = Settings.for_dtype(jnp.float32)
    V, mu = _market(N)
    Q = make_qp(V, mu, u=np.full(N, 4.0 / N, np.float32), dtype=np.float32)
    mesh = make_mesh()
    times = []
    for i in range(3):
        lams = jnp.linspace(0.001 * i, 2.0 + 0.001 * i, batch,
                            dtype=jnp.float32)
        Qb, shared = frontier_batch(Q, lams)
        Qs = shard_batch(Qb, mesh, shared=shared)
        t0 = time.perf_counter()
        r, stats = solve_qp_sharded(Qs, s, mesh, shared=shared)
        np.asarray(r.x)
        if i:
            times.append(time.perf_counter() - t0)
        assert int(stats["solved"]) == batch, stats
    qps = batch / float(np.mean(times))
    _emit(f"sharded_n256_{ndev}dev_qps", qps, "QP/s")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    configs = {"1": config1, "2": config2, "3": config3, "4": config4,
               "5": config5}
    if which == "all":
        for k in sorted(configs):
            configs[k]()
    else:
        configs[which]()


if __name__ == "__main__":
    main()
