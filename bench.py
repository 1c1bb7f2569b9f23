"""Headline benchmark: dense N=256 portfolio QPs solved per second per chip.

Protocol (BASELINE.md): batched efficient-frontier-style QPs — one shared
dense PSD covariance, varying linear terms, budget equality, box upper bounds
— solved end-to-end (Phase-1 simplex + status-switching S-loop) on one chip.
Target: >= 10k QPs/s/chip at <1e-6 objective gap (vs_baseline is value/10000).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from ssqp_tpu.types import Settings, make_qp
    from ssqp_tpu.parallel.batch import frontier_batch, solve_qp_batch

    N = int(os.environ.get("BENCH_N", 256))
    batch = int(os.environ.get("BENCH_BATCH", 512))
    reps = int(os.environ.get("BENCH_REPS", 3))
    dtype = jnp.float32

    settings = Settings.for_dtype(dtype)
    rng = np.random.default_rng(7)
    H = rng.standard_normal((N, N))
    V = H @ H.T / N + 0.5 * np.eye(N)
    mu = rng.uniform(0.0, 0.2, N)
    Q = make_qp(
        np.asarray(V, np.float32), np.asarray(mu, np.float32),
        u=np.full(N, 4.0 / N, np.float32), dtype=np.float32,
    )
    lams = jnp.linspace(0.0, 2.0, batch).astype(dtype)
    Qb, shared = frontier_batch(Q, lams)

    def run():
        res = solve_qp_batch(Qb, settings, shared=shared)
        jax.block_until_ready(res)
        return res

    res = run()  # compile + warm-up
    status = np.asarray(res.status)
    ok = int((status > 0).sum())

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    t = min(times)
    qps = batch / t

    # accuracy audit vs float64 CPU reference solve of a subsample
    gap = float("nan")
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            from ssqp_tpu.solvers.ssqp import solve_qp

            idx = np.linspace(0, batch - 1, 5).astype(int)
            gaps = []
            for i in idx:
                Qi = make_qp(V, mu, u=np.full(N, 4.0 / N), dtype=np.float64)
                from ssqp_tpu.types import QP

                qi = np.asarray(-lams[i], np.float64) * mu
                Qi = make_qp(V, qi, u=np.full(N, 4.0 / N), dtype=np.float64)
                r64 = solve_qp(Qi)
                x32 = np.asarray(res.x[i], np.float64)
                x64 = np.asarray(r64.x)
                f32v = 0.5 * x32 @ V @ x32 + qi @ x32
                f64v = 0.5 * x64 @ V @ x64 + qi @ x64
                gaps.append(abs(f32v - f64v) / max(1.0, abs(f64v)))
            gap = float(max(gaps))
    except Exception as e:  # audit is best-effort; never sink the bench
        print(f"accuracy audit skipped: {e}", file=sys.stderr)

    print(
        f"solved {ok}/{batch} N={N} QPs in {t:.4f}s "
        f"({qps:.1f}/s), max objective gap vs f64 = {gap:.2e}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": f"dense_n{N}_qp_solves_per_s_per_chip",
        "value": round(qps, 2),
        "unit": "QP/s",
        "vs_baseline": round(qps / 10000.0, 4),
    }))


if __name__ == "__main__":
    main()
