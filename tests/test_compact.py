"""Batch-level compacted PDAS identification (verdict r4 item 1).

_guess_start_batch schedules the per-instance PDAS rounds at batch level and
gathers still-changing instances into a static C-width buffer for the late
rounds. The contract pinned here: results are BYTE-IDENTICAL to the plain
vmapped path (same rounds per instance, same warm starts, same budget) —
compaction is a scheduling change, not an algorithm change. Reference hot
loop it accelerates: SSQP.jl:276-332.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssqp_tpu.parallel.batch import (
    frontier_batch,
    solve_qp_batch,
    solve_qp_batch_compact,
    solve_qp_batch_waves,
    stack_qps,
)
from ssqp_tpu.types import Settings, make_qp

S32 = Settings.for_dtype(jnp.float32)
S64 = Settings.for_dtype(jnp.float64)


def _frontier(N=48, B=64, seed=3, dtype=np.float32):
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((N, N))
    V = (H @ H.T / N + 0.5 * np.eye(N)).astype(dtype)
    mu = rng.uniform(0, 0.2, N).astype(dtype)
    Q = make_qp(V, mu, u=np.full(N, 4.0 / N, dtype), dtype=dtype)
    return frontier_batch(Q, jnp.linspace(0.0, 2.0, B).astype(dtype))


class TestCompactBatch:
    @pytest.mark.parametrize("compact", [2, 4, 8, (2, 4, 8)])
    def test_identical_to_plain(self, compact):
        Qb, shared = _frontier()
        r0 = solve_qp_batch(Qb, S32, shared=shared)
        r1 = solve_qp_batch_compact(Qb, S32, shared=shared, compact=compact)
        assert bool(jnp.all(r0.status == r1.status))
        assert bool(jnp.all(r0.S == r1.S))
        np.testing.assert_array_equal(np.asarray(r0.x), np.asarray(r1.x))

    def test_waves_compact_identical(self):
        Qb, shared = _frontier(B=64)
        r0 = solve_qp_batch_waves(Qb, S32, shared, waves=8)
        r1 = solve_qp_batch_waves(Qb, S32, shared, waves=8, compact=4)
        assert bool(jnp.all(r0.status == r1.status))
        np.testing.assert_array_equal(np.asarray(r0.x), np.asarray(r1.x))

    def test_stacked_per_instance_V(self):
        """Per-instance V (nothing shared): pdas_precond auto-disables and
        the compacted CG rounds still match the plain path."""
        def rand_qp(seed, N=16):
            rng = np.random.default_rng(seed)
            H = rng.standard_normal((N, N))
            V = H @ H.T / N + 0.5 * np.eye(N)
            q = rng.standard_normal(N) * 0.1
            return make_qp(V, q, u=np.full(N, 0.6))

        Qb = stack_qps([rand_qp(s) for s in range(8)])
        r0 = solve_qp_batch(Qb, S64)
        r1 = solve_qp_batch_compact(Qb, S64, compact=4)
        assert bool(jnp.all(r0.status == r1.status))
        np.testing.assert_array_equal(np.asarray(r0.x), np.asarray(r1.x))

    def test_inequality_rows(self):
        """J>0: Se compaction carries inequality statuses through the
        gather/scatter identically."""
        N, B = 24, 32
        rng = np.random.default_rng(9)
        H = rng.standard_normal((N, N))
        V = (H @ H.T / N + 0.5 * np.eye(N)).astype(np.float32)
        mu = rng.uniform(0, 0.2, N).astype(np.float32)
        G = rng.standard_normal((3, N)).astype(np.float32)
        g = (np.abs(rng.standard_normal(3)) + 0.2).astype(np.float32)
        Q = make_qp(V, mu, G=G, g=g, u=np.full(N, 4.0 / N, np.float32),
                    dtype=np.float32)
        Qb, shared = frontier_batch(
            Q, jnp.linspace(0.0, 2.0, B).astype(jnp.float32))
        r0 = solve_qp_batch(Qb, S32, shared=shared)
        r1 = solve_qp_batch_compact(Qb, S32, shared=shared, compact=4)
        assert bool(jnp.all(r0.status == r1.status))
        assert bool(jnp.all(r0.S == r1.S))
        np.testing.assert_array_equal(np.asarray(r0.x), np.asarray(r1.x))


class TestAutoEntry:
    """solve_qp_batch_auto (verdict r4 item 5): one entry point applying the
    measured protocol cost model. At test scale (B << 8192) it must pick the
    plain path and match it exactly; explicit overrides must route to the
    requested protocol."""

    def test_auto_matches_plain_small(self):
        from ssqp_tpu.parallel.batch import solve_qp_batch_auto

        Qb, shared = _frontier(B=64)
        r0 = solve_qp_batch(Qb, S32, shared=shared)
        r1 = solve_qp_batch_auto(Qb, S32, shared=shared)
        assert bool(jnp.all(r0.status == r1.status))
        np.testing.assert_array_equal(np.asarray(r0.x), np.asarray(r1.x))

    def test_auto_tail_override(self):
        from ssqp_tpu.parallel.batch import (
            solve_qp_batch_auto, solve_qp_batch_tail_refined,
        )

        Qb, shared = _frontier(B=32)
        # the auto entry point runs the tail at iters=1 (round-5 policy)
        r0 = solve_qp_batch_tail_refined(Qb, S32, shared, waves=0, tail=4,
                                         iters=1)
        r1 = solve_qp_batch_auto(Qb, S32, shared=shared, tail=4)
        assert bool(jnp.all(r0.status == r1.status))
        np.testing.assert_array_equal(np.asarray(r0.x), np.asarray(r1.x))

    def test_auto_waves_override(self):
        from ssqp_tpu.parallel.batch import (
            solve_qp_batch_auto, solve_qp_batch_waves,
        )

        Qb, shared = _frontier(B=64)
        r0 = solve_qp_batch_waves(Qb, S32, shared, waves=8)
        r1 = solve_qp_batch_auto(Qb, S32, shared=shared, waves=8)
        assert bool(jnp.all(r0.status == r1.status))
        np.testing.assert_array_equal(np.asarray(r0.x), np.asarray(r1.x))
