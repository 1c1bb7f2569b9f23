"""Compilation warm-up & persistent cache — the PrecompileTools analogue.

The reference ships a `@compile_workload` block that pre-compiles the solver
entry points at package build time (reference: src/StatusSwitchingQP.jl:39-77).
The TPU-native equivalent is (a) XLA's persistent compilation cache, so a
solver program for a given (N, M, J, batch) shape compiles once per machine,
and (b) an explicit AOT warm-up that traces/lowers/compiles the canonical
entry points for the shapes a deployment cares about.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional, Tuple

import numpy as np


def enable_compilation_cache(path: Optional[str] = None) -> str:
    """Turn on JAX's persistent compilation cache (idempotent).

    Long solver `while_loop` programs take minutes to compile on TPU; the
    cache makes every later process start-up near-instant for seen shapes.
    """
    import jax

    path = path or os.environ.get(
        "SSQP_CACHE_DIR", os.path.join(os.path.expanduser("~"), ".ssqp_tpu_cache")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path


def warmup(
    shapes: Iterable[Tuple[int, int, int]] = ((16, 1, 0),),
    batch: int = 0,
    dtype=None,
    refined: bool = False,
) -> int:
    """Compile the QP solve paths for the given (N, M, J) shapes.

    ``solve_qp`` (the three-stage auto solve — PDAS guess, Phase-1, exact
    pass — all one XLA program) is always warmed; ``batch > 0`` additionally
    warms the vmap-batched path at that batch size, and ``refined=True``
    warms the mixed-precision pipeline (f32 search + refinement — a distinct
    program). Returns the number of programs executed. Mirrors the
    reference's precompile workload (a tiny portfolio QP through every
    entry point).
    """
    import jax.numpy as jnp

    from ssqp_tpu.types import Settings, make_qp
    from ssqp_tpu.solvers.ssqp import solve_qp
    from ssqp_tpu.parallel.batch import solve_qp_batch, stack_qps

    dtype = dtype or np.float32
    settings = Settings.for_dtype(dtype)
    n = 0
    for (N, M, J) in shapes:
        rng = np.random.default_rng(0)
        H = rng.standard_normal((N, N))
        V = (H @ H.T / N + 0.5 * np.eye(N)).astype(dtype)
        A = np.ones((M, N), dtype)
        b = np.ones((M,), dtype)
        G = rng.standard_normal((J, N)).astype(dtype) if J else None
        g = np.full((J,), 10.0, dtype) if J else None
        Q = make_qp(V, None, A, b, G=G, g=g, u=np.full(N, 1.0, dtype),
                    dtype=dtype)
        solve_qp(Q, settings=settings).x.block_until_ready()
        n += 1
        if batch > 0:
            Qb = stack_qps([Q] * batch)
            solve_qp_batch(Qb, settings).x.block_until_ready()
            n += 1
        if refined:
            hi_dtype = jnp.zeros(0).dtype  # ambient default (f64 iff x64 on)
            if jnp.dtype(hi_dtype) == jnp.dtype(dtype):
                import warnings

                warnings.warn(
                    "warmup(refined=True) skipped: with jax_enable_x64 off "
                    "the high-precision tier equals the search dtype, so "
                    "the mixed-precision (f32 search + f64 refine) program "
                    "would never be the one compiled; enable x64 first",
                    stacklevel=2,
                )
            else:
                from ssqp_tpu.solvers.refine import solve_qp_refined

                import jax

                Qhi = jax.tree.map(lambda a: a.astype(hi_dtype), Q)
                solve_qp_refined(
                    Qhi, search_dtype=jnp.dtype(dtype)
                ).x.block_until_ready()
                n += 1
    return n
