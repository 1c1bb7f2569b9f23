"""Matmul precision control for TPU.

On TPU, `jnp.dot`/`@` on float32 defaults to bfloat16 MXU passes (~1e-3
relative error) — far below the solver tolerances (tolG ~ 1e-6 in f32), which
makes the active-set iteration cycle. Every solver entry point is traced under
`highest` matmul precision (3-pass bf16 ~ full f32). The reference has no
analogue (CPU BLAS is always full precision); this is the TPU-native
correctness/performance knob, and Pallas kernels later choose per-op.
"""

from __future__ import annotations

import functools

import jax


def highest_matmul(fn):
    """Trace ``fn`` with `jax.default_matmul_precision('highest')` active."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
