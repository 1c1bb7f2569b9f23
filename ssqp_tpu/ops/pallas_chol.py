"""Fused batched Cholesky factorize-and-solve as a Pallas TPU kernel.

Why this exists: XLA's batched `cholesky`/`lu` are fast standalone but
collapse inside `lax.while_loop` on TPU (measured 0.02 ms -> 10.6 ms for a
256x256x256 f32 batch on v5e; batched LU fails to even compile in reasonable
time in a loop). The status-switching solver factorizes a fresh mask-padded
SPD matrix every iteration inside a while_loop, so the hot path needs a
loop-robust kernel. This is the "fused Pallas factorize-and-solve on the
padded KKT matrix" item from the build plan (SURVEY.md §7).

Design (one `pallas_call`, grid over batch tiles of G instances):

  * the G padded matrices live in VMEM for the whole kernel;
  * right-looking Cholesky vectorized over (G, N, N): the sequential
    dependency is the column index only; each step does a masked rank-1
    trailing update (VPU). The trailing block stays symmetric, so column j
    is read as ROW j (sublane dynamic slice — cheap), and the factor is
    written row-wise into an L^T buffer. No lane-dimension dynamic indexing
    anywhere;
  * the K-column solves run in TRANSPOSED (G, K, N) layout so the length-N
    axis rides the 128-wide lane dimension (K is tiny — (G, N, K) layout
    would waste 126/128 lanes per vector op). Scalar extraction at lane j is
    a masked lane-reduction; updates are masked lane writes. Forward solve is
    elimination-form, backward solve a masked row-dot recurrence; both reuse
    the factor from VMEM, so factorization + solves cost one HBM round-trip.

The padded matrices are SPD with unit diagonal on pinned coordinates
(ops/kkt.py), so no pivoting is needed; a floor under the pivot keeps
sqrt/div defined on singular input (callers detect failure from the
solution residual).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_solve_kernel(a_ref, rhs_ref, out_ref, a_s, lt_s, r_s):
    """Factor A (G,N,N); solve A X^T = RHS^T with RHS in (G,K,N) layout.

    All iteration happens on scratch buffers; the pipelined output block is
    written exactly once at the end (per-step read-modify-write of a grid
    output ref measured ~1000x slower than scratch on v5e).
    """
    G, N, _ = a_s.shape
    dtype = a_ref.dtype

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)  # (1, N)

    a_s[:] = a_ref[:]

    # ---- Cholesky: trailing block kept symmetric in a_s, factor in lt_s --
    def chol_step(j, _):
        A = a_s[:]
        rowj = a_s[:, pl.ds(j, 1), :][:, 0, :]  # (G, N) == column j by symmetry
        dj2 = jnp.sum(jnp.where(lane == j, rowj, 0.0), axis=1)  # (G,)
        inv_d = jax.lax.rsqrt(jnp.maximum(dj2, 1e-30))
        col = jnp.where(lane >= j, rowj * inv_d[:, None], 0.0)  # (G, N)
        mask = ((row_ids > j) & (col_ids > j)).astype(dtype)
        a_s[:] = A - mask[None] * (col[:, :, None] * col[:, None, :])
        lt_s[:, pl.ds(j, 1), :] = col[:, None, :]  # row j of L^T = col j of L
        return 0

    jax.lax.fori_loop(0, N, chol_step, 0)

    # ---- forward solve L y = r, elimination form, lanes = N --------------
    r_s[:] = rhs_ref[:]

    def fwd_step(j, _):
        ltrow = lt_s[:, pl.ds(j, 1), :]  # (G, 1, N) column j of L
        djj = jnp.sum(jnp.where(lane == j, ltrow[:, 0, :], 0.0), axis=1)  # (G,)
        r = r_s[:]
        rj = jnp.sum(jnp.where(lane[None] == j, r, 0.0), axis=2)  # (G, K)
        yj = rj / djj[:, None]
        below = jnp.where(lane[None] > j, ltrow, 0.0)  # (G, 1, N)
        r2 = r - below * yj[:, :, None]
        r_s[:] = jnp.where(lane[None] == j, yj[:, :, None], r2)
        return 0

    jax.lax.fori_loop(0, N, fwd_step, 0)

    # ---- backward solve L^T x = y, row-dot recurrence, lanes = N ---------
    def bwd_step(t, _):
        j = N - 1 - t
        ltrow = lt_s[:, pl.ds(j, 1), :]  # (G, 1, N) row j of L^T
        djj = jnp.sum(jnp.where(lane == j, ltrow[:, 0, :], 0.0), axis=1)
        x = r_s[:]
        right = jnp.where(lane[None] > j, ltrow, 0.0)
        contrib = jnp.sum(right * x, axis=2)  # (G, K)
        yj = jnp.sum(jnp.where(lane[None] == j, x, 0.0), axis=2)  # (G, K)
        xj = (yj - contrib) / djj[:, None]
        r_s[:] = jnp.where(lane[None] == j, xj[:, :, None], x)
        return 0

    jax.lax.fori_loop(0, N, bwd_step, 0)
    out_ref[:] = r_s[:]


@functools.partial(jax.jit, static_argnames=("tile",))
def chol_solve_batch(A, RHS, tile: int = 8):
    """Solve A X = RHS for a batch of SPD matrices with one fused kernel.

    Args:
      A: (B, N, N) SPD (mask-padded KKT) matrices, float32.
      RHS: (B, N, K) right-hand sides.
      tile: instances per grid program (VMEM ~ 2*tile*N*N*4 bytes).

    Returns (B, N, K) solutions.
    """
    B, N, _ = A.shape
    K = RHS.shape[2]
    while tile > 1 and B % tile != 0:
        tile //= 2
    grid = (B // tile,)
    rhs_t = jnp.swapaxes(RHS, 1, 2)  # (B, K, N): lanes = N inside the kernel
    # Trace with x64 disabled: under jax_enable_x64 the Python-int literals
    # in index maps / fori bounds stage as i64 and Mosaic fails to legalize
    # them (see ops/pallas_cg.py). All kernel values are explicitly 32-bit.
    with jax.enable_x64(False):
        out_t = pl.pallas_call(
        _chol_solve_kernel,
        out_shape=jax.ShapeDtypeStruct((B, K, N), A.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, N, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, K, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, K, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile, N, N), A.dtype),
            pltpu.VMEM((tile, N, N), A.dtype),
            pltpu.VMEM((tile, K, N), A.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(B * (N**3 + 4 * N * N * K)),
            bytes_accessed=int(B * (N * N + 2 * N * K) * A.dtype.itemsize),
            transcendentals=int(B * N),
        ),
    )(A, rhs_t)
    return jnp.swapaxes(out_t, 1, 2)
