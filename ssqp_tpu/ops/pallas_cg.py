"""Fused multi-RHS CG on the mask-padded KKT operator as a Pallas TPU kernel.

Why this exists: the batched solver's cost is ~all conjugate-gradient
iterations on ``Vp X = B`` (ops/kkt.py::cg_solve_padded) — the PDAS warm-start
rounds and the S-loop KKT solves together are >95% of the headline batch
solve (profile_headline.py). Keeping the CG state VMEM-resident across
iterations removes the per-iteration HBM streaming of X/r/p/z.

MEASURED OUTCOME (v5e, N=256, batch 8192, K=2, 64 cold iterations): 7.0 ms
per solve vs 6.6 ms for the XLA while-loop — PARITY, not a win. XLA already
fuses the CG elementwise chain into the matvec and the loop is MXU-bound
(~0.1 ms/iteration ≈ the 6-pass f32 GEMM cost), not HBM-bound as the state
sizes suggested. The kernel is therefore opt-in (SSQP_PALLAS_CG=1, see
ops/kkt.py::_vp_cg) and kept as the starting point for a lower-precision
PDAS-only variant, where the MXU-bound balance WOULD favor fewer passes.

Design (one `pallas_call`, grid over tiles of flattened "systems"):

  * the batch of instances is FLATTENED: each instance contributes its
    K = 1+M+J right-hand sides as independent rows, so one kernel invocation
    runs CG for every instance at once (V is shared across the batch — the
    only case this kernel accepts; per-instance-V batches fall back to the
    XLA loop);
  * ROW layout (T systems, N coordinates): the length-N coordinate axis
    rides the 128-wide LANE dimension, so the three per-iteration inner
    products (pAp, r'z, r'r) are per-row lane reductions — the fast VPU
    path. The first fused-CG attempt used (N, T) column layout and lost to
    XLA: per-system reductions were then cross-SUBLANE trees, ~10x the GEMM
    cost per iteration (same lesson as ops/pallas_chol.py's transposed
    solves);
  * X, r, p live in VMEM for the WHOLE CG run: HBM traffic collapses from
    O(state x iterations) to O(state + V x tiles);
  * the mask-padded operator is applied without materializing Vp:
        vp(x) = fm . (x . fm) V^T + (1-fm) . x        [rows x (N,N) MXU]
    with fm the per-row free mask (bound coordinates pass through the
    implicit identity block);
  * per-row convergence freezing (alpha/beta zeroed on converged rows)
    mirrors the XLA implementation; a tile whose rows are ALL converged
    exits its `lax.while_loop` at the next chunk boundary — warm-started
    rows are ~free.

The iteration bound is a runtime scalar (SMEM) because the solver passes a
traced budget (fast/exact passes share one compiled body, solvers/ssqp.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cg_kernel(iters_ref, v_ref, fm_ref, dinv_ref, b_ref, tol2_ref,
               x0_ref, x_ref, rr_ref, r_s, p_s):
    """Run the whole CG loop for one row tile; state stays in VMEM.

    ``x0_ref`` (warm start) is input/output-aliased with ``x_ref`` (the
    solution), so the copy below is within one VMEM buffer. ``rr_ref``
    returns the final squared residual per row.
    """
    dtype = v_ref.dtype
    V = v_ref[:]
    fm = fm_ref[:]
    dinv = dinv_ref[:]
    tol2 = tol2_ref[:]
    x_ref[:] = x0_ref[:]
    # explicit-dtype constants: under jax_enable_x64, Python float literals
    # lower as f64 scalars inside Mosaic (no weak-type narrowing) and fail
    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)
    eps = jnp.asarray(1e-30, dtype)

    def vp(x):
        # rows of x are systems; y[c, :] = V @ (fm[c] . x[c]) via (x.fm) V^T
        xm = x * fm
        y = jax.lax.dot_general(
            xm, V, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dtype,
        )
        return fm * y + (one - fm) * x

    r0 = b_ref[:] - vp(x_ref[:])
    r_s[:] = r0
    z0 = r0 * dinv
    p_s[:] = z0
    rz0 = jnp.sum(r0 * z0, axis=1, keepdims=True)  # (T, 1) lane reduction
    rr0 = jnp.sum(r0 * r0, axis=1, keepdims=True)

    def step(_, carry):
        rz, rr = carry
        alive = rr > tol2
        p = p_s[:]
        Ap = vp(p)
        pAp = jnp.sum(p * Ap, axis=1, keepdims=True)
        alpha = jnp.where(alive & (pAp > zero),
                          rz / jnp.maximum(pAp, eps), zero)
        x_ref[:] = x_ref[:] + alpha * p
        r = r_s[:] - alpha * Ap
        r_s[:] = r
        zn = r * dinv
        rzn = jnp.sum(r * zn, axis=1, keepdims=True)
        beta = jnp.where(alive, rzn / jnp.maximum(rz, eps), zero)
        p_s[:] = zn + beta * p
        rrn = jnp.sum(r * r, axis=1, keepdims=True)
        return rzn, rrn

    # The scalar any-alive check syncs the pipeline, so it runs every CHUNK
    # steps, not every step (converged rows are frozen per-step by the alive
    # mask regardless — overshooting the check costs compute only). The
    # inner fori bound is clamped to the remaining budget so the kernel
    # never runs PAST the traced iteration cap: the opt-in Pallas path and
    # the default XLA loop return bit-comparable X for not-yet-converged
    # columns on identical inputs. The reduction lives in the BODY and the
    # cond reads a carried scalar: Mosaic's while lowering cannot legalize
    # vector reductions inside the cond region (and a bool any-reduction
    # additionally routes through float64 under x64).
    CHUNK = 8

    def alive_flag(rr):
        return (jnp.max(rr - tol2) > zero).astype(jnp.int32)

    def cond(carry):
        i, go, rz, rr = carry
        return (i < iters_ref[0]) & (go > 0)

    def body(carry):
        i, go, rz, rr = carry
        # int32 loop bounds: under jax_enable_x64 plain-int bounds make an
        # i64 induction variable, which Mosaic fails to legalize
        rz, rr = jax.lax.fori_loop(
            jnp.asarray(0, jnp.int32),
            jnp.minimum(jnp.asarray(CHUNK, jnp.int32), iters_ref[0] - i),
            step, (rz, rr))
        return i + CHUNK, alive_flag(rr), rz, rr

    _, _, _, rr = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), alive_flag(rr0), rz0, rr0)
    )
    rr_ref[:] = rr


def _row_tile(N: int) -> int:
    """Systems per grid program. VMEM demand per (T, N) f32 buffer is DOUBLED
    for the pipelined inputs (Pallas double-buffers in/out blocks to overlap
    the next tile's DMA with compute); a 5.5 MB nominal budget for the six
    live row buffers keeps the peak just under the 16 MB scoped limit
    (measured at N=256: 6 MB nominal = 16.09 MB demand, 88 KB over; 5.5 MB
    fits). The (N, N) V block's own (double-buffered) footprint comes out of
    the budget first — it is negligible at N=256 (~0.5 MB) but O(N^2):
    ~2 MB at N=512, ~8 MB at N=1024."""
    budget = int(5.5 * 2**20) - 2 * N * N * 4
    rows = budget // (6 * N * 4)
    return max(8, min(2048, (rows // 8) * 8))


@functools.partial(jax.jit, static_argnames=("interpret",))
def cg_padded_rows(V, fmr, dinvr, Br, tol2r, iters, X0r, interpret=False):
    """Fused CG for ``vp(x_c) = b_c`` over flattened system rows.

    Args:
      V: (N, N) shared operator, float32.
      fmr, dinvr: (C, N) per-row free mask / Jacobi preconditioner.
      Br: (C, N) right-hand sides (one system per row).
      tol2r: (C, 1) squared absolute residual tolerance per row.
      iters: () int32 iteration bound (may be traced).
      X0r: (C, N) warm start (zeros for a cold start).
      interpret: run the Pallas interpreter (CPU testing).

    Returns (X (C, N), rr (C, 1) final squared residual).
    """
    C, N = Br.shape
    dtype = Br.dtype

    # lane alignment: pad N to a multiple of 128 with identity coordinates
    # (fm=0 -> vp passes x through; b=x0=0 -> the coordinates stay exactly 0)
    Nl = -(-N // 128) * 128
    if Nl != N:
        pad = ((0, 0), (0, Nl - N))
        V = jnp.pad(V, ((0, Nl - N), (0, Nl - N)))
        fmr = jnp.pad(fmr, pad)
        dinvr = jnp.pad(dinvr, pad, constant_values=1.0)
        Br = jnp.pad(Br, pad)
        X0r = jnp.pad(X0r, pad)

    # sublane alignment: pad C to a multiple of the tile with converged rows
    # (tol2=0 and b=0 -> rr0=0, never alive)
    T = min(_row_tile(Nl), -(-C // 8) * 8)
    Cp = -(-C // T) * T
    if Cp != C:
        fmr = jnp.pad(fmr, ((0, Cp - C), (0, 0)))
        dinvr = jnp.pad(dinvr, ((0, Cp - C), (0, 0)), constant_values=1.0)
        Br = jnp.pad(Br, ((0, Cp - C), (0, 0)))
        X0r = jnp.pad(X0r, ((0, Cp - C), (0, 0)))
        tol2r = jnp.pad(tol2r, ((0, Cp - C), (0, 0)))

    grid = (Cp // T,)
    it_arr = jnp.reshape(jnp.asarray(iters, jnp.int32), (1,))
    # Trace the kernel with x64 disabled: under jax_enable_x64 the literal
    # constants in index maps / loop bounds stage as i64/f64, which Mosaic
    # fails to legalize ("func.return"(i64), f64 squeeze). Every value in
    # this kernel is explicitly 32-bit, so the local scope changes nothing
    # semantically.
    with jax.enable_x64(False):
        X, rr = pl.pallas_call(
        _cg_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Cp, Nl), dtype),
            jax.ShapeDtypeStruct((Cp, 1), dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # iters, whole (1,) array
            pl.BlockSpec((Nl, Nl), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, Nl), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, Nl), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, Nl), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, Nl), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T, Nl), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((T, Nl), dtype),
            pltpu.VMEM((T, Nl), dtype),
        ],
        input_output_aliases={6: 0},  # X0 buffer becomes the solution
        cost_estimate=pl.CostEstimate(
            flops=int(2 * Nl * Nl * Cp * 32),  # ~32 expected iterations
            bytes_accessed=int((6 * Nl * Cp + grid[0] * Nl * Nl) * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(it_arr, V, fmr, dinvr, Br, tol2r, X0r)
    return X[:C, :N], rr[:C]


def cg_padded_batch(V, FM, B, DINV, TOL2, iters, X0, interpret=False):
    """Batched adapter: flatten (batch, N, K) instances into system rows, run
    the fused kernel, restore the batch layout.

    Args:
      V: (N, N) shared operator.
      FM: (batch, N) free masks; DINV: (batch, N) preconditioners.
      B, X0: (batch, N, K); TOL2: (batch, K).

    Returns (X (batch, N, K), rr (batch, K)).
    """
    batch, N, K = B.shape
    C = batch * K
    Br = jnp.transpose(B, (0, 2, 1)).reshape(C, N)
    X0r = jnp.transpose(X0, (0, 2, 1)).reshape(C, N)
    fmr = jnp.broadcast_to(FM[:, None, :], (batch, K, N)).reshape(C, N)
    dinvr = jnp.broadcast_to(DINV[:, None, :], (batch, K, N)).reshape(C, N)
    tol2r = TOL2.reshape(C, 1)
    Xr, rrr = cg_padded_rows(V, fmr, dinvr, Br, tol2r, iters, X0r,
                             interpret=interpret)
    X = jnp.transpose(Xr.reshape(batch, K, N), (0, 2, 1))
    rr = rrr.reshape(batch, K)
    return X, rr
