"""Warm-wave LP grids: solve a c-parametric LP family fast.

A parametric cost sweep (e.g. a risk-aversion or price scan over a fixed
feasible region) is the LP analogue of the QP efficient frontier. The
two-phase simplex splits into a cost-independent part — standardization,
row purge, and Phase-1, which only minimizes artificials — and a Phase-2
that depends on c. `solve_lp_batch_waves` computes the shared part ONCE
per family and solves the sorted cost grid in warm waves, each slot
starting Phase-2 from its grid neighbor's optimal basis (any basis stays
feasible when only c varies). Reference analogue: the warm-startable
simplex kernels of Simplex.jl:426-445, one problem at a time.

Run: python examples/lp_grid.py        (CPU or TPU)

Note: the timings below include one-off compilation; the measured
steady-state win on TPU (N=100, batch 256, chained dispatch) is 1.57x
(6.2k vs 3.9k LP/s — see bench_suite.py config2's grid columns).
"""
import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from ssqp_tpu import Settings, make_lp
from ssqp_tpu.parallel.batch import solve_lp_batch, solve_lp_batch_waves

# float32 end to end with the f32-tier Settings: the f64 LP path needs a
# CPU backend (TPU implements LU only in F32 — see the project notes), so
# an example meant to run on either device sticks to the f32 tier
N, M, J, B = 60, 4, 12, 64
rng = np.random.default_rng(3)
x0 = rng.uniform(0.1, 1.0, N).astype(np.float32)
A = rng.standard_normal((M, N)).astype(np.float32)
G = rng.standard_normal((J, N)).astype(np.float32)
b = A @ x0
g = (G @ x0 + rng.uniform(0.1, 1.0, J)).astype(np.float32)

# sorted cost grid: c(t) = c0 + t * dc, t in [0, 1]
c0 = rng.standard_normal(N).astype(np.float32)
dc = (rng.standard_normal(N) * 0.5).astype(np.float32)
ts = np.linspace(0.0, 1.0, B).astype(np.float32)
C = jnp.asarray(c0[None, :] + ts[:, None] * dc[None, :])

P = make_lp(c0, A, b, G=G, g=g, d=np.zeros(N, np.float32),
            u=np.full(N, 2.0, np.float32), dtype=np.float32)
Pb = dataclasses.replace(P, c=C)
shared = ("A", "b", "G", "g", "d", "u")
s = Settings.for_dtype(jnp.float32)

t0 = time.perf_counter()
r_plain = solve_lp_batch(Pb, s, shared=shared)
jax.block_until_ready(r_plain.x)
t_plain = time.perf_counter() - t0

t0 = time.perf_counter()
r_waves = solve_lp_batch_waves(Pb, s, shared, waves=8)
jax.block_until_ready(r_waves.x)
t_waves = time.perf_counter() - t0

f_plain = np.asarray((C * r_plain.x).sum(axis=1))
f_waves = np.asarray((C * r_waves.x).sum(axis=1))
print(f"grid of {B} LPs (N={N}, M={M}, J={J}):")
print(f"  plain vmapped two-phase: {t_plain:.3f}s "
      f"({int((np.asarray(r_plain.status) >= 1).sum())}/{B} solved)")
print(f"  warm waves (shared Phase-1): {t_waves:.3f}s "
      f"({int((np.asarray(r_waves.status) >= 1).sum())}/{B} solved)")
print(f"  max objective difference: {np.abs(f_plain - f_waves).max():.2e}")
print(f"  optimal value along the sweep: {f_waves[0]:.4f} (t=0) "
      f"-> {f_waves[-1]:.4f} (t=1)")
