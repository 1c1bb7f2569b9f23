"""Closed-form LP over a box (no equality/inequality rows).

Reference: `boxLP` (src/utils.jl:282-329) — per-coordinate sign test on c.
Divergence note: the reference initializes its status to -1 ("computing") and
never sets it on the clean unique path, returning -1 for a perfectly solvable
box LP; here the unique case correctly returns 1.
"""

from __future__ import annotations

import jax.numpy as jnp

from ssqp_tpu.types import DN, IN, LP, Result, Settings, UP


def box_lp(P: LP, *, settings: Settings | None = None, minimize: bool = True) -> Result:
    settings = settings or Settings.for_dtype(P.c.dtype)
    tol = settings.tol
    c = P.c if minimize else -P.c
    d, u = P.d, P.u

    pos = c > tol
    neg = c < -tol
    zero = ~pos & ~neg
    x = jnp.where(neg, u, d)
    S = jnp.where(neg, UP, DN).astype(jnp.int8)
    # zero-cost coordinates: any value optimal; keep d if finite else 0/u
    xz = jnp.where(jnp.isfinite(d), d, jnp.where(jnp.isfinite(u), u, 0.0))
    x = jnp.where(zero, xz, x)
    S = jnp.where(zero & ~jnp.isfinite(d) & jnp.isfinite(u), UP, S).astype(jnp.int8)
    S = jnp.where(zero & ~jnp.isfinite(d) & ~jnp.isfinite(u), IN, S).astype(jnp.int8)

    unbounded = jnp.any((pos & ~jnp.isfinite(d)) | (neg & ~jnp.isfinite(u)))
    many = jnp.any(zero)
    status = jnp.where(unbounded, 3, jnp.where(many, 2, 1)).astype(jnp.int32)
    x = jnp.where(jnp.isfinite(x), x, 0.0)  # cosmetic value on unbounded coords
    # dual certificate: no rows, so the reduced gradient IS the (minimized)
    # cost; min-sense convention like the simplex/cclp engines
    ok = status > 0
    gamma = jnp.where(ok, c, jnp.zeros_like(c))
    return Result(x, S, status, jnp.zeros((0,), c.dtype), gamma)
