"""Ill-conditioned battery: the accuracy-first stance under bad conditioning.

The reference keeps accuracy by refactorizing everywhere (Simplex.jl:7-10,
SSQP.jl:322-328). The TPU-native CG path instead carries a settings-derived
acceptance gate (Settings.cg_ok_rtol) plus escalation to direct Cholesky
solves (Settings.escalate_direct) — these tests pin that machinery: tiny
ridges, nearly dependent equality rows, and strongly correlated covariances
must all solve to KKT accuracy with stock f64 settings (no tolerance
loosening), and genuinely indefinite V must come back status -1, never a
silent wrong "optimal".
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ssqp_tpu.types import IN, DN, UP, Settings, make_qp
from ssqp_tpu.solvers.ssqp import solve_qp
from ssqp_tpu.utils.problems import kkt_residual


def _kkt_max(Q, x):
    return kkt_residual(
        np.asarray(Q.V), np.asarray(Q.q), np.asarray(Q.A), np.asarray(Q.b),
        np.asarray(Q.G), np.asarray(Q.g), np.asarray(Q.d), np.asarray(Q.u),
        np.asarray(x),
    )["max"]


def _check(Q, r, tol=1e-6):
    assert int(r.status) > 0, f"status {int(r.status)}"
    res = _kkt_max(Q, r.x)
    assert res < tol, f"KKT residual {res:.2e}"


def test_tiny_ridge_covariance():
    # V = H H'/N + 1e-6 I: condition number ~1e6, far from the comfy 0.5
    # ridge every other test uses.
    rng = np.random.default_rng(3)
    N = 64
    H = rng.standard_normal((N, N // 4))
    V = H @ H.T / N + 1e-6 * np.eye(N)
    mu = rng.uniform(0.0, 0.2, N)
    Q = make_qp(V, -mu, u=np.full(N, 8.0 / N))
    _check(Q, solve_qp(Q), tol=5e-6)


def test_nearly_dependent_equality_rows():
    # Second equality row = first + 1e-7 perturbation (consistent b):
    # the working-system purge must keep the system solvable.
    rng = np.random.default_rng(4)
    N = 32
    H = rng.standard_normal((N, N))
    V = H @ H.T / N + 0.1 * np.eye(N)
    a1 = np.ones(N)
    a2 = a1 + 1e-7 * rng.standard_normal(N)
    x_feas = np.full(N, 1.0 / N)
    A = np.stack([a1, a2])
    b = A @ x_feas
    Q = make_qp(V, rng.standard_normal(N) * 0.1, A=A, b=b,
                d=np.full(N, -1.0), u=np.full(N, 1.0))
    _check(Q, solve_qp(Q), tol=5e-6)


def test_strongly_correlated_covariance():
    # Equicorrelation rho=0.999: eigenvalues {~N rho, ~(1-rho)} — condition
    # number ~2.5e5 with a tight eigenvalue cluster CG finds hard.
    N = 48
    rho = 0.999
    V = rho * np.ones((N, N)) + (1 - rho) * np.eye(N)
    rng = np.random.default_rng(5)
    mu = rng.uniform(0.0, 0.2, N)
    Q = make_qp(V, -mu, u=np.full(N, 6.0 / N))
    _check(Q, solve_qp(Q), tol=5e-6)


def test_wide_scale_spread():
    # Variable scales spanning 6 orders of magnitude.
    rng = np.random.default_rng(6)
    N = 40
    s = np.logspace(-3, 3, N)
    H = rng.standard_normal((N, N))
    V = (H @ H.T / N + 0.5 * np.eye(N)) * np.outer(s, s) * 1e-3
    mu = rng.uniform(0.0, 0.2, N) * s
    Q = make_qp(V, -mu, u=np.full(N, np.inf))
    _check(Q, solve_qp(Q), tol=5e-6)


def test_indefinite_V_never_silently_optimal():
    # V with a negative eigenvalue smuggled past the constructor's PSD check
    # (check_psd=False): every iteration's KKT solve must flag it, and the
    # final status must be -1 — not a finite-garbage "optimal" (the Pallas
    # kernel floors pivots; the residual gate is what catches this).
    N = 16
    rng = np.random.default_rng(7)
    H = rng.standard_normal((N, N))
    V = H @ H.T / N + 0.1 * np.eye(N)
    w, U = np.linalg.eigh(V)
    w[0] = -0.5  # force indefiniteness
    V = (U * w) @ U.T
    Q = make_qp(V, rng.standard_normal(N), u=np.full(N, 2.0 / N),
                check_psd=False)
    r = solve_qp(Q)
    # An indefinite EQP can still stumble into a KKT point of the restricted
    # problem; what is forbidden is claiming optimality at a point whose
    # KKT residual is garbage.
    if int(r.status) > 0:
        assert _kkt_max(Q, r.x) < 1e-6
    else:
        assert int(r.status) == -1


def test_escalation_recovers_cg_stall():
    # Starved CG budget (4 iterations on a cond~1e6 system) must not produce
    # a wrong answer: either the gate + escalation rescue the solve, or it
    # reports a numerical error. With escalation the solve must succeed.
    rng = np.random.default_rng(8)
    N = 48
    H = rng.standard_normal((N, N // 4))
    V = H @ H.T / N + 1e-6 * np.eye(N)
    mu = rng.uniform(0.0, 0.2, N)
    Q = make_qp(V, -mu, u=np.full(N, 8.0 / N))
    s = Settings(cg_iters=4, escalate_direct=True)
    _check(Q, solve_qp(Q, settings=s), tol=5e-6)


def test_gate_is_settings_derived():
    # The acceptance gate must follow Settings.cg_ok_rtol, not a literal.
    from ssqp_tpu.ops.kkt import kkt_solve_cg

    rng = np.random.default_rng(9)
    N = 24
    H = rng.standard_normal((N, N))
    V = jnp.asarray(H @ H.T / N + 1e-8 * np.eye(N))
    q = jnp.asarray(rng.standard_normal(N))
    A = jnp.ones((1, N))
    b = jnp.ones((1,))
    z = jnp.full((N,), 1.0 / N)
    free = jnp.ones((N,), bool)
    keep = jnp.ones((1,), bool)
    # 2 CG iterations cannot converge on cond ~1e8 — strict gate says not ok
    r_strict = kkt_solve_cg(V, q, A, b, z, free, keep, 2, 1e-14, ok_rtol=1e-10)
    assert not bool(r_strict.ok)
    # an absurdly loose gate accepts the same solve
    r_loose = kkt_solve_cg(V, q, A, b, z, free, keep, 2, 1e-14, ok_rtol=1e6)
    assert bool(r_loose.ok)
