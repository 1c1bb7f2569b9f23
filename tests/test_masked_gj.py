"""masked_gj vs numpy rank ground truth (reference utils.jl:49-86 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssqp_tpu.ops.masked_gj import (
    masked_gj_purge,
    masked_independent_cols,
    masked_row_rank,
)

TOL = 2.0**-33


def np_rank(A, tol=1e-9):
    if A.size == 0:
        return 0
    return int(np.linalg.matrix_rank(A, tol=tol))


@pytest.mark.parametrize("seed", range(6))
def test_purge_full_rank_consistent(seed):
    rng = np.random.default_rng(seed)
    R, C = 5, 12
    A = rng.standard_normal((R, C))
    x = rng.standard_normal(C)
    b = A @ x
    keep, inc, _ = masked_gj_purge(jnp.asarray(A), jnp.asarray(b), jnp.ones(R, bool), TOL)
    assert not bool(inc)
    assert int(keep.sum()) == R


@pytest.mark.parametrize("seed", range(6))
def test_purge_redundant_consistent(seed):
    rng = np.random.default_rng(100 + seed)
    R, C = 6, 10
    A = rng.standard_normal((R, C))
    A[3] = 2.0 * A[0] - A[1]  # dependent
    A[5] = -A[2]
    x = rng.standard_normal(C)
    b = A @ x
    keep, inc, _ = masked_gj_purge(jnp.asarray(A), jnp.asarray(b), jnp.ones(R, bool), TOL)
    assert not bool(inc)
    assert int(keep.sum()) == np_rank(A)
    kept_rows = A[np.asarray(keep)]
    assert np_rank(kept_rows) == np_rank(A)


def test_purge_inconsistent_detected():
    rng = np.random.default_rng(7)
    A = rng.standard_normal((4, 8))
    A[3] = A[0] + A[1]
    b = rng.standard_normal(4)
    b[3] = b[0] + b[1] + 1.0  # violates the dependency
    keep, inc, _ = masked_gj_purge(jnp.asarray(A), jnp.asarray(b), jnp.ones(4, bool), TOL)
    assert bool(inc)


def test_purge_respects_row_mask():
    rng = np.random.default_rng(11)
    A = rng.standard_normal((5, 9))
    b = A @ rng.standard_normal(9)
    mask = jnp.array([True, False, True, True, False])
    keep, inc, _ = masked_gj_purge(jnp.asarray(A), jnp.asarray(b), mask, TOL)
    assert not bool(inc)
    assert not bool(keep[1]) and not bool(keep[4])
    assert int(keep.sum()) == 3


@pytest.mark.parametrize("seed", range(4))
def test_masked_rank(seed):
    rng = np.random.default_rng(200 + seed)
    A = rng.standard_normal((7, 5))  # rank <= 5 with 7 rows
    rank, keep = masked_row_rank(jnp.asarray(A), jnp.ones(7, bool), TOL)
    assert int(rank) == np_rank(A)


def test_independent_cols_priority():
    rng = np.random.default_rng(3)
    R, C = 4, 8
    A = rng.standard_normal((R, C))
    A[:, 5] = A[:, 0] + A[:, 1]  # dependent on cols 0,1
    # priority: prefer columns 5,0,1 first (5 should win over 0+1 jointly)
    priority = np.full(C, 2.0)
    priority[[5, 0, 1]] = [0.0, 1.0, 1.0]
    keep = masked_independent_cols(
        jnp.asarray(A), jnp.ones(C, bool), jnp.asarray(priority), TOL
    )
    keep = np.asarray(keep)
    assert keep[5]  # highest priority, picked first
    assert keep.sum() == R  # maximal: rank(A) = 4
    assert np_rank(A[:, keep]) == R


def test_independent_cols_col_mask():
    rng = np.random.default_rng(4)
    A = rng.standard_normal((3, 6))
    cm = jnp.array([True, True, False, True, False, True])
    keep = masked_independent_cols(
        jnp.asarray(A), cm, jnp.zeros(6), TOL
    )
    keep = np.asarray(keep)
    assert not keep[2] and not keep[4]
    assert keep.sum() == 3


def test_vmap_purge():
    rng = np.random.default_rng(9)
    B, R, C = 4, 5, 7
    A = rng.standard_normal((B, R, C))
    A[:, 4] = A[:, 0]  # every instance has one redundant row
    b = np.einsum("brc,bc->br", A, rng.standard_normal((B, C)))
    f = jax.vmap(lambda a, bb: masked_gj_purge(a, bb, jnp.ones(R, bool), TOL)[:2])
    keep, inc = f(jnp.asarray(A), jnp.asarray(b))
    assert not bool(inc.any())
    assert (np.asarray(keep).sum(axis=1) == 4).all()


def test_column_pivot_flavor():
    # column-pivoted purge (reference getRowsGJ): same keep-count on full
    # rank, detects inconsistency identically
    from ssqp_tpu.ops.masked_gj import masked_gj_purge_col

    rng = np.random.default_rng(5)
    A = rng.standard_normal((4, 6))
    b = A @ rng.standard_normal(6)
    keep, inc, bad = masked_gj_purge_col(
        jnp.asarray(A), jnp.asarray(b), jnp.ones(4, bool), TOL)
    assert keep.sum() == 4 and not bool(inc)
    # duplicated inconsistent row
    A2 = np.vstack([A, A[0]])
    b2 = np.concatenate([b, [b[0] + 1.0]])
    keep, inc, bad = masked_gj_purge_col(
        jnp.asarray(A2), jnp.asarray(b2), jnp.ones(5, bool), TOL)
    assert bool(inc) and int(keep.sum()) == 4


def test_independent_rows_gs():
    from ssqp_tpu.ops.masked_gj import independent_rows_gs

    rng = np.random.default_rng(6)
    A = rng.standard_normal((5, 8))
    A[3] = 2.0 * A[1] - A[0]  # dependent row
    keep = independent_rows_gs(jnp.asarray(A), jnp.ones(5, bool), 1e-9)
    assert int(keep.sum()) == 4 and not bool(keep[3])
    # masked-out rows are never kept
    mask = jnp.asarray([True, True, False, True, True])
    keep = independent_rows_gs(jnp.asarray(A), mask, 1e-9)
    assert not bool(keep[2])


class TestQRPurge:
    """masked_purge_qr must agree with the GJ sweep (same greedy keep
    semantics) on every shape class the S-loop feeds it."""

    @pytest.mark.parametrize("seed", range(8))
    def test_matches_gj_on_random(self, seed):
        from ssqp_tpu.ops.masked_gj import masked_purge_qr

        rng = np.random.default_rng(seed)
        R, C = 20, 32
        A = rng.standard_normal((R, C))
        # make some rows dependent on earlier ones
        for j in (4, 9, 15):
            A[j] = A[j - 2] * 1.5 - A[j - 4]
        x = rng.standard_normal(C)
        b = A @ x  # consistent
        mask = jnp.asarray(rng.random(R) < 0.8)
        k1, i1, _ = masked_gj_purge(jnp.asarray(A), jnp.asarray(b), mask, TOL)
        k2, i2, _ = masked_purge_qr(jnp.asarray(A), jnp.asarray(b), mask, TOL)
        assert not bool(i1) and not bool(i2)
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))

    def test_inconsistent_detected(self):
        from ssqp_tpu.ops.masked_gj import masked_purge_qr

        rng = np.random.default_rng(3)
        R, C = 10, 16
        A = rng.standard_normal((R, C))
        A[6] = 2.0 * A[1] - A[3]
        b = A @ rng.standard_normal(C)
        b[6] += 0.5  # break consistency on the dependent row
        keep, inc, bad = masked_purge_qr(
            jnp.asarray(A), jnp.asarray(b), jnp.ones(R, bool), TOL
        )
        assert bool(inc)
        assert bool(bad[6]) and int(np.asarray(bad).sum()) == 1
        assert not bool(keep[6])

    def test_more_rows_than_cols(self):
        from ssqp_tpu.ops.masked_gj import masked_purge_qr

        rng = np.random.default_rng(4)
        R, C = 12, 5
        A = rng.standard_normal((R, C))
        b = A @ rng.standard_normal(C)
        keep, inc, _ = masked_purge_qr(
            jnp.asarray(A), jnp.asarray(b), jnp.ones(R, bool), TOL
        )
        assert int(np.asarray(keep).sum()) == C
        assert not bool(inc)

    def test_vmap(self):
        from ssqp_tpu.ops.masked_gj import masked_purge_qr

        rng = np.random.default_rng(5)
        A = rng.standard_normal((4, 8, 12))
        b = np.einsum("brc,bc->br", A, rng.standard_normal((4, 12)))
        keep, inc, bad = jax.vmap(
            lambda a, bb: masked_purge_qr(a, bb, jnp.ones(8, bool), TOL)
        )(jnp.asarray(A), jnp.asarray(b))
        assert keep.shape == (4, 8)
        assert not bool(inc.any())
