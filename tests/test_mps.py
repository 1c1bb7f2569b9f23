"""MPS importer tests (reference workflow: examples/rwMOI.jl — read a file,
optimize, inspect). Fixtures vendored under tests/data/."""

import os

import numpy as np
import pytest

from ssqp_tpu.utils.mps import read_mps, solve_mps

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_simple_lp():
    m = solve_mps(os.path.join(DATA, "simple_lp.mps"))
    assert m.termination_status() == "OPTIMAL"
    assert abs(m.objective_value() - (-8.0)) < 1e-8
    np.testing.assert_allclose(m.values(), [0.0, 4.0], atol=1e-8)


def test_bounds_and_ranges():
    m = solve_mps(os.path.join(DATA, "bounds_ranges.mps"))
    assert m.termination_status() == "OPTIMAL"
    assert abs(m.objective_value() - 1.0) < 1e-8
    x = m.values()
    assert abs(x.sum() - 1.0) < 1e-8        # range row at its lower edge
    assert abs(x[0] - x[2] - 0.5) < 1e-8    # equality row holds


def test_quadobj_qp():
    m = solve_mps(os.path.join(DATA, "simple_qp.mps"))
    assert m.termination_status() == "OPTIMAL"
    assert abs(m.objective_value() - (-9.0)) < 1e-7
    np.testing.assert_allclose(m.values(), [1.0, 1.0], atol=1e-6)


def test_read_from_string_and_file_object():
    text = open(os.path.join(DATA, "simple_lp.mps")).read()
    m1 = read_mps(text)                       # raw text
    with open(os.path.join(DATA, "simple_lp.mps")) as fh:
        m2 = read_mps(fh)                     # file object
    m1.optimize()
    m2.optimize()
    assert abs(m1.objective_value() - m2.objective_value()) < 1e-12


def test_read_from_pathlike():
    import pathlib

    m = read_mps(pathlib.Path(DATA) / "simple_lp.mps")  # os.PathLike
    m.optimize()
    assert abs(m.objective_value() - (-8.0)) < 1e-8


def test_objsense_max():
    text = """NAME MAXLP
OBJSENSE
    MAX
ROWS
 N  OBJ
 L  C1
COLUMNS
    X1        OBJ       1.0        C1        1.0
RHS
    RHS       C1        5.0
ENDATA
"""
    m = read_mps(text)
    m.optimize()
    assert m.termination_status() == "OPTIMAL"
    assert abs(m.objective_value() - 5.0) < 1e-8


def test_integer_markers_relaxed_and_unknown_rejected():
    mip = """NAME MIP
ROWS
 N  OBJ
 G  R1
COLUMNS
    M1        'MARKER'   'INTORG'
    X1        OBJ       1.0   R1   1.0
    M2        'MARKER'   'INTEND'
RHS
    RHS       R1        2.0
ENDATA
"""
    # default is a hard error: silently solving a MIP's relaxation would
    # report OPTIMAL for the wrong problem class
    with pytest.raises(ValueError, match="relax_integers"):
        read_mps(mip)
    with pytest.warns(UserWarning, match="relaxed to continuous"):
        m = read_mps(mip, relax_integers=True)
    assert m.relaxed_integers is True
    m.optimize()  # continuous relaxation solves fine
    assert m.termination_status() == "OPTIMAL"
    assert abs(m.objective_value() - 2.0) < 1e-8
    assert read_mps(os.path.join(DATA, "simple_lp.mps")).relaxed_integers is False
    with pytest.raises(ValueError):
        read_mps("NAME X\nSOS\n S1 SET 1\nENDATA\n")


def test_roundtrip_against_scipy():
    # cross-check the two LP fixtures against scipy linprog on the same data
    from scipy.optimize import linprog

    m = read_mps(os.path.join(DATA, "simple_lp.mps"))
    P = m._assemble()
    res = linprog(np.asarray(P.c), A_ub=np.asarray(P.G), b_ub=np.asarray(P.g),
                  bounds=list(zip(np.asarray(P.d), np.asarray(P.u))),
                  method="highs")
    m.optimize()
    assert abs(m.objective_value() - res.fun) < 1e-8


# ---------------------------------------------------------------------------
# writer (write_mps) + gzip
# ---------------------------------------------------------------------------

from ssqp_tpu.utils.mps import write_mps  # noqa: E402


def _assert_exact_roundtrip(m):
    """read(write(m)) must reassemble the IDENTICAL problem pytree."""
    import jax

    m2 = read_mps(write_mps(m))
    P1, P2 = m._assemble(), m2._assemble()
    assert type(P1) is type(P2)
    for l1, l2 in zip(jax.tree.leaves(P1), jax.tree.leaves(P2)):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert m2._sense == m._sense and m2._f0 == m._f0


def test_write_roundtrip_fixtures():
    for f in ("simple_lp.mps", "bounds_ranges.mps", "simple_qp.mps"):
        _assert_exact_roundtrip(read_mps(os.path.join(DATA, f)))


def test_write_roundtrip_all_features():
    from ssqp_tpu.model import Model

    rng = np.random.default_rng(3)
    m = Model()
    # every bound class, incl. the negative-UP quirk (lo=0, up<0) and
    # irrational-ish floats that must survive the decimal round trip
    m.add_variable(0.0, np.inf)            # MPS default, no BOUNDS line
    m.add_variable(-np.inf, np.inf)        # FR
    m.add_variable(0.25, 0.25)             # FX
    m.add_variable(-np.inf, 1.0 / 3.0)     # MI + UP
    m.add_variable(0.0, -0.5)              # UP<0 with explicit LO 0 (quirk)
    m.add_variable(np.pi, np.inf)          # LO only
    m.add_variable(-2.5, 7.125)            # LO + UP
    n = m.n
    m.add_eq(rng.standard_normal(n), 1.75)
    m.add_le(rng.standard_normal(n), -0.125)
    m.add_ge(rng.standard_normal(n), 0.5)
    m.add_interval(rng.standard_normal(n), -1.0, 2.0)
    quad = {}
    for i in range(n):
        quad[(i, i)] = 1.0 + i
    quad[(0, 1)] = 0.7
    quad[(1, 0)] = 0.1  # asymmetric input; symmetrization must survive
    m.set_objective(quad=quad, lin=rng.standard_normal(n),
                    constant=3.25, sense="min")
    _assert_exact_roundtrip(m)
    # max-sense LP variant
    m2 = Model()
    m2.add_variables(3, lb=0.0, ub=2.0)
    m2.add_le(np.ones(3), 2.0)
    m2.set_objective(lin=[1.0, 2.0, 3.0], sense="max")
    _assert_exact_roundtrip(m2)


def test_write_gzip_and_read_gzip(tmp_path):
    m = read_mps(os.path.join(DATA, "simple_qp.mps"))
    gz = tmp_path / "roundtrip.mps.gz"
    text = write_mps(m, path=gz)
    assert gz.exists()
    import gzip

    assert gzip.open(gz, "rt").read() == text
    m2 = read_mps(gz)              # path ending .gz
    m3 = read_mps(gz.read_bytes())  # raw gzipped bytes
    for mm in (m2, m3):
        mm.optimize()
        assert abs(mm.objective_value() - (-9.0)) < 1e-7
    # plain-path write still round-trips
    plain = tmp_path / "roundtrip.mps"
    write_mps(m, path=plain)
    m4 = read_mps(plain)
    m4.optimize()
    assert abs(m4.objective_value() - (-9.0)) < 1e-7


def test_solve_mps_settings_are_per_solve():
    from ssqp_tpu.types import Settings

    s = Settings(max_iter=333)
    m = solve_mps(os.path.join(DATA, "simple_lp.mps"), settings=s)
    assert m.termination_status() == "OPTIMAL"
    assert m.settings is not s  # restored after the solve


def test_vendored_gzip_fixture():
    m = solve_mps(os.path.join(DATA, "simple_qp.mps.gz"))
    assert m.termination_status() == "OPTIMAL"
    assert abs(m.objective_value() - (-9.0)) < 1e-7
