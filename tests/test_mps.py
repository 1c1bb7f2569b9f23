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
    with pytest.warns(UserWarning, match="relaxed to continuous"):
        m = read_mps(mip)
    m.optimize()  # continuous relaxation solves fine
    assert m.termination_status() == "OPTIMAL"
    assert abs(m.objective_value() - 2.0) < 1e-8
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
