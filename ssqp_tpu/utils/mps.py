"""MPS file import — the reference's file-based workflow equivalent.

The reference demonstrates MPS -> solver through JuMP/MOI's FileFormats
bridge (reference examples/rwMOI.jl:1-10: `read_from_file` then `optimize!`).
Natively we parse free-format MPS (fixed-format files parse too — the free
grammar is a superset for the common subset) into a :class:`ssqp_tpu.model.Model`,
which assembles the LP/QP pytree and dispatches the right engine.

Supported sections: NAME, OBJSENSE, ROWS (N/L/G/E), COLUMNS (with integer
markers tolerated-but-relaxed), RHS, RANGES, BOUNDS (UP LO FX FR MI PL BV),
QUADOBJ/QMATRIX (quadratic objective, lower-triangle entries; QMATRIX gives
both triangles), ENDATA. Unsupported sections raise ValueError rather than
silently mis-reading (SOS, indicators).
"""

from __future__ import annotations

import io

import numpy as np


def _tok(line: str):
    return line.split()


def read_mps(source) -> "Model":
    """Parse MPS text into a ready-to-optimize Model.

    ``source`` is a path, file object, or the raw MPS text itself.
    """
    from ssqp_tpu.model import Model

    import os

    if hasattr(source, "read"):
        text = source.read()
    elif isinstance(source, os.PathLike) or (
        isinstance(source, str) and "\n" not in source
    ):
        with open(source) as fh:
            text = fh.read()
    else:
        text = source

    section = None
    obj_row = None
    sense = "min"
    rows = {}  # name -> kind in {'L','G','E'}
    row_order = []
    cols = {}  # var -> {row: coef}
    col_order = []
    obj_coefs = {}
    rhs = {}
    ranges = {}
    bounds = {}  # var -> [lo, up]
    quad = {}  # (var_i, var_j) -> coef
    in_integer = False

    for raw in io.StringIO(text):
        line = raw.rstrip("\n")
        if not line.strip() or line.lstrip().startswith("*"):
            continue
        if not line[0].isspace():  # section header
            parts = _tok(line)
            section = parts[0].upper()
            if section == "NAME":
                continue
            if section == "OBJSENSE":
                # OBJSENSE may carry the value on the same line
                if len(parts) > 1:
                    sense = "max" if parts[1].upper().startswith("MAX") else "min"
                continue
            if section in ("ROWS", "COLUMNS", "RHS", "RANGES", "BOUNDS",
                           "QUADOBJ", "QMATRIX", "ENDATA"):
                continue
            raise ValueError(f"unsupported MPS section: {section}")
        parts = _tok(line)
        if section == "OBJSENSE":
            sense = "max" if parts[0].upper().startswith("MAX") else "min"
        elif section == "ROWS":
            kind, name = parts[0].upper(), parts[1]
            if kind == "N":
                if obj_row is None:
                    obj_row = name
                # extra N rows are ignored (standard behavior)
            else:
                if kind not in ("L", "G", "E"):
                    raise ValueError(f"bad row kind {kind}")
                rows[name] = kind
                row_order.append(name)
        elif section == "COLUMNS":
            if len(parts) >= 3 and parts[1].upper() == "'MARKER'":
                # integer markers are tolerated-but-RELAXED (continuous
                # relaxation; the engines are LP/QP only) — warn once
                if parts[2].upper() == "'INTORG'" and not in_integer:
                    import warnings

                    warnings.warn(
                        "MPS integer marker: variables are relaxed to "
                        "continuous (LP/QP engines only)", stacklevel=2,
                    )
                in_integer = parts[2].upper() == "'INTORG'"
                continue
            var = parts[0]
            if var not in cols:
                cols[var] = {}
                col_order.append(var)
            for rname, val in zip(parts[1::2], parts[2::2]):
                v = float(val)
                if rname == obj_row:
                    obj_coefs[var] = obj_coefs.get(var, 0.0) + v
                elif rname in rows:
                    cols[var][rname] = cols[var].get(rname, 0.0) + v
                # coefficients for ignored extra N rows are dropped
        elif section == "RHS":
            # first token is the RHS set name (arbitrary)
            for rname, val in zip(parts[1::2], parts[2::2]):
                if rname == obj_row:
                    # objective constant enters negated per MPS convention
                    rhs[obj_row] = float(val)
                else:
                    rhs[rname] = float(val)
        elif section == "RANGES":
            for rname, val in zip(parts[1::2], parts[2::2]):
                ranges[rname] = float(val)
        elif section == "BOUNDS":
            btype = parts[0].upper()
            var = parts[2]
            lo, up = bounds.get(var, [0.0, np.inf])
            if btype == "UP":
                up = float(parts[3])
                if up < 0 and lo == 0.0:
                    # classic MPS quirk: negative UP implies free-below
                    lo = -np.inf
            elif btype == "LO":
                lo = float(parts[3])
            elif btype == "FX":
                lo = up = float(parts[3])
            elif btype == "FR":
                lo, up = -np.inf, np.inf
            elif btype == "MI":
                lo = -np.inf
            elif btype == "PL":
                up = np.inf
            elif btype == "BV":
                raise ValueError("binary variables are not supported")
            else:
                raise ValueError(f"bad bound type {btype}")
            bounds[var] = [lo, up]
        elif section in ("QUADOBJ", "QMATRIX"):
            vi, vj, val = parts[0], parts[1], float(parts[2])
            quad[(vi, vj)] = quad.get((vi, vj), 0.0) + val
        elif section == "ENDATA":
            break
        else:
            raise ValueError(f"data line outside a known section: {line!r}")

    # ---- assemble the Model ------------------------------------------------
    m = Model()
    idx = {}
    for var in col_order:
        lo, up = bounds.get(var, [0.0, np.inf])
        idx[var] = m.add_variable(lo, up)
    N = len(col_order)

    for rname in row_order:
        kind = rows[rname]
        coefs = np.zeros(N)
        for var in col_order:
            if rname in cols[var]:
                coefs[idx[var]] = cols[var][rname]
        r = rhs.get(rname, 0.0)
        if rname in ranges:
            rng = ranges[rname]
            # RANGES semantics (standard): row becomes two-sided
            if kind == "L":
                lo_, hi_ = r - abs(rng), r
            elif kind == "G":
                lo_, hi_ = r, r + abs(rng)
            else:  # E
                lo_, hi_ = (r, r + rng) if rng >= 0 else (r + rng, r)
            m.add_interval(coefs, lo_, hi_)
        elif kind == "L":
            m.add_le(coefs, r)
        elif kind == "G":
            m.add_ge(coefs, r)
        else:
            m.add_eq(coefs, r)

    lin = np.zeros(N)
    for var, v in obj_coefs.items():
        lin[idx[var]] = v
    const = -rhs.get(obj_row, 0.0) if obj_row in rhs else 0.0

    if quad:
        V = np.zeros((N, N))
        qmatrix = any((j, i) in quad and i != j for (i, j) in quad)
        for (vi, vj), v in quad.items():
            i, j = idx[vi], idx[vj]
            V[i, j] += v
            if i != j and not qmatrix:
                # QUADOBJ stores one triangle; mirror it
                V[j, i] += v
        V = (V + V.T) / 2
        m.set_objective(quad=V, lin=lin, constant=const, sense=sense)
    else:
        m.set_objective(lin=lin, constant=const, sense=sense)
    return m


def solve_mps(source, settings=None):
    """Convenience: read + optimize; returns the Model (reference rwMOI.jl
    workflow: read_from_file -> optimize! -> inspect). ``settings`` override
    the Model's solver settings for this solve."""
    m = read_mps(source)
    if settings is not None:
        m.settings = settings
    m.optimize()
    return m
