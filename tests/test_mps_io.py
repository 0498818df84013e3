"""Native MPS reader: build, parse, solve end-to-end."""

import textwrap

import numpy as np
import pytest

from linprog_tpu import SimplexSolver
from linprog_tpu.io import mps_to_solver_inputs, read_mps

SIMPLE_MPS = textwrap.dedent("""\
    * sample LP:
    *   min -x - 2y  s.t.  x + y <= 4,  y <= 2,  x + 2y >= 1,  x3 fixed
    NAME          SAMPLE
    ROWS
     N  COST
     L  CAP
     L  YLIM
     G  MIN1
     E  FIX3
    COLUMNS
        X         COST      -1.0       CAP        1.0
        X         MIN1       1.0
        Y         COST      -2.0       CAP        1.0
        Y         YLIM       1.0       MIN1       2.0
        Z         FIX3       1.0
    RHS
        RHS       CAP        4.0       YLIM       2.0
        RHS       MIN1       1.0      FIX3        1.5
    BOUNDS
     UP BND       X          3.0
    ENDATA
    """)


@pytest.fixture()
def mps_file(tmp_path):
    p = tmp_path / "sample.mps"
    p.write_text(SIMPLE_MPS)
    return str(p)


def test_parse_structure(mps_file):
    prob = read_mps(mps_file)
    assert prob.name == "SAMPLE"
    assert not prob.maximize
    assert prob.col_names == ["X", "Y", "Z"]
    assert list(prob.row_types) == ["L", "L", "G", "E"]
    assert np.allclose(prob.rhs, [4.0, 2.0, 1.0, 1.5])
    assert np.allclose(prob.c, [-1.0, -2.0, 0.0])
    assert prob.ub[0] == 3.0 and np.isinf(prob.ub[1])
    A = prob.A
    assert A[0, 0] == 1.0 and A[0, 1] == 1.0  # CAP
    assert A[3, 2] == 1.0  # FIX3


def test_parse_error_reporting(tmp_path):
    bad = tmp_path / "bad.mps"
    bad.write_text("ROWS\n L  R1\nGARBAGE SECTION\nENDATA\n")
    with pytest.raises(ValueError, match="unknown section"):
        read_mps(str(bad))


def test_solve_parsed_problem(mps_file):
    scipy_opt = pytest.importorskip("scipy.optimize")
    prob = read_mps(mps_file)
    c, A, b, G, h, lb, ub = mps_to_solver_inputs(prob)
    res = SimplexSolver(c, A=A, b=b, G=G, h=h, lb=lb, ub=ub).solve()
    assert res.optimum

    ref = scipy_opt.linprog(
        prob.c,
        A_ub=np.concatenate([prob.A[[0, 1]], -prob.A[[2]]]),
        b_ub=np.array([4.0, 2.0, -1.0]),
        A_eq=prob.A[[3]],
        b_eq=np.array([1.5]),
        bounds=list(zip(prob.lb, np.where(np.isinf(prob.ub), None, prob.ub))),
        method="highs",
    )
    assert ref.status == 0
    assert res.cost == pytest.approx(ref.fun, abs=1e-4)


def test_maximize_objsense(tmp_path):
    text = textwrap.dedent("""\
        NAME MAXLP
        OBJSENSE
            MAX
        ROWS
         N  OBJ
         L  R1
        COLUMNS
            X   OBJ   1.0   R1   1.0
        RHS
            RHS R1    5.0
        ENDATA
        """)
    p = tmp_path / "max.mps"
    p.write_text(text)
    prob = read_mps(str(p))
    assert prob.maximize
    c, A, b, G, h, lb, ub = mps_to_solver_inputs(prob)
    res = SimplexSolver(c, A=A, b=b, G=G, h=h, lb=lb, ub=ub).solve()
    # max x s.t. x <= 5 -> x = 5 (internal min form cost -5)
    assert res.x[0] == pytest.approx(5.0, abs=1e-5)


def test_ranges_section(tmp_path):
    text = textwrap.dedent("""\
        NAME RANGED
        ROWS
         N  OBJ
         L  R1
         G  R2
        COLUMNS
            X   OBJ   -1.0   R1   1.0
            X   R2    1.0
            Y   OBJ   -1.0   R1   1.0
        RHS
            RHS R1    8.0    R2   1.0
        RANGES
            RNG R1    3.0
        ENDATA
        """)
    p = tmp_path / "ranged.mps"
    p.write_text(text)
    prob = read_mps(str(p))
    assert prob.ranges[0] == 3.0 and np.isnan(prob.ranges[1])
    c, A, b, G, h, lb, ub = mps_to_solver_inputs(prob)
    # L row with range r: rhs - r <= a'x <= rhs -> extra G row
    assert G.shape[0] == 3  # R1 (<=8), -R2 (>=1 negated), range side (>=5)
    res = SimplexSolver(c, A=A, b=b, G=G, h=h, lb=lb, ub=ub).solve()
    assert res.optimum
    # max x+y subject to 5 <= x+y <= 8, x >= 1 -> objective -8
    assert res.cost == pytest.approx(-8.0, abs=1e-4)


def test_ranged_e_row(tmp_path):
    # E row with RANGES: sign(range) semantics (previously silently treated
    # as a pure equality, shrinking the feasible region)
    text = textwrap.dedent("""\
        NAME RANGEDE
        ROWS
         N  OBJ
         E  R1
        COLUMNS
            X   OBJ   -1.0   R1   1.0
        RHS
            RHS R1    2.0
        RANGES
            RNG R1    3.0
        ENDATA
        """)
    p = tmp_path / "rangede.mps"
    p.write_text(text)
    prob = read_mps(str(p))
    c, A, b, G, h, lb, ub = mps_to_solver_inputs(prob)
    # r > 0 on an E row: 2 <= x <= 5; the row must NOT stay an equality
    assert A is None and G.shape[0] == 2
    res = SimplexSolver(c, A=A, b=b, G=G, h=h, lb=lb, ub=ub).solve()
    assert res.optimum
    assert res.x[0] == pytest.approx(5.0, abs=1e-5)  # min -x -> x = 5


def test_ranged_e_row_negative_range(tmp_path):
    text = textwrap.dedent("""\
        NAME RANGEDEN
        ROWS
         N  OBJ
         E  R1
        COLUMNS
            X   OBJ   1.0   R1   1.0
        RHS
            RHS R1    4.0
        RANGES
            RNG R1    -3.0
        ENDATA
        """)
    p = tmp_path / "rangeden.mps"
    p.write_text(text)
    prob = read_mps(str(p))
    c, A, b, G, h, lb, ub = mps_to_solver_inputs(prob)
    # r < 0 on an E row: 1 <= x <= 4
    res = SimplexSolver(c, A=A, b=b, G=G, h=h, lb=lb, ub=ub).solve()
    assert res.optimum
    assert res.x[0] == pytest.approx(1.0, abs=1e-5)  # min x -> x = 1


def test_integer_markers_warn(tmp_path):
    text = textwrap.dedent("""\
        NAME INTLP
        ROWS
         N  OBJ
         L  R1
        COLUMNS
            M1  'MARKER'  'INTORG'
            X   OBJ   -1.0   R1   1.0
            M2  'MARKER'  'INTEND'
        RHS
            RHS R1    5.0
        ENDATA
        """)
    p = tmp_path / "int.mps"
    p.write_text(text)
    with pytest.warns(UserWarning, match="LP relaxation"):
        prob = read_mps(str(p))
    assert prob.n_integer_sections == 1
    # the relaxation still solves
    c, A, b, G, h, lb, ub = mps_to_solver_inputs(prob)
    res = SimplexSolver(c, A=A, b=b, G=G, h=h, lb=lb, ub=ub).solve()
    assert res.x[0] == pytest.approx(5.0, abs=1e-5)


@pytest.mark.parametrize("body,match", [
    ("ROWS\n L  R1\nCOLUMNS\n    X  R1  notanumber\nENDATA\n",
     "parse"),
    ("ROWS\n Z  R1\nENDATA\n", "bad row type"),
    ("ROWS\n L  R1\nGARBAGE\nENDATA\n", "unknown section"),
])
def test_malformed_files_fail_loudly(tmp_path, body, match):
    p = tmp_path / "bad.mps"
    p.write_text(body)
    with pytest.raises(ValueError, match=match):
        read_mps(str(p))


def test_rhs_on_unknown_row_rejected_or_ignored(tmp_path):
    # RANGES naming an unknown row must not crash the reader
    text = textwrap.dedent("""\
        NAME ODD
        ROWS
         N  OBJ
         L  R1
        COLUMNS
            X   OBJ   1.0   R1   1.0
        RHS
            RHS R1    5.0
        RANGES
            RNG NOSUCH 1.0
        ENDATA
        """)
    p = tmp_path / "odd.mps"
    p.write_text(text)
    prob = read_mps(str(p))  # parses; unknown range row ignored
    assert np.isnan(prob.ranges[0])


def test_fuzz_corrupted_files_never_crash(tmp_path):
    """Randomized corruption fuzz: the C++ reader must either parse or
    raise ValueError -- never crash the process, hang, or silently return
    a malformed problem object (VERDICT round-1 item 9)."""
    base = textwrap.dedent("""\
        NAME FUZZBASE
        ROWS
         N  OBJ
         L  R1
         G  R2
         E  R3
        COLUMNS
            X1  OBJ  1.0   R1  2.0
            X1  R2   1.0   R3  1.0
            X2  OBJ  -2.0  R1  1.0
            X2  R3   1.0
        RHS
            RHS R1  10.0  R2  1.0
            RHS R3  3.0
        RANGES
            RNG R1  4.0
        BOUNDS
         UP BND X1  8.0
         LO BND X2  0.5
        ENDATA
        """)
    rng = np.random.default_rng(0)
    lines = base.splitlines(keepends=True)
    n_parsed = n_rejected = 0
    for trial in range(40):
        kind = trial % 5
        if kind == 0:  # truncate at a random byte
            cut = int(rng.integers(1, len(base)))
            text = base[:cut]
        elif kind == 1:  # drop a random line
            i = int(rng.integers(0, len(lines)))
            text = "".join(lines[:i] + lines[i + 1:])
        elif kind == 2:  # duplicate a random line
            i = int(rng.integers(0, len(lines)))
            text = "".join(lines[:i] + [lines[i]] + lines[i:])
        elif kind == 3:  # replace a random token with garbage
            toks = base.split(" ")
            j = int(rng.integers(0, len(toks)))
            toks[j] = "\x7f@!" if toks[j].strip() else toks[j]
            text = " ".join(toks)
        else:  # splice random bytes into the middle
            cut = int(rng.integers(0, len(base)))
            junk = bytes(rng.integers(33, 127, 12)).decode("ascii")
            text = base[:cut] + junk + base[cut:]
        p = tmp_path / f"fuzz{trial}.mps"
        p.write_text(text)
        try:
            prob = read_mps(str(p))
        except ValueError:
            n_rejected += 1
            continue
        # accepted parses must be structurally sane
        m, n = prob.A.shape
        assert len(prob.col_names) == n and len(prob.row_names) == m
        assert prob.rhs.shape == (m,) and prob.c.shape == (n,)
        assert prob.lb.shape == (n,) and prob.ub.shape == (n,)
        n_parsed += 1
    # both outcomes must actually occur across the corpus
    assert n_parsed > 0 and n_rejected > 0, (n_parsed, n_rejected)
