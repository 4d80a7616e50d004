"""MPS reader tests: crafted-file unit coverage plus the bundled MIPLIB 2017
instance end-to-end (reference asserts dual ≈ 27±1,
``examples/miplib_2017/solve_miplib_dataset.py:53-70``)."""

import gzip
import math
from pathlib import Path

import numpy as np
import pytest

from dualip_tpu.io.mps import read_mps_file
from dualip_tpu.sparse import csc_to_dense

MPS_TEXT = """* comment line
NAME          tiny
ROWS
 N  COST
 L  LIM1
 G  LIM2
 E  EQ1
COLUMNS
    X1        COST      1.0   LIM1      2.0
    X1        LIM2      3.0
    X2        COST      2.0   LIM1      1.0
    X2        EQ1       1.0
    X3        EQ1       -1.0  LIM2      1.0
RHS
    RHS       LIM1      4.0   LIM2      1.0
    RHS       EQ1       7.0
BOUNDS
 UP BND       X1        4.0
 LO BND       X2        -1.0
 FR BND       X3
ENDATA
"""


@pytest.fixture
def tiny_mps(tmp_path):
    p = tmp_path / "tiny.mps"
    p.write_text(MPS_TEXT)
    return str(p)


def test_parse_structure(tiny_mps):
    lp = read_mps_file(tiny_mps)
    assert lp.name == "tiny"
    assert lp.shape == (3, 3)
    assert lp.col_names == ["X1", "X2", "X3"]
    assert lp.row_names == ["LIM1", "LIM2", "EQ1"]
    assert np.allclose(lp.c, [1.0, 2.0, 0.0])
    # G row LIM2 negated into <= form: -3 X1 - 1 X3 <= -1
    assert np.allclose(lp.b, [4.0, -1.0, 7.0])
    assert lp.equality_mask.tolist() == [False, False, True]

    dense = csc_to_dense(lp.to_csc())
    expect = np.array(
        [
            [2.0, 1.0, 0.0],  # LIM1 (<=)
            [-3.0, 0.0, -1.0],  # LIM2 (>= negated)
            [0.0, 1.0, -1.0],  # EQ1
        ],
        dtype=np.float32,
    )
    assert np.allclose(dense, expect)


def test_bounds_conventions(tiny_mps):
    lp = read_mps_file(tiny_mps)
    # X1: UP 4.0 with u >= 0 -> lower defaults to 0 (IBM convention)
    assert lp.lower[0] == 0.0 and lp.upper[0] == 4.0
    # X2: LO -1 only -> upper unbounded (NaN)
    assert lp.lower[1] == -1.0 and math.isnan(lp.upper[1])
    # X3: FR -> both NaN
    assert math.isnan(lp.lower[2]) and math.isnan(lp.upper[2])


def test_negative_upper_only_is_free_below(tmp_path):
    text = MPS_TEXT.replace(" UP BND       X1        4.0", " UP BND       X1        -2.0")
    p = tmp_path / "neg.mps"
    p.write_text(text)
    lp = read_mps_file(str(p))
    assert math.isnan(lp.lower[0]) and lp.upper[0] == -2.0


def test_projection_map_groups_by_bounds(tiny_mps):
    lp = read_mps_file(tiny_mps)
    pm = lp.build_projection_map()
    covered = sorted(i for e in pm.values() for i in e.indices)
    assert covered == [0, 1, 2]
    # three distinct bound pairs -> three entries
    assert len(pm) == 3


def test_gzip_roundtrip(tmp_path):
    p = tmp_path / "tiny.mps.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(MPS_TEXT)
    lp = read_mps_file(str(p))
    assert lp.shape == (3, 3)


RANGES_MPS = """NAME          rangetest
ROWS
 N  obj
 L  r1
 G  r2
 E  r3
 E  r4
 E  r5
COLUMNS
    x         obj       1.0        r1        1.0
    x         r2        1.0        r3        1.0
    y         obj       2.0        r1        1.0
    y         r2       -1.0        r4        1.0
    y         r5        1.0
RHS
    RHS       r1        5.0        r2        1.0
    RHS       r3        2.0        r4        1.0
    RHS       r5        7.0
RANGES
    RNG       r1        2.0        r2        3.0
    RNG       r3        1.5        r4       -0.5
    RNG       r5        0.0
BOUNDS
 FR BND       x
 FR BND       y
ENDATA
"""


def test_ranges_expand_to_two_sided_rows(tmp_path):
    """RANGES semantics (extension; the reference mis-parses such files):
    L: r-|R| <= ax <= r;  G: r <= ax <= r+|R|;  E: r+min(R,0) <= ax <= r+max(R,0);
    zero range on an E row keeps it an equality."""
    p = tmp_path / "r.mps"
    p.write_text(RANGES_MPS)
    lp = read_mps_file(str(p))
    m, n = lp.shape
    assert n == 2
    # 5 base rows + 4 range rows (r5 has zero range -> stays equality)
    assert m == 9
    assert lp.stats["ranged_rows"] == 4
    assert [nm for nm in lp.row_names if nm.endswith("__range")] == [
        "r1__range", "r2__range", "r3__range", "r4__range"]
    assert lp.equality_mask.sum() == 1  # only r5

    A = np.zeros((m, n))
    A[lp.a_rows, lp.a_cols] = lp.a_vals
    xi, yi = lp.col_names.index("x"), lp.col_names.index("y")

    rng = np.random.default_rng(0)
    # r5 (the zero-range equality y == 7) never holds on the sampled grid, so
    # it is dropped from both sides for the feasibility-region comparison
    keep = np.array([nm != "r5" for nm in lp.row_names])
    A2, b2, eq2 = A[keep], lp.b[keep], lp.equality_mask[keep]

    def feasible2(x, y):
        v = np.zeros(n); v[xi], v[yi] = x, y
        return (A2[~eq2] @ v <= b2[~eq2] + 1e-9).all()

    def math_feasible2(x, y):
        return (3.0 <= x + y <= 5.0 and 1.0 <= x - y <= 4.0
                and 2.0 <= x <= 3.5 and 0.5 <= y <= 1.0)

    agree = 0
    for _ in range(500):
        x, y = rng.uniform(1.0, 4.5), rng.uniform(0.0, 1.5)
        assert feasible2(x, y) == math_feasible2(x, y), (x, y)
        agree += feasible2(x, y)
    assert 0 < agree < 500  # both classes sampled


def test_ranges_unknown_row_raises(tmp_path):
    p = tmp_path / "r.mps"
    p.write_text("NAME x\nROWS\n N obj\n L r1\nCOLUMNS\n    x obj 1.0 r1 1.0\n"
                 "RANGES\n    RNG nosuch 1.0\nENDATA\n")
    with pytest.raises(ValueError, match="unknown row"):
        read_mps_file(str(p))


BUNDLED = Path(__file__).resolve().parents[1] / "examples" / "miplib_2017" / "v150d30-2hopcds.mps.gz"


@pytest.mark.skipif(not BUNDLED.exists(), reason="bundled MIPLIB instance missing")
def test_v150d30_parses():
    lp = read_mps_file(str(BUNDLED))
    assert lp.shape == (7822, 150)
    assert lp.to_csc().nnz == 103991
    assert not lp.equality_mask.any()


@pytest.mark.skipif(not BUNDLED.exists(), reason="bundled MIPLIB instance missing")
def test_v150d30_dual_objective():
    """Full 10k-iteration solve lands at ~27 (reference ±1 assertion)."""
    import jax.numpy as jnp

    from dualip_tpu.objectives.miplib import MIPLIB2017ObjectiveFunction
    from dualip_tpu.optimizers.agd import AcceleratedGradientDescent

    lp = read_mps_file(str(BUNDLED))
    obj = MIPLIB2017ObjectiveFunction(lp.to_miplib_input_args())
    solver = AcceleratedGradientDescent(max_iter=10000, gamma=1e-3, initial_step_size=1e-5)
    res = solver.maximize(obj, jnp.zeros(lp.shape[0], jnp.float32))
    assert abs(res.dual_objective - 27.0) < 1.0


def test_duplicate_column_entries_sum(tmp_path):
    # MPS convention: repeated (row, column) coefficients sum — both in the
    # objective row and in constraint rows (regression: objective overwrote,
    # constraints produced a CSC with duplicate row indices).
    text = """NAME dup
ROWS
 N  COST
 L  R1
COLUMNS
    X  COST  1.0  R1  2.0
    X  COST  0.5  R1  3.0
    Y  R1  1.0
RHS
    RHS  R1  10.0
ENDATA
"""
    p = tmp_path / "dup.mps"
    p.write_text(text)
    lp = read_mps_file(str(p))
    xj = lp.col_names.index("X")
    yj = lp.col_names.index("Y")
    assert lp.c[xj] == 1.5
    A = lp.to_csc()
    from dualip_tpu.preprocessing import check_correct_csc_construction
    from dualip_tpu.sparse.csc import csc_to_dense

    check_correct_csc_construction(A)  # no duplicate row indices
    dense = csc_to_dense(A)
    assert dense[0, xj] == 5.0
    assert dense[0, yj] == 1.0


@pytest.mark.skipif(not BUNDLED.exists(), reason="bundled MIPLIB instance missing")
def test_v150d30_butterfly_layout_agrees():
    """``_ButterflySparseOps`` (Benes dual-layout matvecs) reproduces the COO
    path on real MPS data.

    Runs on a 24-column slice of the bundled instance (sliced with the
    library's own sharding utilities) so the interpret-mode Pallas kernels
    finish in default-CI time; per-``calculate`` agreement covers the full
    butterfly pipeline (rmatvec → projection → matvec → finalization), and
    solve-level butterfly agreement is covered on synthetic LPs by
    ``tests/objectives/test_miplib_objective.py::test_miplib_butterfly_layout_matches_coo``
    and ``tests/test_rowmajor_layout.py``.  Match: the reference's single COO
    pipeline on this instance (``examples/miplib_2017/solve_miplib_dataset.py:53-70``).
    """
    import jax.numpy as jnp
    import numpy as np

    from dualip_tpu.objectives.miplib import MIPLIB2017ObjectiveFunction, MIPLIBInputArgs
    from dualip_tpu.parallel.dist_utils import global_to_local_projection_map
    from dualip_tpu.sparse.csc import split_csc_by_cols

    lp = read_mps_file(str(BUNDLED))
    args = lp.to_miplib_input_args()
    K = 24  # real columns (~670 nnz each: the instance's set-cover structure)
    A_sl = split_csc_by_cols(args.A, [K, args.A.shape[1] - K])[0]
    sl = MIPLIBInputArgs(
        A=A_sl,
        c=args.c[:K],
        projection_map=global_to_local_projection_map(args.projection_map, list(range(K))),
        b_vec=args.b_vec,
        equality_mask=args.equality_mask,
    )
    coo = MIPLIB2017ObjectiveFunction(sl)
    bf = MIPLIB2017ObjectiveFunction(sl, layout="butterfly")
    lam = jnp.asarray(np.abs(np.random.default_rng(0).normal(size=lp.shape[0])).astype(np.float32))
    r1, r2 = coo.calculate(lam, gamma=1e-3), bf.calculate(lam, gamma=1e-3)
    g1, g2 = np.asarray(r1.dual_gradient), np.asarray(r2.dual_gradient)
    assert np.allclose(g1, g2, atol=1e-3 * max(1.0, np.abs(g1).max())), np.abs(g1 - g2).max()
    assert np.isclose(float(r1.dual_objective), float(r2.dual_objective), rtol=1e-5, atol=1e-4)
    assert np.isclose(float(r1.reg_penalty), float(r2.reg_penalty), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("form", ["block", "inline"])
def test_objsense_max_negates_c(tmp_path, form):
    """OBJSENSE MAX (extension) normalizes to minimization; the original
    optimum is -dual_objective."""
    sense = "OBJSENSE\n    MAXIMIZE\n" if form == "block" else "OBJSENSE MAX\n"
    text = (
        "NAME maxtest\n" + sense +
        "ROWS\n N  obj\n L  r1\nCOLUMNS\n"
        "    x         obj       3.0        r1        1.0\n"
        "    y         obj       1.0        r1        1.0\n"
        "RHS\n    RHS       r1        2.0\nENDATA\n"
    )
    p = tmp_path / "max.mps"
    p.write_text(text)
    lp = read_mps_file(str(p))
    assert lp.objective_sense == "max"
    np.testing.assert_allclose(lp.c, [-3.0, -1.0])  # min-normalized

    # default OBJSENSE is min and leaves c untouched
    p2 = tmp_path / "min.mps"
    p2.write_text(text.replace(sense, ""))
    lp2 = read_mps_file(str(p2))
    assert lp2.objective_sense == "min"
    np.testing.assert_allclose(lp2.c, [3.0, 1.0])


def _assert_lp_equal(a, b, rtol=0.0):
    assert a.shape == b.shape
    assert a.objective_sense == b.objective_sense
    np.testing.assert_allclose(a.c, b.c, rtol=rtol)
    np.testing.assert_allclose(a.b, b.b, rtol=rtol)
    np.testing.assert_array_equal(a.equality_mask, b.equality_mask)
    # assert_allclose treats NaN == NaN (equal_nan defaults True), so the
    # NaN-coded absent bounds compare correctly here
    np.testing.assert_allclose(a.lower, b.lower, rtol=rtol)
    np.testing.assert_allclose(a.upper, b.upper, rtol=rtol)
    m, n = a.shape
    A1 = np.zeros((m, n)); A1[a.a_rows, a.a_cols] = a.a_vals
    A2 = np.zeros((m, n)); A2[b.a_rows, b.a_cols] = b.a_vals
    np.testing.assert_allclose(A1, A2, rtol=rtol)


def test_mps_writer_roundtrip_random(tmp_path):
    """write_mps_file -> read_mps_file is the identity on normalized LPs,
    across every bound class (default / FR / MI+UP / LO / FX / LO+UP,
    including a negative upper, which needs the explicit-LO guard)."""
    from dualip_tpu.io.mps import MPSLinearProgram, write_mps_file

    rng = np.random.default_rng(0)
    m, n = 7, 12
    mask = rng.random((m, n)) < 0.5
    rows, cols = np.nonzero(mask)
    vals = rng.normal(size=rows.size)
    lower = np.zeros(n); upper = np.full(n, np.nan)
    lower[1], upper[1] = np.nan, np.nan            # FR
    lower[2], upper[2] = np.nan, 2.5               # MI + UP
    lower[3] = -1.5                                # LO only
    lower[4] = upper[4] = 0.75                     # FX
    lower[5], upper[5] = -2.0, 3.0                 # LO + UP
    lower[6], upper[6] = -5.0, -1.0                # negative upper (IBM guard)
    eq = np.zeros(m, bool); eq[2] = True
    lp = MPSLinearProgram(
        name="roundtrip",
        c=rng.normal(size=n), b=rng.normal(size=m),
        a_rows=rows.astype(np.int32), a_cols=cols.astype(np.int32), a_vals=vals,
        lower=lower, upper=upper, equality_mask=eq,
        row_names=[f"R{i}" for i in range(m)], col_names=[f"X{j:02d}" for j in range(n)],
    )
    for suffix in (".mps", ".mps.gz"):
        p = tmp_path / ("rt" + suffix)
        write_mps_file(lp, str(p))
        back = read_mps_file(str(p))
        _assert_lp_equal(lp, back)
        # NaN-coded bounds compare elementwise (allclose treats NaN != NaN)
        assert np.array_equal(np.isnan(lp.lower), np.isnan(back.lower))
        assert np.array_equal(np.isnan(lp.upper), np.isnan(back.upper))
        ok = ~np.isnan(lp.upper)
        np.testing.assert_allclose(lp.upper[ok], back.upper[ok])


@pytest.mark.skipif(not BUNDLED.exists(), reason="bundled MIPLIB instance missing")
def test_mps_writer_roundtrip_bundled(tmp_path):
    from dualip_tpu.io.mps import write_mps_file

    lp = read_mps_file(str(BUNDLED))
    p = tmp_path / "v150.mps.gz"
    write_mps_file(lp, str(p))
    back = read_mps_file(str(p))
    _assert_lp_equal(lp, back)


def test_mps_writer_edge_cases(tmp_path):
    """Regressions from review: empty zero-objective columns survive the
    round trip, a constraint row named OBJ does not collide with the
    objective row, and a max-sense LP round-trips its sense and numbers."""
    from dualip_tpu.io.mps import MPSLinearProgram, write_mps_file

    lp = MPSLinearProgram(
        name="edge",
        c=np.array([1.0, 0.0, 2.0]),
        b=np.array([4.0]),
        # column 1 has NO constraint entries and zero objective coefficient
        a_rows=np.array([0, 0], dtype=np.int32),
        a_cols=np.array([0, 2], dtype=np.int32),
        a_vals=np.array([3.0, 1.0]),
        lower=np.array([0.0, -1.5, 0.0]),
        upper=np.array([np.nan, 2.5, np.nan]),
        equality_mask=np.zeros(1, bool),
        row_names=["OBJ"],  # collides with the writer's objective row name
        col_names=["A", "B", "C"],
        objective_sense="max",
    )
    p = tmp_path / "edge.mps"
    write_mps_file(lp, str(p))
    back = read_mps_file(str(p))
    _assert_lp_equal(lp, back)
    assert back.col_names == ["A", "B", "C"]
    assert back.row_names == ["OBJ"]  # the constraint row kept its name
