"""Z-order layout: three-way key identity, bijectivity, the skipping
evidence vs a one-dimensional layout, rank scaling, and guards."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from word_sense_disambiguation_spark.operators.zorder import (
    minmax_rank_exprs,
    zorder_chunk_stats,
    zorder_key_col,
    zorder_sql,
)

BITS = 6
SIDE = 1 << BITS  # 64x64 grid


def z_py(vals: list[int], bits: int) -> int:
    z = 0
    for ci, v in enumerate(vals):
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * len(vals) + ci)
    return z


@pytest.fixture(scope="module")
def grid(spark):
    return spark.range(0, SIDE * SIDE).selectExpr(
        f"id % {SIDE} AS x", f"id div {SIDE} AS y"
    )


def test_key_matches_python_and_duckdb(spark, grid):
    got = grid.select("x", "y", zorder_key_col(["x", "y"], BITS).alias("z")).collect()
    assert all(r.z == z_py([r.x, r.y], BITS) for r in got)
    con = duckdb.connect()
    con.sql(
        f"CREATE TABLE t AS SELECT i % {SIDE} AS x, i // {SIDE} AS y "
        f"FROM range({SIDE * SIDE}) r(i)"
    )
    rows = con.sql(
        f"SELECT x, y, {zorder_sql(['x', 'y'], BITS, 'duckdb')} AS z FROM t"
    ).fetchall()
    assert all(z == z_py([x, y], BITS) for x, y, z in rows)


def test_key_is_bijective(spark, grid):
    keyed = grid.select(zorder_key_col(["x", "y"], BITS).alias("z"))
    n = SIDE * SIDE
    assert keyed.distinct().count() == n
    mm = keyed.agg(F.min("z").alias("mn"), F.max("z").alias("mx")).collect()[0]
    assert (mm.mn, mm.mx) == (0, n - 1)  # a bijection onto [0, 4096)


def test_chunks_bound_every_dimension(spark, grid):
    """The layout claim itself: 16 equal Z-ranges over a 64x64 grid span
    at most 16 in BOTH dimensions; the same chunking over a row-major
    key spans the full 63 in x for every chunk — that delta is the
    min/max file skipping a scan gets on the second dimension."""
    st = zorder_chunk_stats(grid, ["x", "y"], BITS, n_chunks=16).collect()
    assert len(st) == 16
    assert sum(r.n for r in st) == SIDE * SIDE
    assert max(r.dim0_max - r.dim0_min for r in st) <= 16
    assert max(r.dim1_max - r.dim1_min for r in st) <= 16

    rowmajor = grid.select(
        F.expr(f"(y * {SIDE} + x) div {SIDE * SIDE // 16}").alias("chunk"), "x"
    ).groupBy("chunk").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    assert all(r.mx - r.mn == SIDE - 1 for r in rowmajor.collect())


def test_minmax_ranks(spark):
    df = spark.createDataFrame(
        [(10, 5), (20, 5), (110, 5)], "a long, c long"
    )
    ra, rc = minmax_rank_exprs(df, ["a", "c"], bits=8)
    got = df.select(
        F.expr(ra).alias("ra"), F.expr(rc).alias("rc")
    ).collect()
    assert [r.ra for r in got] == [0, 25, 255]  # (x-10)*255 div 100
    assert all(r.rc == 0 for r in got)  # constant column -> rank 0


def test_guards_and_codegen(spark, grid):
    with pytest.raises(ValueError):
        zorder_sql(["x"], 8)
    with pytest.raises(ValueError):
        zorder_sql(["x", "y", "w"], 21)  # 63 bits > 62
    st = zorder_chunk_stats(grid, ["x", "y"], BITS, n_chunks=16)
    plan = st._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "EvalPython" not in plan
    assert plan.count("Exchange") == 1  # partial-combined groupBy only


# ---------------------------------------------------------------------------
# compaction_plan: integer file-sizing arithmetic
# ---------------------------------------------------------------------------


def test_compaction_plan_hand_arithmetic(spark):
    from word_sense_disambiguation_spark.operators.zorder import (
        compaction_plan,
    )

    rows = (
        [("a", 100)] * 10      # 1000 bytes -> 1 file at target 4096, small
        + [("b", 3000)] * 3    # 9000 bytes -> ceil(9000/4096)=3 files
        + [("c", 4096)]        # exactly one target -> 1 file
    )
    df = spark.createDataFrame(rows, "slice string, nb long")
    got = {
        r.slice: (r.n_rows, r.total_bytes, r.n_files, r.rows_per_file,
                  r.needs_compaction)
        for r in compaction_plan(
            df, ["slice"], "nb", target_file_bytes=4096
        ).collect()
    }
    assert got == {
        "a": (10, 1000, 1, 10, False),   # 1000 >= 512 = 4096/8
        "b": (3, 9000, 3, 1, False),
        "c": (1, 4096, 1, 1, False),
    }
    tiny = spark.createDataFrame([("t", 100)], "slice string, nb long")
    out = compaction_plan(tiny, ["slice"], "nb", target_file_bytes=4096)
    assert out.collect()[0].needs_compaction is True


def test_compaction_plan_div_precision_past_double(spark):
    """2^53-adjacent byte totals: IEEE `/` would round, DIV must not."""
    from word_sense_disambiguation_spark.operators.zorder import (
        compaction_plan,
    )

    big = (1 << 53) + 1  # not representable as double
    df = spark.createDataFrame([("s", big)], "slice string, nb long")
    r = compaction_plan(df, ["slice"], "nb", target_file_bytes=1).collect()[0]
    assert r.total_bytes == big and r.n_files == big
