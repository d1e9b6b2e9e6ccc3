"""Z-order layout: multi-dimensional data skipping actually skips.

Writes the same table in two layouts — single-column sort (by date
bucket) and Morton z-order over (custkey bucket, date bucket) — then
counts parquet row groups whose min/max stats overlap a selective
2-D box predicate. The z-ordered layout must prune strictly more row
groups for the box, and must not lose or duplicate rows.

Row-group min/max via pyarrow metadata — the same statistics Spark's
parquet scan consults for skipping.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from trello_github_etl_spark.io import load_table
from trello_github_etl_spark.operators import zorder as Z


def _normed_orders(spark):
    o = load_table(spark, SF_DIR, "orders")
    day = F.datediff(
        F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
    ).cast("bigint")
    o = o.select("o_orderkey", F.col("o_custkey").alias("ck"), day.alias("dy"))
    lo_ck, hi_ck, lo_dy, hi_dy = o.agg(
        F.min("ck"), F.max("ck"), F.min("dy"), F.max("dy")
    ).first()
    return o.select(
        "o_orderkey",
        Z.normalize_to_bits(F.col("ck"), lo_ck, hi_ck).alias("zx"),
        Z.normalize_to_bits(F.col("dy"), lo_dy, hi_dy).alias("zy"),
    )


def _overlapping_row_groups(path: str, box) -> tuple[int, int]:
    """(row groups overlapping the box, total row groups)."""
    (xlo, xhi), (ylo, yhi) = box
    hit = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        cols = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            sx = g.column(cols["zx"]).statistics
            sy = g.column(cols["zy"]).statistics
            total += 1
            if sx.min <= xhi and sx.max >= xlo and sy.min <= yhi and sy.max >= ylo:
                hit += 1
    return hit, total


def test_zorder_prunes_2d_box_better_than_single_sort(spark, tmp_path):
    df = _normed_orders(spark)
    n = df.count()
    box = ((100, 200), (100, 200))  # ~1% of each dimension's range

    linear = str(tmp_path / "linear")
    zordered = str(tmp_path / "zordered")
    # layout A: sorted by zy only (the common date-sorted table)
    (
        df.repartitionByRange(64, "zy")
        .sortWithinPartitions("zy")
        .write.mode("overwrite")
        .option("parquet.block.size", 1 << 16)
        .parquet(linear)
    )
    # layout B: Morton over (zx, zy)
    Z.write_zordered(df, zordered, Z.zvalue(["zx", "zy"], bits=10), n_files=64)

    # no rows lost or duplicated by re-layout
    assert spark.read.parquet(zordered).count() == n
    assert (
        spark.read.parquet(zordered).select(F.sum("o_orderkey")).first()[0]
        == df.select(F.sum("o_orderkey")).first()[0]
    )

    hit_lin, tot_lin = _overlapping_row_groups(linear, box)
    hit_z, tot_z = _overlapping_row_groups(zordered, box)
    assert tot_lin > 16 and tot_z > 16  # enough granularity to matter
    # the date-sorted layout prunes on zy but every surviving group
    # spans all of zx; z-order must do strictly better on the box
    assert hit_z < hit_lin, (hit_z, tot_z, hit_lin, tot_lin)
    # and the box predicate itself returns identical rows
    a = (
        spark.read.parquet(linear)
        .filter("zx BETWEEN 100 AND 200 AND zy BETWEEN 100 AND 200")
        .agg(F.count("*"), F.sum("o_orderkey"))
        .first()
    )
    b = (
        spark.read.parquet(zordered)
        .filter("zx BETWEEN 100 AND 200 AND zy BETWEEN 100 AND 200")
        .agg(F.count("*"), F.sum("o_orderkey"))
        .first()
    )
    assert tuple(a) == tuple(b)


def test_normalize_to_bits_propagates_null_and_clamps(spark):
    """NULL inputs stay NULL (greatest/least skip NULLs, so without
    the guard they'd collapse into bucket 0 with minimum-value rows —
    r4 advice); out-of-range values clamp to the edge buckets."""
    df = spark.createDataFrame(
        [(None,), (-5,), (0,), (100,), (250,)], "v int"
    )
    out = [
        r[0]
        for r in df.select(
            Z.normalize_to_bits(F.col("v"), 0, 100, bits=4)
        ).collect()
    ]
    assert out[0] is None  # NULL propagates, not bucket 0
    assert out[1] == 0 and out[2] == 0  # below-range clamps to lo edge
    assert out[3] == 15 and out[4] == 15  # hi edge = 2^bits - 1


def test_zvalue_is_bijective_on_the_grid():
    """The %-and-* interleave must be a bijection from [0,2^b)^2 onto
    [0,4^b) — checked exhaustively at b=5 via DuckDB (no Spark), i.e.
    the shared SQL text itself, not a Python reimplementation."""
    import duckdb

    expr = Z.zvalue_sql(["x", "y"], bits=5)
    rows = duckdb.sql(
        f"""
        WITH g AS (
          SELECT a.r AS x, b.r AS y
          FROM range(32) a(r), range(32) b(r)
        )
        SELECT {expr} AS z FROM g
        """
    ).fetchall()
    zs = sorted(r[0] for r in rows)
    assert zs == list(range(1024))  # every code hit exactly once


def test_zvalue_locality_nested_quadrants():
    """High bits of the Morton code = quadrant of the space: points
    sharing a quadrant must be contiguous in z-range."""
    import duckdb

    expr = Z.zvalue_sql(["x", "y"], bits=5)
    rows = duckdb.sql(
        f"""
        WITH g AS (
          SELECT a.r AS x, b.r AS y
          FROM range(32) a(r), range(32) b(r)
        )
        SELECT x, y, {expr} AS z FROM g
        """
    ).fetchall()
    for x, y, z in rows:
        quad = (x >= 16, y >= 16)
        # top 2 bits of z encode the quadrant
        assert (bool((z >> 8) & 1), bool((z >> 9) & 1)) == quad


def test_compaction_shrinks_files_preserves_layout_and_content(spark, tmp_path):
    """Compaction must cut file count to the target, keep every row,
    and keep the layout key clustered (file-level key ranges stay
    disjoint, so pruning still works after the rewrite)."""
    from trello_github_etl_spark.operators import maintenance as M

    df = _normed_orders(spark).withColumn(
        "z", Z.zvalue(["zx", "zy"], bits=10)
    )
    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    # simulate a streaming sink: many tiny appends
    for i in range(10):
        df.filter(F.col("o_orderkey") % 10 == i).repartition(8).write.mode(
            "append"
        ).parquet(src)
    n_src_files = len(glob.glob(src + "/*.parquet"))
    assert n_src_files >= 60  # properly fragmented

    n_out = M.compact(spark, src, out, "z", target_rows_per_file=400)
    files = glob.glob(out + "/*.parquet")
    assert len(files) == n_out <= 5

    # content identical
    a = spark.read.parquet(src).agg(
        F.count("*"), F.sum("o_orderkey"), F.sum("z")
    ).first()
    b = spark.read.parquet(out).agg(
        F.count("*"), F.sum("o_orderkey"), F.sum("z")
    ).first()
    assert tuple(a) == tuple(b)

    # clustering preserved: per-file z ranges must not overlap
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(cols["z"]).statistics
            mins.append(st.min); maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint key ranges across files
