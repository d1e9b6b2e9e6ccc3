"""Derived-partsupp invariants (VERDICT r13 #3).

The tpch*ps queries derive partsupp from part x supplier with a
0-based variant of TPC-H dbgen's suppkey mapping; these tests pin the
properties the query semantics rely on. The cross-engine equality of
the derivation itself is covered by the three oracle-parity rows
(tpch2ps/tpch11ps/tpch20ps), whose DuckDB side rebuilds the table
from PARTSUPP_SQL_CTES.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from trello_github_etl_spark.io import load_table
from trello_github_etl_spark.queries.tpch_ext_q import derive_partsupp


def test_partsupp_four_distinct_suppliers_per_part(spark):
    ps = derive_partsupp(spark, SF_DIR)
    n_part = load_table(spark, SF_DIR, "part").count()
    bad = (
        ps.groupBy("ps_partkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("ps_suppkey").alias("nd"),
        )
        .filter((F.col("n") != 4) | (F.col("nd") != 4))
        .count()
    )
    assert bad == 0
    assert ps.count() == 4 * n_part


def test_partsupp_keys_and_value_ranges(spark):
    ps = derive_partsupp(spark, SF_DIR)
    s_n = load_table(spark, SF_DIR, "supplier").count()
    stats = ps.agg(
        F.min("ps_suppkey").alias("k0"),
        F.max("ps_suppkey").alias("k1"),
        F.min("ps_availqty").alias("q0"),
        F.max("ps_availqty").alias("q1"),
        F.min("ps_supplycost").alias("c0"),
        F.max("ps_supplycost").alias("c1"),
    ).collect()[0]
    # suppkeys land in the dim's 0-based key space; availqty 1..9999;
    # supplycost 1.00..1000.99 (the dbgen-ish domain)
    assert 0 <= stats["k0"] and stats["k1"] <= s_n - 1
    assert 1 <= stats["q0"] and stats["q1"] <= 9999
    assert 1.0 <= stats["c0"] and stats["c1"] <= 1000.99


def test_partsupp_is_deterministic(spark):
    a = sorted(map(tuple, derive_partsupp(spark, SF_DIR).collect()))
    b = sorted(map(tuple, derive_partsupp(spark, SF_DIR).collect()))
    assert a == b
