"""cell_pairs' giant-cell block-salting lever (blocks=B): the pair
multiset must be EXACTLY the plain cell-equi-join's — blocking only
re-partitions the pair enumeration (each unordered pair matches on
exactly one ordered block combination), it never adds, drops, or
rescores a candidate. Asserted bit-exact (cos doubles included), plus
the plumbing through semantic_dedup / mutual_knn_graph and the plan
shape (explicit AQE-exempt exchange, no cartesian product).
SCALE.md lesson 37.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from trello_github_etl_spark.operators import dedup, similarity

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _cells(spark, nlist=4):
    emb = _emb(spark)
    cents, _, _ = similarity.auto_seed_centroids(emb, nlist=nlist)
    return similarity.ivf_assign(emb, cents, 1)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_cell_pairs_blocked_multiset_bit_identical(spark):
    """blocks=1 vs B ∈ {2, 3, 7}: same (va, vb, cos) rows, same
    double bits — the blocked join scores the identical candidate set
    with the identical prenormed-cosine expression. B=7 > the number
    of rows in some cells, so empty blocks are exercised too."""
    cells = _cells(spark)
    base = sorted(similarity.cell_pairs(cells).collect())
    assert base  # fixture produces within-cell pairs
    for b in (2, 3, 7):
        got = sorted(similarity.cell_pairs(cells, blocks=b).collect())
        assert got == base, f"blocks={b} diverged"


def test_cell_pairs_blocks_validation(spark):
    cells = _cells(spark)
    with pytest.raises(ValueError, match="blocks must be >= 1"):
        similarity.cell_pairs(cells, blocks=0)


def test_semantic_dedup_pair_blocks_identical(spark):
    """pair_blocks is purely a physical re-plan: full output frame
    equality on both the static-centroid path (dd14's shape) and the
    self-seeding auto path (dd24's shape)."""
    emb = _emb(spark)
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    plain = sorted(dedup.semantic_dedup(emb, cents, threshold=0.8).collect())
    blocked = sorted(
        dedup.semantic_dedup(emb, cents, threshold=0.8, pair_blocks=2).collect()
    )
    assert blocked == plain
    auto_plain = sorted(dedup.semantic_dedup(emb, threshold=0.8).collect())
    auto_blocked = sorted(
        dedup.semantic_dedup(emb, threshold=0.8, pair_blocks=3).collect()
    )
    assert auto_blocked == auto_plain


def test_mutual_knn_pair_blocks_identical(spark):
    emb = _emb(spark)
    plain = sorted(similarity.mutual_knn_graph(emb, k=3).collect())
    blocked = sorted(
        similarity.mutual_knn_graph(emb, k=3, pair_blocks=2).collect()
    )
    assert blocked == plain


def test_blocked_plan_shape(spark):
    """The blocked join must (a) stay an equi-join — no cartesian
    product, no broadcast of the corpus side — and (b) carry the
    explicit numPartitions exchange (REPARTITION_BY_NUM), which is
    exempt from AQE byte-based coalescing: the join's cost is the
    cosine folds in its condition, invisible to byte stats (SCALE.md
    lessons 36/37)."""
    cells = _cells(spark)
    plan = _plan(similarity.cell_pairs(cells, blocks=4))
    assert "CartesianProduct" not in plan
    # the shuffle_hash hint must hold even though the fixture side
    # fits under autoBroadcastJoinThreshold — a corpus-side broadcast
    # is the lesson-36 at-scale killer this shape exists to avoid
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan
    assert "REPARTITION_BY_NUM" in plan
    assert "_blk" in plan and "_pb" in plan
