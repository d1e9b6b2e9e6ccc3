"""Sequence-packing operators: greedy no-split invariants, GPT-style
concat-chunk geometry, determinism under repartitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trello_github_etl_spark.operators import packing


def _toks(spark, rows, shards_hint=1):
    # (doc_id, n_tokens); single shard via shards=1 unless the test
    # wants real sharding
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_greedy_pack_golden_sequence(spark):
    """Hand-checked chain at budget 10: 4+5 fit; +3 overflows → new
    seq; 12 (> budget) overflows again and sits alone; 1 then joins a
    fresh seq after the oversized one."""
    df = _toks(
        spark, [(0, 4), (1, 5), (2, 3), (3, 12), (4, 1), (5, 9), (6, 2)]
    )
    rows = {
        r.doc_id: (r.seq_idx, r.fill)
        for r in packing.greedy_pack(df, budget=10, shards=1).collect()
    }
    assert rows == {
        0: (0, 4),
        1: (0, 9),
        2: (1, 3),
        3: (2, 12),
        4: (3, 1),
        5: (3, 10),
        6: (4, 2),
    }


def test_greedy_pack_never_overflows_except_oversize_alone(spark):
    df = _toks(spark, [(i, (i * 37) % 150 + 1) for i in range(300)])
    out = packing.greedy_pack(df, budget=100, shards=4).collect()
    by_seq = {}
    for r in out:
        by_seq.setdefault((r.shard, r.seq_idx), []).append(r.n_tokens)
    for (shard, seq), sizes in by_seq.items():
        if sum(sizes) > 100:
            # only an oversized doc alone may exceed the budget
            assert len(sizes) == 1 and sizes[0] > 100, (shard, seq)
    # every doc appears exactly once
    assert len(out) == 300


def test_greedy_pack_partitioning_invariant(spark):
    df = _toks(spark, [(i, (i * 13) % 90 + 1) for i in range(200)])
    a = sorted(
        map(tuple, packing.greedy_pack(df, budget=128, shards=4).collect())
    )
    b = sorted(
        map(
            tuple,
            packing.greedy_pack(
                df.repartition(7), budget=128, shards=4
            ).collect(),
        )
    )
    assert a == b


def test_concat_chunk_geometry(spark):
    """Budget 10, one shard: docs tile the concatenated stream with
    no gaps; straddling is reported via start/end seq."""
    df = _toks(spark, [(0, 4), (1, 5), (2, 3), (3, 12), (4, 0)])
    rows = {
        r.doc_id: r
        for r in packing.concat_chunk_packing(
            df, budget=10, shards=1
        ).collect()
    }
    assert (rows[0].start_seq, rows[0].start_off, rows[0].end_seq) == (0, 0, 0)
    assert (rows[1].start_seq, rows[1].start_off, rows[1].end_seq) == (0, 4, 0)
    # doc 2 starts at offset 9 and straddles into sequence 1
    assert (rows[2].start_seq, rows[2].start_off, rows[2].end_seq) == (0, 9, 1)
    # doc 3: starts at cum 12 → seq 1 off 2, ends at cum 23 → seq 2
    assert (rows[3].start_seq, rows[3].start_off, rows[3].end_seq) == (1, 2, 2)
    # empty doc: start == end
    assert rows[4].start_seq == rows[4].end_seq


def test_concat_chunk_stream_is_gapless(spark):
    """Per shard, each doc's start offset equals the previous doc's
    cumulative token count — the chunked stream drops nothing."""
    df = _toks(spark, [(i, (i * 7) % 60) for i in range(100)])
    out = packing.concat_chunk_packing(df, budget=64, shards=4).collect()
    by_shard = {}
    for r in sorted(out, key=lambda r: (r.shard, r.doc_id)):
        cum = by_shard.get(r.shard, 0)
        assert r.start_seq * 64 + r.start_off == cum, r
        by_shard[r.shard] = cum + r.n_tokens


def test_deterministic_shuffle_is_dense_permutation(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long"
    )
    out = packing.deterministic_shuffle(df).collect()
    assert sorted(r.shuffle_pos for r in out) == list(range(1, 501))
    assert len({r.doc_id for r in out}) == 500
    # partitioning cannot change the permutation
    again = packing.deterministic_shuffle(df.repartition(13)).collect()
    assert {(r.doc_id, r.shuffle_pos) for r in out} == {
        (r.doc_id, r.shuffle_pos) for r in again
    }
    # a different salt is a different (but still dense) permutation
    other = packing.deterministic_shuffle(df, salt="epoch-1").collect()
    assert sorted(r.shuffle_pos for r in other) == list(range(1, 501))
    assert {(r.doc_id, r.shuffle_pos) for r in other} != {
        (r.doc_id, r.shuffle_pos) for r in out
    }


def test_deterministic_shuffle_bucket_order_is_global_order(spark):
    """Positions must be contiguous by bucket in bucket order — the
    broadcast prefix-sum property that makes the parallel rank equal
    one global ORDER BY."""
    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    rows = sorted(
        packing.deterministic_shuffle(df).collect(),
        key=lambda r: r.shuffle_pos,
    )
    buckets_in_pos_order = [r.bucket for r in rows]
    assert buckets_in_pos_order == sorted(buckets_in_pos_order)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    costs=st.lists(st.integers(0, 40), min_size=1, max_size=60),
    budget=st.integers(1, 50),
)
def test_greedy_pack_matches_python_model(spark, costs, budget):
    """Model-based: the distributed greedy pack must equal a plain
    sequential fold over the same (single-shard) order."""
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(costs)], "doc_id long, n_tokens long"
    )
    got = {
        r.doc_id: (r.seq_idx, r.fill)
        for r in packing.greedy_pack(df, budget=budget, shards=1).collect()
    }
    seq, fill, model = 0, 0, {}
    for i, n in enumerate(costs):
        if i == 0:
            fill = n
        elif fill + n > budget:
            seq, fill = seq + 1, n
        else:
            fill += n
        model[i] = (seq, fill)
    assert got == model
