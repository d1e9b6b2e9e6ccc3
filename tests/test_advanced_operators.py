"""Unit tests for as-of join, banded range join, and IVF ANN."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from trello_github_etl_spark.operators import asof, similarity


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(5)), (3, "u", _ts(0))],
        "lid long, user string, lts timestamp",
    )
    right = spark.createDataFrame(
        [(100, "u", _ts(4)), (101, "u", _ts(10)), (102, "u", _ts(20))],
        "rid long, user string, rts timestamp",
    )
    out = {
        r.lid: r.asof_rid
        for r in asof.asof_join(
            left, right, on="user", left_ts="lts", right_ts="rts",
            right_payload=["rid"], left_tie="lid", right_tie="rid",
        ).collect()
    }
    # lid=1 @10: rid 101 (@10, inclusive); lid=2 @5: rid 100 (@4);
    # lid=3 @0: nothing precedes → null
    assert out == {1: 101, 2: 100, 3: None}


def test_asof_join_tie_on_right_ts_takes_max_tie(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10))], "lid long, user string, lts timestamp"
    )
    right = spark.createDataFrame(
        [(7, "u", _ts(3)), (9, "u", _ts(3))],
        "rid long, user string, rts timestamp",
    )
    [row] = asof.asof_join(
        left, right, on="user", left_ts="lts", right_ts="rts",
        right_payload=["rid"], right_tie="rid",
    ).collect()
    assert row.asof_rid == 9


def test_asof_join_keys_are_isolated(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(10))], "lid long, user string, lts timestamp"
    )
    right = spark.createDataFrame(
        [(5, "b", _ts(1))], "rid long, user string, rts timestamp"
    )
    [row] = asof.asof_join(
        left, right, on="user", left_ts="lts", right_ts="rts",
        right_payload=["rid"],
    ).collect()
    assert row.asof_rid is None


def test_banded_range_join_boundaries(spark):
    # window = 60s: matches are strictly-after up to and including +60s
    left = spark.createDataFrame(
        [(1, "u", _ts(10, 0))], "lid long, user string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (20, "u", _ts(10, 0)),   # equal ts → excluded
            (21, "u", _ts(10, 30)),  # in window, same bucket
            (22, "u", _ts(11, 0)),   # exactly +60s → included, next bucket
            (23, "u", _ts(11, 1)),   # +61s → excluded
            (24, "v", _ts(10, 30)),  # other key → excluded
        ],
        "rid long, user string, ts timestamp",
    )
    joined = asof.banded_range_join(
        left, right, on="user", window_us=60_000_000
    )
    got = sorted(
        r.r_rid for r in joined.collect() if r.r_rid is not None
    )
    assert got == [21, 22]


def test_banded_range_join_zero_match_rows_survive(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10))], "lid long, user string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(20, "u", _ts(50))], "rid long, user string, ts timestamp"
    )
    agg = (
        asof.banded_range_join(left, right, on="user", window_us=60_000_000)
        .groupBy("lid")
        .agg(F.count("r_rid").alias("n"))
        .collect()
    )
    assert [(r.lid, r.n) for r in agg] == [(1, 0)]


def test_ivf_assign_puts_centroid_in_own_cell(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0]),
            (10, [0.9, 0.1, 0.0]),   # nearest centroid 0
            (11, [0.1, 0.9, 0.0]),   # nearest centroid 1
        ],
        "vec_id long, embedding array<float>",
    )
    cents = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    cells = {
        r.vec_id: r.cell for r in similarity.ivf_assign(emb, cents).collect()
    }
    assert cells == {0: 0, 1: 1, 10: 0, 11: 1}


def test_ivf_topk_finds_in_cell_neighbors(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (10, [0.95, 0.05]),
            (11, [0.9, 0.1]),
            (12, [0.05, 0.95]),
        ],
        "vec_id long, embedding array<float>",
    )
    cents = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    qs = spark.createDataFrame(
        [(100, [0.93, 0.07])], "q_id long, q_vec array<float>"
    )
    got = similarity.ivf_topk(qs, emb, cents, k=2, nprobe=1).collect()
    assert [r.vec_id for r in got] == [10, 11] or [r.vec_id for r in got] == [11, 10]
    assert all(r.q_id == 100 for r in got)


def test_bloom_filter_never_drops_true_matches(spark):
    """Bloom guarantee: every true semi-join match passes the filter
    (zero false negatives); false positives stay rare (< 5% of the
    non-matching rows at these parameters)."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    r = entrymod.queries()["bloom1_runtime_filter"](spark, SF_DIR).collect()[0]
    true_pass = r.n_pass - r.n_false_pass
    assert true_pass == r.n_true
    non_matching = r.n_orders - r.n_true
    assert non_matching == 0 or r.n_false_pass / non_matching < 0.05


def test_ivm_merge_drops_zeroed_groups_and_surfaces_negatives(spark):
    from trello_github_etl_spark.operators import ivm

    state = spark.createDataFrame(
        [("a", 10, 2), ("b", 7, 1)], "k string, m long, n_rows long"
    )
    # retract ALL of b -> group disappears; over-retract c (never seen)
    delta = spark.createDataFrame(
        [("b", -7, -1), ("c", -3, -1)], "k string, m long, n_rows long"
    )
    out = {
        r.k: (r.m, r.n_rows)
        for r in ivm.merge_agg_state(state, delta, ["k"], ["m"]).collect()
    }
    assert out["a"] == (10, 2)
    assert "b" not in out  # zero-count group dropped from the view
    assert out["c"] == (-3, -1)  # over-retraction surfaced, not clamped


def test_ivm_incremental_equals_recompute_any_batching(spark):
    from trello_github_etl_spark.operators import ivm
    from pyspark.sql import functions as F

    rows = [(i % 3, i, 1) for i in range(30)]
    base = spark.createDataFrame(rows, "k int, m long, n_rows long")
    full = {
        r.k: (r.m, r.n_rows)
        for r in base.groupBy("k")
        .agg(F.sum("m").alias("m"), F.sum("n_rows").alias("n_rows"))
        .collect()
    }
    # apply in 3 uneven delta batches on top of an empty state
    state = spark.createDataFrame([], "k int, m bigint, n_rows bigint")
    for lo, hi in [(0, 5), (5, 21), (21, 30)]:
        batch = (
            spark.createDataFrame(rows[lo:hi], "k int, m long, n_rows long")
            .groupBy("k")
            .agg(F.sum("m").alias("m"), F.sum("n_rows").alias("n_rows"))
        )
        state = ivm.merge_agg_state(state, batch, ["k"], ["m"])
    got = {r.k: (r.m, r.n_rows) for r in state.collect()}
    assert got == full


def test_forward_asof_no_following_match_is_null(spark):
    from trello_github_etl_spark.operators import asof
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, 10, t(5)), (2, 10, t(30)), (3, 11, t(1))],
        "id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, t(5)), (101, 10, t(20))],
        "event_id long, user_id long, ts timestamp",
    )
    out = {
        r.id: r.asof_event_id
        for r in asof.asof_join_forward(
            left, right, on="user_id", right_payload=["event_id"],
            right_tie="event_id",
        ).collect()
    }
    assert out[1] == 100  # inclusive: equal ts matches
    assert out[2] is None  # nothing after t=30
    assert out[3] is None  # user 11 has no right rows


from hypothesis import given, settings, HealthCheck
from hypothesis import strategies as st


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 4), st.integers(-50, 50)),
        min_size=1, max_size=40,
    ),
    cut1=st.integers(0, 40),
    cut2=st.integers(0, 40),
    n_retract=st.integers(0, 10),
)
def test_ivm_property_batched_inserts_plus_retractions(
    spark, rows, cut1, cut2, n_retract
):
    """Any batching of inserts followed by retracting any prefix of
    the inserted rows must equal recomputing over the surviving rows
    — exact decimal/int state makes merge order irrelevant."""
    from pyspark.sql import functions as F

    from trello_github_etl_spark.operators import ivm

    lo, hi = sorted((min(cut1, len(rows)), min(cut2, len(rows))))
    batches = [b for b in (rows[:lo], rows[lo:hi], rows[hi:]) if b]
    retracted = rows[: min(n_retract, len(rows))]
    survivors = rows[len(retracted):]

    schema = "k int, m long, n_rows long"

    def agg(rs):
        return (
            spark.createDataFrame([(k, m, 1) for k, m in rs], schema)
            .groupBy("k")
            .agg(F.sum("m").alias("m"), F.sum("n_rows").alias("n_rows"))
        )

    state = spark.createDataFrame([], "k int, m bigint, n_rows bigint")
    for b in batches:
        state = ivm.merge_agg_state(state, agg(b), ["k"], ["m"])
    if retracted:
        state = ivm.merge_agg_state(
            state, ivm.retraction(agg(retracted), ["k"], ["m"]), ["k"], ["m"]
        )
    got = {r.k: (r.m, r.n_rows) for r in state.collect()}
    want = (
        {r.k: (r.m, r.n_rows) for r in agg(survivors).collect()}
        if survivors
        else {}
    )
    assert got == want


def test_observe_quality_metrics_ride_the_action(spark):
    from trello_github_etl_spark.operators.observe import observe_quality

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)],
        "id long, v string",
    )
    inst, obs = observe_quality(df, ["v", "id"], name="q1")
    # one action drives both the result and the metrics — no re-scan
    assert inst.count() == 4
    got = obs.get
    assert got["n_rows"] == 4
    assert got["null_v"] == 2
    assert got["null_id"] == 0


def test_join_view_delta_cross_term(spark):
    """The bilinear identity's cross term: a delta-A row matching
    ONLY a delta-B row must appear exactly once (dropping dA⋈dB
    misses it; the naive (A∪dA)⋈dB ∪ dA⋈B double-counts dA⋈dB).
    Base-base matches must NOT appear (they are already in the
    view)."""
    from trello_github_etl_spark.operators.ivm import join_view_delta

    A = spark.createDataFrame([(1, "a1")], "k long, av string")
    dA = spark.createDataFrame([(2, "a2")], "k long, av string")
    B = spark.createDataFrame([(1, "b1")], "k long, bv string")
    dB = spark.createDataFrame([(1, "b1x"), (2, "b2")], "k long, bv string")
    rows = sorted(
        (r.k, r.av, r.bv)
        for r in join_view_delta(A, dA, B, dB, on="k").collect()
    )
    # (1,a1,b1) is base⋈base -> excluded; every other pairing once
    assert rows == [(1, "a1", "b1x"), (2, "a2", "b2")]


def test_signed_join_delta_cancellation(spark):
    """Z-relation netting: deleting the only order while a lineitem
    arrives for it makes the (deleted-order x new-lineitem) tuple
    appear +1 via A-side-base x dB and -1 via dA x dB — those MUST
    net to zero, leaving exactly one retraction of the old view row."""
    from trello_github_etl_spark.operators.ivm import signed_join_view_delta

    A = spark.createDataFrame([(1, "p")], "k long, av string")
    dA = spark.createDataFrame([(1, "p", -1)], "k long, av string, sign int")
    B = spark.createDataFrame([(1, "old")], "k long, bv string")
    dB = spark.createDataFrame([(1, "new", 1)], "k long, bv string, sign int")
    rows = {
        (r.k, r.av, r.bv): r.net
        for r in signed_join_view_delta(
            A, dA, B, dB, on="k", view_cols=["k", "av", "bv"]
        ).collect()
    }
    assert rows == {(1, "p", "old"): -1}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 2)), max_size=6),
    b=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 2)), max_size=6),
    ins_a=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 2)), max_size=4),
    ins_b=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 2)), max_size=4),
    del_a=st.data(),
)
def test_signed_join_delta_matches_recompute_model(
    spark, a, b, ins_a, ins_b, del_a
):
    """Model-based: the signed bilinear delta must equal the per-row
    count diff of brute-force recompute for ARBITRARY small signed
    batches — duplicate rows, multi-deletes, cancellations and all.
    Deletes are sampled from the actual base multisets (a delete of
    a non-existent row is a caller error by contract)."""
    from collections import Counter

    from trello_github_etl_spark.operators.ivm import signed_join_view_delta

    da_del = del_a.draw(
        st.lists(st.sampled_from(a), max_size=len(a)) if a else st.just([])
    )
    db_del = del_a.draw(
        st.lists(st.sampled_from(b), max_size=len(b)) if b else st.just([])
    )
    # a multiset delete cannot remove more copies than exist
    da_del = [r for i, r in enumerate(da_del) if da_del[:i].count(r) < a.count(r)]
    db_del = [r for i, r in enumerate(db_del) if db_del[:i].count(r) < b.count(r)]

    def df(rows, schema):
        return spark.createDataFrame(rows, schema) if rows else (
            spark.createDataFrame([], schema)
        )

    A = df(a, "k long, av long")
    B = df(b, "k long, bv long")
    dA = df(
        [(k, v, 1) for k, v in ins_a] + [(k, v, -1) for k, v in da_del],
        "k long, av long, sign int",
    )
    dB = df(
        [(k, v, 1) for k, v in ins_b] + [(k, v, -1) for k, v in db_del],
        "k long, bv long, sign int",
    )
    got = {
        (r.k, r.av, r.bv): r.net
        for r in signed_join_view_delta(
            A, dA, B, dB, on="k", view_cols=["k", "av", "bv"]
        ).collect()
    }

    def join(xs, ys):
        return Counter(
            (k, av, bv) for k, av in xs for k2, bv in ys if k == k2
        )

    new_a = list(a) + list(ins_a)
    for r in da_del:
        new_a.remove(r)
    new_b = list(b) + list(ins_b)
    for r in db_del:
        new_b.remove(r)
    model = join(new_a, new_b)
    model.subtract(join(a, b))
    assert got == {t: n for t, n in model.items() if n != 0}
