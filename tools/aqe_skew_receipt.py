"""AQE skew-join vs manual salting — the measured comparison VERDICT
r11 #3 asks for: when is hand-salting (operators/skew.py) necessary,
and when does AQE (or classic map-side combine) already cover it?

Input: a deterministic 8M-row skewed table written once to
.data/aqe_skew_events — one key ("hot") owns 90% of rows, 99 cold
keys share the rest; values are xxhash-derived (HIGH ENTROPY — with
repeated/modulo values, shuffle-block lz4 compressed the hot
partition below every skew threshold and the split never fired:
MapOutputStatistics reports COMPRESSED sizes). All timings
median-of-3, run SOLO.

Two structural findings this receipt pins (found by iterating on the
non-firing split):

- OptimizeSkewedJoin only matches SMJ(Sort(Shuffle), Sort(Shuffle)).
  A dim built by .distinct() in the same plan leaves its final
  HashAggregate between the Sort and the shuffle stage — the rule
  does not fire AT ANY threshold. The receipt therefore materializes
  the dim to parquet first, which is also what a production
  dimension is.
- Skew detection reads compressed shuffle-block sizes, so a
  low-cardinality hot key with compressible payload can hide a
  row-skewed partition from AQE entirely — salting keys off
  row-count knowledge, not byte statistics, is immune.

Five measurements:

1. ALGEBRAIC group-by (count+sum, skew1's shape): plain one-phase vs
   salted two-phase. Hypothesis: parity — partial aggregation
   (map-side combine) reduces every partition to ≤ |keys| rows
   before the shuffle, so the hot key never concentrates ROWS on one
   reducer; salting an algebraic agg is unnecessary at any scale.

2. HOLISTIC group-by (collect_list, no map-side reduction): plain vs
   salted two-phase. Here the hot key's 7.2M values DO land on one
   reducer; salting is the only lever (AQE's skew handling applies
   to joins, not aggregations).

3. JOIN skew (sort-merge forced: broadcast disabled, AQE skew
   thresholds lowered so the MB-scale hot partition qualifies):
   plain join with skewJoin ON vs OFF vs operators/skew.salted_join.
   Plus the plan pin that OptimizeSkewedJoin actually fired.

4. Result identity across all modes.

Writes AQE_SKEW.json; SCALE.md quotes it.

    python tools/aqe_skew_receipt.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DATA = os.path.join(ROOT, ".data", "aqe_skew_events")
N = 8_000_000


def median_secs(thunk, runs: int = 3) -> float:
    times = []
    for _ in range(runs):
        t0 = time.time()
        thunk()
        times.append(time.time() - t0)
    return round(statistics.median(times), 3)


def main() -> int:
    from pyspark.sql import functions as F

    from trello_github_etl_spark.operators import skew
    from trello_github_etl_spark.queries.helpers import DEC
    from trello_github_etl_spark.session import get_spark

    spark = get_spark("aqe-skew-receipt")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_rows": N, "hot_share": 0.9}

    if not os.path.isdir(DATA):
        spark.range(N).select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") % 100 < 90, F.lit("hot"))
            .otherwise(
                F.concat(F.lit("k"), (F.col("id") % 100).cast("string"))
            )
            .alias("event_type"),
            # xxhash-derived: incompressible, so the hot partition's
            # COMPRESSED shuffle size reflects its row share
            (
                F.pmod(F.xxhash64("id"), F.lit(10_000_000)).cast("double")
                / 7.0
            ).alias("value"),
        ).write.mode("overwrite").parquet(DATA)
    ev = spark.read.parquet(DATA)

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    # --- 1. algebraic agg: map-side combine already fixes it ------
    def plain_agg():
        run(
            ev.groupBy("event_type").agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast(DEC)).cast("double").alias(
                    "sum_value"
                ),
            )
        )

    def salted_agg():
        run(
            skew.salted_count_sum(
                ev, key="event_type", value_col="value",
                unique_col="event_id",
            )
        )

    out["agg_algebraic_plain"] = median_secs(plain_agg)
    out["agg_algebraic_salted"] = median_secs(salted_agg)

    # --- 2. holistic agg: no partial reduction, salting required --
    def plain_holistic():
        run(
            ev.groupBy("event_type").agg(
                F.size(F.collect_list("value")).alias("n_vals")
            )
        )

    def salted_holistic():
        p1 = (
            ev.withColumn("_salt", skew.salt_col("event_id"))
            .groupBy("event_type", "_salt")
            .agg(F.size(F.collect_list("value")).alias("_n"))
        )
        run(
            p1.groupBy("event_type").agg(F.sum("_n").alias("n_vals"))
        )

    out["agg_holistic_plain"] = median_secs(plain_holistic)
    out["agg_holistic_salted"] = median_secs(salted_holistic)

    # --- 3. join skew: AQE skewJoin vs salting --------------------
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    # dim MUST be a materialized table: built inline via .distinct(),
    # its final HashAggregate sits between the join-side Sort and the
    # shuffle stage and OptimizeSkewedJoin's pattern never matches
    # (see module doc)
    dim_path = os.path.join(ROOT, ".data", "aqe_skew_dim")
    if not os.path.isdir(dim_path):
        ev.select("event_type").distinct().withColumn(
            "type_label", F.upper("event_type")
        ).write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path)

    def agg_join(joined):
        return joined.groupBy("type_label").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias(
                "sum_value"
            ),
        )

    def plain_join():
        run(agg_join(ev.join(dim, "event_type")))

    def salted_join():
        run(
            agg_join(
                skew.salted_join(
                    ev, dim, key="event_type", fact_unique_col="event_id"
                )
            )
        )

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    out["join_plain_aqe_skew_on"] = median_secs(plain_join)
    # the pin probe must shuffle the incompressible value column too —
    # a key-only projection re-hides the hot partition behind lz4
    # (module-doc finding #2) and the split quietly skips
    probe = agg_join(ev.join(dim, "event_type"))
    probe.collect()
    final_plan = probe._jdf.queryExecution().executedPlan().toString()
    out["aqe_skew_split_pinned"] = (
        "skew=true" in final_plan or "skewed" in final_plan
    )

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    out["join_plain_aqe_skew_off"] = median_secs(plain_join)

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    out["join_salted"] = median_secs(salted_join)

    # --- 4. identity ----------------------------------------------
    ref = sorted(map(tuple, agg_join(ev.join(dim, "event_type")).collect()))
    got = sorted(
        map(
            tuple,
            agg_join(
                skew.salted_join(
                    ev, dim, key="event_type", fact_unique_col="event_id"
                )
            ).collect(),
        )
    )
    out["results_identical"] = ref == got

    with open(os.path.join(ROOT, "AQE_SKEW.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, indent=1, sort_keys=True))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
