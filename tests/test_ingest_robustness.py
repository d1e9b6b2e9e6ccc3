"""Messy-ingest contracts: real corpora arrive with corrupt lines.

Pins Spark's three malformed-record policies on JSON lines ingest —
PERMISSIVE (quarantine into ``_corrupt_record``, keep the batch),
DROPMALFORMED (silently shed), FAILFAST (abort) — and CSV with a
schema-mismatched row. The quarantine column is the 100 TB pattern:
bad rows flow to a dead-letter sink for replay instead of killing a
12-hour job (same philosophy as the reference's idempotent resume,
etl.js state store: never lose progress to one bad record).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

GOOD = '{"doc_id": 1, "text": "hello"}'
GOOD2 = '{"doc_id": 2, "text": "world"}'
BAD = '{"doc_id": 3, "text": '  # truncated JSON

SCHEMA = "doc_id bigint, text string, _corrupt_record string"


def _write_jsonl(tmp_path, name="docs.jsonl"):
    p = tmp_path / name
    p.write_text("\n".join([GOOD, BAD, GOOD2]) + "\n")
    return str(p)


def test_permissive_quarantines_corrupt_records(spark, tmp_path):
    path = _write_jsonl(tmp_path)
    df = (
        spark.read.schema(SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    ).cache()  # corrupt-record column requires a materialized read
    try:
        assert df.count() == 3
        good = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert {r.doc_id for r in good.collect()} == {1, 2}
        quarantined = bad.collect()
        assert len(quarantined) == 1
        assert quarantined[0].doc_id is None
        assert quarantined[0]._corrupt_record.startswith('{"doc_id": 3')
    finally:
        df.unpersist()


def test_dropmalformed_sheds_bad_rows(spark, tmp_path):
    path = _write_jsonl(tmp_path)
    df = (
        spark.read.schema("doc_id bigint, text string")
        .option("mode", "DROPMALFORMED")
        .json(path)
    )
    assert {r.doc_id for r in df.collect()} == {1, 2}


def test_failfast_aborts_on_first_bad_row(spark, tmp_path):
    path = _write_jsonl(tmp_path)
    df = (
        spark.read.schema("doc_id bigint, text string")
        .option("mode", "FAILFAST")
        .json(path)
    )
    with pytest.raises(Exception) as e:
        df.collect()
    assert "MALFORMED" in str(e.value).upper() or "FAILFAST" in str(e.value).upper()


def test_csv_type_mismatch_quarantined_not_coerced(spark, tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text("id,amount\n1,10.5\n2,not-a-number\n3,30.25\n")
    df = (
        spark.read.schema("id bigint, amount double, _corrupt_record string")
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
    ).cache()
    try:
        bad = df.filter(F.col("_corrupt_record").isNotNull()).collect()
        assert len(bad) == 1 and bad[0].id == 2 and bad[0].amount is None
        ok = df.filter(F.col("_corrupt_record").isNull())
        assert ok.agg(F.sum("amount")).first()[0] == 40.75
    finally:
        df.unpersist()


def test_format_agnostic_ingestion_equivalence(spark, tmp_path):
    """The engine is parquet-first but not parquet-bound: the same
    documents relation round-trips through ORC (built into Spark),
    newline JSON and headered CSV and every registered query sees
    identical data — pinned by running a representative text query
    over each format's round-trip and comparing full outputs. CSV
    needs an explicit schema on read (its types are strings
    otherwise); JSON needs timestamps absent (documents has none)."""
    import os

    from pyspark.sql import functions as F

    from trello_github_etl_spark.io import load_table
    from tests.conftest import SF_DIR

    base = load_table(spark, SF_DIR, "documents")
    schema = base.schema
    outs = {}
    for fmt in ("orc", "json", "csv"):
        d = os.path.join(str(tmp_path), fmt)
        w = base.write.mode("overwrite")
        if fmt == "csv":
            # multiLine + an explicit empty/null sentinel pair: the
            # default CSV read splits embedded newlines into rows and
            # reads a written '' back as NULL — either would fail the
            # equality for reasons unrelated to the format-agnostic
            # property under test (r5 code review)
            w = (
                w.option("header", True)
                .option("escape", '"')
                .option("emptyValue", "")
                .option("nullValue", "\\N")
            )
        w.format(fmt).save(d)
        r = spark.read
        if fmt == "csv":
            r = (
                r.option("header", True)
                .option("multiLine", True)
                .option("escape", '"')
                .option("emptyValue", "")
                .option("nullValue", "\\N")
                .schema(schema)
            )
        else:
            r = r.schema(schema)
        back = r.format(fmt).load(d)
        got = sorted(
            (row.doc_id, row.text, row.lang, row.source, row.n_chars)
            for row in back.collect()
        )
        outs[fmt] = got
    want = sorted(
        (row.doc_id, row.text, row.lang, row.source, row.n_chars)
        for row in base.collect()
    )
    for fmt, got in outs.items():
        assert got == want, fmt
