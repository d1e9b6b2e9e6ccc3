"""Generate sf1-scale testdata (10x sf0.1) under .data/sf1 (gitignored).

The driver's testdata dir is read-only and tops out at sf0.1; VERDICT
r2 #1 asks for the full parity sweep at the next decade, where shuffle
spill, AQE coalescing and skew handling actually engage on local[32].
The sweep only needs Spark and DuckDB to read the SAME data — it does
not need the driver's exact generator — so sf1 is derived from sf0.1:

- region/nation: copied (fixed dimensions, like TPC-H).
- customer/supplier/part/orders/lineitem/events: 10 copies with
  disjoint key offsets, foreign keys remapped consistently (offsets
  exceed every key range, and doc/vec id plantings in queries use
  +100000-style shifts, so synthetic ids stay clear of them).
- documents: the original 5,000 plus 45,000 synthesized docs — each
  takes a template doc's (lang, source, word count) and samples its
  words from the per-language word stream of the original corpus
  (frequency-weighted by construction), so language-id, stopword,
  quality and length distributions carry over WITHOUT creating the
  45k exact duplicates plain replication would plant (which would
  quadratically blow up every blocked dedup join).
- embeddings: the original 2,000 plus 18,000 synthesized uniform
  vectors in the observed value range, labels copied from templates.

Deterministic: numpy default_rng seeded per entity id.

    python tools/make_sf1.py          # writes .data/sf1/*.parquet
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
OUT = os.path.join(ROOT, ".data", "sf1")
N_COPIES = 10

# key offsets: > max key of the table, and far below the +100000-style
# planted-id shifts used by dd10/s3/dd14/pipe8 fixtures (docs/vecs
# only; relational keys have no plantings)
OK_OFF = 1_000_000  # orders (max 149,999)
CK_OFF = 100_000  # customer (max 14,999)
SK_OFF = 10_000  # supplier (max 999)
PK_OFF = 100_000  # part (max 19,999)
EV_OFF = 1_000_000  # events (max 99,999)
U_OFF = 10_000  # user_id (max 1,499)

N_DOCS_SRC = 5_000
N_DOCS_OUT = 50_000
N_VECS_SRC = 2_000
N_VECS_OUT = 20_000


def _copy_sql(table: str, cols: list[str]) -> str:
    return (
        f"SELECT {', '.join(cols)} "
        f"FROM read_parquet('{SRC}/{table}.parquet') "
        f"CROSS JOIN range({N_COPIES}) t(c)"
    )


def scale_relational(con: duckdb.DuckDBPyConnection) -> None:
    plans = {
        "region": None,
        "nation": None,
        "customer": [
            f"c_custkey + c * {CK_OFF} AS c_custkey",
            "c_name",
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        ],
        "supplier": [
            f"s_suppkey + c * {SK_OFF} AS s_suppkey",
            "s_name",
            "s_nationkey",
            "s_acctbal",
        ],
        "part": [
            f"p_partkey + c * {PK_OFF} AS p_partkey",
            "p_name",
            "p_brand",
            "p_type",
            "p_size",
            "p_retailprice",
        ],
        "orders": [
            f"o_orderkey + c * {OK_OFF} AS o_orderkey",
            f"o_custkey + c * {CK_OFF} AS o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
        "lineitem": [
            f"l_orderkey + c * {OK_OFF} AS l_orderkey",
            f"l_partkey + c * {PK_OFF} AS l_partkey",
            f"l_suppkey + c * {SK_OFF} AS l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ],
        "events": [
            f"event_id + c * {EV_OFF} AS event_id",
            "ts",
            f"user_id + c * {U_OFF} AS user_id",
            "event_type",
            "value",
            "props",
        ],
    }
    for table, cols in plans.items():
        dst = os.path.join(OUT, f"{table}.parquet")
        if cols is None:
            sql = f"SELECT * FROM read_parquet('{SRC}/{table}.parquet')"
        else:
            sql = _copy_sql(table, cols)
        con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")


def synth_documents(con: duckdb.DuckDBPyConnection) -> None:
    rows = con.execute(
        f"SELECT doc_id, text, lang, source FROM "
        f"read_parquet('{SRC}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    by_lang_words: dict[str, list[str]] = {}
    templates = []
    for _, text, lang, source in rows:
        words = text.split()
        by_lang_words.setdefault(lang, []).extend(words)
        templates.append((words, lang, source))
    lang_arrays = {
        lang: np.array(ws, dtype=object) for lang, ws in by_lang_words.items()
    }

    doc_ids, texts, langs, sources, n_chars = [], [], [], [], []
    for doc_id, text, lang, source in rows:
        doc_ids.append(doc_id)
        texts.append(text)
        langs.append(lang)
        sources.append(source)
        n_chars.append(len(text))
    for i in range(N_DOCS_SRC, N_DOCS_OUT):
        t_words, lang, source = templates[i % N_DOCS_SRC]
        pool = lang_arrays[lang]
        rng = np.random.default_rng(1_000_000 + i)
        idx = rng.integers(0, len(pool), size=len(t_words))
        text = " ".join(pool[idx])
        doc_ids.append(i)
        texts.append(text)
        langs.append(lang)
        sources.append(source)
        n_chars.append(len(text))

    table = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(OUT, "documents.parquet"))
    print(f"documents: {len(doc_ids)} rows")


def synth_embeddings(con: duckdb.DuckDBPyConnection) -> None:
    rows = con.execute(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{SRC}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    vec_ids = [r[0] for r in rows]
    embs = [np.asarray(r[1], dtype=np.float32) for r in rows]
    labels = [r[2] for r in rows]
    lo = min(float(e.min()) for e in embs)
    hi = max(float(e.max()) for e in embs)
    dim = len(embs[0])
    for i in range(N_VECS_SRC, N_VECS_OUT):
        rng = np.random.default_rng(2_000_000 + i)
        vec_ids.append(i)
        embs.append(rng.uniform(lo, hi, size=dim).astype(np.float32))
        labels.append(labels[i % N_VECS_SRC])

    table = pa.table(
        {
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": pa.array(
                [e.tolist() for e in embs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(OUT, "embeddings.parquet"))
    print(f"embeddings: {len(vec_ids)} rows")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    scale_relational(con)
    synth_documents(con)
    synth_embeddings(con)
    print(f"sf1 written to {OUT}")


if __name__ == "__main__":
    sys.exit(main())
