"""Generate a documents+embeddings-only corpus at an arbitrary
multiple of sf0.1 under .data/sf<N> (gitignored) — the >10x scale
probe VERDICT r8 #5 asks for.

All sf0.1→sf1 ratio evidence stops at 10x; the 128 GiB sandbox has
room for a docs/embeddings corpus at 30–50x, where the next
scale-killer in the dedup/similarity levers would surface while it's
cheap to find. Only the two LLM-pipeline tables are scaled (the
relational tables would quintuple the build time for queries this
probe doesn't run); tools/bench-able queries at this dir are the ones
that read documents/embeddings only (dd17/dd24/dd25/dd26/dd27/s15
and friends).

Synthesis matches tools/make_sf1.py so distributions carry over:
- documents: the original 5,000 sf0.1 docs plus synthesized docs,
  each sampling a template doc's (lang, source, word count) from the
  original per-language frequency-weighted word stream — no planted
  exact duplicates beyond the originals (plain replication would
  quadratically blow up every blocked dedup join).
- embeddings: the original 2,000 plus uniform vectors in the observed
  value range, labels copied from templates.

One deliberate difference: parquet is written with row_group_size
small enough that a plain scan yields >= 32 splittable units — the
healthy many-row-group layout a real 100 TB table has. sf1's
single-row-group files are what ensure_parallelism guards against
(SCALE.md lesson 38); this probe measures the levers' asymptotics,
not that pathology again.

Deterministic: numpy default_rng seeded per entity id with the SAME
seed scheme as make_sf1 (a doc with id i is byte-identical across
sfN dirs for every N where it exists).

PLANTED-ID BOUNDARIES (r12): document-fixture plantings use
llm_q.DOC_SHIFT = 10M multiples, safe to doc_id < 10M (mult 2000).
EMBEDDING plantings still use +100000/+200000/…: vec_ids reach
100000·(mult/50), so --mult 50 is the LAST collision-free embedding
scale — going past it requires bumping the vec planting shifts the
way DOC_SHIFT was bumped (the +100000 doc collision at mult 50
silently merged 3,000 ids in group-by paths; see the r12 fix).

    python tools/make_sfN.py --mult 50        # .data/sf5 (50x sf0.1)
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"

N_DOCS_SRC = 5_000
N_VECS_SRC = 2_000


def synth_documents(out_dir: str, n_out: int) -> None:
    con = duckdb.connect()
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
    for i in range(N_DOCS_SRC, n_out):
        t_words, lang, source = templates[i % N_DOCS_SRC]
        pool = lang_arrays[lang]
        rng = np.random.default_rng(1_000_000 + i)
        idx = rng.integers(0, len(pool), size=len(t_words))
        texts.append(" ".join(pool[idx]))
        doc_ids.append(i)
        langs.append(lang)
        sources.append(source)
        n_chars.append(len(texts[-1]))

    table = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    pq.write_table(
        table,
        os.path.join(out_dir, "documents.parquet"),
        row_group_size=max(1, n_out // 64),
    )
    print(f"documents: {len(doc_ids)} rows")


def synth_embeddings(out_dir: str, n_out: int) -> None:
    con = duckdb.connect()
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
    for i in range(N_VECS_SRC, n_out):
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
    pq.write_table(
        table,
        os.path.join(out_dir, "embeddings.parquet"),
        row_group_size=max(1, n_out // 64),
    )
    print(f"embeddings: {len(vec_ids)} rows")


# --- relational leg (VERDICT r12 #6) -------------------------------
# The sf5 gate originally carried only documents/embeddings; the
# planted-id-collision class found at 50x argues for stressing the
# relational side too. Same derivation as tools/make_sf1.py: mult
# copies of each sf0.1 table with DISJOINT key offsets, foreign keys
# remapped consistently. Offset safety at mult=50 (offset * 49 + max
# key, vs the next planting/shift): orders 49M (<10M? n/a — orders
# carry no plantings), customer 4.9M, supplier 0.49M, part 4.9M,
# events 49M, users 0.49M — every synthetic key stays clear of every
# other copy's range AND of the doc/vec planting shifts, which touch
# only documents/embeddings. Row groups sized for >= 32 splittable
# units per big table (the module-docstring layout contract).

_REL_OFFSETS = {
    "orders": ("o_orderkey", 1_000_000),
    "customer": ("c_custkey", 100_000),
    "supplier": ("s_suppkey", 10_000),
    "part": ("p_partkey", 100_000),
    "events": ("event_id", 1_000_000),
}


def synth_relational(out_dir: str, mult: int) -> None:
    con = duckdb.connect()
    plans = {
        "region": None,
        "nation": None,
        "customer": [
            "c_custkey + c * 100000 AS c_custkey",
            "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
        ],
        "supplier": [
            "s_suppkey + c * 10000 AS s_suppkey",
            "s_name", "s_nationkey", "s_acctbal",
        ],
        "part": [
            "p_partkey + c * 100000 AS p_partkey",
            "p_name", "p_brand", "p_type", "p_size", "p_retailprice",
        ],
        "orders": [
            "o_orderkey + c * 1000000 AS o_orderkey",
            "o_custkey + c * 100000 AS o_custkey",
            "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority",
        ],
        "lineitem": [
            "l_orderkey + c * 1000000 AS l_orderkey",
            "l_partkey + c * 100000 AS l_partkey",
            "l_suppkey + c * 10000 AS l_suppkey",
            "l_linenumber", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_returnflag", "l_linestatus",
            "l_shipdate",
        ],
        "events": [
            "event_id + c * 1000000 AS event_id",
            "ts",
            "user_id + c * 10000 AS user_id",
            "event_type", "value", "props",
        ],
    }
    for table, cols in plans.items():
        dst = os.path.join(out_dir, f"{table}.parquet")
        if cols is None:
            sql = f"SELECT * FROM read_parquet('{SRC}/{table}.parquet')"
        else:
            sql = (
                f"SELECT {', '.join(cols)} "
                f"FROM read_parquet('{SRC}/{table}.parquet') "
                f"CROSS JOIN range({mult}) t(c)"
            )
        # >= 32 row groups on the big tables so local[32] gets real
        # splits (lineitem at mult=50 is ~30M rows -> 500k/group = 60)
        con.execute(
            f"COPY ({sql}) TO '{dst}' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 500000)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")
    # partsupp (VERDICT r13 #3): PHYSICAL copy of the table the
    # tpch*ps queries derive in-query (same PARTSUPP_SQL_CTES formula
    # over the scaled dims) — an independent receipt that the
    # derivation and a materialized table agree at 50x. The queries
    # themselves never read this file; verify with
    #   SELECT count(*) FROM (derived EXCEPT physical).
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from trello_github_etl_spark.queries.tpch_ext_q import (  # noqa: E402
        PARTSUPP_SQL_CTES,
    )

    for t in ("part", "supplier"):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{out_dir}/{t}.parquet')"
        )
    dst = os.path.join(out_dir, "partsupp.parquet")
    con.execute(
        f"COPY (WITH {PARTSUPP_SQL_CTES} SELECT * FROM partsupp) "
        f"TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE 500000)"
    )
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{dst}')"
    ).fetchone()[0]
    print(f"partsupp: {n} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=50,
                    help="multiple of sf0.1 (50 -> .data/sf5)")
    ap.add_argument("--relational", action="store_true",
                    help="also scale the relational tables "
                         "(region..lineitem, events)")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    name = f"sf{args.mult / 10:g}".replace(".0", "")
    if name == "sf1":
        # .data/sf1 is make_sf1.py's fixture with DELIBERATE
        # single-row-group files (the lesson-3/38 starved-scan
        # pathology the guards are tested against); this tool's
        # many-row-group layout would silently destroy that property
        # while keeping content identical — refuse the collision.
        raise SystemExit(
            "refusing --mult 10: .data/sf1 belongs to make_sf1.py "
            "(single-row-group layout is load-bearing)"
        )
    out_dir = os.path.join(ROOT, ".data", name)
    done = os.path.join(out_dir, ".complete")
    if os.path.exists(done) and not args.force:
        print(f"{out_dir} already built (use --force to regenerate)")
        return
    os.makedirs(out_dir, exist_ok=True)
    synth_documents(out_dir, N_DOCS_SRC * args.mult)
    synth_embeddings(out_dir, N_VECS_SRC * args.mult)
    if args.relational:
        synth_relational(out_dir, args.mult)
    with open(done, "w") as fh:
        fh.write("ok\n")
    print(f"{name} written to {out_dir}")


if __name__ == "__main__":
    sys.exit(main())
