"""Generate the STANDING skewed-corpus fixture under .data/skew
(gitignored), at sf0.1 size (VERDICT r7 #1).

tools/skew_stress.py builds a one-off sf1-scale stress corpus and
asserts lever behavior; this fixture instead makes skew a third
CORRECTNESS+BENCH scale: a complete sf_dir (all ten tables) whose
documents/embeddings carry the three real-corpus pathologies the
driver's uniform synthetic data lacks, sized so the full
dedup/similarity oracle sweep runs in minutes every round:

- **Zipf-ish text**: 4,000 background docs x ~100 tokens, token ids
  drawn u^3-skewed over a 30k vocab (heavy head concentration);
- **hot boilerplate 8-gram** spliced mid-document into 20% of the
  background docs (df ~800 — the repeated-ngram / shingle-cap
  stressor);
- **one giant exact-dup family**: docs 4000..4999 (1,000 members,
  20% of the corpus) share one text — every LSH/simhash band
  collides, the O(d^2) pair-expansion stressor;
- **one giant embedding cluster**: vecs 1600..1999 (400 members,
  20%) are tiny deterministic perturbations of one unit vector — at
  auto_nlist(2000)=45 cells they all land in ONE cell, the SemDeDup
  giant-cell / block-salting stressor;
- **one hot canonical URL** (r10 VERDICT #6): 1,000 extra re-fetch
  docs whose ids are chosen so dd31's provenance derivation
  (canonical key = (doc_id DIV 3) % 1000) maps them ALL to key 7 —
  one page re-fetched a thousand times, textually distinct each
  fetch (exactly dd31's premise). Stresses the keeper election's
  hot canon_url window partition.

The remaining eight tables are copied from sf0.1 so ANY registered
query runs against this dir (bench warmup reads orders.parquet).

Deterministic: numpy default_rng with fixed seeds; same bytes every
run, so CORRECTNESS_skew.json diffs round-over-round mean code, not
data. Regenerate with --force after changing this file.

    python tools/make_skew.py [--force]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
OUT = os.path.join(ROOT, ".data", "skew")

N_DOCS = 5_000
N_HOT_URL = 1_000  # re-fetch docs, all on dd31 canonical key 7
HOT_URL_KEY = 7
DOC_TOKENS = 100
VOCAB = 30_000
HOT_MOD = 5  # background doc_id % 5 == 1 -> carries the hot 8-gram
HOT8 = "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8"
DOC_CLUSTER_START = 4_000  # docs 4000..4999: one exact-dup family
N_VECS = 2_000
DIM = 64
VEC_CLUSTER_START = 1_600  # vecs 1600..1999: one tight cluster
COPY_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events",
)


def build_documents() -> pa.Table:
    rng = np.random.default_rng(8101)
    # u^3-skewed Zipf-ish draw: ~9% of all tokens hit the hottest word
    draws = rng.random((N_DOCS, DOC_TOKENS)) ** 3
    ids = (draws * VOCAB).astype(np.int64)
    texts: list[str] = []
    for d in range(N_DOCS):
        words = [f"w{t}" for t in ids[d]]
        if d % HOT_MOD == 1:
            words = words[: DOC_TOKENS // 2] + HOT8.split() + words[DOC_TOKENS // 2:]
        texts.append(" ".join(words))
    clone = texts[DOC_CLUSTER_START]
    for d in range(DOC_CLUSTER_START, N_DOCS):
        texts[d] = clone
    # hot canonical URL: ids 3*(HOT_URL_KEY + 1000k) for k=2.. — all
    # satisfy (doc_id DIV 3) % 1000 == HOT_URL_KEY (dd31's canonical
    # identity) and sit far above the base id range; each fetch gets
    # distinct short text (re-fetches differ textually — that is the
    # provenance-dedup premise)
    hot_ids = [
        3 * (HOT_URL_KEY + 1000 * k) for k in range(2, 2 + N_HOT_URL)
    ]
    hot_texts = [f"refetch of page seven number {k}" for k in hot_ids]
    doc_ids = list(range(N_DOCS)) + hot_ids
    texts = texts + hot_texts
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            # one lang block = worst case for every lang-blocked join
            "lang": pa.array(["en"] * len(doc_ids), pa.string()),
            "source": pa.array(
                [f"src{d % 20}" for d in doc_ids], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def build_embeddings() -> pa.Table:
    rng = np.random.default_rng(8102)
    vecs = rng.normal(size=(N_VECS, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # the giant cluster: one center + ~1e-3 jitter, re-normalized —
    # pairwise cosines ~0.999998, far above every dedup threshold
    center = vecs[VEC_CLUSTER_START].copy()
    n_c = N_VECS - VEC_CLUSTER_START
    jitter = rng.normal(scale=1e-3, size=(n_c, DIM))
    cl = center[None, :] + jitter
    cl /= np.linalg.norm(cl, axis=1, keepdims=True)
    vecs[VEC_CLUSTER_START:] = cl
    return pa.table(
        {
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(
                (np.arange(N_VECS) % 10).astype(np.int32), pa.int32()
            ),
        }
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    marker = os.path.join(OUT, "embeddings.parquet")
    if os.path.exists(marker) and not args.force:
        print(f"{OUT} already built (use --force to regenerate)")
        return 0
    os.makedirs(OUT, exist_ok=True)
    for t in COPY_TABLES:
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(OUT, f"{t}.parquet")
        )
    pq.write_table(build_documents(), os.path.join(OUT, "documents.parquet"))
    pq.write_table(build_embeddings(), os.path.join(OUT, "embeddings.parquet"))
    print(f"wrote {OUT}: {N_DOCS + N_HOT_URL} docs (giant family "
          f"{N_DOCS - DOC_CLUSTER_START}, hot-URL fetches {N_HOT_URL}), "
          f"{N_VECS} vecs (giant cluster {N_VECS - VEC_CLUSTER_START})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
