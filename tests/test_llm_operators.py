"""Property tests for the LLM-pipeline operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from trello_github_etl_spark.io import load_table
from trello_github_etl_spark.operators import dedup, multimodal, similarity, textstats


def test_exact_dup_finds_planted_copies(spark):
    docs = spark.createDataFrame(
        [
            (1, "The  SAME text"),
            (2, "the same TEXT"),  # same canonical form
            (3, "something else"),
        ],
        "doc_id long, text string",
    )
    groups = dedup.exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0].doc_ids == [1, 2]
    assert groups[0].keeper_id == 1


def test_minhash_identical_docs_identical_sigs(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "totally different words here now ok yes")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: r.sig for r in dedup.minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]
    pairs = {(r.doc_a, r.doc_b) for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs


def test_simhash_similar_docs_close_hamming(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, "completely unrelated content xyzzy")],
        "doc_id long, text string",
    )
    sh = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(sh[1], sh[2]) < hamming(sh[1], sh[3])


def test_lsh_topk_subset_of_brute_force_bucketmates(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    qs = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    targets = emb.select("vec_id", "embedding")
    bf = {
        (r.q_id, r.vec_id): r.cos
        for r in similarity.brute_force_topk(qs, targets, k=50).collect()
    }
    approx = similarity.lsh_topk(qs, targets, k=5).collect()
    # every LSH hit's cosine must equal the exact cosine (same fold)
    for r in approx:
        if (r.q_id, r.vec_id) in bf:
            assert r.cos == bf[(r.q_id, r.vec_id)]
    # the query vector itself shares its own bucket → rank-1 self hit
    self_hits = {r.q_id for r in approx if r.q_id == r.vec_id and r.rank == 1}
    assert self_hits == {r.q_id for r in qs.select("q_id").collect()}


def _wav_bytes(freq_hz=440.0, rate=16_000, seconds=0.5, amp=0.5):
    """Synthesize a mono 16-bit PCM WAV of a sine tone."""
    import io
    import wave

    import numpy as np

    n = int(rate * seconds)
    t = np.arange(n) / rate
    sig = (amp * np.sin(2 * np.pi * freq_hz * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(sig.tobytes())
    return buf.getvalue()


def _ppm_bytes(width=8, height=4, value=100):
    """Binary netpbm P6 image with every channel = value."""
    return (
        f"P6\n{width} {height}\n255\n".encode()
        + bytes([value]) * (width * height * 3)
    )


def test_real_codec_unsupported_formats_fail_loudly(spark):
    media = spark.createDataFrame(
        [(1, "video", b"bytes", "src")],
        "media_id long, media_type string, payload binary, meta_source string",
    )
    with pytest.raises(Exception):  # NotImplementedError inside the task
        multimodal.decode_media(media, codec="real").collect()
    with pytest.raises(ValueError):
        multimodal.decode_media(media, codec="webp")


def test_real_codec_decodes_wav_and_ppm(spark):
    """codec='real' actually parses the payload bytes: PPM dims and
    pixel stats, WAV channel/bit-depth/frame counts and RMS (a 0.5-amp
    sine has RMS 0.5/sqrt(2)) — not md5 derivations."""
    import math

    wav = _wav_bytes(seconds=0.25, amp=0.5)
    ppm = _ppm_bytes(width=8, height=4, value=100)
    media = spark.createDataFrame(
        [(1, "audio", wav, "s"), (2, "image", ppm, "s")],
        "media_id long, media_type string, payload binary, meta_source string",
    )
    rows = {
        r.media_id: r
        for r in multimodal.decode_media(media, codec="real").collect()
    }
    img = rows[2]
    assert (img.width, img.height, img.n_frames) == (8, 4, 1)
    assert img.feat_0 == pytest.approx(100 / 255.0)  # mean pixel
    assert img.feat_1 == pytest.approx(0.0)  # uniform → zero std
    aud = rows[1]
    assert (aud.width, aud.height) == (1, 16)  # mono, 16-bit
    assert aud.n_frames == 4000  # 0.25 s @ 16 kHz
    assert aud.feat_0 == pytest.approx(0.5 / math.sqrt(2), rel=1e-2)
    # 440 Hz for 0.25 s → ~220 zero crossings over 4000 samples
    assert aud.feat_1 == pytest.approx(220 / 4000, rel=0.05)


def test_real_codec_ppm_16bit_and_truncated_fail_loudly():
    """ADVICE r2: maxval > 255 means 2-byte samples — decoding as
    uint8 would silently garble the stats, so it must raise the loud
    capability boundary; a payload shorter than the header promises
    must also fail rather than compute stats over a short buffer."""
    import pytest as _pytest

    from trello_github_etl_spark.operators.multimodal import (
        _real_decode_one,
    )

    wide = (
        b"P6\n2 2\n65535\n" + bytes([0, 100]) * (2 * 2 * 3)
    )
    with _pytest.raises(NotImplementedError, match="maxval"):
        _real_decode_one(1, "image", wide)
    truncated = b"P6\n8 4\n255\n" + bytes([100]) * 10
    with _pytest.raises(ValueError, match="truncated"):
        _real_decode_one(2, "image", truncated)


def _p6_video_bytes(frames):
    """Concatenated-P6 video container: one (width, height, value)
    8-bit frame per entry, back to back."""
    return b"".join(_ppm_bytes(w, h, v) for w, h, v in frames)


def test_real_codec_decodes_concatenated_p6_video(spark):
    """VERDICT r13 #4: video is no longer a NotImplementedError — a
    concatenated-P6 payload decodes to whole-clip stats (mm1 path)
    and per-sampled-frame rows (decode_video_frames), with unsampled
    frames skipped by header offset."""
    vid = _p6_video_bytes(
        [(4, 2, 10), (4, 2, 20), (4, 2, 30), (4, 2, 40), (4, 2, 50)]
    )
    media = spark.createDataFrame(
        [(7, "video", vid, "s")],
        "media_id long, media_type string, payload binary, meta_source string",
    )
    clip = multimodal.decode_media(media, codec="real").collect()[0]
    assert (clip.width, clip.height, clip.n_frames) == (4, 2, 5)
    assert clip.feat_0 == pytest.approx(30 / 255.0)  # mean over frames
    # per-frame rows, every 2nd frame: indices 0, 2, 4
    rows = sorted(
        multimodal.decode_video_frames(
            media, every_n=2, codec="real"
        ).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in rows] == [0, 2, 4]
    assert [r.frame_feat_0 for r in rows] == pytest.approx(
        [10 / 255.0, 30 / 255.0, 50 / 255.0]
    )
    assert all((r.width, r.height) == (4, 2) for r in rows)
    assert all(r.frame_feat_1 == pytest.approx(0.0) for r in rows)


def test_real_codec_video_boundaries_fail_loudly():
    """Truncated frames and 16-bit frames inside the container raise
    the same loud boundaries as the single-image path; compressed
    magic still hits the NotImplementedError wall."""
    from trello_github_etl_spark.operators.multimodal import (
        _real_decode_one,
        decode_video_frames,
    )

    good = _ppm_bytes(4, 2, 10)
    with pytest.raises(ValueError, match="truncated P6 frame 1"):
        _real_decode_one(1, "video", good + b"P6\n4 2\n255\n" + b"\x00" * 3)
    with pytest.raises(NotImplementedError, match="frame 1"):
        _real_decode_one(
            2, "video", good + b"P6\n2 2\n65535\n" + b"\x00\x64" * 12
        )
    with pytest.raises(NotImplementedError, match="concatenated-P6"):
        _real_decode_one(3, "video", b"\x00\x00\x00\x18ftypmp42")
    with pytest.raises(ValueError, match="every_n"):
        decode_video_frames(None, every_n=0)


def test_fake_codec_deterministic_batch_shape(spark):
    media = spark.createDataFrame(
        [(i, "video", f"payload{i}".encode(), "s") for i in range(10)],
        "media_id long, media_type string, payload binary, meta_source string",
    )
    a = sorted(map(tuple, multimodal.decode_media(media).collect()))
    b = sorted(map(tuple, multimodal.decode_media(media.repartition(4)).collect()))
    assert a == b  # partitioning cannot change decode results
    assert all(1 <= r[4] <= 240 for r in a)  # n_frames in range


def test_connected_components_chain_and_islands(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (21, 20)],
        "doc_a long, doc_b long",
    )
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_split_leakage_flags_only_cross_split_groups(spark):
    """Groups spanning splits are reported with the train/eval
    breakdown; within-split dups, unique docs and NULL-text docs are
    silent (NULL text carries no comparable content — the
    exact_duplicates contract)."""
    docs = spark.createDataFrame(
        [
            # fp A: train + test  -> leaks (1 train, 1 eval)
            (1, "alpha beta", "train"),
            (2, "Alpha  beta", "test"),  # same canonical form
            # fp B: train + train -> duplicate but NOT a leak
            (3, "gamma", "train"),
            (4, "gamma", "train"),
            # fp C: val + test + train -> leaks (1 train, 2 eval)
            (5, "delta", "val"),
            (6, "delta", "test"),
            (7, "delta", "train"),
            # unique + NULL text -> silent
            (8, "epsilon", "test"),
            (9, None, "train"),
            (10, None, "test"),
        ],
        "doc_id long, text string, split string",
    )
    got = {
        r.keeper_id: (r.n_docs, r.n_splits, r.splits, r.n_train, r.n_eval)
        for r in dedup.split_leakage(docs).collect()
    }
    assert got == {
        1: (2, 2, "test,train", 1, 1),
        5: (3, 3, "test,train,val", 1, 2),
    }


def test_split_leakage_null_split_fails_loudly(spark):
    """A NULL split is a caller bug, not data: collect_set would
    silently skip it (a train+NULL group never flags and the counts
    stop summing to n_docs), so both operators raise instead."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkRuntimeError

    docs = spark.createDataFrame(
        [(1, "alpha", "train"), (2, "alpha", None)],
        "doc_id long, text string, split string",
    )
    with pytest.raises((Py4JJavaError, PySparkRuntimeError, Exception),
                       match="NULL split"):
        dedup.split_leakage(docs).collect()
    with pytest.raises((Py4JJavaError, PySparkRuntimeError, Exception),
                       match="NULL split"):
        dedup.split_decontaminate(docs).collect()


def test_split_decontaminate_purges_only_contaminated_train(spark):
    """Only TRAIN docs whose fp appears in an eval split are purged;
    eval rows, clean train dups and NULL-text rows survive."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta", "train"),   # contaminated by 2 -> purged
            (2, "Alpha  beta", "test"),
            (3, "gamma", "train"),        # train-only dup -> kept
            (4, "gamma", "train"),
            (5, "delta", "val"),          # eval-only dup -> kept
            (6, "delta", "test"),
            (7, "delta", "train"),        # contaminated by 5 AND 6
            (8, None, "train"),           # NULL text never matches
        ],
        "doc_id long, text string, split string",
    )
    got = {
        r.doc_id: r.eval_splits
        for r in dedup.split_decontaminate(docs).collect()
    }
    assert got == {1: "test", 7: "test,val"}


def test_pq_rerank_full_shortlist_equals_brute_force(spark):
    """The refine contract: with the shortlist as wide as the corpus,
    stage 1 cannot drop a true neighbor, so the exact re-rank must
    reproduce brute force bit-for-bit (ids AND cosines)."""
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    qs = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    seeds = emb.filter(F.col("vec_id") < similarity.PQ_CODEBOOK)
    truth = {
        (r.q_id, r.vec_id, r.rank, r.cos)
        for r in similarity.brute_force_topk(qs, emb).collect()
    }
    refined = {
        (r.q_id, r.vec_id, r.rank, r.cos)
        for r in similarity.pq_rerank_topk(qs, emb, seeds, shortlist=n).collect()
    }
    assert refined == truth
    # and the default narrow shortlist still re-ranks with EXACT
    # cosines: every emitted (q,vec) pair scores identically to truth
    narrow = similarity.pq_rerank_topk(qs, emb, seeds).collect()
    truth_cos = {(t[0], t[1]): t[3] for t in truth}
    for r in narrow:
        if (r.q_id, r.vec_id) in truth_cos:
            assert r.cos == truth_cos[(r.q_id, r.vec_id)]


def test_multiprobe_recall_dominates_single_probe(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    qs = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    truth = {
        (r.q_id, r.vec_id)
        for r in similarity.brute_force_topk(qs, emb).collect()
    }
    single = {
        (r.q_id, r.vec_id) for r in similarity.lsh_topk(qs, emb).collect()
    }
    multi = {
        (r.q_id, r.vec_id)
        for r in similarity.multiprobe_lsh_topk(qs, emb).collect()
    }
    recall_single = len(single & truth) / len(truth)
    recall_multi = len(multi & truth) / len(truth)
    assert recall_multi >= recall_single
    assert recall_multi > 0


def test_shingle_count_property(spark):
    # k tokens → max(0, k-2) 3-gram shingles before dedup; distinct after
    rows = [
        (1, "a b"),                  # 2 tokens → 0 shingles
        (2, "a b c"),                # 3 → 1
        (3, "a b c d e"),            # 5 → 3
        (4, "x y x y x y"),          # 6 → 4 raw, 2 distinct
    ]
    from trello_github_etl_spark.operators.textstats import shingles
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", F.size(shingles(F.col("text"))).alias("n")
        ).collect()
    }
    assert got == {1: 0, 2: 1, 3: 3, 4: 2}


def test_minhash_signature_invariant_under_exact_duplication(spark):
    # signatures depend only on the shingle SET → canonical-form dups
    # (case/whitespace changes that survive tokenization) share sigs
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "ALPHA  beta   GAMMA delta epsilon"),
            (3, "totally different text entirely here"),
        ],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: tuple(r.sig) for r in dedup.minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_ivf_multiprobe_recall_dominates(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents = emb.filter(F.col("vec_id") < similarity.NUM_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    qs = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    truth = {
        (r.q_id, r.vec_id)
        for r in similarity.brute_force_topk(qs, emb).collect()
    }
    r1 = {
        (r.q_id, r.vec_id)
        for r in similarity.ivf_topk(qs, emb, cents, nprobe=1).collect()
    }
    r2 = {
        (r.q_id, r.vec_id)
        for r in similarity.ivf_topk(qs, emb, cents, nprobe=2).collect()
    }
    assert len(r2 & truth) >= len(r1 & truth)
    assert len(r2 & truth) > 0


def test_ivf_budgeted_probe_walk_respects_budget(spark):
    """Synthetic 2-D corpus: a dense cell and several sparse cells.

    With a budget smaller than the dense cell, a query nearest the
    dense centroid must stop after that one probe; a query nearest a
    sparse centroid must keep probing past it. We observe probe
    breadth through which candidates can appear in the result."""
    import math

    def vec(angle):
        return [float(math.cos(angle)), float(math.sin(angle))]

    # centroids at 0°, 60°, 120°
    cents = spark.createDataFrame(
        [(0, vec(0.0)), (1, vec(1.05)), (2, vec(2.09))],
        "cent_id long, c_vec array<float>",
    )
    # 6 corpus vectors hugging centroid 0 (dense), 1 each at 60°/120°
    rows = [(i, vec(0.02 * i)) for i in range(6)]
    rows += [(10, vec(1.0)), (20, vec(2.05))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # dense-side query: budget 3 < dense cell size 6 → single probe,
    # so vec 10 (cell 1) can never be a candidate even with k=8
    qs_dense = spark.createDataFrame(
        [(100, vec(0.01))], "q_id long, q_vec array<float>"
    )
    got = similarity.ivf_topk_budgeted(
        qs_dense, emb, cents, k=8, nprobe_max=3, candidate_budget=3
    ).collect()
    assert {r.vec_id for r in got} == {0, 1, 2, 3, 4, 5}

    # sparse-side query: first probe (cell 1, occupancy 1) leaves the
    # budget open → walk continues into the next-nearest cell
    qs_sparse = spark.createDataFrame(
        [(200, vec(1.0))], "q_id long, q_vec array<float>"
    )
    got2 = similarity.ivf_topk_budgeted(
        qs_sparse, emb, cents, k=8, nprobe_max=3, candidate_budget=3
    ).collect()
    assert len({r.vec_id for r in got2}) > 1
    assert 10 in {r.vec_id for r in got2}


def test_ivf_budgeted_recall_dominates_single_probe(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents = emb.filter(F.col("vec_id") < similarity.NUM_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    qs = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    truth = {
        (r.q_id, r.vec_id)
        for r in similarity.brute_force_topk(qs, emb).collect()
    }
    r1 = {
        (r.q_id, r.vec_id)
        for r in similarity.ivf_topk(qs, emb, cents, nprobe=1).collect()
    }
    rb = {
        (r.q_id, r.vec_id)
        for r in similarity.ivf_topk_budgeted(
            qs, emb, cents, nprobe_max=4, candidate_budget=150
        ).collect()
    }
    assert len(rb & truth) >= len(r1 & truth)
    assert len(rb & truth) > 0


def test_split_assignment_invariant_under_partitioning(spark):
    """Hash-bucket splits must not depend on row order or layout: the
    same doc gets the same split at 1 partition and at 32."""
    from trello_github_etl_spark.queries.pipeline_q import _hash_bucket

    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    split = (
        F.when(_hash_bucket("split|", F.col("doc_id"), 100) < 80, "train")
        .when(_hash_bucket("split|", F.col("doc_id"), 100) < 90, "val")
        .otherwise("test")
    )
    one = {
        r.doc_id: r.split
        for r in docs.coalesce(1).withColumn("split", split).collect()
    }
    many = {
        r.doc_id: r.split
        for r in docs.repartition(32).withColumn("split", split).collect()
    }
    assert one == many
    # all three splits are populated and roughly 80/10/10
    from collections import Counter

    c = Counter(one.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]


def test_decontaminate_flags_planted_leak_not_disjoint_doc(spark):
    """A verbatim copy of a benchmark doc must be flagged at full
    overlap; a doc sharing no vocabulary must not appear at all."""
    from trello_github_etl_spark.operators import dedup

    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta"),  # full leak
            (11, "alpha beta gamma delta other words here"),  # partial
            (12, "totally unrelated vocabulary in this doc"),  # clean
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r
        for r in dedup.decontaminate(corpus, bench, threshold=0.5).collect()
    }
    assert got[10].overlap == 1.0 and got[10].n_sh == got[10].n_hit
    assert 12 not in got
    # partial doc: 5 shingles, 2 of them ("alpha beta gamma",
    # "beta gamma delta") in the benchmark -> 0.4 < threshold
    assert 11 not in got


def test_quantize_int8_bounds_and_error(spark):
    """Codes stay in [-127, 127] and dequantization error is at most
    half a quantization step per element; zero vectors get scale 0."""
    from trello_github_etl_spark.operators import similarity

    vecs = spark.createDataFrame(
        [
            (1, [0.5, -2.0, 1.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),
        ],
        ["vec_id", "embedding"],
    )
    got = {r.vec_id: r for r in similarity.quantize_int8(vecs).collect()}
    r1 = got[1]
    assert max(abs(q) for q in r1.qvec) == 127  # max element hits full range
    for orig, q in zip([0.5, -2.0, 1.25, 0.0], r1.qvec):
        assert abs(q / r1.scale - orig) <= 0.5 / r1.scale
    assert got[2].scale == 0.0 and got[2].qvec == [0, 0, 0, 0]


def test_token_chunks_cover_stream_with_overlap(spark):
    """Every chunk is width<=W, consecutive chunks overlap by W-S
    tokens, and the union of chunks covers the whole token stream."""
    from trello_github_etl_spark.queries import pipeline_q

    n_tokens = 130  # -> starts 1, 41, 81, 121 -> widths 50,50,50,10
    text = " ".join(f"tok{i}" for i in range(n_tokens))
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [7], "text": [text]}))
    df.createOrReplaceTempView("_chunkdoc")
    # call the operator body directly on a tiny frame via the query fn
    # path: write the frame as the documents table of a temp sf dir
    import os, tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        rows = sorted(
            pipeline_q.pipe3_token_chunks(spark, d).collect(),
            key=lambda r: r.chunk_idx,
        )
    assert [r.n_tokens for r in rows] == [50, 50, 50, 10]
    assert [r.chunk_idx for r in rows] == [0, 1, 2, 3]


def test_quantized_topk_recall_vs_exact(spark):
    """int8 cosine ranking must closely agree with exact float
    ranking: recall@5 over all queries >= 0.8 at test scale."""
    from trello_github_etl_spark.queries.llm_q import (
        s1_cosine_topk,
        s8_quantized_topk,
    )

    truth = {}
    for r in s1_cosine_topk(spark, SF_DIR).collect():
        truth.setdefault(r.q_id, set()).add(r.vec_id)
    got = {}
    for r in s8_quantized_topk(spark, SF_DIR).collect():
        got.setdefault(r.q_id, set()).add(r.vec_id)
    assert set(got) == set(truth)
    hits = sum(len(got[q] & truth[q]) for q in truth)
    total = sum(len(truth[q]) for q in truth)
    assert hits / total >= 0.8, f"recall {hits}/{total}"


def test_kmeans_refine_partitioning_invariant(spark):
    """Fixed-point accumulation makes refined centroids bit-identical
    regardless of data layout — 1 partition vs 32 must agree on every
    double."""
    from trello_github_etl_spark.operators import similarity

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents = emb.filter(F.col("vec_id") < similarity.NUM_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    one = {
        r.cent_id: (r.n_members, tuple(r.c_vec))
        for r in similarity.kmeans_refine(
            emb.coalesce(1), cents, n_iter=2
        ).collect()
    }
    many = {
        r.cent_id: (r.n_members, tuple(r.c_vec))
        for r in similarity.kmeans_refine(
            emb.repartition(32), cents, n_iter=2
        ).collect()
    }
    assert one == many
    assert sum(n for n, _ in one.values()) == emb.count()


def test_audio_segments_tile_each_clip(spark):
    media = spark.createDataFrame(
        [(i, "audio", f"clip{i}".encode(), "s") for i in range(8)]
        + [(99, "image", b"not-audio", "s")],
        "media_id long, media_type string, payload binary, meta_source string",
    )
    rows = multimodal.segment_audio(media).collect()
    assert rows and all(r.media_id != 99 for r in rows)  # non-audio filtered
    by_clip = {}
    for r in rows:
        by_clip.setdefault(r.media_id, []).append(r)
    for clip, segs in by_clip.items():
        segs.sort(key=lambda r: r.seg_idx)
        assert [s.seg_idx for s in segs] == list(range(len(segs)))
        assert segs[0].start_sample == 0
        assert segs[-1].end_sample == segs[-1].n_samples  # full coverage
        for s in segs:
            assert s.start_sample < s.n_samples
            assert s.end_sample == min(s.start_sample + 160_000, s.n_samples)
            assert 0.0 <= s.seg_feat <= 1.0
    # partitioning cannot change segmentation
    again = multimodal.segment_audio(media.repartition(4)).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_audio_real_codec_segments_wav(spark):
    """Real WAV segmentation: window/hop tiling over the true sample
    count, per-window RMS of the decoded signal."""
    import math

    wav = _wav_bytes(seconds=1.0, rate=16_000, amp=0.5)  # 16k samples
    media = spark.createDataFrame(
        [(1, "audio", wav, "s")],
        "media_id long, media_type string, payload binary, meta_source string",
    )
    segs = sorted(
        multimodal.segment_audio(
            media, window=8_000, hop=4_000, codec="real"
        ).collect(),
        key=lambda r: r.seg_idx,
    )
    assert len(segs) == 4  # ceil(16000/4000)
    assert all(s.sample_rate == 16_000 and s.n_samples == 16_000 for s in segs)
    assert [s.start_sample for s in segs] == [0, 4000, 8000, 12000]
    assert [s.end_sample for s in segs] == [8000, 12000, 16000, 16000]
    # full windows of a 0.5-amp sine: RMS = 0.5/sqrt(2)
    for s in segs[:3]:
        assert s.seg_feat == pytest.approx(0.5 / math.sqrt(2), rel=1e-2)
    with pytest.raises(ValueError):
        multimodal.segment_audio(media, codec="mp3")


def test_repetition_stats_golden_and_edges(spark):
    from trello_github_etl_spark.operators import textstats

    df = spark.createDataFrame(
        [(1, "a a a b c b c x"), (2, ""), (3, "solo")],
        "doc_id long, text string",
    )
    tk = F.col("tk")
    rows = {
        r.doc_id: r
        for r in df.withColumn("tk", textstats.tokens(F.col("text")))
        .withColumn("g2", textstats.ngrams(tk, 2))
        .select(
            "doc_id",
            textstats.unique_fraction(tk).alias("u"),
            textstats.duplicate_fraction(F.col("g2")).alias("d2"),
            textstats.top_element_ratio(tk).alias("topw"),
        )
        .collect()
    }
    # 8 tokens, 4 distinct; 7 bigrams, 5 distinct ("a a" and "b c" repeat);
    # "a" is the mode at 3/8.
    assert rows[1].u == 0.5
    assert rows[1].d2 == pytest.approx(2.0 / 7.0)
    assert rows[1].topw == 0.375
    assert (rows[2].u, rows[2].d2, rows[2].topw) == (0.0, 0.0, 0.0)
    assert (rows[3].u, rows[3].d2, rows[3].topw) == (1.0, 0.0, 1.0)


def test_collapse_adjacent_repeats_property(spark):
    from trello_github_etl_spark.operators import textstats

    df = spark.createDataFrame(
        [(1, "a a a b c b c x"), (2, ""), (3, "solo"), (4, "z z z z")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r.kept
        for r in df.withColumn("tk", textstats.tokens(F.col("text")))
        .select(
            "doc_id",
            textstats.collapse_adjacent_repeats(F.col("tk")).alias("kept"),
        )
        .collect()
    }
    assert rows[1] == ["a", "b", "c", "b", "c", "x"]
    assert rows[2] == []
    assert rows[3] == ["solo"]
    assert rows[4] == ["z"]
    # idempotence: collapsing a collapsed stream is a no-op
    df2 = spark.createDataFrame(
        [(k, " ".join(v)) for k, v in rows.items()], "doc_id long, text string"
    )
    again = {
        r.doc_id: r.kept
        for r in df2.withColumn("tk", textstats.tokens(F.col("text")))
        .select(
            "doc_id",
            textstats.collapse_adjacent_repeats(F.col("tk")).alias("kept"),
        )
        .collect()
    }
    assert again == rows


def test_repetition_ops_match_python_model(spark):
    import random
    from collections import Counter

    rng = random.Random(7)
    vocab = ["a", "b", "ab", "xyz", "q0", "longword"]
    cases = ["", "a", "a a", " ".join(["b"] * 50)]
    for _ in range(200):
        cases.append(
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40)))
        )
    from trello_github_etl_spark.operators import textstats

    df = spark.createDataFrame(list(enumerate(cases)), "doc_id long, text string")
    tk = F.col("tk")
    rows = (
        df.withColumn("tk", textstats.tokens(F.col("text")))
        .withColumn("g2", textstats.ngrams(tk, 2))
        .select(
            "doc_id",
            textstats.unique_fraction(tk).alias("u"),
            textstats.duplicate_fraction(F.col("g2")).alias("d2"),
            textstats.top_element_ratio(tk).alias("topw"),
            textstats.collapse_adjacent_repeats(tk).alias("kept"),
        )
        .collect()
    )
    for r in rows:
        toks = cases[r.doc_id].split()
        n = len(toks)
        u = len(set(toks)) / n if n else 0.0
        g2 = [" ".join(toks[i : i + 2]) for i in range(n - 1)]
        d2 = 1.0 - len(set(g2)) / len(g2) if g2 else 0.0
        topw = max(Counter(toks).values()) / n if n else 0.0
        kept = [t for i, t in enumerate(toks) if i == 0 or t != toks[i - 1]]
        case = cases[r.doc_id]
        assert r.u == pytest.approx(u), case
        assert r.d2 == pytest.approx(d2), case
        assert r.topw == pytest.approx(topw), case
        assert r.kept == kept, case


def test_top_element_ratio_grouped_matches_hof(spark):
    from trello_github_etl_spark.operators import textstats

    df = spark.createDataFrame(
        [(1, "a a a b c b c x"), (2, ""), (3, "solo"), (4, "z z q z")],
        "doc_id long, text string",
    ).withColumn("tk", textstats.tokens(F.col("text")))
    hof = {
        r.doc_id: r.r
        for r in df.select(
            "doc_id", textstats.top_element_ratio(F.col("tk")).alias("r")
        ).collect()
    }
    grouped = {
        r.doc_id: r.top_element_ratio
        for r in textstats.top_element_ratio_grouped(df, "doc_id", "tk").collect()
    }
    # empty doc drops out of the grouped form; all others must agree
    assert 2 not in grouped
    for k, v in grouped.items():
        assert v == pytest.approx(hof[k])
    assert set(grouped) == {1, 3, 4}


def test_twostar_components_match_propagation(spark):
    """large-star/small-star must produce the identical
    (node → component-min) labeling as min-label propagation on a
    skewed graph mix: a path (worst case for diameter), a hub star
    (worst case for degree skew), a triangle, and isolated pairs —
    with edge directions deliberately scrambled."""
    from trello_github_etl_spark.operators import dedup

    edges = [(i + 1, i) for i in range(100, 115)]  # path, reversed dirs
    edges += [(200, 200 + j) for j in range(1, 30)]  # star
    edges += [(300, 301), (301, 302), (302, 300)]  # triangle
    edges += [(501, 500), (600, 601)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    prop = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components(pairs).collect()
    }
    star = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components_twostar(pairs).collect()
    }
    assert star == prop
    assert star[115] == 100
    assert star[229] == 200
    assert star[302] == 300
    assert star[501] == 500 and star[601] == 600


def test_twostar_converges_fast_on_long_path(spark):
    """A diameter-60 path needs ~60 label-propagation rounds but must
    collapse in O(log² n) two-star rounds — the whole point of the
    algorithm. max_iter=10 would leave propagation unconverged; the
    two-star labels must still be exact."""
    from trello_github_etl_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "doc_a long, doc_b long"
    )
    star = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components_twostar(
            pairs, max_iter=10
        ).collect()
    }
    assert star == {i: 0 for i in range(61)}


def test_top_element_ratio_adaptive_matches_hof_both_paths(spark):
    """The adaptive operator must agree with the per-row HOF on every
    doc regardless of which path (marker row vs explode) the doc
    takes — including full coverage of empty docs (ratio 0.0), which
    the pure grouped variant drops."""
    from trello_github_etl_spark.operators import textstats

    rows = [
        (1, "a a a b c b c x"),  # 8 tokens
        (2, ""),  # empty → 0.0, short path
        (3, "solo"),
        (4, "z z q z"),
        (5, " ".join(["w"] * 40 + ["v", "u"] * 10)),  # 60 tokens, long path
        (6, " ".join(str(i % 7) for i in range(25))),  # long path
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "tk", textstats.tokens(F.col("text"))
    )
    hof = {
        r.doc_id: r.r
        for r in df.select(
            "doc_id", textstats.top_element_ratio(F.col("tk")).alias("r")
        ).collect()
    }
    for threshold in (0, 10, 1000):  # all-long, mixed, all-short
        got = {
            r.doc_id: r.top_element_ratio
            for r in textstats.top_element_ratio_adaptive(
                df.select("doc_id", "tk"), "doc_id", "tk", threshold=threshold
            ).collect()
        }
        assert set(got) == set(hof), threshold
        for k, v in got.items():
            assert v == pytest.approx(hof[k]), (threshold, k)


def test_incremental_dedup_verdicts(spark):
    from trello_github_etl_spark.operators.textstats import fingerprint

    corpus = spark.createDataFrame(
        [("known text",), ("other known",)], "text string"
    ).select(fingerprint(F.col("text")).alias("fp"))
    batch = spark.createDataFrame(
        [
            (1, "Known   TEXT "),  # canonicalizes to a corpus hit
            (2, "brand new"),
            (3, "brand new"),  # within-batch dup of 2
            (4, "unique thing"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.verdict
        for r in dedup.incremental_dedup(batch, corpus).collect()
    }
    assert got == {
        1: "dup_existing",
        2: "kept",
        3: "dup_batch",
        4: "kept",
    }


def test_triangle_counts_known_graph(spark):
    """K4 on {1,2,3,4} (4 triangles, each node in 3), one pendant
    edge (5), one disjoint triangle {10,11,12}."""
    from trello_github_etl_spark.operators import dedup

    k4 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    edges = k4 + [(4, 5), (10, 11), (10, 12), (11, 12)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r.doc_id: r.n_triangles
        for r in dedup.triangle_counts(pairs).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 10: 1, 11: 1, 12: 1}
    assert 5 not in got  # pendant node joins no triangle


def test_winnow_pairs_catch_partial_overlap(spark):
    """The winnowing guarantee: any shared run of >= w+k-1 = 12
    tokens yields >= 1 shared fingerprint — including CONTAINMENT
    (a copied paragraph inside an otherwise-different doc), the case
    whole-doc MinHash bands miss."""
    from trello_github_etl_spark.operators import dedup

    copied = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    host = (
        "completely different opening words about various other topics "
        + copied
        + " and then a totally different ending follows here too"
    )
    docs = spark.createDataFrame(
        [(1, copied), (2, host), (3, "unrelated short content entirely")],
        "doc_id long, text string",
    )
    pairs = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in dedup.winnow_pairs(docs).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_winnow_df_cap_kills_boilerplate_pairs(spark):
    """A boilerplate run shared by many docs must stop generating
    pairs under the cap, while genuine twins keep pairing through
    their rare fingerprints."""
    from trello_github_etl_spark.operators import dedup

    boiler = "this standard license header appears on every single page of the site"
    rows = [(i, boiler + f" unique tail {i} content word{i}") for i in range(10)]
    twin = "a genuinely copied rare document body with many distinct words spread over more than twelve tokens"
    rows += [(100, twin), (101, twin)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r.doc_a, r.doc_b) for r in dedup.winnow_pairs(docs).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in dedup.winnow_pairs(docs, max_fp_df=3).collect()
    }
    # boilerplate family pairs exist uncapped, vanish under the cap
    assert any(a < 10 and b < 10 for a, b in uncapped)
    assert not any(a < 10 and b < 10 for a, b in capped)
    # the rare twin survives both
    assert (100, 101) in uncapped and (100, 101) in capped


def test_twostar_raises_on_exhausted_iterations(spark):
    """An unconverged two-star run must fail loudly — a non-star
    residual edge set would silently fan the label join out into
    duplicated rows per node."""
    from trello_github_etl_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components_twostar(pairs, max_iter=1)


def test_min_label_raises_on_exhausted_iterations(spark):
    """Min-label propagation must ALSO fail loudly when the round
    budget is smaller than the graph's diameter — the r12 50x sweep
    caught it returning partially-propagated labels silently (198k
    wrong cluster ids) when a star-edge chain needed 38 rounds
    against the old cap of 25. Two-star had this guard from r9;
    the asymmetry was the bug."""
    from trello_github_etl_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iter=3)
    # and a budget >= diameter converges to the single chain class
    labels = dedup.connected_components(pairs, max_iter=64).collect()
    assert {r.cluster_id for r in labels} == {0}


def test_real_codec_24bit_wav_is_loud_boundary(spark):
    """24-bit PCM passes the RIFF magic but needs byte repacking —
    must raise the documented NotImplementedError, not a KeyError."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)  # 24-bit
        w.setframerate(8000)
        w.writeframes(b"\x00\x01\x02" * 100)
    media = spark.createDataFrame(
        [(1, "audio", buf.getvalue(), "s")],
        "media_id long, media_type string, payload binary, meta_source string",
    )
    with pytest.raises(Exception, match="sample width"):
        multimodal.decode_media(media, codec="real").collect()


def test_countmin_is_admissible_overestimate(spark):
    """CMS property: est >= true for EVERY token, exact for tokens
    with no cell collisions in at least one row."""
    from trello_github_etl_spark.operators import sketch

    rows = []
    for i, (tok, n) in enumerate(
        [("alpha", 50), ("beta", 30), ("gamma", 7), ("rare", 1)]
    ):
        rows += [(tok,)] * n
    toks = spark.createDataFrame(rows, "token string")
    cms = sketch.countmin_table(toks)
    # grid never exceeds depth*width rows, total mass = depth*N
    grid = cms.collect()
    assert len(grid) <= sketch.CMS_DEPTH * sketch.CMS_WIDTH
    assert sum(r.cnt for r in grid) == sketch.CMS_DEPTH * len(rows)
    est = {
        r.token: r.cms_est
        for r in sketch.countmin_estimate(
            toks.select("token").distinct(), cms
        ).collect()
    }
    truth = {"alpha": 50, "beta": 30, "gamma": 7, "rare": 1}
    for tok, true_n in truth.items():
        assert est[tok] >= true_n, tok
    # unseen token estimates 0 (or collision mass), never negative
    unseen = sketch.countmin_estimate(
        spark.createDataFrame([("zzz-unseen",)], "token string"), cms
    ).collect()[0].cms_est
    assert unseen >= 0


def test_kmv_estimate_accuracy_and_small_set_fallback(spark):
    from trello_github_etl_spark.operators import sketch

    # small set: exact fallback
    small = spark.createDataFrame(
        [(f"tok{i}",) for i in range(40)], "token string"
    )
    row = sketch.kmv_distinct_estimate(small).collect()[0]
    assert row.n_hashes_kept == 40 and row.kmv_est == 40.0
    # large set: estimate within the k=256 sketch's expected error
    # band (~1/sqrt(k) ≈ 6%; allow 20% for one draw)
    big = spark.createDataFrame(
        [(f"token-{i}",) for i in range(20_000)], "token string"
    )
    est = sketch.kmv_distinct_estimate(big).collect()[0].kmv_est
    assert abs(est - 20_000) / 20_000 < 0.20
    # duplicates don't move the estimate (distinct semantics)
    dup = big.union(big)
    est_dup = sketch.kmv_distinct_estimate(dup).collect()[0].kmv_est
    assert est_dup == est


def test_sketches_merge_exactly(spark):
    """Mergeability — the property that makes sketches incremental:
    per-batch Count-Min grids summed cell-wise must equal the grid
    built over the concatenated stream, and merged KMV k-mins must
    equal the k-mins of the union. Exact equality, not approximate."""
    from trello_github_etl_spark.operators import sketch

    batches = [
        [(f"tok{i % 40}",) for i in range(300)],
        [(f"tok{i % 90}",) for i in range(200)],
        [(f"other-{i}",) for i in range(250)],
    ]
    dfs = [
        spark.createDataFrame(rows, "token string") for rows in batches
    ]
    full = dfs[0].union(dfs[1]).union(dfs[2])

    merged_cms = sketch.merge_countmin(
        dfs[0]
        .transform(sketch.countmin_table)
        .union(sketch.countmin_table(dfs[1]))
        .union(sketch.countmin_table(dfs[2]))
    )
    batch_cms = sketch.countmin_table(full)
    assert sorted(map(tuple, merged_cms.collect())) == sorted(
        map(tuple, batch_cms.collect())
    )

    from pyspark.sql import functions as F  # noqa: PLC0415

    def kmins(df):
        return (
            df.select(sketch._h60(F.col("token")).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(sketch.KMV_K)
        )

    merged_kmv = sketch.merge_kmv(
        kmins(dfs[0]).union(kmins(dfs[1])).union(kmins(dfs[2]))
    )
    assert sorted(r.h for r in merged_kmv.collect()) == sorted(
        r.h for r in kmins(full).collect()
    )
    # and the merged sketch yields the SAME estimate as sketching the
    # full stream, through the hash-frame entry point (NOT the
    # re-hashing kmv_distinct_estimate)
    est_merged = sketch.kmv_estimate_from_hashes(merged_kmv).collect()[0]
    est_full = sketch.kmv_distinct_estimate(full, "token").collect()[0]
    assert est_merged == est_full


def test_semantic_dedup_recall_vs_brute_force(spark):
    """dd14 recall check (VERDICT r2 #4): the cluster-blocked pair set
    must catch the pairs a brute-force all-pairs cosine scan finds at
    the same threshold. Exact re-embeddings co-locate by construction
    (identical vector => identical argmax cell), so the injected-dup
    subset must be caught at recall 1.0; overall pair recall floors at
    0.9 (measured 1.0 at sf0.01 — the synthetic corpus has no
    borderline cross-cell pairs at 0.92)."""
    from trello_github_etl_spark.queries.llm_q import SEMDEDUP_THRESHOLD

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    dups = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    base = emb.unionByName(dups)
    cents = emb.filter(
        F.col("vec_id") < similarity.NUM_CENTROIDS
    ).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )

    bn = base.withColumn("_n", similarity.norm(F.col("embedding")))
    x, y = bn.alias("x"), bn.alias("y")
    truth = {
        (r.a, r.b)
        for r in (
            x.join(y, F.col("x.vec_id") < F.col("y.vec_id"))
            .withColumn(
                "cos",
                similarity.cosine_prenormed(
                    F.col("x.embedding"),
                    F.col("y.embedding"),
                    F.col("x._n"),
                    F.col("y._n"),
                ),
            )
            .filter(F.col("cos") >= SEMDEDUP_THRESHOLD)
            .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
            .collect()
        )
    }
    assert truth, "fixture must produce ground-truth near-dup pairs"

    verdicts = dedup.semantic_dedup(base, cents, SEMDEDUP_THRESHOLD)
    grouped = {
        r.vec_id: r.group_id for r in verdicts.collect()
    }
    caught = {
        (a, b) for (a, b) in truth if grouped[a] == grouped[b]
    }
    injected = {(v, v + 100000) for (v, _) in [
        (r.vec_id, None)
        for r in emb.filter(F.col("vec_id") % 50 == 0).collect()
    ]}
    assert (injected & truth) <= caught  # exact dups: recall 1.0
    assert len(caught) / len(truth) >= 0.9


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """VERDICT r2 #5: with checkpoint_dir set, the iterative loops use
    a RELIABLE checkpoint (files in the shared dir — survives executor
    loss on a cluster) instead of localCheckpoint, and produce the
    identical labeling."""
    import os

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20)],
        "doc_a long, doc_b long",
    )
    expect = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components(pairs).collect()
    }
    ckpt = str(tmp_path / "ckpt")
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components(
            pairs, checkpoint_dir=ckpt
        ).collect()
    }
    assert got == expect
    # reliable checkpoints actually landed on the shared dir
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(ckpt)
        for f in fs
    ]
    assert files, "no reliable checkpoint files written"
    got2 = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components_twostar(
            pairs, checkpoint_dir=str(tmp_path / "ckpt2")
        ).collect()
    }
    assert got2 == expect


def test_bigram_novelty_semantics(spark, tmp_path):
    """Duplicated text scores 0 novelty (every bigram has outside
    evidence); text whose bigrams exist nowhere else scores 1; short
    docs (<2 tokens) stay visible with NULL novelty."""
    import __spark_entry__ as entry

    rows = [
        (1, "the quick brown fox jumps", "en", "web"),
        (2, "the quick brown fox jumps", "en", "web"),
        (3, "zxqv wplk mnbt rrsd qqae", "en", "web"),
        (4, "single", "en", "web"),
    ]
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    out = {
        r.doc_id: r
        for r in entry.queries()["t14_bigram_novelty"](spark, sf).collect()
    }
    assert out[1].novelty == 0.0 and out[2].novelty == 0.0
    assert out[3].novelty == 1.0
    assert out[4].novelty is None and out[4].n_bigrams == 0
    assert out[1].n_bigrams == 4


def test_samp3_bounds_and_partition_invariance(spark, tmp_path):
    """keep_rate in (0,1]; kept is 0/1; verdicts identical under any
    repartitioning (the membership hash sees only doc_id)."""
    import os

    import __spark_entry__ as entry

    rows = [(i, f"w{i} " * 5, "en", f"src{i % 3}") for i in range(60)]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    q = entry.queries()["samp3_temperature_rebalance"]
    out = {r.doc_id: (r.keep_rate, r.kept) for r in q(spark, sf).collect()}
    assert all(0.0 < kr <= 1.0 and k in (0, 1) for kr, k in out.values())
    # 20 docs per source, cap 10 -> sqrt(0.5): the rate must bind
    assert any(k == 0 for _, k in out.values())
    again = {r.doc_id: (r.keep_rate, r.kept) for r in q(spark, sf).collect()}
    assert out == again


def test_t15_readability_invariants(spark):
    """Syllables >= tokens (every token contributes >=1); sentences
    >= 1 always; flesch NULL iff tokenless; punctuation-only and
    empty docs behave."""
    import os

    import __spark_entry__ as entry

    rows = [
        (1, "The quick brown fox. It jumps!", "en", "web"),
        (2, "", "en", "web"),
        (3, "?!... ---", "en", "web"),
        (4, "one two three four five", "en", "web"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r.doc_id: r for r in docs.select(
        "doc_id",
        textstats.token_count(F.col("text")).alias("n_tokens"),
        textstats.sentence_count(F.col("text")).alias("n_sentences"),
        textstats.syllable_count(F.col("text")).alias("n_syllables"),
        textstats.flesch_reading_ease(F.col("text")).alias("flesch"),
    ).collect()}
    for r in out.values():
        assert r.n_sentences >= 1
        assert r.n_syllables >= r.n_tokens
        assert (r.flesch is None) == (r.n_tokens == 0)
    assert out[1].n_sentences == 2
    assert out[2].n_tokens == 0 and out[2].flesch is None
    assert out[3].n_tokens == 0
    assert out[4].n_sentences == 1  # unterminated floor


def test_simhash_hamming_pairs_find_planted_near_copies(spark):
    """The Hamming-ball pair stage must (a) recall every planted
    near-verbatim copy — tiny token-set edits move few signature bits
    — and (b) respect the ball: no emitted pair above max_hamming,
    doc_a < doc_b throughout."""
    from trello_github_etl_spark.queries.llm_q import _augmented_docs
    from tests.conftest import SF_DIR as _SF

    docs = _augmented_docs(spark, _SF)
    from trello_github_etl_spark.queries.llm_q import DOC_SHIFT

    planted = {
        (r.doc_id, r.doc_id + DOC_SHIFT)
        for r in docs.filter(F.col("doc_id") < DOC_SHIFT)
        .filter(F.col("doc_id") % 50 == 0)
        .select("doc_id")
        .collect()
    }
    pairs = dedup.simhash_hamming_pairs(docs, bits=60).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert planted <= got
    assert all(0 <= r.hamming <= 3 and r.doc_a < r.doc_b for r in pairs)


def test_pagerank_star_hub_dominates_and_is_deterministic(spark):
    """On a star graph the hub out-ranks every leaf; leaves tie
    exactly (integer grid — not approximately); floor damping keeps
    every rank >= the 0.15 base and total mass <= n."""
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "doc_a long, doc_b long"
    )
    out = {r.doc_id: r.pr_nano for r in dedup.pagerank(pairs).collect()}
    leaves = {out[i] for i in range(1, 9)}
    assert len(leaves) == 1  # exact tie on the integer grid
    assert out[0] > leaves.pop()
    assert all(v >= 150_000_000 for v in out.values())
    assert sum(out.values()) <= 9 * 1_000_000_000
    again = {r.doc_id: r.pr_nano for r in dedup.pagerank(pairs).collect()}
    assert out == again


def test_pagerank_matches_python_model_at_any_round_count(spark):
    """The r14 interval-2 lineage truncation is a cost knob only: the
    trajectory must equal a pure-Python replay of the integer-grid
    recurrence at EVERY round count — including counts that do not
    align with the truncation interval (1, 3) and ones that do (2, 4),
    so both the mid-interval lazy round and the forced final-round
    truncation are exercised."""
    raw = [(0, 1), (0, 2), (1, 2), (2, 3)]
    pairs = spark.createDataFrame(raw, "doc_a long, doc_b long")
    edges = raw + [(b, a) for a, b in raw]
    deg = {}
    for _, v in edges:
        deg[v] = deg.get(v, 0) + 1
    for rounds in (1, 2, 3, 4):
        ranks = {n: 1_000_000_000 for n in deg}
        for _ in range(rounds):
            s = {}
            for u, v in edges:
                s[u] = s.get(u, 0) + ranks[v] // deg[v]
            ranks = {
                u: 150_000_000 + (85 * c) // 100 for u, c in s.items()
            }
        got = {
            r.doc_id: r.pr_nano
            for r in dedup.pagerank(pairs, rounds=rounds).collect()
        }
        assert got == ranks, f"rounds={rounds}"


def test_samp4_exact_k_per_source_and_determinism(spark, tmp_path):
    """Every source yields exactly min(k, n_source) rows; ranks are
    1..k dense; the sample is identical on re-run and under a
    different partitioning (hash sees only doc_id); small sources
    are returned whole."""
    import os

    import __spark_entry__ as entry
    from trello_github_etl_spark.queries.pipeline_q import SAMP4_K

    rows = [(i, f"text {i}", "en", "big") for i in range(500)]
    rows += [(1000 + i, f"text {i}", "en", "tiny") for i in range(5)]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    q = entry.queries()["samp4_per_source_sample"]
    out = q(spark, sf).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src["big"]) == SAMP4_K
    assert sorted(r.samp_rank for r in by_src["big"]) == list(
        range(1, SAMP4_K + 1)
    )
    assert {r.doc_id for r in by_src["tiny"]} == {1000 + i for i in range(5)}
    again = {(r.source, r.doc_id, r.samp_rank) for r in q(spark, sf).collect()}
    assert {(r.source, r.doc_id, r.samp_rank) for r in out} == again


def test_samp5_budget_boundary_and_coverage(spark, tmp_path):
    """Kept chars reach the budget for every source with the mass
    (boundary doc included exactly once); sources under budget are
    kept whole; cum_chars is a consistent running sum."""
    import os

    import __spark_entry__ as entry
    from trello_github_etl_spark.queries.pipeline_q import SAMP5_BUDGET

    rows = [(i, "x" * 100, "en", "big", 100) for i in range(200)]
    rows += [(1000 + i, "x" * 50, "en", "tiny", 50) for i in range(4)]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    out = entry.queries()["samp5_source_char_budget"](spark, sf).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    big_total = sum(r.n_chars for r in by_src["big"])
    # crossed the budget, by at most one doc's worth
    assert SAMP5_BUDGET <= big_total < SAMP5_BUDGET + 100
    assert {r.doc_id for r in by_src["tiny"]} == {1000 + i for i in range(4)}
    for rs in by_src.values():
        rs.sort(key=lambda r: r.cum_chars)
        run = 0
        for r in rs:
            run += r.n_chars
            assert r.cum_chars == run
            assert r.cum_chars - r.n_chars < SAMP5_BUDGET  # admission rule


def test_t14_novelty_bounds(spark, tmp_path):
    """novelty in [0,1] wherever defined; evidence columns
    non-negative; instance accounting sums to the bigram total."""
    import os

    import __spark_entry__ as entry

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    rows = [(i, f"alpha beta w{i} gamma delta", "en", "web") for i in range(30)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    for r in entry.queries()["t14_bigram_novelty"](spark, sf).collect():
        assert r.n_bigrams >= 0 and r.novel_instances >= 0
        assert r.loo_evidence >= 0
        assert r.novel_instances <= r.n_bigrams
        if r.n_bigrams:
            assert 0.0 <= r.novelty <= 1.0
        else:
            assert r.novelty is None


def test_pq_encode_properties(spark):
    """Codes are in [0, K); identical vectors get identical codes; a
    codebook seed vector's own code in every subspace is itself (its
    subspace distance to its own centroid is exactly 0, the unique
    minimum unless another seed ties)."""
    from trello_github_etl_spark.io import load_table
    from trello_github_etl_spark.operators import similarity

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    seeds = emb.filter(F.col("vec_id") < similarity.PQ_CODEBOOK)
    codes = {
        r.vec_id: list(r.pq_code)
        for r in similarity.pq_encode(emb, seeds).collect()
    }
    K = similarity.PQ_CODEBOOK
    assert all(
        0 <= c < K for code in codes.values() for c in code
    )
    assert all(
        len(code) == similarity.PQ_SUBSPACES for code in codes.values()
    )
    # seed self-coding: seed c encodes to [c]*m barring exact ties
    for c in range(K):
        assert codes[c] == [c] * similarity.PQ_SUBSPACES


def test_pq_topk_ranks_self_first(spark):
    """ADC with the query's own vector in the corpus: the query's
    code-identical twin (itself) must receive the minimal
    approximate distance, so rank 1 is the query vector unless an
    exact approx-distance tie with a lower vec_id exists."""
    from trello_github_etl_spark.io import load_table
    from trello_github_etl_spark.operators import similarity

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    seeds = emb.filter(F.col("vec_id") < similarity.PQ_CODEBOOK)
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    top = similarity.pq_topk(q, emb, seeds).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r.q_id, []).append(r)
    for q_id, rows in by_q.items():
        best = min(r.approx_d2 for r in rows)
        self_rows = [r for r in rows if r.vec_id == q_id]
        assert self_rows and self_rows[0].approx_d2 == best


def test_image_ahash_locality_and_exact_collision(spark):
    """Exact payload copies hash identically (Hamming 0); a
    length-preserving single-char edit moves only its slice's cell
    (plus any borderline mean flips) — Hamming small; a different
    payload lands far."""
    from trello_github_etl_spark.operators.multimodal import image_ahash

    base = ("word%04d " % 0) * 0 + " ".join(f"w{i:04d}" for i in range(60))
    edited = base[:150] + ("X" if base[150] != "X" else "Y") + base[151:]
    other = " ".join(f"z{i:04d}" for i in range(60, 120))
    media = spark.createDataFrame(
        [(1, base.encode()), (2, base.encode()), (3, edited.encode()),
         (4, other.encode())],
        "media_id long, payload binary",
    )
    fp = {r.media_id: r.ahash for r in image_ahash(media).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 60) - 1)).count("1")

    assert fp[1] == fp[2]
    # one slice changed: at most that bit plus borderline mean flips
    # (zero when the new cell value stays on the same side of the mean)
    assert ham(fp[1], fp[3]) <= 8
    assert ham(fp[1], fp[4]) > 8


def test_components_auto_matches_iterative_on_both_paths(spark):
    """The small-graph union-find shortcut must produce byte-identical
    labels to the iterative operator — exercised on BOTH sides of the
    cutoff with the same graph."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (21, 20), (5, 99), (99, 4)],
        "doc_a long, doc_b long",
    )
    expected = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components(pairs).collect()
    }
    small = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components_auto(pairs).collect()
    }
    forced_iter = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components_auto(pairs, small_edges=0).collect()
    }
    assert small == expected == forced_iter


def test_zero_vector_never_outranks_real_neighbors(spark):
    """Cosine with the zero vector is DEFINED as 0.0 (not NaN, which
    Spark ranks above everything): a zero target must sort below any
    positively-correlated neighbor, and a >= threshold near-dup
    filter must not emit it."""
    rows = [(0, [1.0] * 4), (1, [1.0, 1.0, 1.0, 0.9]), (2, [0.0] * 4)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    top = similarity.brute_force_topk(qs, emb, k=3).collect()
    ranked = sorted(top, key=lambda r: r.rank)
    assert [r.vec_id for r in ranked] == [0, 1, 2]
    assert ranked[-1].cos == 0.0  # the zero vector, defined not NaN


def test_repeated_ngram_coverage_interval_union(spark):
    """Lee-et-al span audit: exact copies reach coverage 1.0; a
    WITHIN-doc repeat is flagged too (the suffix-array criterion
    counts occurrences, not documents); overlapping flagged spans
    are union-counted, never double-counted; unique docs drop out."""
    from trello_github_etl_spark.operators import dedup

    w = lambda *xs: " ".join(xs)  # noqa: E731
    phrase = w(*(f"p{i}" for i in range(8)))  # one exact 8-gram
    docs = spark.createDataFrame(
        [
            # 1 & 2: byte-identical 10-token docs -> every position
            # flagged, overlapping spans union to exactly n_tokens
            (1, phrase + " tail1 tail2"),
            (2, phrase + " tail1 tail2"),
            # 3: the phrase twice INSIDE one doc, separated by one
            # token: flagged starts {0, 9}, union = 8 + 8 = 16 of 17
            (3, phrase + " sep " + phrase),
            # 4: unique content, no repeated 8-gram anywhere
            (4, w(*(f"u{i}" for i in range(12)))),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r for r in dedup.repeated_ngram_coverage(docs).collect()
    }
    assert set(rows) == {1, 2, 3}
    for d in (1, 2):
        assert rows[d].n_tokens == 10
        assert rows[d].n_flagged == 3  # starts 0,1,2 all flagged
        assert rows[d].covered == 10  # 8 + 1 + 1: union, not 24
        assert rows[d].coverage == 1.0
    assert rows[3].n_flagged == 2 and rows[3].covered == 16
    assert abs(rows[3].coverage - 16 / 17) < 1e-15


def test_repeated_ngram_coverage_min_count_lever(spark):
    """min_count is the df lever: at 3 a twice-occurring gram stops
    flagging (boilerplate thresholding), and NULL text drops out
    rather than crashing the tokenizer."""
    from trello_github_etl_spark.operators import dedup

    phrase = " ".join(f"q{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, phrase), (2, phrase), (3, None)],
        "doc_id long, text string",
    )
    assert dedup.repeated_ngram_coverage(docs, min_count=3).count() == 0
    got = dedup.repeated_ngram_coverage(docs, min_count=2)
    assert {r.doc_id for r in got.collect()} == {1, 2}


def test_repeated_ngram_strategies_agree(spark):
    """'grouped' (single-pass, measured 2x faster) and 'rescan' (no
    per-group buffering, the giant-boilerplate fallback) are plan
    strategies, not semantics — identical output; unknown strategies
    fail loudly."""
    import pytest

    from trello_github_etl_spark.operators import dedup

    phrase = " ".join(f"r{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, phrase + " a b"), (2, phrase + " c"), (3, "x y z")],
        "doc_id long, text string",
    )
    a = sorted(
        map(tuple, dedup.repeated_ngram_coverage(docs, strategy="grouped").collect())
    )
    b = sorted(
        map(tuple, dedup.repeated_ngram_coverage(docs, strategy="rescan").collect())
    )
    assert a == b and len(a) == 2
    with pytest.raises(ValueError, match="strategy"):
        dedup.repeated_ngram_coverage(docs, strategy="windowed")


def test_t16_vocab_tiebreak_and_oov(spark, tmp_path):
    """Top-K vocab selection breaks count ties lexicographically (17
    equal-count tokens -> the 16 smallest win), and per-source OOV is
    exact: the all-tied source loses 1/17 of its instances, a source
    of pure tail tokens is 100% OOV."""
    import os

    import __spark_entry__ as entry

    head = " ".join(f"a{i:02d}" for i in range(1, 18))  # a01..a17
    rows = [(i, head, "en", "head", len(head)) for i in range(3)]
    rows += [(100, "b1 b2 b3 b4", "en", "tail", 11)]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    out = {r.source: r for r in entry.queries()["t16_vocab_coverage"](spark, sf).collect()}
    assert out["head"].n_instances == 51 and out["head"].n_covered == 48
    assert abs(out["head"].oov_rate - 3 / 51) < 1e-15
    assert out["tail"].n_covered == 0 and out["tail"].oov_rate == 1.0


def test_samp6_epoch_cap_and_temperature(spark, tmp_path):
    """The 4-epoch cap binds exactly the sources whose sqrt-weighted
    request exceeds 4 passes of their own mass; shares sum to 1;
    effective chars never exceed the budget; the temperature exponent
    upsamples the tail (epochs decrease with source mass)."""
    import os

    import __spark_entry__ as entry

    rows = []
    did = 0
    for src, n_docs, chars in [("tiny", 2, 50), ("mid", 20, 100), ("big", 2000, 500)]:
        for _ in range(n_docs):
            rows.append((did, "x", "en", src, chars))
            did += 1
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    out = {r.source: r for r in entry.queries()["samp6_epoch_mix"](spark, sf).collect()}
    assert abs(sum(r.share for r in out.values()) - 1.0) < 1e-12
    budget_used = sum(r.effective_chars for r in out.values())
    assert budget_used <= 600_000 * (1 + 1e-12)
    for r in out.values():
        assert r.epochs <= 4.0
        assert r.saturated == (r.epochs == 4.0)
        assert abs(r.effective_chars - r.epochs * r.t_chars) < 1e-9
    masses = sorted(out.values(), key=lambda r: r.t_chars)
    epochs_by_mass = [r.epochs for r in masses]
    assert epochs_by_mass == sorted(epochs_by_mass, reverse=True)
    assert out["tiny"].saturated and not out["big"].saturated


def test_samp7_dsir_prefers_target_domain(spark, tmp_path):
    """DSIR importance: docs written in the target domain's bigram
    distribution score imp_mean > 1 and are kept; off-domain docs
    score < 1; bigram-less docs stay visible with NULL score and
    NULL keep (absent data, not a silent drop)."""
    import os

    import __spark_entry__ as entry

    tgt_text = "alpha beta gamma delta " * 10
    off_text = "omega psi chi phi " * 10
    rows = [(i, tgt_text, "en", "src0", len(tgt_text)) for i in range(10)]
    rows += [(100 + i, off_text, "en", "src9", len(off_text)) for i in range(10)]
    # an off-domain-SOURCE doc whose CONTENT matches the target:
    # importance must follow content, not source membership
    rows += [(200, tgt_text, "en", "src9", len(tgt_text))]
    rows += [(300, "solo", "en", "src9", 4)]  # 1 token -> no bigrams
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    out = {r.doc_id: r for r in entry.queries()["samp7_dsir_importance"](spark, sf).collect()}
    assert len(out) == 22
    assert all(out[i].keep and out[i].imp_mean > 1.0 for i in range(10))
    assert all(not out[100 + i].keep and out[100 + i].imp_mean < 1.0 for i in range(10))
    assert out[200].keep and out[200].imp_mean > 1.0
    assert out[300].n_bigrams == 0 and out[300].imp_mean is None and out[300].keep is None


def test_dd22_keeper_election(spark):
    """Keeper = quality argmax with doc_id tie-break: an exact-copy
    cluster keeps the smallest id; a near-copy cluster keeps the
    higher-quality member regardless of id order; every cluster
    reports n_dropped = n_members - 1."""
    from trello_github_etl_spark.operators import dedup

    base_a = "the quick brown fox jumps over the lazy dog again and again today"
    base_b = "pack my box with five dozen liquor jugs for the daily trip north"
    # same token stream as base_b (tokenizer drops punct) -> certain
    # LSH collision, but punct-heavier raw text -> lower quality
    degraded_b = base_b.replace(" ", " !! ")
    docs = spark.createDataFrame(
        [
            (1, base_a), (2, base_a), (3, base_a),  # exact cluster -> keep 1
            (10, degraded_b), (11, base_b),  # near pair: 11 wins on quality
        ],
        "doc_id long, text string",
    )
    out = {r.cluster_id: r for r in dedup.dup_cluster_keepers(docs).collect()}
    exact = next(r for r in out.values() if r.n_members == 3)
    assert exact.keeper_id == 1 and exact.n_dropped == 2
    near = next(r for r in out.values() if r.n_members == 2)
    assert near.keeper_id == 11 and near.n_dropped == 1
    assert near.keeper_quality > 0


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs_toks=st.lists(
        st.lists(st.integers(0, 5), min_size=0, max_size=24),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(2, 4),
)
def test_repeated_ngram_coverage_matches_python_model(spark, docs_toks, n):
    """Model-based: the distributed span audit must equal a plain
    O(corpus^2) Python reference — corpus-wide n-gram occurrence
    counting, per-doc interval union — on arbitrary tiny corpora
    (tiny alphabet so organic repeats are common, the regime where
    overlap unions and within-doc repeats interact)."""
    from collections import Counter

    from trello_github_etl_spark.operators import dedup

    texts = [" ".join(f"w{t}" for t in toks) for toks in docs_toks]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    counts = Counter()
    grams_per_doc = []
    for toks in docs_toks:
        gs = [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        grams_per_doc.append(gs)
        counts.update(gs)
    model = {}
    for d, gs in enumerate(grams_per_doc):
        flagged = [i for i, g in enumerate(gs) if counts[g] >= 2]
        if not flagged:
            continue
        covered_set = set()
        for i in flagged:
            covered_set.update(range(i, i + n))
        model[d] = (
            len(docs_toks[d]),
            len(flagged),
            len(covered_set),
            len(covered_set) / len(docs_toks[d]),
        )
    got = {
        r.doc_id: (r.n_tokens, r.n_flagged, r.covered, r.coverage)
        for r in dedup.repeated_ngram_coverage(df, n=n).collect()
    }
    assert got == model


def test_s15_mutuality_prunes_hub(spark):
    """Mutual-kNN with k=1 on a constructed cell: two tight twins
    pick each other; a hub vector near both picks only its single
    nearest, so hub edges die for lack of reciprocity while the twin
    edge survives. All vectors share one cell (single centroid)."""
    from trello_github_etl_spark.operators import similarity

    def vec(*xs):
        return [float(x) for x in xs] + [0.0] * (4 - len(xs))

    rows = [
        (1, vec(1.0, 0.0)),        # twin A
        (2, vec(0.999, 0.01)),     # twin B (A's and B's nearest)
        (3, vec(0.7, 0.7)),        # hub: closest to A among {A,B}? no —
    ]                              # its top-1 is A or B, but their top-1
    emb = spark.createDataFrame(   # is each other -> no mutual hub edge
        rows, "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [(0, vec(1.0, 0.5))], "cent_id long, c_vec array<double>"
    )
    edges = {
        (r.vec_a, r.vec_b)
        for r in similarity.mutual_knn_graph(emb, cents, k=1).collect()
    }
    assert edges == {(1, 2)}


def test_pipe10_manifest_detects_reorder_and_drop(spark, tmp_path):
    """The shard manifest fingerprint is ORDER-PROVING: identical on
    re-run, changed by dropping a doc — and because each contribution
    bakes in its rank, a same-shard swap of two docs' positions would
    change it too (positions enter the hash, the sum only makes the
    aggregation order-free)."""
    import os

    import __spark_entry__ as entry

    rows = [(i, "x y z", "en", "s", 5) for i in range(200)]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    q = entry.queries()["pipe10_shard_plan"]
    a = {r.shard_id: (r.n_docs, r.n_chars, r.manifest_fp) for r in q(spark, sf).collect()}
    b = {r.shard_id: (r.n_docs, r.n_chars, r.manifest_fp) for r in q(spark, sf).collect()}
    assert a == b and len(a) == 8  # deterministic re-run, all shards hit
    # drop one doc -> exactly the shards at-or-after its rank change
    sf2 = str(tmp_path / "sf2")
    os.makedirs(sf2)
    spark.createDataFrame(
        rows[:-1], "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(sf2, "documents.parquet"))
    c = {r.shard_id: (r.n_docs, r.n_chars, r.manifest_fp) for r in q(spark, sf2).collect()}
    assert c != a
    changed = [s for s in a if a[s] != c.get(s)]
    assert len(changed) == 1  # only the dropped doc's shard moved


def test_pipe10_invariant_to_input_partitioning(spark, tmp_path):
    """The shard manifest must not depend on how the input happens to
    be partitioned — repartitioned and coalesced reads of the same
    corpus produce identical fingerprints (the property that makes
    the manifest an audit tool rather than a run artifact)."""
    import os

    import __spark_entry__ as entry

    rows = [(i, "w " * (i % 9), "en", "s", 2 * (i % 9)) for i in range(150)]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    base = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    base.repartition(17).write.parquet(os.path.join(sf, "documents.parquet"))
    sf2 = str(tmp_path / "sf2")
    os.makedirs(sf2)
    base.coalesce(1).write.parquet(os.path.join(sf2, "documents.parquet"))
    q = entry.queries()["pipe10_shard_plan"]
    a = sorted(map(tuple, q(spark, sf).collect()))
    c = sorted(map(tuple, q(spark, sf2).collect()))
    assert a == c


def test_pipe10_fingerprint_is_rank_sensitive(spark):
    """The ORDER-PROVING property itself: the same doc set with two
    ranks swapped must produce a different manifest sum — i.e. the
    per-doc contribution really bakes the position in (a regression
    to h60(doc_id) alone would pass the re-run and drop tests but
    not this one). Checked on the exact engine expression."""
    from pyspark.sql import functions as F

    from trello_github_etl_spark.operators.dedup import _token_hash60

    def fp(pairs):
        df = spark.createDataFrame(pairs, "doc_id long, rank int")
        contrib = _token_hash60(
            F.concat_ws(
                ":",
                F.col("doc_id").cast("string"),
                F.col("rank").cast("string"),
            )
        )
        return df.agg(
            F.sum(contrib.cast("decimal(38,0)")).alias("fp")
        ).collect()[0].fp

    assert fp([(7, 1), (9, 2)]) != fp([(7, 2), (9, 1)])
    assert fp([(7, 1), (9, 2)]) == fp([(9, 2), (7, 1)])  # set-order free


def test_lsh_star_edges_same_components(spark):
    """lsh_candidate_edges (O(d) star edges per band group — the r7
    giant-dup-cluster fix, SCALE.md lesson 35) must yield the EXACT
    same connected components as the O(d²) pair emitter: both close
    over the band-sharing relation, the star just routes it through
    the group's min-id hub. Corpus includes a planted 12-member
    exact-dup cluster so a multi-member band group actually exists."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    clone_src = docs.filter(F.col("doc_id") % 7 == 0).limit(1)
    clones = clone_src.crossJoin(
        spark.range(1, 13).select((F.col("id") + 900000).alias("new_id"))
    ).select(F.col("new_id").alias("doc_id"), "text")
    corpus = docs.unionByName(clones)

    via_pairs = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components(
            dedup.minhash_lsh_pairs(corpus)
        ).collect()
    }
    via_star = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components(
            dedup.lsh_candidate_edges(corpus)
        ).collect()
    }
    assert via_pairs == via_star
    assert len(via_star) >= 13  # the planted cluster is in there
    # star edge count for a d-member band group is d-1 per band, and
    # the 12 clones + source share every band: strictly fewer edges
    n_pairs = dedup.minhash_lsh_pairs(corpus).count()
    n_star = dedup.lsh_candidate_edges(corpus).count()
    assert n_star < n_pairs


def test_minhash_lsh_pairs_band_df_cap(spark):
    """max_band_df (r7 skew lever): a planted 12-member dup cluster's
    band groups exceed the cap and are dropped BEFORE pair expansion;
    sub-cap pairs are untouched."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    clone_src = docs.filter(F.col("doc_id") % 7 == 0).limit(1)
    clones = clone_src.crossJoin(
        spark.range(1, 13).select((F.col("id") + 900000).alias("new_id"))
    ).select(F.col("new_id").alias("doc_id"), "text")
    corpus = docs.unionByName(clones)

    uncapped = {
        (r.doc_a, r.doc_b) for r in dedup.minhash_lsh_pairs(corpus).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(corpus, max_band_df=5).collect()
    }
    big = {p for p in uncapped if p[0] >= 900000 or p[1] >= 900000}
    assert len(big) >= 66  # C(12,2) within the clone cluster
    assert capped <= uncapped
    # every clone-cluster pair came from a 13-member band group -> gone
    assert not (capped & big)


def test_margin_alignment_demotes_hub_vectors(spark):
    """The semantic point of the margin criterion: a hub y (cosine-
    close to many xs) outranks the true partner on RAW cosine but
    loses on margin, because its own top-k neighborhood average is
    divided out (Artetxe & Schwenk 2019). Hand geometry in 2D, one
    shared cell (explicit single centroid): xs at 0/10/20/30/40
    degrees, hub y at 5 degrees, partner y at -8 degrees — for x1
    (0 deg) cos picks the hub (.9962 > .9903) while margin picks
    the partner (1.044 > 1.017)."""
    import math

    def v(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    xs = spark.createDataFrame(
        [(i, v(d)) for i, d in enumerate([0, 10, 20, 30, 40])],
        "vec_id long, embedding array<double>",
    )
    HUB, PARTNER = 100, 101
    ys = spark.createDataFrame(
        [(HUB, v(5)), (PARTNER, v(-8))],
        "vec_id long, embedding array<double>",
    )
    one_cell = spark.createDataFrame(
        [(0, [1.0, 0.0])], "cent_id int, c_vec array<double>"
    )
    out = {
        r.x_id: r
        for r in similarity.margin_alignment(
            xs, ys, centroids=one_cell, k=4
        ).collect()
    }
    from trello_github_etl_spark.operators.similarity import cosine

    brute = (
        xs.crossJoin(
            ys.select(
                F.col("vec_id").alias("y_id"),
                F.col("embedding").alias("y_vec"),
            )
        )
        .select(
            "vec_id",
            "y_id",
            cosine(F.col("embedding"), F.col("y_vec")).alias("cos"),
        )
        .collect()
    )
    x1 = {r.y_id: r.cos for r in brute if r.vec_id == 0}
    assert x1[HUB] > x1[PARTNER]  # cosine alone picks the hub
    assert out[0].y_id == PARTNER  # margin demotes it
    assert out[0].margin > 1.0


def test_margin_alignment_recall_vs_brute_force(spark):
    """Blocked-candidate recall sanity on the real corpus, SAME
    criterion both sides: the in-cell margin pick vs the brute-force
    margin pick computed over ALL cross pairs (one explicit
    all-covering cell = unblocked margin_alignment — the s1-style
    ablation). Disagreements are exactly the cell-boundary losses
    the docstring declares; the floor pins that they stay the
    exception, not the rule."""
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    xs = emb.filter(F.col("vec_id") % 2 == 0)
    ys = emb.filter(F.col("vec_id") % 2 == 1)
    blocked = {
        r.x_id: r.y_id
        for r in similarity.margin_alignment(
            xs, ys, k=4, cache_key="s16-test"
        ).collect()
    }
    # one centroid -> one cell -> candidates are the full X x Y
    # product and the neighborhood averages are the true global ones
    one_cell = spark.createDataFrame(
        [(0, [1.0] + [0.0] * 63)], "cent_id int, c_vec array<double>"
    )
    brute = {
        r.x_id: r.y_id
        for r in similarity.margin_alignment(
            xs, ys, centroids=one_cell, k=4
        ).collect()
    }
    assert set(blocked) == set(brute)  # every x aligned on both paths
    hits = sum(1 for x, y in blocked.items() if brute[x] == y)
    # this corpus is near-uniform random: global margin argmaxes are
    # barely separated, so top-1 blocked agreement is bounded by the
    # chance a weakly-preferred global pick co-locates (~1/nlist =
    # 1/23 here). Assert the cells beat chance by a wide factor
    # (measured 0.156 ≈ 3.6x chance); the HARD recall guarantee
    # lives in the planted-alignment test below, where true pairs
    # exist and co-locate by construction
    from trello_github_etl_spark.operators.similarity import auto_nlist

    chance = 1.0 / auto_nlist(500)
    assert hits / len(brute) >= 2.5 * chance


def test_margin_alignment_planted_pairs_recall_is_total(spark):
    """The bitext case the operator exists for: ys are exact
    re-embeddings of xs (perfectly aligned shared space). Identical
    vectors share an argmax cell by construction, cos(x, copy) = 1.0
    dominates every competitor's numerator — the blocked margin pick
    must recover the true alignment for EVERY x."""
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    xs = emb.filter(F.col("vec_id") % 2 == 0)
    ys = xs.select((F.col("vec_id") + 10001).alias("vec_id"), "embedding")
    out = similarity.margin_alignment(xs, ys, k=4).collect()
    assert len(out) == xs.count()
    for r in out:
        assert r.y_id == r.x_id + 10001
        # self-cosine is 1.0 up to fold rounding (dot/(n*n) can land
        # one ULP above), not exactly 1.0
        assert abs(r.cos - 1.0) < 1e-12


def test_repeated_kgram_spans_hand_geometry(spark):
    """dd33 semantics on a hand-built corpus (K=8): shifted-alignment
    detection (the case dd28's fixed tiles miss), maximal-span
    merging of overlapping AND abutting windows, within-doc repeats,
    sub-K docs contributing nothing, clean docs absent."""
    import hashlib

    from trello_github_etl_spark.operators.span_dedup import (
        KGRAM_WORDS,
        repeated_kgram_spans,
    )

    assert KGRAM_WORDS == 8  # the geometry below is built for K=8
    run12 = [f"w{i}" for i in range(12)]  # shared 12-token run
    r1 = [f"r{i}" for i in range(8)]  # within-doc repeated 8-run
    s1 = [f"s{i}" for i in range(8)]  # runs for the abutting case
    s2 = [f"t{i}" for i in range(8)]
    rows = [
        # A: run12 at offset 0, unique tail -> span [0, 12)
        (1, run12 + [f"a{i}" for i in range(5)]),
        # B: run12 at offset 3 (SHIFTED vs A) -> span [3, 15)
        (2, ["b0", "b1", "b2"] + run12 + ["b3"]),
        # C: r1 twice WITHIN one doc, gap > K -> two spans
        (3, [f"c{i}" for i in range(4)] + r1
            + [f"d{i}" for i in range(4)] + r1),
        # D: shorter than K -> no postings at all
        (4, ["e0", "e1", "e2"]),
        # E: unique throughout -> absent from the output
        (5, [f"u{i}" for i in range(20)]),
        # F: s1 then s2 back-to-back; marked windows at pos 2 and 10
        #    abut exactly (10 == 2 + K) -> ONE merged span [2, 18)
        (6, ["g0", "g1"] + s1 + s2 + ["g2"]),
        (7, ["h0"] + s1 + ["h1", "h2"]),  # donor for s1
        (8, ["j0", "j1"] + s2),  # donor for s2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, _tk array<string>")
    got = {
        r["doc_id"]: r.asDict()
        for r in repeated_kgram_spans(docs).collect()
    }

    def fp(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    assert set(got) == {1, 2, 3, 6, 7, 8}
    assert got[1] == dict(doc_id=1, n_marked=5, n_spans=1,
                          dup_tokens=12, span_fp=fp("0:12"))
    assert got[2] == dict(doc_id=2, n_marked=5, n_spans=1,
                          dup_tokens=12, span_fp=fp("3:15"))
    assert got[3] == dict(doc_id=3, n_marked=2, n_spans=2,
                          dup_tokens=16, span_fp=fp("4:12;16:24"))
    assert got[6] == dict(doc_id=6, n_marked=2, n_spans=1,
                          dup_tokens=16, span_fp=fp("2:18"))
    assert got[7]["span_fp"] == fp("1:9")
    assert got[8]["span_fp"] == fp("2:10")


def test_repeated_kgram_spans_catches_shift_dd28_tiles_miss(spark):
    """The raison d'etre vs dd28: an 8-word run duplicated at offsets
    0 and 3 shares NO stride-8 tile, so tile-based span dedup sees
    nothing, while the sliding posting list marks both."""
    from trello_github_etl_spark.operators.span_dedup import (
        repeated_kgram_spans,
        span_dedup,
    )

    run = [f"w{i}" for i in range(8)]
    docs = spark.createDataFrame(
        [
            (1, run + [f"a{i}" for i in range(8)]),
            (2, ["b0", "b1", "b2"] + run + [f"c{i}" for i in range(5)]),
        ],
        "doc_id long, _tk array<string>",
    )
    tiles = {r["doc_id"]: r["n_dropped"] for r in span_dedup(docs).collect()}
    assert tiles == {1: 0, 2: 0}  # tile dedup: blind to the shift
    spans = {r["doc_id"]: r["dup_tokens"]
             for r in repeated_kgram_spans(docs).collect()}
    assert spans == {1: 8, 2: 8}  # sliding k-grams: both marked


def test_hard_negative_mining_excludes_same_label(spark):
    """Hand geometry: a tight cluster whose nearest neighbors share
    the anchor's label must NOT appear as negatives; the mined
    negative is the nearest DIFFERENT-label vector, even though it
    is farther than every same-label neighbor."""
    # one cell (nlist=1 via explicit centroid at the origin-ish
    # direction) so cell blocking cannot hide the semantics
    rows = [
        # label-0 cluster hugging +x
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.999, 0.01, 0.0, 0.0], 0),
        (3, [0.998, 0.02, 0.0, 0.0], 0),
        # label-1 vector, close-ish to the cluster: THE hard negative
        (4, [0.9, 0.3, 0.0, 0.0], 1),
        # label-1 vector, far away
        (5, [0.0, 0.0, 1.0, 0.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])], "cent_id int, c_vec array<float>"
    )
    got = similarity.hard_negative_mining(emb, centroids=cents, k=2)
    per = {}
    for r in got.collect():
        per.setdefault(r["anchor_id"], []).append(
            (r["rk"], r["neg_id"], r["neg_label"])
        )
    # anchor 1's same-label neighbors 2,3 are cosine-closer than 4,
    # but negatives must be label!=0: top negative is 4, then 5
    assert sorted(per[1]) == [(1, 4, 1), (2, 5, 1)]
    # anchor 4 (label 1): negatives are the label-0 cluster, nearest
    # first (vec 3 has the largest cosine to 4, then 2)
    assert [n for _, n, _ in sorted(per[4])] == [3, 2]
    # no row anywhere pairs equal labels
    assert all(
        r["anchor_label"] != r["neg_label"] for r in got.collect()
    )


def test_hard_negative_mining_k_cap_and_determinism(spark):
    emb = spark.createDataFrame(
        [(i, [1.0, float(i) / 100.0, 0.0, 0.0], i % 2) for i in range(10)],
        "vec_id long, embedding array<float>, label int",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])], "cent_id int, c_vec array<float>"
    )
    a = similarity.hard_negative_mining(emb, centroids=cents, k=3).collect()
    b = similarity.hard_negative_mining(emb, centroids=cents, k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per = {}
    for r in a:
        per.setdefault(r["anchor_id"], []).append(r["rk"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 3
               for v in per.values())
    assert len(per) == 10  # every anchor has cross-label candidates


def test_cross_source_overlap_matrix_semantics(spark):
    """dd34's pair math on a hand corpus: a fingerprint spanning
    three sources yields all three pairs; whitespace variants share
    a fingerprint; a within-source dup never creates a self-pair;
    jaccard uses distinct-fingerprint counts."""
    from trello_github_etl_spark.queries.llm_q import (
        dd34_cross_source_overlap,  # noqa: F401 (registry import)
    )
    from trello_github_etl_spark.operators import textstats

    from trello_github_etl_spark.operators.gen import exploded  # noqa: F401

    rows = [
        (1, "shared text one", "a"),
        (2, "Shared   TEXT one", "b"),      # same canonical fp as 1
        (3, "shared text one  ", "c"),      # and as 3 -> a,b,c triple
        (4, "only in a", "a"),
        (5, "only in a", "a"),              # within-source dup: no pair
        (6, "a and b both", "a"),
        (7, "a and b both", "b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    f = (
        docs.select(
            textstats.fingerprint(F.col("text")).alias("fp"), "source"
        ).distinct()
    )
    # replicate the registered aggregation inline over the hand corpus
    import trello_github_etl_spark.queries.llm_q as llm

    per = f.groupBy("source").agg(F.count("*").alias("n_fps"))
    sets = (
        f.groupBy("fp")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") >= 2)
    )
    srcs = F.col("srcs")
    pair_arr = F.flatten(
        F.transform(
            srcs,
            lambda x, i: F.transform(
                F.slice(srcs, i + 2, F.size(srcs)),
                lambda y: F.struct(x.alias("sa"), y.alias("sb")),
            ),
        )
    )
    from trello_github_etl_spark.operators.gen import exploded as ex

    pairs = ex(sets, [], pair_arr, "p").select("p.sa", "p.sb")
    got = {
        (r["sa"], r["sb"]): r["n"]
        for r in pairs.groupBy("sa", "sb").agg(F.count("*").alias("n")).collect()
    }
    # fp1 spans {a,b,c} -> three pairs; fp6 spans {a,b} -> one more
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}
    per_map = {r["source"]: r["n_fps"] for r in per.collect()}
    # source a: fps {shared, only-in-a, a-and-b} = 3 DISTINCT
    assert per_map == {"a": 3, "b": 2, "c": 1}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs_toks=st.lists(
        st.lists(st.integers(0, 3), min_size=0, max_size=24),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(2, 4),
)
def test_repeated_kgram_spans_matches_python_model(spark, docs_toks, k):
    """Model-based: dd33's distributed posting-list/islands plan must
    equal a plain Python reference (corpus-wide sliding k-gram
    occurrence counting, per-doc overlap-or-abut interval merging)
    on arbitrary tiny corpora — tiny alphabet so organic repeats are
    common, the regime where island merging, within-doc repeats, and
    the abutting boundary (pos == prev + k) all interact."""
    import hashlib
    from collections import Counter

    from trello_github_etl_spark.operators.span_dedup import (
        repeated_kgram_spans,
    )

    df = spark.createDataFrame(
        [(d, [f"w{t}" for t in toks]) for d, toks in enumerate(docs_toks)],
        "doc_id long, _tk array<string>",
    )
    counts = Counter()
    grams_per_doc = []
    for toks in docs_toks:
        gs = [tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        grams_per_doc.append(gs)
        counts.update(gs)
    model = {}
    for d, gs in enumerate(grams_per_doc):
        marked = [i for i, g in enumerate(gs) if counts[g] >= 2]
        if not marked:
            continue
        spans = []
        for p in marked:
            if spans and p <= spans[-1][1]:  # overlap OR abut merges
                spans[-1][1] = max(spans[-1][1], p + k)
            else:
                spans.append([p, p + k])
        fp = hashlib.md5(
            ";".join(f"{s}:{e}" for s, e in spans).encode()
        ).hexdigest()
        model[d] = (
            len(marked),
            len(spans),
            sum(e - s for s, e in spans),
            fp,
        )
    got = {
        r["doc_id"]: (r["n_marked"], r["n_spans"], r["dup_tokens"], r["span_fp"])
        for r in repeated_kgram_spans(df, k=k).collect()
    }
    assert got == model


def test_source_unigram_tvd_hand_values(spark):
    """t23's exact TVD on a hand corpus, including the
    disjoint-support path (tvd exactly 1.0) the synthetic corpus
    never exercises: a={x,x,y}, b={x,z} -> TVD 1/2; c={q,q} is
    vocabulary-disjoint from both -> TVD exactly 1.0."""
    import trello_github_etl_spark.queries.llm_q as llm

    docs = spark.createDataFrame(
        [
            (1, "x x y", "a"),
            (2, "x z", "b"),
            (3, "q q", "c"),
        ],
        "doc_id long, text string, source string",
    )
    import tempfile, os

    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {
        (r["source_a"], r["source_b"]): r
        for r in llm.t23_source_unigram_tvd(spark, d).collect()
    }
    assert out[("a", "b")]["tvd"] == 0.5
    assert out[("a", "b")]["shared_toks"] == 1
    assert out[("a", "c")]["tvd"] == 1.0
    assert out[("a", "c")]["shared_toks"] == 0
    assert out[("b", "c")]["tvd"] == 1.0
    assert out[("a", "b")]["n_a"] == 3 and out[("a", "b")]["n_b"] == 2


def test_t23_overflow_guard_fires(spark, tmp_path, monkeypatch):
    """r12 ADVICE: the r11 assert_true wrapper had identical when/
    otherwise branches, so SimplifyConditionals pruned the assertion
    and the 'ENFORCED' 1e15 bound was dead code. The reworked guard
    puts raise_error in the violating branch (branches differ →
    survives optimization); lowering the module bound onto a real
    corpus proves the raise actually fires at execution."""
    import os

    import trello_github_etl_spark.queries.llm_q as llm

    docs = spark.createDataFrame(
        [(1, "x x y", "a"), (2, "x z", "b")],
        "doc_id long, text string, source string",
    )
    d = str(tmp_path)
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    monkeypatch.setattr(llm, "_T23_N_BOUND", 2)
    with pytest.raises(Exception, match="exceeds"):
        llm.t23_source_unigram_tvd(spark, d).collect()
    # and at the real bound the same corpus passes untouched
    monkeypatch.setattr(llm, "_T23_N_BOUND", 10**15)
    assert llm.t23_source_unigram_tvd(spark, d).count() == 1


def test_connected_components_rejects_nonpositive_max_iter(spark):
    """r12 ADVICE: max_iter <= 0 skips the loop body, leaving the
    for-else's convergence check with an unbound `changed` — the
    intended RuntimeError would surface as a NameError. Entry
    validation fails loudly instead."""
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="max_iter"):
        dedup.connected_components(pairs, max_iter=0)
