"""Multimodal plumbing queries: binary payloads through mapInPandas.

The media table is constructed from `documents` (payload = utf-8 text
bytes, media_type cycles image/audio/video). The fake codec derives
everything from md5(payload), which DuckDB reproduces with md5(text) —
so even the pandas-UDF path gets a full value-level oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trello_github_etl_spark.io import load_table
from trello_github_etl_spark.operators.multimodal import (
    decode_media,
    frame_sample_plan,
    resize_spec,
)
from trello_github_etl_spark.operators import dedup as _dedup_mod
from trello_github_etl_spark.queries.llm_q import (
    SQL_AUGMENTED_DOCS,
    _sql_hamming_tail,
)
from trello_github_etl_spark.registry import query

SQL_MEDIA = """
    SELECT
      doc_id AS media_id,
      CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
        AS media_type,
      text,
      md5(text) AS h
    FROM documents
"""

SQL_FEATURES = f"""
    WITH media AS ({SQL_MEDIA})
    SELECT
      media_id,
      media_type,
      CAST(TRY_CAST('0x' || substr(h, 1, 4) AS UBIGINT) % 1920 + 1 AS BIGINT) AS width,
      CAST(TRY_CAST('0x' || substr(h, 5, 4) AS UBIGINT) % 1080 + 1 AS BIGINT) AS height,
      CAST(CASE WHEN media_type = 'video'
                THEN TRY_CAST('0x' || substr(h, 9, 4) AS UBIGINT) % 240 + 1
                ELSE 1 END AS BIGINT) AS n_frames,
      CAST(TRY_CAST('0x' || substr(h, 13, 8) AS UBIGINT) AS DOUBLE) / 4294967295.0 AS feat_0,
      CAST(TRY_CAST('0x' || substr(h, 21, 8) AS UBIGINT) AS DOUBLE) / 4294967295.0 AS feat_1
    FROM media
"""


def _media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deliberately NOT ensure_parallelism: fanning a small mapInPandas
    # input across all cores pays one Python worker spin-up per
    # partition, which dwarfs the compute at test scale (1.8s -> 11.7s)
    docs = load_table(spark, sf_dir, "documents")
    mtype = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mtype.alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.col("source").alias("meta_source"),
    )


@query("mm1_decode_features", oracle=SQL_FEATURES)
def mm1_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode (mapInPandas) with the deterministic codec."""
    return decode_media(_media_table(spark, sf_dir))


@query(
    "mm2_resize_spec",
    oracle=f"""
    WITH feats AS ({SQL_FEATURES})
    SELECT media_id, media_type, width, height,
      CASE WHEN width >= height THEN 256
           ELSE CAST(FLOOR(width * 256 / height) AS BIGINT) END AS target_w,
      CASE WHEN width >= height THEN CAST(FLOOR(height * 256 / width) AS BIGINT)
           ELSE 256 END AS target_h
    FROM feats
    """,
)
def mm2_resize_spec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning over decoded dimensions."""
    return resize_spec(decode_media(_media_table(spark, sf_dir)))


@query(
    "mm3_frame_samples",
    oracle=f"""
    WITH feats AS ({SQL_FEATURES})
    SELECT media_id, unnest(range(0, n_frames, 30)) AS frame_idx
    FROM feats WHERE media_type = 'video'
    """,
)
def mm3_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-30th-frame sampling plan for video payloads."""
    return frame_sample_plan(decode_media(_media_table(spark, sf_dir)))


SQL_AUDIO_SEGS = f"""
    WITH meta AS (
      SELECT
        media_id,
        text,
        8000 + CAST(TRY_CAST('0x' || substr(h, 1, 4) AS UBIGINT) % 5 AS BIGINT)
          * 8000 AS sample_rate,
        CAST(TRY_CAST('0x' || substr(h, 5, 6) AS UBIGINT) % 480000 + 16000
          AS BIGINT) AS n_samples
      FROM ({SQL_MEDIA}) WHERE media_type = 'audio'
    ),
    segs AS (
      SELECT
        media_id, text, sample_rate, n_samples,
        UNNEST(generate_series(0, (n_samples - 1) // 80000))
          AS seg_idx
      FROM meta
    )
    SELECT
      media_id,
      sample_rate,
      n_samples,
      seg_idx,
      seg_idx * 80000 AS start_sample,
      LEAST(seg_idx * 80000 + 160000, n_samples) AS end_sample,
      CAST(TRY_CAST('0x' || substr(md5(text || ':' || CAST(seg_idx AS VARCHAR)),
                                   1, 8) AS UBIGINT) AS DOUBLE)
        / 4294967295.0 AS seg_feat
    FROM segs
    ORDER BY media_id, seg_idx
"""


@query("mm4_audio_segments", oracle=SQL_AUDIO_SEGS)
def mm4_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio → fixed windows (160k samples, 80k hop): the 1→N
    mapInPandas expansion, narrow per task; see
    operators/multimodal.py:segment_audio."""
    from trello_github_etl_spark.operators.multimodal import segment_audio

    return segment_audio(_media_table(spark, sf_dir)).orderBy(
        "media_id", "seg_idx"
    )


# cells == fingerprint bits == pairing signature width: all three
# must agree, so the oracle derives from the operator constants
from trello_github_etl_spark.operators.multimodal import AHASH_CELLS as AHASH

if AHASH != _dedup_mod.HAMMING_SIG_BITS:  # not assert: survives python -O
    raise RuntimeError(
        "aHash cell count must equal the Hamming pairing signature "
        f"width (AHASH_CELLS={AHASH}, "
        f"HAMMING_SIG_BITS={_dedup_mod.HAMMING_SIG_BITS})"
    )


def _ahash_cell_sql(b: int) -> str:
    lo = f"({b} * length(text)) // {AHASH}"
    hi = f"({b + 1} * length(text)) // {AHASH}"
    return (
        f"CAST(TRY_CAST('0x' || substr(md5(substr(text, {lo} + 1, {hi} - {lo})),"
        f" 1, 8) AS UBIGINT) AS BIGINT)"
    )


_AHASH_CELLS_SQL = ", ".join(_ahash_cell_sql(b) for b in range(AHASH))
_AHASH_FP_SQL = " + ".join(
    f"(CASE WHEN c[{b + 1}] * {AHASH} > tot THEN CAST({2 ** b} AS BIGINT)"
    " ELSE 0 END)"
    for b in range(AHASH)
)


@query(
    "mm5_image_ahash_pairs",
    oracle=f"""
    WITH docs AS ({SQL_AUGMENTED_DOCS}),
    cells AS (
      SELECT doc_id AS media_id, [{_AHASH_CELLS_SQL}] AS c FROM docs
    ),
    fps AS (
      SELECT media_id, list_sum(c) AS tot, c FROM cells
    ),
    sigs AS (
      SELECT media_id, {_AHASH_FP_SQL} AS ahash FROM fps
    )
    {_sql_hamming_tail("sigs", "media_id", "ahash")}
    """,
)
def mm5_image_ahash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate image pairs: aHash fingerprints from
    the locality-sensitive fake decode (multimodal.image_ahash — cell
    brightness per payload slice, brighter-than-mean bits) paired by
    dedup.hamming_pairs (4x15-bit bands, popcount <= 3, band-df cap
    20 per SCALE.md lesson 27).  The image-dedup stage of a
    multimodal pipeline: exact payload copies collide on every band
    (Hamming 0), and LENGTH-PRESERVING edits move only the touched
    slices (property-tested).  Honest divergence from a real pixel
    decode: a length-CHANGING edit shifts every slice boundary and
    scrambles the grid (the +2*DOC_SHIFT suffix near-copies do NOT pair),
    whereas real aHash average-pools a resized pixel grid and
    absorbs such shifts — the pairing contract downstream of the
    decode is what this query exercises.  Corpus = the augmented
    doc payloads as an image store."""
    from trello_github_etl_spark.operators import dedup as _dedup
    from trello_github_etl_spark.operators.multimodal import image_ahash
    from trello_github_etl_spark.queries.llm_q import _augmented_docs

    # payload stays a STRING here: image_ahash slices str payloads by
    # characters and hashes the utf-8 encoding of each slice, which is
    # exactly DuckDB's md5(substr(text, ...)) — byte-slicing an
    # encoded utf-8 payload would silently break oracle parity on the
    # first multibyte char (r4 code review).
    # ensure_parallelism here but NOT in _media_table: the trade
    # documented there (worker spin-up vs compute) flips once the
    # decode is heavy.  mm1's 2-md5 decode loses to fan-out at test
    # scale; mm5's 60-md5-per-doc aHash on the scan's native
    # partitioning (6 tasks at sf1) was ~90% of its wall — 4.44 s on
    # the starved scan vs 0.94 s at 32 partitions (SCALE.md lesson
    # 39; the r8-flagged 6.1x on 10x data was exactly this).
    from trello_github_etl_spark.operators.parallel import (
        ensure_parallelism,
    )

    media = ensure_parallelism(
        _augmented_docs(spark, sf_dir).select(
            F.col("doc_id").alias("media_id"),
            F.col("text").alias("payload"),
        )
    )
    fps = image_ahash(media)
    return _dedup.hamming_pairs(
        fps,
        "ahash",
        _dedup_mod.HAMMING_SIG_BITS,
        id_col="media_id",
        max_band_df=_dedup_mod.HAMMING_BAND_DF,
    )


@query(
    "mm6_video_frame_features",
    oracle=f"""
    WITH meta AS (
      SELECT
        media_id, text,
        CAST(TRY_CAST('0x' || substr(h, 1, 4) AS UBIGINT) % 1920 + 1
          AS BIGINT) AS width,
        CAST(TRY_CAST('0x' || substr(h, 5, 4) AS UBIGINT) % 1080 + 1
          AS BIGINT) AS height,
        CAST(TRY_CAST('0x' || substr(h, 9, 4) AS UBIGINT) % 240 + 1
          AS BIGINT) AS n_frames
      FROM ({SQL_MEDIA}) WHERE media_type = 'video'
    ),
    frames AS (
      SELECT media_id, text, width, height,
             UNNEST(range(0, n_frames, 30)) AS frame_idx
      FROM meta
    )
    SELECT media_id, frame_idx, width, height,
      CAST(TRY_CAST('0x' || substr(
        md5(text || ':' || CAST(frame_idx AS VARCHAR)), 1, 8)
        AS UBIGINT) AS DOUBLE) / 4294967295.0 AS frame_feat_0,
      CAST(TRY_CAST('0x' || substr(
        md5(text || ':' || CAST(frame_idx AS VARCHAR)), 9, 8)
        AS UBIGINT) AS DOUBLE) / 4294967295.0 AS frame_feat_1
    FROM frames
    """,
)
def mm6_video_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sampled-frame video decode (VERDICT r13 #4): the decode
    stage downstream of mm3's frame-sampling plan, as a 1→N
    mapInPandas over video payloads (every 30th frame). The fake
    codec shares mm1's md5 dims/frame-count formulas, so mm1/mm3/mm6
    agree on every video's geometry; codec='real' parses a
    concatenated-P6 frame container, seeking past unsampled frames by
    header offset (tests/test_llm_operators.py plants real fixtures).
    See operators/multimodal.py:decode_video_frames."""
    from trello_github_etl_spark.operators.multimodal import (
        decode_video_frames,
    )

    return decode_video_frames(_media_table(spark, sf_dir), every_n=30)
