"""Oracle-checked multimodal queries.

The fake decoder's metadata is pure integer arithmetic on payload bytes, so
DuckDB can replicate it exactly — the oracle checks the REAL distributed
plumbing (binary column, Arrow mapInPandas batches, explode) end to end,
with only the innermost decode call stubbed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t
from hpmr_spark.multimodal.binary_columns import (
    decode_meta,
    documents_as_binary,
    sample_frames,
)


@register(
    "multimodal_binary_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS payload_md5,
           source AS origin
    FROM documents
    """,
)
def multimodal_binary_meta(spark, sf_dir):
    """Binary payload column + typed metadata, hashed for integrity."""
    b = documents_as_binary(_t(spark, sf_dir, "documents"))
    return b.select(
        "doc_id",
        F.col("meta.byte_len").alias("byte_len"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.origin").alias("origin"),
    )


@register(
    "multimodal_decode_meta",
    """
    WITH b AS (SELECT doc_id, text, encode(text) AS payload FROM documents)
    SELECT doc_id,
           CAST(octet_length(payload) AS BIGINT) AS byte_len,
           ['raw','png','jpeg','webp'][(CASE WHEN octet_length(payload) = 0 THEN 0
                                        ELSE ascii(text) END % 4) + 1] AS format,
           CAST(16 * (octet_length(payload) % 64 + 1) AS BIGINT) AS width,
           CAST(9 * (octet_length(payload) % 64 + 1) AS BIGINT) AS height,
           CAST(octet_length(payload) // 1024 + 1 AS BIGINT) AS n_frames
    FROM b
    """,
)
def multimodal_decode_meta(spark, sf_dir):
    """Arrow-batched mapInPandas 'decode' (deterministic stub) — checks the
    full Python-UDF plumbing: batch iteration, schema, row alignment."""
    return decode_meta(documents_as_binary(_t(spark, sf_dir, "documents")))


from hpmr_spark.functions.hashing import SQL_HEX15_TO_BIGINT  # noqa: E402

_CHUNK_FP = "md5(substr(text, i * 256 + 1, 256))"
_ENERGY = SQL_HEX15_TO_BIGINT.format(h=f"substr({_CHUNK_FP}, 1, 15)")


@register(
    "multimodal_audio_features",
    f"""
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
           {_CHUNK_FP} AS chunk_fp,
           CAST({_ENERGY} % 1000000 AS BIGINT) AS energy_ppm
    FROM documents, unnest(range(length(text) // 256 + 1)) AS t(i)
    """,
)
def multimodal_audio_features(spark, sf_dir):
    """Audio-shaped pipeline: fixed windows + per-window Python feature
    extraction (mapInPandas), fully oracle-verified via md5-derived fakes."""
    from hpmr_spark.multimodal.audio_stub import audio_features

    return audio_features(_t(spark, sf_dir, "documents"))


@register(
    "multimodal_frame_sample",
    """
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS byte_len FROM documents)
    SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
           CAST(i * 1024 AS BIGINT) AS frame_offset,
           CAST(least(1024, byte_len - i * 1024) AS BIGINT) AS frame_len
    FROM b, unnest(range(byte_len // 1024 + 1)) AS t(i)
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling: explode payloads into offset windows (no byte copies)."""
    return sample_frames(documents_as_binary(_t(spark, sf_dir, "documents")), stride=1024)


@register(
    "multimodal_content_dedup",
    """
    WITH b AS (
      SELECT doc_id,
             md5(hex(encode(text))) AS content_fp,
             CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
      FROM documents
    )
    SELECT doc_id, content_fp, byte_len,
           CAST(COUNT(*) OVER (PARTITION BY content_fp) AS BIGINT)
             AS n_copies,
           CAST(MIN(doc_id) OVER (PARTITION BY content_fp) AS BIGINT)
             AS keeper_id
    FROM b
    """,
)
def multimodal_content_dedup(spark, sf_dir):
    """Binary-payload exact dedup — the first pass of any multimodal
    ingest: group identical payloads by content fingerprint, attach each
    payload's copy count and keeper (min doc_id) — drop rows where
    doc_id ≠ keeper_id to dedup. The payload is hashed via md5(hex(bytes)) because DuckDB's
    md5 takes no BLOBs (CLAUDE.md quirk) — hex() agrees byte-for-byte
    across engines, so the fingerprint does too. Only (fingerprint, 16-ish
    bytes) cross the shuffle; payload bytes never move — exactly how you
    dedup 100 TB of images."""
    from hpmr_spark.multimodal.binary_columns import documents_as_binary

    from pyspark.sql import Window

    b = documents_as_binary(_t(spark, sf_dir, "documents"))
    w = Window.partitionBy("content_fp")
    return b.select(
        "doc_id",
        F.md5(F.hex("payload")).alias("content_fp"),
        F.length("payload").cast("long").alias("byte_len"),
    ).select(
        "doc_id",
        "content_fp",
        "byte_len",
        F.count(F.lit(1)).over(w).alias("n_copies"),
        F.min("doc_id").over(w).alias("keeper_id"),
    )
