"""SimHash near-dedup: 32-bit locality-sensitive document signature.

simhash bit i = majority vote of bit i over the md5-derived 32-bit hashes of
the document's shingles (2·count_set ≥ n). Near-identical shingle sets flip
few majority votes → small Hamming distance.

Pair search uses 4 byte-bands: any pair with Hamming distance ≤ 3 shares at
least one identical byte (pigeonhole: 3 flipped bits touch ≤ 3 of the 4
bytes) → banded search has GUARANTEED 100% recall at ham ≤ 3, then exact
bit_count(xor) verification. All integer ops — oracle-exact by construction.

The 32 per-bit majority counters are unrolled Catalyst expressions (no UDF);
one pass over the exploded shingle hashes computes all 32 via sum(CASE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hpmr_spark.dedup.shingles import shingle_sets
from hpmr_spark.functions.hashing import M32, hash60, sql_hash60

BITS = 32
HAM_MAX = 3


def simhash_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash BIGINT): one explode + one grouped agg."""
    sh = shingle_sets(docs)
    hashed = sh.select("doc_id", F.explode("sh").alias("shingle")).select(
        "doc_id", (hash60(F.col("shingle")) % F.lit(M32)).alias("h")
    )
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum((F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)))).alias(f"c_{i}")
        for i in range(BITS)
    ]
    counts = hashed.groupBy("doc_id").agg(*aggs)
    sim = None
    for i in range(BITS):
        bit = F.when(F.lit(2) * F.col(f"c_{i}") >= F.col("n"), F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        sim = bit if sim is None else sim + bit
    return counts.select("doc_id", sim.cast("long").alias("simhash"))


def sql_simhash_cte() -> str:
    """DuckDB twin: same shingles, same hash, same unrolled majority vote."""
    h_expr = f"({sql_hash60('x')} % {M32})"
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(hs, v -> (v >> {i}) & 1 = 1)) >= len(hs) "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(BITS)
    )
    return f"""
  hashed AS (
    SELECT doc_id, list_transform(sh, x -> {h_expr}) AS hs FROM shingled),
  simhashed AS (
    SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash FROM hashed)
"""


def simhash_near_pairs(docs: DataFrame, ham_max: int = HAM_MAX) -> DataFrame:
    """Pairs with Hamming(simhash_a, simhash_b) ≤ ham_max via byte banding.

    ham_max must stay ≤ 3 for the 4-band pigeonhole recall guarantee."""
    sim = simhash_docs(docs)
    bands = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_idx"),
                        F.shiftright(F.col("simhash"), bi * 8).bitwiseAND(F.lit(255)).alias(
                            "band_key"
                        ),
                    )
                    for bi in range(4)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_idx", "band.band_key")
    a, b = bands.alias("a"), bands.alias("b")
    # corpus-scale band self-join: force sort-merge (round-7 probe class)
    return (
        a.hint("merge").join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("long").alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= ham_max)
    )
