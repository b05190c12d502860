"""Scale probe: synthesize a corpus 20-200× bigger than sf0.1's documents
table and measure the dedup/text operators' scaling behavior — the empirical
backing for SCALE.md's claims. Not part of the driver contract; run ad hoc:

    python tools/scale_probe.py [n_docs]

Synthetic docs: ~60-word texts composed from a 40-word vocab with planted
near-dups (1% of docs get a copy with one word changed), mirroring the
testdata generator's shape.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


VOCAB = (
    "the a key order sort table scan merge part window small hash join batch "
    "stream spark dup group query row data slow filter customer line value "
    "agg column big fast vector count state shuffle disk node core plan cost"
).split()


def synth_docs(spark, n: int):
    """Deterministic synthetic corpus with ~1% planted near-dups."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(60)),
                lambda i: F.element_at(
                    vocab,
                    ((F.xxhash64(F.col("id") * 1000 + i) % len(VOCAB) + len(VOCAB)) % len(VOCAB) + 1).cast("int"),
                ),
            ),
        ).alias("text"),
    )
    dups = (
        base.where(F.col("doc_id") % 100 == 0)
        .select(
            (F.col("doc_id") + n).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        )
    )
    return base.unionByName(dups)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from hpmr_spark.engine import get_spark
    from hpmr_spark.dedup.minhash import minhash_dedup_pairs
    from hpmr_spark.dedup.exact import dedup_exact
    from hpmr_spark.functions.text import quality_score_ppm, token_count

    spark = get_spark("scale-probe")
    docs = synth_docs(spark, n).persist()
    print(f"corpus: {docs.count()} docs")

    t0 = time.time()
    n_fp = dedup_exact(docs).count()
    print(f"dedup_exact: {n_fp} groups in {time.time()-t0:.1f}s")

    t0 = time.time()
    n_tok = docs.select(
        token_count(F.col("text")).alias("t"), quality_score_ppm(F.col("text")).alias("q")
    ).agg(F.sum("t"), F.sum("q")).collect()
    print(f"text scoring: {time.time()-t0:.1f}s ({n_tok[0][0]} tokens)")

    t0 = time.time()
    pairs = minhash_dedup_pairs(docs, threshold_pct=90, bands=16, rows=2).count()
    print(f"minhash_lsh pairs: {pairs} in {time.time()-t0:.1f}s")

    spark.stop()


if __name__ == "__main__":
    main()
