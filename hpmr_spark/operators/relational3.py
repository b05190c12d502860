"""Batch 3: exact percentiles, minhash signature exposure, median-style
order statistics. Percentile interpolation: Spark's exact `percentile` and
DuckDB's `quantile_cont` both sort and linearly interpolate — on
integer-valued doubles the arithmetic is identical IEEE ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t
from hpmr_spark.dedup.shingles import SQL_SHINGLE_CTE
from hpmr_spark.functions.hashing import MINHASH_A, MINHASH_B, P32, sql_hash60


@register(
    "percentile_quantity_by_flag",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS p50_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentile_quantity_by_flag(spark, sf_dir):
    """Exact percentiles (sort-based, not approx sketch) per group."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("p50_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


N_SIG = 4  # signatures exposed for the oracle proof (full pipeline uses 32)

_SIG_SQL = ",\n           ".join(
    f"CAST(list_min(list_transform(sh, s -> ({MINHASH_A[j]} * (({sql_hash60('s')}) % {P32}) "
    f"+ {MINHASH_B[j]}) % {P32})) AS BIGINT) AS sig_{j}"
    for j in range(N_SIG)
)


@register(
    "dedup_minhash_signatures",
    f"""
    WITH {SQL_SHINGLE_CTE}
    SELECT doc_id,
           {_SIG_SQL}
    FROM shingled
    """,
)
def dedup_minhash_signatures(spark, sf_dir):
    """First 4 minhash signature components per doc, reproduced exactly in
    SQL — direct proof the minhash pipeline is engine-invariant (the pair
    query `dedup_minhash_lsh` proves the end result; this proves the
    intermediate)."""
    from hpmr_spark.dedup.minhash import minhash_signatures

    sig = minhash_signatures(_t(spark, sf_dir, "documents"), n_perm=N_SIG)
    return sig.select("doc_id", *[F.col(f"sig_{j}") for j in range(N_SIG)])
