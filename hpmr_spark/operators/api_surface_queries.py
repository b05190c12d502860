"""Engine API surfaces not exercised elsewhere: Dataset observation
metrics (df.observe — SQL-native single-pass telemetry) and Spark 4's
grouped applyInArrow (pyarrow-table group processing, the zero-pandas
Arrow path).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.littables import values_df


@register(
    "observe_metrics_audit",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(COUNT(*) AS BIGINT) AS observed_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS observed_cents
    FROM orders
    """,
)
def observe_metrics_audit(spark, sf_dir):
    """The Observation API: metrics ride along INSIDE a single pass
    (df.observe attaches aggregates to the plan; they materialize with the
    action, costing zero extra scans — unlike the accumulator, they are
    SQL expressions with exact-aggregation semantics). The query emits the
    declarative count/sum next to the observed pair; the oracle pins all
    four equal. This is how a 100 TB ETL job reports row counts and
    checksums without a second pass."""
    from pyspark.sql import Observation

    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    obs = Observation("audit")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("c"),
    )
    agg = observed.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(cents).cast("long").alias("total_cents"),
    )
    row = agg.collect()[0]  # action materializes both the agg and the metrics
    got = obs.get
    return values_df(spark, 
        [
            (
                int(row.n_rows),
                int(row.total_cents),
                int(got["n"]),
                int(got["c"]),
            )
        ],
        "n_rows long, total_cents long, observed_rows long, observed_cents long",
    )


@register(
    "applyinarrow_lang_stats",
    """
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY lang
    """,
)
def applyinarrow_lang_stats(spark, sf_dir):
    """Spark 4 grouped applyInArrow: each language group arrives as ONE
    pyarrow.Table and is reduced with pyarrow.compute kernels — the
    zero-pandas Arrow path (no Series materialization, columnar all the
    way). Exact integer outputs ≡ the plain groupBy oracle. Use over
    applyInPandas when the per-group kernel is columnar (sums, minmax,
    encodings): it skips the Arrow→pandas conversion entirely."""
    docs = _t(spark, sf_dir, "documents").select("lang", "n_chars")

    def stats(table):
        import pyarrow as pa
        import pyarrow.compute as pc

        col = table.column("n_chars")
        return pa.table(
            {
                "lang": [table.column("lang")[0].as_py()],
                "n_docs": [table.num_rows],
                "sum_chars": [pc.sum(col).as_py()],
                "max_chars": [pc.max(col).as_py()],
            },
            schema=pa.schema(
                [
                    ("lang", pa.string()),
                    ("n_docs", pa.int64()),
                    ("sum_chars", pa.int64()),
                    ("max_chars", pa.int64()),
                ]
            ),
        )

    return docs.groupBy("lang").applyInArrow(
        stats, "lang string, n_docs long, sum_chars long, max_chars long"
    )


# ---------------------------------------------------------------------------
# KeyedMap ordered-analytics API (top_k / quantiles), driver-checked.
# ---------------------------------------------------------------------------
@register(
    "api_topk_revenue_customers",
    """
    WITH w AS (
      SELECT o_custkey AS key,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS value
      FROM orders GROUP BY o_custkey
    ),
    r AS (SELECT key, value,
                 row_number() OVER (ORDER BY value DESC, key) AS rank
          FROM w)
    SELECT key, value, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 10
    """,
)
def api_topk_revenue_customers(spark, sf_dir):
    """KeyedMap.top_k through the public API, oracle-checked: build the
    per-customer revenue map with the reducer surface, take the top 10 by
    value with the deterministic (value DESC, key) order. Plans as
    TakeOrderedAndProject + a bounded non-equi re-rank — the scale-safe
    form users reach by DEFAULT instead of Window.orderBy (the Reducer.avg
    guard philosophy applied to ordering)."""
    from hpmr_spark.core.keyed_map import KeyedMap
    from hpmr_spark.reducers import Reducer

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    km = KeyedMap.from_df(o, "o_custkey", "cents", reducer=Reducer.sum)
    return km.top_k(10)


@register(
    "api_quantiles_revenue_buckets",
    """
    WITH w AS (
      SELECT o_custkey AS key,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS value
      FROM orders GROUP BY o_custkey
    ),
    b AS (SELECT key, value,
                 CAST(NTILE(4) OVER (ORDER BY value, key) AS BIGINT) AS bucket
          FROM w)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MIN(value) AS BIGINT) AS lo_cents,
           CAST(MAX(value) AS BIGINT) AS hi_cents
    FROM b GROUP BY bucket
    """,
)
def api_quantiles_revenue_buckets(spark, sf_dir):
    """KeyedMap.quantiles through the public API, oracle-checked: exact
    quartile bucketing of the per-customer revenue map (two-pass bucketed
    NTILE under the hood — no single-partition window), summarized to
    quartile boundary rows."""
    from hpmr_spark.core.keyed_map import KeyedMap
    from hpmr_spark.reducers import Reducer

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    km = KeyedMap.from_df(o, "o_custkey", "cents", reducer=Reducer.sum)
    q = km.quantiles(4)
    return q.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.min("value").cast("long").alias("lo_cents"),
        F.max("value").cast("long").alias("hi_cents"),
    )
