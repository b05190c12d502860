"""Engine API surfaces not exercised elsewhere: Dataset observation
metrics (df.observe — SQL-native single-pass telemetry) and Spark 4's
grouped applyInArrow (pyarrow-table group processing, the zero-pandas
Arrow path).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register


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
    return spark.createDataFrame(
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
