"""Round-12 second sitting, wave 8: freshness_decay_weights — exponential
recency-decay sampling weights (the freshness term of data-mixing /
news-corpus recipes, and the decayed-count stream summary of Cormode et
al. 2009): every event gets weight 2^(−age/half_life) relative to the
corpus frontier max(ts), with a committed 7-day half-life; per event_type
the decayed mass vs raw count gives the "effective freshness" fraction.

Disciplines: timestamps to exact integer MICROS first (unix_micros after
the NTZ cast Spark-side ≡ DuckDB epoch_us — the CLAUDE.md µs-exact
rule); the weight is the pinned EXP/LN commitment evaluated with
identical expression text and floored to integer nanos PER EVENT before
any sum; the frontier rides a 1-row broadcast (no build-time collect);
the final fraction is an int128 cross-multiplication (decayed-nano sums
reach ~1e13, ×1e6 exceeds int64).

Scale: one fact agg + a 1-row frontier join — linear, no windows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register
from hpmr_spark.sources.tables import load_events

_FRESH_HALFLIFE_US = 7 * 86400 * 1_000_000  # 7 days, committed

_W_TEXT = (
    "CAST(FLOOR(exp(0.0e0 - ln(2.0e0)"
    " * (CAST(age_us AS DOUBLE) / {hl}.0e0))"
    " * 1000000000.0e0) AS BIGINT)"
).format(hl=_FRESH_HALFLIFE_US)

_FRESH_ORACLE = f"""
    WITH fr AS (SELECT MAX(epoch_us(ts)) AS mx FROM events),
    w AS (
      SELECT event_type, mx - epoch_us(ts) AS age_us
      FROM events, fr
    ),
    d AS (
      SELECT event_type, {_W_TEXT} AS w_nano FROM w
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(w_nano) AS BIGINT) AS decayed_mass_nano,
           CAST(CAST(SUM(w_nano) AS HUGEINT) * 1000000
             // (CAST(COUNT(*) AS HUGEINT) * 1000000000)
             AS BIGINT) AS freshness_ppm
    FROM d GROUP BY event_type
"""


@register("freshness_decay_weights", _FRESH_ORACLE)
def freshness_decay_weights(spark, sf_dir):
    """Exponential freshness-decay weights per event_type — see module
    docstring. freshness_ppm = decayed mass / raw count: 1e6 means
    everything is at the frontier, small values mean the type's mass is
    stale relative to the committed 7-day half-life."""
    e = load_events(spark, sf_dir)
    fr = e.agg(
        F.expr("MAX(unix_micros(CAST(ts AS TIMESTAMP)))").alias("mx")
    )
    w = e.crossJoin(F.broadcast(fr)).select(
        "event_type",
        F.expr("mx - unix_micros(CAST(ts AS TIMESTAMP))").alias("age_us"),
    )
    d = w.select("event_type", F.expr(_W_TEXT).alias("w_nano"))
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("w_nano").cast("long").alias("decayed_mass_nano"),
        F.expr(
            "CAST(CAST(SUM(w_nano) AS DECIMAL(38,0)) * 1000000"
            " div (CAST(COUNT(1) AS DECIMAL(38,0)) * 1000000000)"
            " AS BIGINT)"
        ).alias("freshness_ppm"),
    )
