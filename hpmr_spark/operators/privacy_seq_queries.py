"""Privacy + sequence-mining batch (round 4): differentially-private
aggregate release with DETERMINISTIC seeded Laplace noise, a k-anonymity
audit of quasi-identifier groups, and frequent ordered event-type
trigrams (the sequence-mining step past pairwise co-occurrence).

The DP mechanism is the repo's strongest demonstration of the committed-
hash + LN-parity discipline: the Laplace inverse-CDF noise is a pure
function of an md5-derived uniform, so both engines release the IDENTICAL
noised value — reproducible privacy, no RNG divergence.

Reference parity: extends the engine surface beyond the reference's
kv kernel (/root/reference/src/hpmr.h:1-10) along the analytics axis
the brief makes first-class; every aggregation follows the DistMap
combine-on-insert ≡ map-side partial agg mapping
(/root/reference/src/bare_map.h:55-57).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.hashing import hash60, sql_hash60
from hpmr_spark.sources.tables import load_events

# ---------------------------------------------------------------------------
# Differentially-private count release (epsilon = 1, deterministic seed).
# ---------------------------------------------------------------------------
@register(
    "dp_noised_segment_counts",
    f"""
    WITH g AS (
      SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n_true
      FROM customer GROUP BY c_mktsegment
    ),
    u AS (
      SELECT segment, n_true,
             CAST({sql_hash60("'dp:' || segment")} % 1000000000 AS BIGINT)
               AS u_e9
      FROM g
    )
    SELECT segment, n_true,
           CAST(CASE WHEN 2 * u_e9 + 1 >= 1000000000 THEN 1 ELSE -1 END
                * CAST(FLOOR(0 - LN(CAST(1000000000 - ABS(2 * u_e9 + 1
                       - 1000000000) AS DOUBLE) / 1000000000.0) * 1000000)
                       AS BIGINT) AS BIGINT) AS noise_micro,
           CAST(n_true * 1000000
                + CASE WHEN 2 * u_e9 + 1 >= 1000000000 THEN 1 ELSE -1 END
                * CAST(FLOOR(0 - LN(CAST(1000000000 - ABS(2 * u_e9 + 1
                       - 1000000000) AS DOUBLE) / 1000000000.0) * 1000000)
                       AS BIGINT) AS BIGINT) AS released_micro
    FROM u
    """,
)
def dp_noised_segment_counts(spark, sf_dir):
    """ε=1 Laplace-mechanism count release per segment with DETERMINISTIC
    seeded noise: u = (md5-hash60('dp:'||segment) mod 10⁹ + ½)/10⁹ is a
    committed uniform, and the inverse-CDF Laplace draw
    −sign(u−½)·ln(1−2|u−½|) is computed with an EXACT integer numerator
    (10⁹ − |2·u_e9+1 − 10⁹|) under the LN-parity commitment, floored to
    integer micro-units — both engines release the bit-identical noised
    count (reproducible DP: the privacy unit test and the release job
    can never disagree). n_true is emitted alongside for the oracle/audit;
    a production release would drop it. Scale 1/ε = 1 count; released =
    n_true·10⁶ + noise_micro."""
    c = _t(spark, sf_dir, "customer")
    g = c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    u = g.select(
        "segment",
        "n_true",
        (hash60(F.concat(F.lit("dp:"), F.col("segment"))) % 1_000_000_000)
        .cast("long")
        .alias("u_e9"),
    )
    sign = "CASE WHEN 2 * u_e9 + 1 >= 1000000000 THEN 1 ELSE -1 END"
    mag = (
        "CAST(FLOOR(0 - LN(CAST(1000000000 - ABS(2 * u_e9 + 1 - 1000000000)"
        " AS DOUBLE) / 1000000000.0) * 1000000) AS BIGINT)"
    )
    return u.select(
        "segment",
        "n_true",
        F.expr(f"CAST({sign} * {mag} AS BIGINT)").alias("noise_micro"),
        F.expr(f"CAST(n_true * 1000000 + {sign} * {mag} AS BIGINT)").alias(
            "released_micro"
        ),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers.
# ---------------------------------------------------------------------------
@register(
    "k_anonymity_audit",
    """
    WITH q AS (
      SELECT c_nationkey AS nation, c_mktsegment AS segment,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) // 100000 AS bal_bucket,
             CAST(COUNT(*) AS BIGINT) AS grp_n
      FROM customer GROUP BY c_nationkey, c_mktsegment,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) // 100000
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(grp_n) AS BIGINT) AS k_min,
           CAST(SUM(CASE WHEN grp_n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_groups_below_k5,
           CAST(SUM(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS BIGINT)
             AS n_rows_at_risk
    FROM q
    """,
)
def k_anonymity_audit(spark, sf_dir):
    """k-anonymity audit of the (nation, segment, $1000-balance-bucket)
    quasi-identifier: the re-identification check run before any record
    release — group-size minimum, groups below k=5, and the row count at
    risk. Pure keyed aggregation (one shuffle of the quasi-id tuple); the
    bucket is TRUNCATING integer division of cents (Spark `div` ≡ DuckDB
    `//` truncate toward zero, identical on both engines INCLUDING the
    ~8% negative c_acctbal rows — small negatives share bucket 0 with
    small positives by design; do NOT "fix" one side to true floor, that
    breaks cross-engine parity) so the grouping is partition- and
    engine-invariant. Pairs with dp_noised_segment_counts:
    suppress-or-noise is decided by exactly this report."""
    c = _t(spark, sf_dir, "customer")
    q = c.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.expr(
            "CAST(ROUND(c_acctbal * 100) AS BIGINT) div 100000"
        ).alias("bal_bucket"),
    ).agg(F.count(F.lit(1)).cast("long").alias("grp_n"))
    return q.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("grp_n").cast("long").alias("k_min"),
        F.sum(F.when(F.col("grp_n") < 5, 1).otherwise(0))
        .cast("long")
        .alias("n_groups_below_k5"),
        F.sum(F.when(F.col("grp_n") < 5, F.col("grp_n")).otherwise(0))
        .cast("long")
        .alias("n_rows_at_risk"),
    )


# ---------------------------------------------------------------------------
# Frequent ordered event-type trigrams (sequence mining past pairs).
# ---------------------------------------------------------------------------
@register(
    "seq_trigram_mining",
    """
    WITH e AS (
      SELECT user_id, event_type,
             CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id
      FROM events
    ),
    w AS (
      SELECT user_id, event_type AS t1,
             lead(event_type, 1) OVER
               (PARTITION BY user_id ORDER BY ts_us, event_id) AS t2,
             lead(event_type, 2) OVER
               (PARTITION BY user_id ORDER BY ts_us, event_id) AS t3
      FROM e
    ),
    tri AS (
      SELECT t1, t2, t3,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM w WHERE t2 IS NOT NULL AND t3 IS NOT NULL
      GROUP BY t1, t2, t3
    ),
    tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS total_users
            FROM e)
    SELECT t1, t2, t3, n_occurrences, n_users,
           CAST(n_users * 1000000 // tot.total_users AS BIGINT)
             AS user_support_ppm
    FROM tri, tot
    ORDER BY n_occurrences DESC, t1, t2, t3 LIMIT 10
    """,
)
def seq_trigram_mining(spark, sf_dir):
    """Frequent ORDERED event-type trigrams per user timeline — the
    sequence-mining step past pairwise co-occurrence (behavior motifs like
    view→click→purchase emerge with their user support). Adjacent triples
    via lead() over the user-partitioned (ts, event_id) order (parallel
    across users — never a global window), grouped exactly, user support
    in integer ppm, top-10 with a full lexicographic tie-break
    (TakeOrdered — no global sort)."""
    ev = load_events(spark, sf_dir)
    e = ev.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
    )
    w_ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w = e.select(
        "user_id",
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w_ord).alias("t2"),
        F.lead("event_type", 2).over(w_ord).alias("t3"),
    )
    tri = (
        w.where(F.col("t2").isNotNull() & F.col("t3").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )
    tot = e.agg(F.countDistinct("user_id").cast("long").alias("total_users"))
    return (
        tri.crossJoin(F.broadcast(tot))
        .select(
            "t1",
            "t2",
            "t3",
            "n_occurrences",
            "n_users",
            F.expr("CAST(n_users * 1000000 div total_users AS BIGINT)").alias(
                "user_support_ppm"
            ),
        )
        .orderBy(F.col("n_occurrences").desc(), "t1", "t2", "t3")
        .limit(10)
    )
