"""Pin the LN/EXP cross-engine parity commitment (see
operators/lm_scale_queries.py and ir_stats_queries.py): floor(f(x)*scale)
must be bit-identical across Spark (JVM Math.log/exp), DuckDB, and CPython
on this platform. BM25, entropy, perplexity, Zipf, softmax-mixture, and ES
sampling all rest on it — if a platform/libm change ever breaks it, this
test fails before any oracle flakes."""

import math

import duckdb


def test_ln_exp_floor_parity(spark):
    n = 50000
    rows = spark.sql(
        f"""
        SELECT id,
               CAST(FLOOR(LN(CAST(id AS DOUBLE)) * 1e6) AS BIGINT) AS l,
               CAST(FLOOR(LN(CAST(id AS DOUBLE) / 97.0) * 1e6) AS BIGINT) AS lr,
               CAST(FLOOR(EXP(CAST(id AS DOUBLE) / 10000.0) * 1e6) AS BIGINT) AS e
        FROM range(1, {n + 1})
        """
    ).collect()
    con = duckdb.connect()
    duck = con.execute(
        f"""
        SELECT CAST(FLOOR(LN(CAST(i AS DOUBLE)) * 1e6) AS BIGINT),
               CAST(FLOOR(LN(CAST(i AS DOUBLE) / 97.0) * 1e6) AS BIGINT),
               CAST(FLOOR(EXP(CAST(i AS DOUBLE) / 10000.0) * 1e6) AS BIGINT)
        FROM generate_series(1, {n}) t(i) ORDER BY i
        """
    ).fetchall()
    for r, (dl, dlr, de) in zip(sorted(rows, key=lambda r: r.id), duck):
        i = r.id
        assert r.l == dl == math.floor(math.log(float(i)) * 1e6), i
        assert r.lr == dlr == math.floor(math.log(float(i) / 97.0) * 1e6), i
        assert r.e == de == math.floor(math.exp(float(i) / 10000.0) * 1e6), i
