"""URL/host canonicalization dedup (VERDICT r7 item 6) — the first key a
real pretraining-dedup user reaches for BEFORE any content hashing: two
crawls of the same page differ in scheme case, host case, a www. prefix,
an explicit default port, a trailing slash, query-parameter order, tracking
params, and fragments — none of which change the resource.

The documents table carries no URL column, so each doc gets a MESSY raw URL
synthesized deterministically and IDENTICALLY in both engines from committed
md5 integer arithmetic (the ivfpq_recall_clustered_gate discipline): the
canonical identity is decided by pid = doc_id % 97 while six independent
hash bits mangle the surface form, so every canonical group contains several
raw variants. The operator under test is the CANONICALIZER:

  1. lowercase scheme and host,
  2. strip a leading 'www.' from the host,
  3. drop explicit default ports (:80 for http, :443 for https),
  4. strip trailing '/' from the path ('' and '/' are the same resource),
  5. drop the fragment,
  6. drop utm_* tracking params, sort the remaining query params.

Spark side parses with the native `parse_url` expression (PROTOCOL / HOST /
AUTHORITY / PATH / QUERY — JVM-side, codegen-friendly); the DuckDB oracle
re-derives the same components independently with regexes and string
functions, so the row-for-row agreement checks the SPEC, not shared text.

Scale: pure per-row string expressions (no UDF, no shuffle until the final
census groupBy on the canonical key — the same hash-groupBy shape as exact
dedup). At 100 TB this is one scan + one agg, shuffle keyed on the
canonical URL hash (near-uniform: hosts are many, canonical keys more so).

Reference parity: extends the engine past the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's LLM-pipeline axis.
"""

from __future__ import annotations

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.hashing import spark_sql_hash60, sql_hash60


def _synth_raw_url(h60, s: str) -> str:
    """Raw-URL synthesis, shared template. `h60` is the engine's
    hash60-of-text builder; `s` is the doc_id-as-string cast expression.
    Emits one SQL expression producing the messy raw URL from doc_id.
    Every int-typed subexpression is wrapped in an explicit string CAST
    (`AS STRING` — valid in Spark AND a DuckDB VARCHAR alias) because
    Spark's ANSI mode does not implicitly cast numerics inside ||."""
    pid = "(doc_id % 97)"
    hid = "CAST(doc_id % 97 % 13 AS STRING)"
    r = {}
    for k, m in [(1, 4), (2, 6), (3, 2), (4, 2), (5, 3), (6, 2)]:
        salt = "'url" + str(k) + "|' || " + s
        r[k] = "(" + h60(salt) + " % " + str(m) + ")"
    sch_low = f"(CASE WHEN {pid} % 2 = 0 THEN 'http' ELSE 'https' END)"
    sch_raw = (
        f"(CASE WHEN {r[1]} % 2 = 0 THEN {sch_low} "
        f"WHEN {pid} % 2 = 0 THEN 'HTTP' ELSE 'HTTPS' END)"
    )
    host_raw = (
        f"(CASE WHEN {r[2]} >= 4 THEN 'Site' || {hid} || '.Com' "
        f"WHEN {r[2]} >= 2 THEN 'SITE' || {hid} || '.COM' "
        f"ELSE 'site' || {hid} || '.com' END)"
    )
    www = (
        f"(CASE WHEN {r[2]} % 2 = 1 THEN "
        f"(CASE WHEN {r[2]} >= 2 THEN 'WWW.' ELSE 'www.' END) ELSE '' END)"
    )
    port = (
        f"(CASE WHEN {r[3]} = 1 THEN "
        f"(CASE WHEN {pid} % 2 = 0 THEN ':80' ELSE ':443' END) ELSE '' END)"
    )
    slash = f"(CASE WHEN {r[4]} = 1 THEN '/' ELSE '' END)"
    path = (
        f"(CASE WHEN {pid} % 10 = 0 THEN {slash} "
        f"ELSE '/p/' || CAST({pid} AS STRING) || {slash} END)"
    )
    qa = f"('a=' || CAST({pid} % 7 AS STRING))"
    qb = f"('b=' || CAST({pid} % 5 AS STRING))"
    query = (
        f"(CASE WHEN {pid} % 4 = 0 THEN '' "
        f"WHEN {r[5]} = 0 THEN '?' || {qa} || '&' || {qb} "
        f"WHEN {r[5]} = 1 THEN '?' || {qb} || '&' || {qa} "
        f"ELSE '?utm_source=feed&' || {qb} || '&' || {qa} END)"
    )
    frag = (
        f"(CASE WHEN {r[6]} = 1 THEN '#sec' || CAST({pid} % 3 AS STRING) "
        f"ELSE '' END)"
    )
    return (
        f"{sch_raw} || '://' || {www} || {host_raw} || {port} || {path}"
        f" || {query} || {frag}"
    )


def _spark_raw_url() -> str:
    return _synth_raw_url(spark_sql_hash60, "CAST(doc_id AS STRING)")


def _duck_raw_url() -> str:
    return _synth_raw_url(sql_hash60, "CAST(doc_id AS STRING)")


# Canonicalization, DuckDB side: independent re-derivation with regexes
# (regexp_extract returns '' on no-match, which the CASEs treat as absent;
# array_to_string over an EMPTY filtered list is NULL in DuckDB → COALESCE).
_DUCK_CANON = """
    parts AS (
      SELECT doc_id, u,
             lower(regexp_extract(u, '^([A-Za-z]+)://', 1)) AS sch,
             regexp_extract(u, '^[A-Za-z]+://([^/?#]*)', 1) AS auth,
             regexp_extract(u, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1) AS path,
             regexp_extract(u, '\\?([^#]*)', 1) AS q
      FROM raw_urls
    ),
    canoned AS (
      SELECT doc_id, u,
        sch || '://'
        || regexp_replace(
             lower(CASE WHEN contains(auth, ':')
                        THEN split_part(auth, ':', 1) ELSE auth END),
             '^www\\.', '')
        || (CASE WHEN NOT contains(auth, ':') THEN ''
                 WHEN sch = 'http'  AND split_part(auth, ':', 2) = '80'  THEN ''
                 WHEN sch = 'https' AND split_part(auth, ':', 2) = '443' THEN ''
                 ELSE ':' || split_part(auth, ':', 2) END)
        || rtrim(path, '/')
        || (CASE WHEN COALESCE(array_to_string(list_sort(list_filter(
                   string_split(q, '&'),
                   p -> p NOT LIKE 'utm\\_%' ESCAPE '\\' AND p != '')), '&'),
                   '') = '' THEN ''
            ELSE '?' || array_to_string(list_sort(list_filter(
                   string_split(q, '&'),
                   p -> p NOT LIKE 'utm\\_%' ESCAPE '\\' AND p != '')), '&')
            END) AS canonical_url,
        regexp_replace(
             lower(CASE WHEN contains(auth, ':')
                        THEN split_part(auth, ':', 1) ELSE auth END),
             '^www\\.', '') AS host
      FROM parts
    )
"""

_URL_ORACLE = f"""
    WITH raw_urls AS MATERIALIZED (
      SELECT doc_id, {_duck_raw_url()} AS u FROM documents
    ),
    {_DUCK_CANON}
    SELECT canonical_url, host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT u) AS BIGINT) AS n_raw_variants,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
    FROM canoned
    GROUP BY canonical_url, host
"""


@register("url_canonical_dedup_groups", _URL_ORACLE)
def url_canonical_dedup_groups(spark, sf_dir):
    """Canonical-URL dup census: per canonical URL — doc count, distinct
    raw surface forms collapsed, and the kept representative (min doc_id).
    Spark parses with native parse_url; the oracle re-derives components
    with independent DuckDB regexes, so agreement verifies the committed
    canonicalization SPEC (scheme/host lowercase, www-strip, default-port
    drop, trailing-slash strip, fragment drop, utm-strip + param sort)."""
    docs = _t(spark, sf_dir, "documents")
    raw = docs.selectExpr("doc_id", f"{_spark_raw_url()} AS u")
    raw.createOrReplaceTempView("hpmr_raw_urls")
    return spark.sql("""
      WITH parts AS (
        SELECT doc_id, u,
               lower(parse_url(u, 'PROTOCOL')) AS sch,
               coalesce(parse_url(u, 'HOST'), '') AS host_raw,
               coalesce(parse_url(u, 'AUTHORITY'), '') AS auth,
               coalesce(parse_url(u, 'PATH'), '') AS path,
               coalesce(parse_url(u, 'QUERY'), '') AS q
        FROM hpmr_raw_urls
      ),
      canoned AS (
        SELECT doc_id, u,
          sch || '://'
          || regexp_replace(lower(host_raw), '^www\\\\.', '')
          || (CASE WHEN NOT contains(auth, ':') THEN ''
                   WHEN sch = 'http'
                        AND element_at(split(auth, ':'), 2) = '80' THEN ''
                   WHEN sch = 'https'
                        AND element_at(split(auth, ':'), 2) = '443' THEN ''
                   ELSE ':' || element_at(split(auth, ':'), 2) END)
          || TRIM(TRAILING '/' FROM path)
          || (CASE WHEN array_join(sort_array(filter(split(q, '&'),
                     p -> p NOT LIKE 'utm\\\\_%' AND p != '')), '&') = ''
                   THEN ''
              ELSE '?' || array_join(sort_array(filter(split(q, '&'),
                     p -> p NOT LIKE 'utm\\\\_%' AND p != '')), '&') END)
          AS canonical_url,
          regexp_replace(lower(host_raw), '^www\\\\.', '') AS host
        FROM parts
      )
      SELECT canonical_url, host,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT u) AS BIGINT) AS n_raw_variants,
             CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
      FROM canoned
      GROUP BY canonical_url, host
    """)


_HOST_ORACLE = f"""
    WITH raw_urls AS MATERIALIZED (
      SELECT doc_id, {_duck_raw_url()} AS u FROM documents
    ),
    {_DUCK_CANON}
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT canonical_url) AS BIGINT) AS n_pages,
           CAST(CAST(COUNT(*) - COUNT(DISTINCT canonical_url) AS HUGEINT)
                * 1000000 // COUNT(*) AS BIGINT) AS dup_ppm
    FROM canoned
    GROUP BY host
"""


@register("url_host_dup_profile", _HOST_ORACLE)
def url_host_dup_profile(spark, sf_dir):
    """Per-host crawl-dup profile: docs, distinct canonical pages, and the
    duplicated fraction in ppm (int128 floor division — the committed ppm
    discipline). The ranking a crawler reads to find boilerplate-heavy or
    mirror-heavy hosts before content-level dedup."""
    docs = _t(spark, sf_dir, "documents")
    raw = docs.selectExpr("doc_id", f"{_spark_raw_url()} AS u")
    raw.createOrReplaceTempView("hpmr_raw_urls_host")
    return spark.sql("""
      WITH parts AS (
        SELECT doc_id, u,
               lower(parse_url(u, 'PROTOCOL')) AS sch,
               coalesce(parse_url(u, 'HOST'), '') AS host_raw,
               coalesce(parse_url(u, 'AUTHORITY'), '') AS auth,
               coalesce(parse_url(u, 'PATH'), '') AS path,
               coalesce(parse_url(u, 'QUERY'), '') AS q
        FROM hpmr_raw_urls_host
      ),
      canoned AS (
        SELECT doc_id,
          sch || '://'
          || regexp_replace(lower(host_raw), '^www\\\\.', '')
          || (CASE WHEN NOT contains(auth, ':') THEN ''
                   WHEN sch = 'http'
                        AND element_at(split(auth, ':'), 2) = '80' THEN ''
                   WHEN sch = 'https'
                        AND element_at(split(auth, ':'), 2) = '443' THEN ''
                   ELSE ':' || element_at(split(auth, ':'), 2) END)
          || TRIM(TRAILING '/' FROM path)
          || (CASE WHEN array_join(sort_array(filter(split(q, '&'),
                     p -> p NOT LIKE 'utm\\\\_%' AND p != '')), '&') = ''
                   THEN ''
              ELSE '?' || array_join(sort_array(filter(split(q, '&'),
                     p -> p NOT LIKE 'utm\\\\_%' AND p != '')), '&') END)
          AS canonical_url,
          regexp_replace(lower(host_raw), '^www\\\\.', '') AS host
        FROM parts
      )
      SELECT host,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT canonical_url) AS BIGINT) AS n_pages,
             CAST(CAST(COUNT(*) - COUNT(DISTINCT canonical_url)
                       AS DECIMAL(38,0)) * 1000000
                  div COUNT(*) AS BIGINT) AS dup_ppm
      FROM canoned
      GROUP BY host
    """)
