"""LLM-pipeline extras: contrastive negative sampling and a BPE merge step.

Reference parity: keyed combine workloads (/root/reference/src/dist_map.h:
147-210) over derived keys (sampled pairs, char bigrams); both extend the
brief's training-data-pipeline surface.

Determinism: negatives come from the committed md5-derived hash60 (identical
on both engines) — no runtime randomness; BPE pair counts are exact BIGINT
weighted sums with fully tie-broken ranking."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t
from hpmr_spark.functions.littables import values_df
from hpmr_spark.functions.hashing import hash60, sql_hash60

N_NEG = 4

_NEG_SQL = f"""
    WITH mx AS (SELECT CAST(MAX(doc_id) AS BIGINT) AS max_id FROM documents),
    cand AS (SELECT d.doc_id AS anchor_id, j.j,
                    {sql_hash60("d.doc_id || ':' || j.j")} % (mx.max_id + 1) AS neg_id
             FROM documents d
             CROSS JOIN (SELECT unnest(range(1, {N_NEG + 1})) AS j) j
             CROSS JOIN mx)
    SELECT c.anchor_id, CAST(c.j AS BIGINT) AS j, c.neg_id
    FROM cand c JOIN documents e ON c.neg_id = e.doc_id
    WHERE c.neg_id <> c.anchor_id
"""


@register("negative_sampling_pairs", _NEG_SQL)
def negative_sampling_pairs(spark, sf_dir):
    """Deterministic contrastive negatives: each anchor doc draws K=4
    pseudo-random partner ids via the committed 60-bit hash of
    'doc_id:j' mod (max_id+1) — reproducible on any engine and any
    partitioning, unlike rand()-based sampling. Misses (ids not present)
    and self-pairs are dropped by a join back to the doc-id set; at 100 TB
    that join is a semi-join on the id column only (no payloads move), and
    the candidate generation is a pure map stage."""
    docs = _t(spark, sf_dir, "documents")
    mx = docs.agg(F.max("doc_id").alias("max_id"))
    j = spark.range(1, N_NEG + 1).select(F.col("id").alias("j"))
    cand = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(j))
        .crossJoin(F.broadcast(mx))
        .select(
            F.col("doc_id").alias("anchor_id"),
            F.col("j"),
            (
                hash60(F.concat_ws(":", F.col("doc_id"), F.col("j")))
                % (F.col("max_id") + 1)
            ).alias("neg_id"),
        )
        .where(F.col("neg_id") != F.col("anchor_id"))
    )
    ids = docs.select(F.col("doc_id").alias("neg_id"))
    return cand.join(ids, "neg_id", "left_semi").select("anchor_id", "j", "neg_id")


_BPE_SQL = """
    WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
                 FROM documents),
    w AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY token),
    pr AS (SELECT unnest(list_transform(range(length(token) - 1),
                         _ci -> substr(token, CAST(_ci + 1 AS INTEGER), 2))) AS pair,
                  n
           FROM w WHERE length(token) >= 2),
    agg AS (SELECT pair, CAST(SUM(n) AS BIGINT) AS cnt FROM pr GROUP BY pair)
    SELECT pair, cnt, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair) AS rnk
          FROM agg)
    WHERE rnk <= 10
"""


@register("bpe_merge_step", _BPE_SQL)
def bpe_merge_step(spark, sf_dir):
    """One BPE training step: adjacent character-pair counts weighted by
    word frequency, top-10 merge candidates (count desc, pair asc — fully
    tie-broken). The pair explosion runs over the POST-aggregation word
    list (vocab-bounded, not corpus-bounded) — exactly how a real BPE
    trainer loops: count words once, then iterate merges over the vocab.
    Top-10 selection is TakeOrderedAndProject (per-partition heaps); the
    re-rank window sees only the 10 selected rows."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0))
    w = (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.length("token") >= 2)
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("token") - 1),
        lambda i: F.col("token").substr(i.cast("int"), F.lit(2)),
    )
    pr = w.select(F.explode(pairs).alias("pair"), "n")
    agg = pr.groupBy("pair").agg(F.sum("n").alias("cnt"))
    from hpmr_spark.functions.ranking import bounded_rank

    top = agg.orderBy(F.col("cnt").desc(), F.col("pair")).limit(10)
    # 10-row re-rank as a broadcast non-equi join — no window at all
    return bounded_rank(top, "cnt", "pair", out="rnk").select("pair", "cnt", "rnk")


# ---------------------------------------------------------------------------
# Multi-step BPE trainer: 8 chained merges (VERDICT r5 item 7).
# ---------------------------------------------------------------------------
N_MERGES = 8


_DUCK_FOLD = """
             list_reduce(
               list_prepend('', string_split(substr({t}.tk, 2), '|')),
               (_acc, _s) -> CASE
                 WHEN length(_acc) >= length(b.l) + 1
                      AND substr(_acc, length(_acc) - length(b.l)) = '|' || b.l
                      AND _s = b.r
                 THEN _acc || b.r ELSE _acc || '|' || _s END) AS tk"""


def _bpe_cte_parts(n_merges: int) -> str:
    """Shared chained-merge CTE prefix: per step i, count adjacent symbol
    pairs of the current tokenization, pick the (cnt DESC, pair ASC)
    argmax via ROW_NUMBER (DuckDB arg_min can't take struct ordering), and
    re-tokenize with a list_reduce STRING fold — the accumulator is the
    '|'-delimited symbol string, so 'ends with |l AND next is r' is the
    exact left-to-right non-overlapping merge (a fresh merge result is
    strictly longer than l and can never re-match in the same pass;
    verified: 'aaa'+(a,a) -> |aa|a, 'abab'+(a,b) -> |ab|ab). Exposes
    b1..bN (merge rules) and t0..tN (global-vocab tokenizations)."""
    parts = [
        """
    WITH tok AS (SELECT source,
                        unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                          AS token
                 FROM documents),
    w AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok
          WHERE length(token) >= 2 GROUP BY token),
    t0 AS (SELECT n, regexp_replace(token, '(.)', '|\\1', 'g') AS tk FROM w)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(f"""
    p{i} AS (
      SELECT u.pr, t.n
      FROM t{i - 1} t, LATERAL (
        SELECT unnest(list_transform(
                 range(1, len(string_split(substr(t.tk, 2), '|'))),
                 _pi -> string_split(substr(t.tk, 2), '|')[_pi] || ' ' ||
                        string_split(substr(t.tk, 2), '|')[_pi + 1])) AS pr
      ) u
    ),
    a{i} AS (SELECT pr, CAST(SUM(n) AS BIGINT) AS cnt FROM p{i} GROUP BY pr),
    b{i} AS (
      SELECT split_part(pr, ' ', 1) AS l, split_part(pr, ' ', 2) AS r, cnt
      FROM (SELECT pr, cnt, row_number() OVER (ORDER BY cnt DESC, pr) AS rn
            FROM a{i})
      WHERE rn = 1
    ),
    t{i} AS (
      SELECT t.n,{_DUCK_FOLD.format(t='t')}
      FROM t{i - 1} t CROSS JOIN b{i} b
    )""")
    return ",".join(parts)


def _bpe_oracle(n_merges: int) -> str:
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS step, l AS lhs, r AS rhs, cnt FROM b{i}"
        for i in range(1, n_merges + 1)
    ]
    return _bpe_cte_parts(n_merges) + "\n    " + "\n    UNION ALL ".join(selects)


@register("bpe_train_8_merges", _bpe_oracle(N_MERGES))
def bpe_train_8_merges(spark, sf_dir):
    """BPE TRAINER, 8 chained merges (completes the tokenizer-training
    surface next to bpe_merge_step's single step and the Viterbi
    segmenter): per step, adjacent symbol-pair counts weighted by word
    frequency, argmax merge rule (cnt DESC, pair ASC — min of
    (-cnt, pair) structs), then every word re-tokenized by the exact
    left-to-right non-overlapping merge before the next count.

    Spark shape: the word-frequency table (vocab-bounded, not
    corpus-bounded — the real trainer loop's working set) is persisted
    once; each step's argmax is ONE bounded collect (a single row), and
    the merge is applied as a pure aggregate() string-fold expression with
    the collected literals — the tokenization column is a lazily-stacked
    expression over the persisted vocab, so no step adds a consumer or a
    shuffle beyond its own pair count. The fold accumulator is the
    '|'-delimited symbol string ('ends with |l and next is r' ⟹ append r,
    else append |s) — identical semantics to the oracle's list_reduce;
    a brute-force Python model test guards the generator
    (tests/test_tokenize2.py::test_bpe_train_matches_python_model).
    8 collects at build ⟹ plan_snapshot SKIP."""
    from pyspark import StorageLevel

    w = _bpe_vocab(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    rules = _bpe_train_rules(w, N_MERGES)
    w.unpersist()
    return values_df(
        spark, rules, "step long, lhs string, rhs string, cnt long"
    )


_SY = "split(substring(tk, 2), '\\\\|')"


def _bpe_vocab(spark, sf_dir):
    """(source, token, n) word-frequency table — the trainer's working set.
    Carries source so the apply/report query can reuse the same frame; the
    trainer's global counts are a SUM over sources of the same rows."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0))
    return (
        docs.select("source", F.explode(toks).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .where(F.length("token") >= 2)
        # plan-uniqueness dummy (CLAUDE.md cache-aliasing rule):
        # bpe_merge_step builds a canonically similar word-count frame
        .withColumn("_uq_bpe", F.lit(0))
        .drop("_uq_bpe")
    )


def _bpe_fold_expr(lhs: str, rhs: str) -> str:
    """The literal-rule merge fold (same semantics as the oracle's
    list_reduce: 'accumulator ends with |lhs and next symbol is rhs' ⟹
    append rhs, else append |symbol)."""
    return (
        f"aggregate({_SY}, '', (_acc, _s) -> CASE"
        f" WHEN length(_acc) >= {len(lhs)} + 1"
        f" AND substring(_acc, length(_acc) - {len(lhs)}) = '|{lhs}'"
        f" AND _s = '{rhs}'"
        f" THEN _acc || '{rhs}' ELSE _acc || '|' || _s END)"
    )


def _bpe_train_rules(ws, n_merges: int):
    """Run the merge-training loop over a (source, token, n) vocab frame
    (ideally persisted by the caller): n_merges bounded 1-row collects,
    each followed by a pure fold re-tokenization expression. Returns
    [(step, lhs, rhs, cnt)]."""
    t = ws.groupBy("token").agg(F.sum("n").cast("long").alias("n")).select(
        "n", F.regexp_replace("token", "(.)", r"|$1").alias("tk")
    )
    rules = []
    for step in range(1, n_merges + 1):
        pairs = t.select(
            "n",
            # sequence(1, 0) DESCENDS ([1, 0]) — a fully-merged word has one
            # symbol, so short arrays must hit the empty branch (the ADVICE
            # r5 short-doc rule; DuckDB's range(1, 1) is naturally empty)
            F.explode(
                F.expr(
                    f"CASE WHEN size({_SY}) >= 2 THEN"
                    f" transform(sequence(1, size({_SY}) - 1),"
                    f" _pi -> concat(element_at({_SY}, _pi), ' ',"
                    f" element_at({_SY}, _pi + 1)))"
                    " ELSE array() END"
                )
            ).alias("pr"),
        )
        best = (
            pairs.groupBy("pr")
            .agg(F.sum("n").cast("long").alias("cnt"))
            .agg(F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("pr"))).alias("m"))
            .select(F.col("m.pr").alias("pr"), (-F.col("m.nc")).cast("long").alias("cnt"))
            .collect()[0]
        )
        lhs, rhs = best["pr"].split(" ")
        rules.append((step, lhs, rhs, int(best["cnt"])))
        t = t.select("n", F.expr(_bpe_fold_expr(lhs, rhs)).alias("tk"))
        # r11 iterative-lineage cut (the CLAUDE.md set_batch/beam rule —
        # each step's pair-count job consumed the previous step's frame,
        # so step i re-analyzed and re-applied i stacked folds; measured
        # ~0.6 s/step stacked vs ~0.3 s/step checkpointed at sf0.1).
        # Eager localCheckpoint materializes the step-i tokenization once;
        # the trainer loop is the canonical place for a lineage cut (at
        # corpus scale the vocab frame is the trainer's bounded-per-key
        # working set and re-deriving k folds per step is O(k²) work).
        t = t.localCheckpoint(eager=True)
    return rules


def _bpe_apply_oracle(n_merges: int) -> str:
    parts = [
        _bpe_cte_parts(n_merges),
        """,
    ws AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS n FROM tok
           WHERE length(token) >= 2 GROUP BY source, token),
    s0 AS (SELECT source, n, regexp_replace(token, '(.)', '|\\1', 'g') AS tk
           FROM ws)""",
    ]
    for i in range(1, n_merges + 1):
        parts.append(f""",
    s{i} AS (
      SELECT t.source, t.n,{_DUCK_FOLD.format(t='t')}
      FROM s{i - 1} t CROSS JOIN b{i} b
    )""")
    parts.append(f"""
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_words,
           CAST(SUM(n * length(replace(substr(tk, 2), '|', ''))) AS BIGINT)
             AS n_chars,
           CAST(SUM(n * len(string_split(substr(tk, 2), '|'))) AS BIGINT)
             AS n_tokens,
           CAST(SUM(n * len(string_split(substr(tk, 2), '|'))) * 1000000
                // SUM(n * length(replace(substr(tk, 2), '|', '')))
                AS BIGINT) AS tokens_per_char_ppm
    FROM s{n_merges}
    GROUP BY source""")
    return "".join(parts)


@register("bpe_apply_compression_report", _bpe_apply_oracle(N_MERGES))
def bpe_apply_compression_report(spark, sf_dir):
    """Apply the trained BPE merges back to the corpus — the second half of
    the tokenizer-training loop (train on global counts, then measure what
    the vocabulary buys per data source): after the same 8 chained merges
    as bpe_train_8_merges, re-tokenize the per-source vocabulary and
    report words, characters, post-merge token counts, and the
    tokens-per-character ratio in exact integer ppm — the compression /
    fertility readout a tokenizer-training pipeline uses to compare
    sources (lower = the learned merges fit that source better).

    Spark shape: ONE persisted (source, token, n) vocab frame feeds both
    the training loop (global counts = a SUM over sources) and the apply
    pass; the 8 merge rules arrive as bounded 1-row collects and are
    applied as literal fold expressions — the apply side is a pure
    projection + one final agg, no joins, no windows. 8 collects at
    build ⟹ plan_snapshot SKIP."""
    from pyspark import StorageLevel

    ws = _bpe_vocab(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    rules = _bpe_train_rules(ws, N_MERGES)
    t = ws.select(
        "source", "n", F.regexp_replace("token", "(.)", r"|$1").alias("tk")
    )
    for _step, lhs, rhs, _cnt in rules:
        t = t.select("source", "n", F.expr(_bpe_fold_expr(lhs, rhs)).alias("tk"))
    out = t.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_words"),
        F.sum(
            F.col("n") * F.length(F.expr("replace(substring(tk, 2), '|', '')"))
        )
        .cast("long")
        .alias("n_chars"),
        F.sum(F.col("n") * F.expr(f"size({_SY})")).cast("long").alias("n_tokens"),
        F.expr(
            f"CAST(SUM(n * size({_SY})) * 1000000"
            " div SUM(n * length(replace(substring(tk, 2), '|', '')))"
            " AS BIGINT)"
        ).alias("tokens_per_char_ppm"),
    )
    return out
