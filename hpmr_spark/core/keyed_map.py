"""KeyedMap — the engine's analog of the reference's DistMap<K,V,H>
(/root/reference/src/dist_map.h:14-72): distributed keyed state with the
"≤ 1 live row per key" invariant, where duplicate writes merge via a reducer.

Spark-first design notes
------------------------
* State is a DataFrame ``(key, value)``; the invariant is maintained by
  ``groupBy(key).agg(reducer)`` at every mutation epoch. Catalyst plans this as
  partial (map-side) + final aggregation — exactly the reference's
  combine-on-insert + shuffle-merge pipeline (src/bare_map.h:55-57 +
  src/dist_map.h:147-210) — with zero custom code.
* ``async_set``/``sync`` (src/dist_map.h:118-130,147-210) collapse into the
  epoch model: writes accumulate in a pending batch; ``sync()`` unions pending
  into state and re-aggregates. Spark's lazy execution means the shuffle runs
  when an action fires; ``sync`` additionally persists to cap lineage.
* Point ops (``get``/``has``/``unset`` — src/dist_map.h:132-145,
  src/concurrent_map.h:46-52) are filters / semi / anti joins, so at cluster
  scale they stay distributed; ``get`` collects a single row to the driver,
  matching the reference's owner-broadcast semantics.
* Arbitrary Python reducers fall back to ``RDD.reduceByKey`` (map-side combine
  included); the five canned reducers stay JVM-side as agg expressions.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hpmr_spark.reducers import Reducer, _Reducer

KEY = "key"
VALUE = "value"
ORDER = "_order"


def _normalize(df: DataFrame, key_col: str, value_col: str, order_col: str | None) -> DataFrame:
    cols = [F.col(key_col).alias(KEY), F.col(value_col).alias(VALUE)]
    if order_col is not None:
        cols.append(F.col(order_col).alias(ORDER))
    return df.select(*cols)


class KeyedMap:
    """Distributed K→V map with reducer-merge write semantics."""

    def __init__(self, df: DataFrame, *, _has_order: bool = False, _unique: bool = True):
        self._df = df
        self._has_order = _has_order
        self._unique = _unique  # True once the ≤1-row-per-key invariant holds
        self._epoch = 0
        # Driver-side cache of max(_order). Without it every set_batch epoch
        # embedded the CURRENT plan twice (union side + broadcast max-order
        # agg side), doubling the logical plan per epoch — exponential
        # lineage growth, caught by tests/test_epoch_stress.py. With it the
        # first epoch runs one 1-row agg job and every later epoch is a
        # pure driver-side increment (our own batch order IS the new max).
        self._max_order: int | None = None

    # ------------------------------------------------------------- construction
    @classmethod
    def from_df(
        cls,
        df: DataFrame,
        key_col: str,
        value_col: str,
        reducer: _Reducer = Reducer.overwrite,
        order_col: str | None = None,
    ) -> "KeyedMap":
        """Bulk ingest: merge duplicate keys with ``reducer`` (src/dist_map.h:31-34)."""
        norm = _normalize(df, key_col, value_col, order_col)
        return cls(norm, _has_order=order_col is not None, _unique=False).sync(reducer)

    @classmethod
    def from_pairs(
        cls,
        spark: SparkSession,
        pairs: Iterable[tuple],
        reducer: _Reducer = Reducer.overwrite,
    ) -> "KeyedMap":
        """Ingest (k, v) pairs with arrival-order determinism: the iteration
        index becomes the order column, so keep/overwrite are well-defined
        (unlike the reference, where arrival order is thread/network
        nondeterministic — SURVEY.md §2.2)."""
        rows = [(k, v, i) for i, (k, v) in enumerate(pairs)]
        df = spark.createDataFrame(rows, [KEY, VALUE, ORDER])
        return cls(df, _has_order=True, _unique=False).sync(reducer)

    # ------------------------------------------------------------------ epochs
    def sync(self, reducer: _Reducer = Reducer.keep) -> "KeyedMap":
        """Merge duplicate keys — THE shuffle (src/dist_map.h:147-210).

        Canned reducers run as JVM agg expressions (partial+final agg); custom
        reducers run via RDD.reduceByKey (still map-side combined)."""
        if self._unique:
            return self
        if reducer.agg_factory is None:
            # arbitrary Python merge → RDD path (order column dropped)
            rdd = self._df.select(KEY, VALUE).rdd.map(tuple).reduceByKey(reducer.fn)
            return KeyedMap(rdd.toDF([KEY, VALUE]), _has_order=False, _unique=True)
        aggs = [reducer.agg(VALUE, ORDER if self._has_order else None).alias(VALUE)]
        if self._has_order:
            aggs.append(F.max(ORDER).alias(ORDER))
        out = self._df.groupBy(KEY).agg(*aggs)
        return KeyedMap(out, _has_order=self._has_order, _unique=True)

    def set_batch(
        self, batch: DataFrame, key_col: str, value_col: str, reducer: _Reducer = Reducer.overwrite
    ) -> "KeyedMap":
        """async_set epoch: union a batch of writes, merge on key
        (src/dist_map.h:118-130). New rows get a later epoch order so
        ``overwrite`` means "batch wins over existing state"."""
        if self._has_order:
            # Batch order must exceed EVERY existing order, including
            # user-supplied order_col values from from_df (e.g. epoch-micros
            # timestamps ~1.7e15) — a fixed (epoch+1)·2^40 base silently
            # loses to those. The max is computed ONCE (1-row agg job) and
            # cached driver-side; afterwards each epoch increments it — our
            # own batch literal IS the new max, so no re-derivation. This
            # keeps the per-epoch plan growth LINEAR: deriving the base as a
            # crossJoin(broadcast(agg(cur))) embedded cur's plan twice per
            # epoch and doubled the logical plan every set_batch
            # (exponential — tests/test_epoch_stress.py is the sentinel).
            cur = self._df
            if self._max_order is None:
                row = cur.agg(
                    F.coalesce(F.max(ORDER), F.lit(0)).cast("long").alias("m")
                ).collect()
                self._max_order = int(row[0]["m"])
            base = self._max_order + 1
            nxt = _normalize(batch, key_col, value_col, None).withColumn(
                ORDER, F.lit(base).cast("long")
            )
        else:
            cur = self._df.withColumn(ORDER, F.lit(0).cast("long"))
            base = 1
            nxt = _normalize(batch, key_col, value_col, None).withColumn(
                ORDER, F.lit(base).cast("long")
            )
        merged = KeyedMap(cur.unionByName(nxt), _has_order=True, _unique=False).sync(reducer)
        merged._epoch = self._epoch + 1
        merged._max_order = base  # sync keeps max(_order) = the batch epoch
        return merged

    # ------------------------------------------------------------- point ops
    def get(self, key: Any, default: Any = None) -> Any:
        """Point lookup with default (src/dist_map.h:132-145)."""
        row = self._df.where(F.col(KEY) == F.lit(key)).select(VALUE).take(1)
        return row[0][0] if row else default

    def get_many(self, keys: list) -> dict:
        """Batched point lookup — one job for K keys instead of K jobs.
        At scale this is an IN-filter pushed to the scan, not K collects."""
        rows = (
            self._df.where(F.col(KEY).isin(keys)).select(KEY, VALUE).collect()
        )
        return {r[0]: r[1] for r in rows}

    def has(self, key: Any) -> bool:
        """Membership (src/bare_hash_container.h:181-196)."""
        return bool(self._df.where(F.col(KEY) == F.lit(key)).take(1))

    def unset(self, key: Any) -> "KeyedMap":
        """Delete one key (src/bare_hash_container.h:150-179)."""
        return KeyedMap(
            self._df.where(F.col(KEY) != F.lit(key)),
            _has_order=self._has_order,
            _unique=self._unique,
        )

    def unset_many(self, keys_df: DataFrame, key_col: str) -> "KeyedMap":
        """Bulk delete = left-anti join (distributed, no driver loop)."""
        other = keys_df.select(F.col(key_col).alias(KEY))
        return KeyedMap(
            self._df.join(other, on=KEY, how="left_anti"),
            _has_order=self._has_order,
            _unique=self._unique,
        )

    # ---------------------------------------------------------------- metadata
    def n_keys(self) -> int:
        """Global distinct-key count (src/dist_map.h:90-96). The unique-key
        invariant makes this a plain count."""
        return self._df.count()

    def n_partitions(self) -> int:
        """get_n_buckets analog (src/dist_map.h:98-104)."""
        return self._df.rdd.getNumPartitions()

    # ----------------------------------------------------- load-factor knobs
    # API-fidelity surface for the reference's hash-table sizing knobs
    # (src/dist_map.h:25-29, 106-116). Spark owns physical hash-table sizing
    # (Tungsten BytesToBytesMap + AQE coalescing — SURVEY §4 row 8), so the
    # "load factor" here is the planning-level analog: keys per shuffle
    # partition. NOTE the reference's get_load_factor body returns
    # n_buckets/n_keys (src/dist_map.h:106-109) — transposed vs
    # std::unordered_map semantics; like the Reducer::min/max transposition
    # (SURVEY §2.2) we implement the corrected keys-per-bucket ratio and
    # document the divergence.
    DEFAULT_MAX_LOAD_FACTOR = 1_000_000.0  # keys per partition before rebalance

    def get_load_factor(self) -> float:
        """Mean keys per partition (corrected src/dist_map.h:106-109).

        Runs one count job; n_partitions is metadata-only."""
        parts = self.n_partitions()
        return float(self.n_keys()) / float(max(parts, 1))

    def get_max_load_factor(self) -> float:
        """src/dist_map.h:26 analog — the rebalance threshold knob."""
        return getattr(self, "_max_load_factor", self.DEFAULT_MAX_LOAD_FACTOR)

    def set_max_load_factor(self, max_load_factor: float) -> "KeyedMap":
        """src/dist_map.h:110-116 analog. The reference rehashes its local +
        remote maps; here the knob is recorded and `rebalance()` applies it
        by hash-repartitioning so keys/partition <= max_load_factor.
        Execution-level sizing stays with Tungsten/AQE — this is the
        planning-surface no-op knob SURVEY §2 row 9 promises, made real
        enough to drive `reserve` with."""
        if max_load_factor <= 0:
            raise ValueError("max_load_factor must be positive")
        self._max_load_factor = float(max_load_factor)
        return self

    def rebalance(self) -> "KeyedMap":
        """Repartition to ceil(n_keys / max_load_factor) partitions (the
        reference's rehash-on-threshold, as an explicit call: Spark plans
        are immutable so the trigger is pull- not write-driven)."""
        import math

        target = max(1, math.ceil(self.n_keys() / self.get_max_load_factor()))
        out = self.reserve(target)
        out._max_load_factor = self.get_max_load_factor()
        return out

    def reserve(self, n_partitions: int) -> "KeyedMap":
        """Pre-size partitioning (src/dist_map.h:82-88): hash-repartition on key."""
        return KeyedMap(
            self._df.repartition(n_partitions, KEY),
            _has_order=self._has_order,
            _unique=self._unique,
        )

    def clear(self) -> "KeyedMap":
        """Drop all entries (src/dist_map.h:243-253)."""
        return KeyedMap(self._df.limit(0), _has_order=self._has_order, _unique=True)

    # ------------------------------------------------------------ full scans
    def for_each(self, handler: Callable[[Any, Any], None]) -> None:
        """Scan all entries (src/concurrent_map.h:58-62). Streams partitions to
        the driver; for distributed side effects use ``to_df().foreach``."""
        for row in self._df.select(KEY, VALUE).toLocalIterator():
            handler(row[0], row[1])

    def items(self) -> Iterator[tuple]:
        for row in self._df.select(KEY, VALUE).toLocalIterator():
            yield row[0], row[1]

    def map_reduce(
        self,
        mapper: Callable[[Any, Any], Iterable[tuple]],
        reducer: _Reducer,
    ) -> "KeyedMap":
        """flatMap entries → (k2, v2), merge by key (src/dist_map.h:256-279).

        The mapper is arbitrary Python (the reference's lambda-with-emit,
        src/dist_map.h:48-50), so this runs on the RDD path; reduceByKey gives
        map-side combine like the reference's combine-on-insert. Prefer
        :meth:`map_reduce_expr` when the mapper is expressible as columns —
        that path stays entirely in the JVM."""
        fn = reducer.fn
        rdd = (
            self._df.select(KEY, VALUE)
            .rdd.flatMap(lambda row: mapper(row[0], row[1]))
            .reduceByKey(fn)
        )
        return KeyedMap(rdd.toDF([KEY, VALUE]), _unique=True)

    def map_reduce_expr(
        self,
        key_expr,
        value_expr,
        reducer: _Reducer,
    ) -> "KeyedMap":
        """Declarative map_reduce: key/value are Column expressions, reducer is
        canned → whole pipeline is Catalyst-planned (fast path)."""
        projected = self._df.select(key_expr.alias(KEY), value_expr.alias(VALUE))
        return KeyedMap(projected, _unique=False).sync(reducer)

    # ------------------------------------------------------- ordered analytics
    def top_k(self, k: int, by_value: bool = True, descending: bool = True) -> DataFrame:
        """Top-k entries with a deterministic (value, key) total order and a
        1-based `rank` column. The scale-safe default a user should reach
        instead of `Window.orderBy(...)`: selection plans as
        TakeOrderedAndProject (per-partition heaps + a k-row merge — no
        global sort, no single-partition window); the rank comes from
        `functions/ranking.bounded_rank` — a broadcast non-equi self-join
        over the already-selected k-row frame (no window at all)."""
        order = (
            [F.col(VALUE).desc(), F.col(KEY)] if descending else [F.col(VALUE), F.col(KEY)]
        ) if by_value else (
            [F.col(KEY).desc()] if descending else [F.col(KEY)]
        )
        from hpmr_spark.functions.ranking import bounded_rank

        top = self._df.select(KEY, VALUE).orderBy(*order).limit(k)
        # k-row re-rank as a broadcast non-equi join — no window at all
        # (primary == tiebreak degenerates to a pure key rank for by_value=False)
        primary = VALUE if by_value else KEY
        return bounded_rank(top, primary, KEY, primary_desc=descending, out="rank")

    def quantiles(self, buckets: int) -> DataFrame:
        """Exact equi-depth bucketing of values: every entry tagged with its
        NTILE(buckets) over (value, key) — deterministic under the full
        tie-break — via the two-pass bucketed global row_number
        (functions/ranking.py), never a single-partition window. Returns
        (key, value, bucket); derive boundaries with a groupBy(bucket)
        min/max. The numeric leading key requirement is VALUE's type."""
        from hpmr_spark.functions.ranking import exact_ntile, global_row_number

        base = self._df.select(KEY, VALUE)
        r = global_row_number(base, [VALUE, KEY], out="_rn")
        t = base.agg(F.count(F.lit(1)).alias("_n"))
        return (
            r.crossJoin(F.broadcast(t))
            .select(
                KEY,
                VALUE,
                exact_ntile(F.col("_rn"), F.col("_n"), buckets).alias("bucket"),
            )
        )

    # ------------------------------------------------------------------ export
    def to_df(self, key_name: str = KEY, value_name: str = VALUE) -> DataFrame:
        return self._df.select(F.col(KEY).alias(key_name), F.col(VALUE).alias(value_name))

    @property
    def df(self) -> DataFrame:
        return self._df

    def to_dict(self, max_rows: int = 1_000_000) -> dict:
        """Collect the whole map to a driver dict — the reference's
        owner-broadcast get() generalized to all keys (src/dist_map.h:132-145).
        Guarded by max_rows: this is for genuinely small maps."""
        n = self._df.count()
        if n > max_rows:
            raise ValueError(f"KeyedMap has {n} keys; refusing driver collect > {max_rows}")
        return {r[0]: r[1] for r in self._df.select(KEY, VALUE).collect()}

    def as_map_column(self, max_rows: int = 10_000):
        """The hot-lookup pattern: the map as a literal Catalyst map column
        (create_map), so joins against it become JVM-side getItem lookups
        with no shuffle — the broadcast-dict idiom from SURVEY §2 row 6."""
        items = self.to_dict(max_rows)
        flat = []
        for k, v in items.items():
            flat.extend([F.lit(k), F.lit(v)])
        return F.create_map(*flat)

    def lookup_join(self, df: DataFrame, key_col: str, out_col: str = "value",
                    max_rows: int = 10_000) -> DataFrame:
        """Attach this map's values to df rows by key via a literal map
        lookup (no shuffle, no broadcast join machinery) — for small hot
        dimension maps; use a broadcast join beyond max_rows."""
        m = self.as_map_column(max_rows)
        return df.withColumn(out_col, m.getItem(F.col(key_col)))

    def persist(self) -> "KeyedMap":
        self._df = self._df.persist()
        return self

    def checkpoint(self) -> "KeyedMap":
        """Cut lineage after many epochs (SURVEY.md §7.3 risk b)."""
        self._df = self._df.localCheckpoint(eager=True)
        return self
