"""Shared Spark helpers: null-safe equi-joins and column disambiguation.

The reference joins with ``join_on_nulls=True`` everywhere
(`_base_transformation_visitor.py:877, 899, 968, 985`), i.e. null join keys
match each other. Spark expresses this with ``<=>`` (EqualNullSafe), which
still qualifies as a hash-join key, so broadcast/sort-merge strategies and
AQE all still apply — no performance cliff vs plain ``=``.
"""

from __future__ import annotations

import contextlib as _contextlib
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nullsafe_equi_join(
    left: DataFrame,
    right: DataFrame,
    join_columns: Sequence[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Join on ``join_columns`` with null-safe equality.

    Output columns: join columns (taken from the left side), then left
    non-key columns, then right non-key columns. Shared non-key columns must
    have been disambiguated by the caller.
    """
    if not join_columns:
        raise ValueError("join_columns must be non-empty")
    # Rename right join keys to temporaries so the condition is unambiguous.
    tmp = {c: f"__join_r_{c}" for c in join_columns}
    r = right.withColumnsRenamed(tmp)
    if broadcast_right:
        r = F.broadcast(r)
    cond = None
    for c in join_columns:
        piece = F.col(c).eqNullSafe(F.col(tmp[c]))
        cond = piece if cond is None else cond & piece
    joined = left.join(r, on=cond, how=how)
    return joined.drop(*tmp.values())


def nullsafe_anti_join(
    left: DataFrame, right: DataFrame, join_columns: Sequence[str]
) -> DataFrame:
    """Left anti-join with null-safe equality on ``join_columns``."""
    tmp = {c: f"__join_r_{c}" for c in join_columns}
    r = right.withColumnsRenamed(tmp)
    cond = None
    for c in join_columns:
        piece = F.col(c).eqNullSafe(F.col(tmp[c]))
        cond = piece if cond is None else cond & piece
    return left.join(r, on=cond, how="left_anti")


def disambiguate_columns(
    left: DataFrame,
    right: DataFrame,
    join_columns: Sequence[str],
) -> tuple:
    """Rename shared non-key columns to ``{name}_left`` / ``{name}_right``
    (reference JoinPublic semantics, _query_expr.py:1000-1012)."""
    shared = [
        c
        for c in left.columns
        if c in set(right.columns) and c not in set(join_columns)
    ]
    lren = {c: f"{c}_left" for c in shared}
    rren = {c: f"{c}_right" for c in shared}
    return left.withColumnsRenamed(lren), right.withColumnsRenamed(rren), shared


def event_time(df: DataFrame, col: str = "ts") -> "F.Column":
    """``TimestampType`` column from any physical encoding of an event
    timestamp column:

    - BIGINT nanoseconds — TIMESTAMP(NANOS) parquet read under
      ``spark.sql.legacy.parquet.nanosAsLong`` (integer-DIV to
      microseconds, matching DuckDB's truncating ns->us conversion);
    - TIMESTAMP_NTZ — timestamp[us] parquet under Spark 4's NTZ
      inference (cast; requires ``spark.sql.session.timeZone=UTC`` for
      epoch parity with engines that treat NTZ micros as raw epoch);
    - TIMESTAMP — used as-is.
    """
    from pyspark.sql import types as T

    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return F.timestamp_micros(F.expr(f"`{col}` DIV 1000"))
    return F.col(col).cast("timestamp")


def cleanup() -> None:
    """Release cached DataFrames held by this engine's sessions/keysets
    (reference utils.py:20-26 analogue). Call before ``spark.stop()``.

    This engine materializes no temp tables in the warehouse — views are
    held as (optionally persisted) DataFrames — so cleanup only needs to
    clear the Spark cache.
    """
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is not None:
        spark.catalog.clearCache()


def remove_all_temp_tables() -> None:
    """Reference utils.py:28-36 analogue: drop any temp views registered
    in the current Spark session's catalog."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        return
    for table in spark.catalog.listTables():
        if table.isTemporary:
            spark.catalog.dropTempView(table.name)


def check_installation() -> None:
    """Smoke-check the install: run one tiny end-to-end DP query
    (reference utils.py:38-170 analogue). Raises on failure."""
    from pyspark.sql import SparkSession

    from . import AddOneRow, PureDPBudget, QueryBuilder, Session

    spark = SparkSession.getActiveSession() or SparkSession.builder.master(
        "local[2]"
    ).getOrCreate()
    df = spark.createDataFrame([(i,) for i in range(10)], "x long")
    s = Session.from_dataframe(PureDPBudget(1), "check", df, AddOneRow())
    out = s.evaluate(QueryBuilder("check").count(), PureDPBudget(1))
    assert out.count() == 1


def salted_join(
    left: "DataFrame",
    right: "DataFrame",
    join_columns: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> "DataFrame":
    """Skew-resistant equi-join: salt the (skewed) left side into
    ``salt_buckets`` sub-keys and replicate the right side across every
    bucket, so one hot key spreads over ``salt_buckets`` tasks instead of
    stalling a single reducer.

    AQE's skew-join handles most cases at runtime; use this when a key is
    so hot that even split shuffle blocks overwhelm one executor (the
    classic power-law join at 100 TB), or when AQE is unavailable
    (streaming joins). Replication costs ``salt_buckets`` copies of the
    right side's shuffle — keep the smaller table on the right.
    """
    cols = list(join_columns)
    salted_left = left.withColumn(
        "__salt__", (F.rand(seed=0) * salt_buckets).cast("int")
    )
    salted_right = right.join(
        F.broadcast(
            left.sparkSession.range(salt_buckets).select(
                F.col("id").cast("int").alias("__salt__")
            )
        )
    )
    out = salted_left.join(salted_right, on=cols + ["__salt__"], how=how)
    return out.drop("__salt__")


def spread_rows(
    df: DataFrame, min_files: int = 8, target: int = None
) -> DataFrame:
    """Round-robin repartition when the input is a few-file scan.

    Python-kernel stages (row-dict UDFs, per-row hashing kernels) cost
    enough per row that a single-file parquet scan serializes the whole
    stage on a few cores; the one-off shuffle pays for itself. At real
    scale the scan already has >= cores files and this is a no-op. The
    guard reads ``inputFiles()`` (a walk of the analyzed plan), NOT
    ``df.rdd`` — converting to an RDD would force a physical plan per
    compile and pin the pre-AQE plan. Non-file-rooted plans (anything
    downstream of a shuffle) are already parallel and are left alone.
    """
    if target is None:
        target = df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files and len(files) < min(target, min_files):
        return df.repartition(target)
    return df


def zorder_key(columns: Sequence["F.Column"], bits: int = 16) -> "F.Column":
    """Morton (Z-order) interleave of ``len(columns)`` non-negative
    integer columns into one bigint sort key: bit ``b`` of column ``c``
    lands at position ``b * k + c``. Sorting / range-partitioning by
    this key before writing gives multi-dimensional data locality, so
    min/max footer stats prune scans on EVERY interleaved dimension —
    the lakehouse OPTIMIZE ZORDER primitive, as a plain column
    expression.

    Callers normalize each column into ``[0, 2^bits)`` first (modulo,
    binning, or rank); ``k * bits`` must be <= 63 so the key stays a
    positive int64. Pure Catalyst shift/mask arithmetic — codegen, no
    shuffle, exactly replayable in ANSI SQL.
    """
    cols = list(columns)
    k = len(cols)
    if k < 1:
        raise ValueError("need at least one column")
    if k * bits > 63:
        raise ValueError(f"k*bits = {k * bits} exceeds 63 (int64 sign bit)")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for c, col in enumerate(cols):
            bit = F.shiftright(col.cast("long"), b).bitwiseAND(F.lit(1))
            key = key + (bit * F.lit(1 << (b * k + c))).cast("long")
    return key


def top_k(
    df: DataFrame,
    order_cols: Sequence,
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Distributed global top-``k`` with a dense 1..k rank column — THE
    sanctioned way to rank "the k best rows of a big table".

    ``orderBy(...).limit(k)`` compiles to Spark's TakeOrderedAndProject:
    every partition keeps a k-row heap, the driver merges #partitions
    heaps — no global sort, no shuffle of the table, no single task
    seeing more than its own partition. The ``row_number`` window that
    assigns the rank then runs over only the k surviving rows, so the
    "un-partitioned window" it contains is O(k), not O(table).

    This utility exists because three operators independently hand-rolled
    global ranking and two of them did it with
    ``row_number().over(Window.orderBy(...))`` straight on the full
    table — which shuffles EVERY row to one task (the classic Spark
    scale-killer; at crawl scale it is the job). Route all global
    ranking through here; ``tests/test_plan_shape.py`` locks the
    TakeOrderedAndProject shape for each call site.

    ``order_cols``: sequence of Column expressions (include ``.desc()`` /
    ``.asc()`` and tie-breaks — ties MUST be broken for the rank to be
    deterministic across runs and engines).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    cols = list(order_cols)
    top = df.orderBy(*cols).limit(k)
    w = Window.orderBy(*cols)
    return top.withColumn(rank_col, F.row_number().over(w))


def observe_stage(df: DataFrame, name: str, **metrics) -> tuple:
    """Attach free pipeline metrics to a DataFrame stage via Spark's
    Observation API: ``metrics`` maps metric name -> aggregate Column
    (default: a plain row count). Returns ``(df, observation)``; after
    ANY action on the returned frame, ``observation.get`` yields the
    metric values — measured during the action itself, with no second
    pass over the data.

    This is how a 100 TB pipeline reports per-stage row counts and
    filter drop rates without count() re-scans: the metrics ride the
    same job. One observation per stage name per query.
    """
    from pyspark.sql import Observation

    if not metrics:
        metrics = {"n_rows": F.count(F.lit(1))}
    obs = Observation(name)
    out = df.observe(obs, *[c.alias(k) for k, c in metrics.items()])
    return out, obs


def skew_report(df: DataFrame, column: str, top_n: int = 10) -> DataFrame:
    """Join/groupBy skew diagnostic for a key column: the ``top_n``
    heaviest keys with their row counts and share of the table — the
    numbers you check BEFORE deciding to salt a join or enable AQE skew
    handling (a top key holding >1/partitions of the rows will straggle
    its task). One aggregation + a TakeOrderedAndProject (no global
    sort) + a broadcast of the 1-row total.

    Output: (key string-cast, n_rows, share, rank), heaviest first.
    """
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    counts = df.groupBy(
        F.col(column).cast("string").alias("key")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__t__"))
    top = top_k(counts, [F.desc("n_rows"), F.asc("key")], top_n, "rank")
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn(
            "share",
            F.round(
                F.col("n_rows").cast("double") / F.col("__t__"), 6
            ),
        )
        .select("key", "n_rows", "share", "rank")
    )


def input_bytes(spark, *paths: str) -> int:
    """Total on-disk bytes under each path, via the Hadoop FileSystem
    API — so the same call works for local files, HDFS, and object
    stores (anything the session's Hadoop conf can open)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    total = 0
    for path in paths:
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(conf)
        total += fs.getContentSummary(p).getLength()
    return int(total)


def derive_shuffle_partitions(
    spark,
    paths: Sequence[str],
    target_partition_bytes: int = 256 << 20,
    expansion: float = 4.0,
    floor: int = None,
    cap: int = 4096,
) -> int:
    """Size ``spark.sql.shuffle.partitions`` from the INPUT, not from a
    human: ``ceil(input_bytes * expansion / target_partition_bytes)``,
    floored at the core count and capped.

    ``expansion`` ~4 covers parquet's compression ratio (columnar
    snappy text/ints decode to roughly 3-5x their on-disk size); 256 MB
    of in-memory rows per post-shuffle partition is the standard
    sizing rule — small enough to sort/hash without spilling, large
    enough to amortize task overhead. Oversizing is cheap: AQE's
    partition coalescing merges the excess at runtime, so the derived
    value is an upper bound the optimizer trims, while UNDERSIZING
    (the default 32 at 600M rows = ~19M rows/partition) spills — the
    measured sf100 failure mode this replaces (SF1.md: 79.6 s -> 47.0 s
    at 256 partitions for private_join_nonunique).
    """
    import math

    if floor is None:
        floor = spark.sparkContext.defaultParallelism
    total = input_bytes(spark, *paths)
    need = math.ceil(total * float(expansion) / int(target_partition_bytes))
    return int(min(int(cap), max(int(floor), need, 1)))


def configure_shuffle_partitions(spark, paths: Sequence[str], **kwargs) -> int:
    """Set ``spark.sql.shuffle.partitions`` from the input size (see
    :func:`derive_shuffle_partitions`) and return the chosen value."""
    n = derive_shuffle_partitions(spark, paths, **kwargs)
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    return n


@_contextlib.contextmanager
def stream_state_partitions(
    spark,
    rows: Optional[int] = None,
    input_bytes: Optional[int] = None,
    rows_per_partition: int = 250_000,
    partition_bytes: int = 64 << 20,
    expansion: float = 4.0,
    floor: int = 4,
):
    """Pin ``spark.sql.shuffle.partitions`` to a SIZE-DERIVED streaming
    state-partition count for the duration of one streaming query, then
    restore the session value.

    Structured Streaming creates one state-store instance per shuffle
    partition per stateful operator, and every micro-batch pays store
    init plus a checkpoint delta file per instance — overhead that is
    pure waste when partitions far exceed the per-trigger volume
    (measured on the stream-stream interval join at sf0.1: 9.8 s with
    the session's 32 partitions vs 3.1 s with 4, identical output). AQE
    cannot help: stateful exchanges are exempt from runtime coalescing
    because the partition count is baked into the checkpoint at first
    start. So the count must be chosen BEFORE ``.start()``, derived
    from the staged input (``rows`` or ``input_bytes``, whichever the
    caller knows for free), floored at ``floor`` for parallelism, and
    capped at the session's own batch-derived setting so a genuinely
    large stream keeps its scale — the knob stays input-proportional
    rather than tuned to any one machine.
    """
    import math

    current = int(spark.conf.get("spark.sql.shuffle.partitions"))
    need = 1
    if rows is not None:
        need = max(need, math.ceil(int(rows) / int(rows_per_partition)))
    if input_bytes is not None:
        need = max(
            need,
            math.ceil(
                int(input_bytes) * float(expansion) / int(partition_bytes)
            ),
        )
    n = min(current, max(int(floor), need))
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(current))
