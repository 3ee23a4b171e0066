"""Sequence packing for training-data pipelines.

Pretraining loaders concatenate documents in a fixed order and cut the
stream every ``ctx`` tokens ("concat-and-chunk" packing).  The only
non-trivial part at 100 TB is the exclusive running token offset of
every document under a total order — a naive
``sum().over(Window.orderBy(...))`` is an ``Exchange SinglePartition``
that serializes the corpus through one task (the same anti-pattern as
the reference's global row_number keys, `convert/to_silver.py:130-131`).

:func:`ordered_prefix_sum` computes the identical result with a
distributed two-phase prefix sum: range-repartition on the order key,
per-partition token totals to the driver (bytes of metadata, one tiny
job), then a within-partition cumulative window whose offsets are the
driver-side prefix sums.  Values depend only on the (unique) order key,
never on the physical partitioning, so the output is deterministic
under repartitioning, AQE re-plans, and retries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ordered_prefix_sum(
    df: DataFrame,
    order_col: str | list[str],
    value_col: str,
    out_col: str = "start_offset",
) -> DataFrame:
    """Exclusive prefix sum — see :func:`ordered_prefix_sum_with_total`
    (this is the same computation, discarding the grand total)."""
    out, _ = ordered_prefix_sum_with_total(df, order_col, value_col, out_col)
    return out


def ordered_prefix_sum_with_total(
    df: DataFrame,
    order_col: str | list[str],
    value_col: str,
    out_col: str = "start_offset",
) -> tuple[DataFrame, int]:
    """Exclusive prefix sum of ``value_col`` under ORDER BY ``order_col``,
    plus the GRAND TOTAL as a driver int (free: the per-partition stats
    collected for the offsets already sum to it — callers needing the
    total must not pay a second full-scan aggregate).

    ``order_col`` is one column name or a list (lexicographic ascending
    order); the combination must be globally unique (e.g. a quality
    rank with a doc-id tiebreak).  ``value_col`` is coalesced to 0 when
    null.  Adds ``out_col`` (long): the sum of all values strictly
    before this row in the total order.

    Scale: one range shuffle + one metadata-sized driver collect; the
    window runs per partition.  Equivalent single-node SQL:
    ``SUM(v) OVER (ORDER BY k... ROWS BETWEEN UNBOUNDED PRECEDING AND 1
    PRECEDING)``.
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    clash = {"_pid", "_v"} & set(df.columns)
    if clash:
        raise ValueError(
            f"ordered_prefix_sum reserves column names {sorted(clash)}; "
            "rename them on the input first"
        )
    v = F.coalesce(F.col(value_col).cast("long"), F.lit(0))
    # localCheckpoint pins row->partition assignment so the totals job
    # and the output see the same partitioning (same reasoning as
    # surrogate_keys.assign_keys_distributed).  Explicit partition
    # count: a no-N range exchange gets AQE-coalesced to one partition
    # on small-bytes inputs, which would quietly degrade the
    # distributed prefix sum to a single-partition window (still
    # correct, but serial — and the multi-partition path would never
    # run under test).
    part = (
        df.repartitionByRange(
            df.sparkSession.sparkContext.defaultParallelism,
            *[F.col(c) for c in order_cols],
        )
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_v", v)
        .localCheckpoint(eager=True)
    )
    # Order partitions by their key range, not by pid: RangePartitioner
    # does emit ascending pids, but deriving the order from min(key)
    # makes no assumption about that internal detail.  min(struct(...))
    # is lexicographic — the same total order the range partitioning
    # and the window use.
    stats = (
        part.groupBy("_pid")
        .agg(
            F.min(F.struct(*order_cols)).alias("lo"),
            F.sum("_v").alias("tot"),
            F.sum(
                sum(
                    F.col(c).isNull().cast("long") for c in order_cols
                )
            ).alias("nulls"),
        )
        .collect()
    )
    if not stats:  # empty input: no offsets to assign
        empty = part.withColumn(out_col, F.lit(0).cast("long")).drop(
            "_pid", "_v"
        )
        return empty, 0
    if any(r["nulls"] for r in stats):
        # A null order key has no defined place in the total order (and
        # would crash the driver-side range sort below with an opaque
        # TypeError) — refuse loudly instead.
        raise ValueError(
            "ordered_prefix_sum: order column(s) contain NULLs; the total "
            "order requires non-null unique keys — filter or coalesce first"
        )
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(stats, key=lambda r: tuple(r["lo"])):
        offsets[r["_pid"]] = acc
        acc += r["tot"]
    # O(1) per-row offset lookup: range-partitioner pids are dense
    # 0..P-1, so an array literal indexed by _pid replaces the
    # create_map literal whose GetMapValue is a per-row LINEAR scan —
    # at thousands of shuffle partitions that scan would tax every row
    # of the corpus.
    offset_arr: Column = F.array(
        *[F.lit(offsets.get(i, 0)) for i in range(max(offsets) + 1)]
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    cum_incl = F.sum("_v").over(w)  # inclusive within-partition sum
    out = (
        part.withColumn(
            out_col,
            (
                F.element_at(offset_arr, F.col("_pid") + 1)
                + cum_incl
                - F.col("_v")
            ).cast("long"),
        )
        .drop("_pid", "_v")
    )
    return out, acc


def pack_concat_chunks(
    df: DataFrame,
    order_col: str,
    token_col: str,
    ctx: int,
) -> DataFrame:
    """Assign each document its chunk span under concat-and-chunk packing.

    Documents are laid out in ``order_col`` order and the token stream
    is cut every ``ctx`` tokens.  Adds ``start_offset`` (exclusive
    prefix sum), ``start_chunk``/``end_chunk`` (0-based chunk ids the
    doc's tokens land in), and ``n_chunks`` (how many chunks the doc
    spans).  Zero-token documents are dropped — they occupy no chunk.
    """
    if ctx <= 0:
        raise ValueError(f"ctx must be positive, got {ctx}")
    packed = ordered_prefix_sum(
        df.filter(F.col(token_col) > 0), order_col, token_col
    )
    return (
        packed.withColumn("start_chunk", F.expr(f"start_offset div {ctx}"))
        .withColumn(
            "end_chunk",
            F.expr(f"(start_offset + {token_col} - 1) div {ctx}"),
        )
        .withColumn(
            "n_chunks", (F.col("end_chunk") - F.col("start_chunk") + 1).cast("long")
        )
    )


def distributed_ntile(
    df: DataFrame,
    order_col: str | list[str],
    n_buckets: int,
    out_col: str = "bucket",
) -> DataFrame:
    """Exact NTILE(n) without a single-partition window — see
    :func:`distributed_rank_ntile` (same computation, rank dropped)."""
    # rank column must never collide with out_col or an input column —
    # a collision would silently drop the bucket on the way out
    rk = "__rank_drop"
    while rk == out_col or rk in df.columns:
        rk += "_"
    out, _ = distributed_rank_ntile(df, order_col, n_buckets, out_col, rk)
    return out.drop(rk)


def distributed_rank_ntile(
    df: DataFrame,
    order_col: str | list[str],
    n_buckets: int,
    out_col: str = "bucket",
    rank_col: str = "__rank",
) -> tuple[DataFrame, int]:
    """Exact NTILE(n) without a single-partition window.

    A bare ``ntile(n).over(Window.orderBy(...))`` moves the WHOLE
    input through one task; this computes the identical bucket ids
    from the distributed rank (``ordered_prefix_sum`` of 1s) and
    SQL-standard ntile arithmetic in pure integers: with n rows and
    k buckets, the first n mod k buckets hold ceil(n/k) rows, the
    rest floor(n/k) — so

        big   = n DIV k + 1,  r = n MOD k
        bucket(rank) = (rank-1) DIV big + 1              if rank <= r·big
                       r + (rank - r·big - 1) DIV (n DIV k) + 1  otherwise

    ``order_col`` must be a non-null unique total order (same contract
    as ordered_prefix_sum).  One range shuffle + a metadata collect;
    the row count rides in from the same partition stats, so no extra
    pass.

    Returns ``(df, n)``: the input with ``rank_col`` (1-based global
    rank, long — the ROW_NUMBER/RANK under the unique order) and
    ``out_col`` (the ntile bucket, int), plus the total row count as a
    driver int.  With the rank and ``n`` in hand, callers get the whole
    global-ranking window family without the single-partition window:
    ``percent_rank = (rank-1)/(n-1)``; under a UNIQUE order,
    ``dense_rank = rank = row_number``.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    clash = {"__one", "__rk0", out_col, rank_col} & set(df.columns)
    if clash:
        raise ValueError(
            f"distributed_ntile reserves column names {sorted(clash)}; "
            "rename them on the input (or pick a different out_col) first"
        )
    # The grand total of the 1s IS the row count — it rides out of the
    # prefix sum's per-partition driver stats, so no extra scan job.
    ranked, n = ordered_prefix_sum_with_total(
        df.withColumn("__one", F.lit(1)), order_col, "__one", out_col="__rk0"
    )
    if n == 0:
        return (
            df.withColumn(rank_col, F.lit(None).cast("long")).withColumn(
                out_col, F.lit(None).cast("int")
            ),
            0,
        )
    big = n // n_buckets + 1
    small = n // n_buckets
    r = n % n_buckets
    rank = F.col("__rk0") + 1
    if small == 0:
        # fewer rows than buckets: every row its own bucket (= rank)
        bucket = rank
    elif r == 0:
        bucket = F.expr(f"CAST((__rk0) DIV {small} AS INT) + 1")
    else:
        bucket = F.when(
            rank <= r * big,
            F.expr(f"CAST((__rk0) DIV {big} AS INT) + 1"),
        ).otherwise(
            F.expr(
                f"CAST({r} + ((__rk0 - {r * big}) DIV {small}) + 1 AS INT)"
            )
        )
    return (
        ranked.withColumn(rank_col, (F.col("__rk0") + 1).cast("long"))
        .withColumn(out_col, bucket.cast("int"))
        .drop("__one", "__rk0"),
        n,
    )
