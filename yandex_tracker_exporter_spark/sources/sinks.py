"""Versioned-table sinks (S5/S6/S9 + O1/O2 on the write path).

The reference's sink is ClickHouse ReplacingMergeTree: append full new
row versions, let ``OPTIMIZE FINAL`` + ``FINAL`` views collapse to
latest-per-key (``migrations/clickhouse/000004…``). The Spark-native
equivalent:

- ``write_versioned``    — append a new batch of versioned rows to a
  parquet table partitioned by month (the DDL's ``PARTITION BY
  toYYYYMM(...)``), sorted within partitions by the dedup key (the DDL
  ``ORDER BY`` — gives parquet min/max pruning on the key).
- ``read_latest``        — latest-version-wins dedup window on read
  (the ``FINAL`` view).
- ``compact``            — rewrite a table to one version per key (the
  ``OPTIMIZE FINAL`` table rewrite, run periodically, not per-batch).
- ``create_latest_view`` — registers the dedup view in the session
  catalog (S9's ``CREATE VIEW``).

At 100 TB: appends are cheap (no read-modify-write per batch); the dedup
window shuffles only at read/compaction, partitioned-by-month so
compaction touches recent partitions only. With a Delta/Iceberg catalog
``write_versioned`` + ``compact`` collapse into ``MERGE INTO`` — the
parquet path keeps the engine dependency-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.operators.dedup import latest_version_dedup
from yandex_tracker_exporter_spark.schemas import DEDUP_KEYS


def write_versioned(
    df: DataFrame,
    path: str,
    keys: list[str],
    partition_ts_col: str | None = None,
    mode: str = "append",
) -> None:
    """Append versioned rows, partitioned by month of ``partition_ts_col``
    and sorted within partitions by the dedup key."""
    out = df
    partition_cols: list[str] = []
    if partition_ts_col is not None:
        out = out.withColumn(
            "_month", F.date_format(F.col(partition_ts_col), "yyyyMM")
        )
        partition_cols = ["_month"]
    # include the partition column in the sort: FileFormatWriter requires
    # rows sorted by partition columns, and a keys-only sort would be
    # re-sorted by the writer's own Sort(_month) — losing the promised
    # key order (parquet min/max pruning) inside each file
    out = out.sortWithinPartitions(*(partition_cols + keys))
    writer = out.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def read_latest(
    spark: SparkSession,
    path: str,
    keys: list[str],
    version_col: str = "version",
    months: list[str] | None = None,
) -> DataFrame:
    """The ``FINAL`` view: latest version per dedup key.

    ``months`` scopes the read to specific ``_month`` partitions — the
    filter lands in the scan's PartitionFilters, so only those
    directories are listed and read (at 100 TB the difference between
    touching one month and the whole table). Semantics mirror
    ClickHouse ``FINAL`` over a partition subset: latest version AMONG
    THE SCOPED MONTHS — a newer version living in an out-of-scope month
    is not consulted.
    """
    df = spark.read.parquet(path)
    if months is not None and "_month" in df.columns:
        df = df.where(F.col("_month").isin([str(m) for m in months]))
    if "_month" in df.columns:
        df = df.drop("_month")
    return latest_version_dedup(df, keys, version_col)


def _hadoop_fs(spark: SparkSession, path: str):
    """Hadoop FileSystem + Path factory for ``path``'s scheme (works for
    ``file://``, ``hdfs://``, ``s3a://`` — whatever the session's Hadoop
    conf can resolve)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def compact(
    spark: SparkSession,
    path: str,
    keys: list[str],
    version_col: str = "version",
    months: list[str] | None = None,
) -> None:
    """``OPTIMIZE FINAL``: rewrite the table to one version per key.

    ``months`` scopes the rewrite to specific ``_month`` partitions
    (ClickHouse ``OPTIMIZE TABLE … PARTITION`` semantics): at 100 TB a
    sliding-window upsert only dirties the most recent month(s), so
    compacting those alone turns a full-table rewrite into a bounded
    one. Like ClickHouse, a partition-scoped merge collapses versions
    WITHIN the partition only — a key whose versions span months keeps
    one row per touched month, and :func:`read_latest` (the FINAL view)
    remains the cross-partition correctness layer either way.

    Durable swap protocol — the rewrite NEVER overwrites the files it is
    reading (a cache-and-overwrite-in-place loses the table if cached
    blocks are evicted mid-write and the plan recomputes from deleted
    source files):

    1. write the deduped data to a staging location OUTSIDE the table
       root (full table: sibling ``<dir>.__compact_tmp__``; partition:
       ``<dir>.__compact_staging__/<month>.tmp``)
    2. rename the live directory aside (to ``<dir>.__compact_old__`` /
       ``…staging/<month>.old``)
    3. rename the staged directory into place
    4. delete the old directory

    Staging must never live INSIDE the table root: Spark's partition
    discovery treats any directory whose name contains ``=`` as a
    partition (the hidden-file filter exempts it), so an in-root
    ``_month=202402.__compact_tmp__`` would be ingested as a bogus
    ``_month`` value by any concurrent or post-crash full-table read —
    a complete duplicate copy of the month. The staging names here
    contain no ``=`` and sit next to the table directory.

    A crash between steps leaves either the untouched live table or the
    complete old copy at the staging location; :func:`compact` recovers
    it on the next run (restore-if-live-missing, then discard stale
    staging). (On HDFS the renames are atomic; object stores emulate
    rename — a Delta/Iceberg ``OPTIMIZE`` replaces this whole protocol
    when a transactional catalog is available.)
    """
    base = path.rstrip("/")
    if months is None:
        # A month-partitioned table must KEEP its layout: the old
        # read_latest-based rewrite dropped _month and wrote flat
        # parquet, after which partition-scoped compacts raised, month
        # scoping silently read everything, and a later merge_upsert
        # produced a mixed flat/partitioned layout. Full-table compact
        # of a partitioned table = compact every live month (exactly
        # ClickHouse OPTIMIZE FINAL, which merges within partitions).
        live_months = _live_months(spark, base)
        if live_months:
            compact(spark, path, keys, version_col, months=live_months)
            return
        _recover_swap(spark, base, base + ".__compact_tmp__", base + ".__compact_old__")
        deduped = read_latest(spark, path, keys, version_col)
        _swap_rewrite(spark, base, deduped.sortWithinPartitions(*keys),
                      base + ".__compact_tmp__", base + ".__compact_old__")
        return
    staging = base + ".__compact_staging__"
    for month in months:
        part_dir = f"{base}/_month={month}"
        tmp, old = f"{staging}/{month}.tmp", f"{staging}/{month}.old"
        _recover_swap(spark, part_dir, tmp, old)
        deduped = latest_version_dedup(
            spark.read.parquet(part_dir), keys, version_col
        )
        _swap_rewrite(spark, part_dir, deduped.sortWithinPartitions(*keys), tmp, old)
    fs, hpath = _hadoop_fs(spark, staging)
    if fs.exists(hpath(staging)):
        try:
            fs.delete(hpath(staging), False)  # non-recursive: only when empty
        except Exception:
            pass  # leftover artifacts from other months' crashes stay put


def _live_months(spark: SparkSession, base: str) -> list[str]:
    """The ``_month=`` partition values present under ``base`` (empty
    for a flat or missing table) — one driver-side directory listing."""
    fs, hpath = _hadoop_fs(spark, base)
    if not fs.exists(hpath(base)):
        return []
    months = []
    for status in fs.listStatus(hpath(base)):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith("_month="):
            months.append(name.split("=", 1)[1])
    return sorted(months)


def _recover_swap(spark: SparkSession, target: str, tmp: str, old: str) -> None:
    """Recover from a compaction crash: a live dir missing with a complete
    old copy present means the previous run died between rename-aside and
    rename-into-place — restore it. A leftover tmp is always incomplete
    or unswapped; discard it."""
    fs, hpath = _hadoop_fs(spark, target)
    if not fs.exists(hpath(target)) and fs.exists(hpath(old)):
        if not fs.rename(hpath(old), hpath(target)):
            raise IOError(f"compact: could not restore {target} from {old}")
    if fs.exists(hpath(tmp)):
        fs.delete(hpath(tmp), True)


def _swap_rewrite(
    spark: SparkSession, target: str, df: DataFrame, tmp: str, old: str
) -> None:
    """Write ``df`` to ``tmp`` (outside the table root) and swap it in."""
    df.write.mode("overwrite").parquet(tmp)
    fs, hpath = _hadoop_fs(spark, target)
    if fs.exists(hpath(old)):
        fs.delete(hpath(old), True)
    if not fs.rename(hpath(target), hpath(old)):
        raise IOError(f"compact: could not move {target} aside to {old}")
    if not fs.rename(hpath(tmp), hpath(target)):
        fs.rename(hpath(old), hpath(target))  # restore the live table
        raise IOError(f"compact: could not move {tmp} into place (restored {target})")
    fs.delete(hpath(old), True)


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    version_col: str = "version",
    partition_ts_col: str | None = None,
) -> list[str]:
    """Transactional-style upsert: ``MERGE INTO`` semantics without a
    Delta/Iceberg catalog (SURVEY O1/O2's named mapping — the jars are
    not in this container, so the merge is a deterministic
    read-modify-swap of ONLY the affected ``_month`` partitions).

    Result is defined to equal the append-then-compact route::

        write_versioned(updates, path, keys, partition_ts_col)
        compact(spark, path, keys, months=<touched months>)

    i.e. per touched partition, latest-version-per-key over
    (live ∪ updates); untouched partitions are not read or rewritten.
    Each partition rewrite goes through the durable staging swap
    (:func:`_swap_rewrite`), so a crash leaves either the old or the new
    partition, never a torn one. Returns the list of touched months.

    At 100 TB: the update batch dirties a bounded set of recent months
    (sliding-window exports), so the rewrite is bounded by month size,
    not table size; the touched-month list is a tiny driver-side
    ``collect`` of the updates' distinct months. With Delta/Iceberg on
    the classpath, replace calls to this with ``MERGE INTO`` — the write
    amplification drops from month-granular to file-granular.
    """
    base = path.rstrip("/")
    if partition_ts_col is None:
        _recover_swap(spark, base, base + ".__compact_tmp__", base + ".__compact_old__")
        fs, hpath = _hadoop_fs(spark, base)
        if fs.exists(hpath(base)):
            merged = latest_version_dedup(
                spark.read.parquet(base).unionByName(updates),
                keys,
                version_col,
            )
            _swap_rewrite(
                spark, base, merged,
                base + ".__compact_tmp__", base + ".__compact_old__",
            )
        else:
            updates.sortWithinPartitions(*keys).write.parquet(base)
        return []

    monthly = updates.withColumn(
        "_month", F.date_format(F.col(partition_ts_col), "yyyyMM")
    )
    months = sorted(
        r["_month"] for r in monthly.select("_month").distinct().collect()
    )
    staging = base + ".__compact_staging__"
    fs, hpath = _hadoop_fs(spark, base)
    if months:
        # only materialize the root when there is something to write —
        # an empty-updates call must not leave an empty dir that makes
        # the next read fail with 'unable to infer schema' instead of
        # the clear path-not-found
        fs.mkdirs(hpath(base))  # no-op if the table root already exists
    for month in months:
        part_dir = f"{base}/_month={month}"
        tmp, old = f"{staging}/{month}.tmp", f"{staging}/{month}.old"
        _recover_swap(spark, part_dir, tmp, old)
        batch = monthly.where(F.col("_month") == month).drop("_month")
        if fs.exists(hpath(part_dir)):
            merged = latest_version_dedup(
                spark.read.parquet(part_dir).unionByName(batch),
                keys,
                version_col,
            )
            _swap_rewrite(spark, part_dir, merged.sortWithinPartitions(*keys), tmp, old)
        else:
            # brand-new month: write staged, single rename into place
            batch.sortWithinPartitions(*keys).write.parquet(tmp)
            if not fs.rename(hpath(tmp), hpath(part_dir)):
                raise IOError(f"merge_upsert: could not move {tmp} into {part_dir}")
    if fs.exists(hpath(staging)):
        try:
            fs.delete(hpath(staging), False)  # non-recursive: only when empty
        except Exception:
            pass
    return months


def create_latest_view(
    spark: SparkSession,
    table_name: str,
    path: str,
    keys: list[str] | None = None,
    version_col: str = "version",
) -> None:
    """Register ``{table_name}_view`` = latest-version rows (S9 views)."""
    keys = keys or DEDUP_KEYS.get(table_name, ["issue_key"])
    read_latest(spark, path, keys, version_col).createOrReplaceTempView(
        f"{table_name}_view"
    )
