"""Source/sink format surface beyond parquet (SURVEY.md §2.1/§2.8).

The reference moves rows JDBC→JDBC; its "source" abstraction is any
tabular ResultSet.  The Spark-native equivalents are the built-in
DataSource formats — same declarative scan, same pushdown machinery.
This module pins the engine's conventions for them:

* explicit schemas for text formats (csv/json infer-scans are a full
  extra pass over 100 TB — never rely on inference in production paths);
* timestamps serialized with an explicit UTC format so round-trips are
  lossless;
* date/hash-partitioned layouts for writes (partition pruning is the
  single biggest scan reducer at scale);
* small-file compaction (streaming/incremental sinks accrete files; scan
  cost is per-file, so periodic compaction keeps reads healthy).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Lossless round-trip format for csv/json timestamps (UTC, µs).
TIMESTAMP_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

_TEXT_FORMATS = ("csv", "json")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    """Format-agnostic table scan.  Text formats REQUIRE a schema —
    silent inference would re-scan the input and guess types the JDBC
    metadata (S2) already told us."""
    if fmt in _TEXT_FORMATS and schema is None:
        raise ValueError(f"{fmt} scans require an explicit schema (no inference passes)")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("timestampFormat", TIMESTAMP_FORMAT)
    if fmt == "json":
        options.setdefault("timestampFormat", TIMESTAMP_FORMAT)
    return reader.options(**options).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "error",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Format-agnostic write with optional hive-style partition layout."""
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("timestampFormat", TIMESTAMP_FORMAT)
    if fmt == "json":
        options.setdefault("timestampFormat", TIMESTAMP_FORMAT)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "error",
) -> None:
    """Partition-pruned layout: one directory per partition value.

    A filter on a partition column then skips whole directories at
    planning time (``PartitionFilters`` in the scan, zero I/O for
    excluded partitions) — at 100 TB this is the difference between
    scanning a day and scanning the archive.  Choose low-cardinality
    columns (date buckets, region); high-cardinality partitioning
    creates the small-file problem ``compact`` exists to fix."""
    write_table(df, path, "parquet", mode=mode, partition_by=partition_cols)


def bucketed_table_name(sf_dir: str, table: str, key: str, buckets: int) -> str:
    """Managed-table name for one fixture table's bucketed copy.

    Carries a content key (fixture path + the table parquet's
    size/nanosecond-mtime — the media_store discipline) so a
    regenerated fixture MISSES and rebuilds instead of serving stale
    bucketed rows; sanitized to a valid lowercase SQL identifier."""
    import hashlib
    import re

    abs_dir = os.path.abspath(sf_dir.rstrip("/") or sf_dir)
    try:
        st = os.stat(os.path.join(abs_dir, f"{table}.parquet"))
        content = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        content = "absent"
    h = hashlib.md5(f"{abs_dir}|{table}|{content}".encode()).hexdigest()[:10]
    tag = re.sub(r"[^a-z0-9]+", "_", os.path.basename(abs_dir).lower()) or "sf"
    return f"bkt_{table}_{key}_{buckets}_{tag}_{h}"


def ensure_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str,
    buckets: int = 8,
) -> str:
    """Materialize (once) a hash-BUCKETED, per-bucket-SORTED managed
    copy of a fixture table, keyed on the join column; returns the
    table name.

    Bucketing is the storage-level half of the co-located-join story:
    both sides of a key-equi-join written with the same bucket count on
    the join key scan as pre-partitioned inputs, so the join runs with
    ZERO Exchange — at 100 TB this removes the single largest shuffle a
    fact⋈fact join pays, and it amortizes: pay the layout once, every
    downstream join on that key rides it.

    The frame is repartitioned into ``buckets`` partitions ON the key
    before the bucketed write: Spark's repartition and bucket
    assignment use the same murmur3-pmod hash, so each task holds
    exactly one bucket's rows and every bucket lands in ONE file.  The
    per-bucket sortBy keeps the key clustered for row-group min/max
    skipping and better compression (Spark still re-sorts merge-join
    inputs — it cannot trust intra-bucket order across files — but
    those sorts are partition-local CPU, not network).  Superseded
    builds of the same (table, key, buckets, fixture-tag) are dropped
    when a new content key builds.

    Cross-session reuse (ADVICE r11): the default catalog is in-memory
    per session while the warehouse directory is shared, so a finished
    build from another session is a directory this session's catalog
    has never heard of.  The builder drops a ``_SPARK_GRAFT_BUCKET_SPEC``
    marker (schema DDL + bucket spec) AFTER a successful write; a later
    session finding the marker ADOPTS the directory via
    ``CREATE TABLE ... CLUSTERED BY ... LOCATION`` — zero-Exchange plans
    verified identical to the fresh build — instead of deleting a
    sibling session's just-built copy and rebuilding.  The stale sweep
    only ever removes SUPERSEDED content keys (same prefix, different
    hash) plus this name's own marker-less debris; the one remaining
    race is two sessions building the same brand-new key concurrently,
    which a cluster deployment closes with the catalog's own
    transactional CREATE (Hive metastore / Delta), not filesystem
    markers."""
    import glob
    import json
    import shutil

    from spanner_jdbc_converter_spark.catalog import load_table

    name = bucketed_table_name(sf_dir, table, key, buckets)
    if spark.catalog.tableExists(name):
        return name
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    wh_path = wh[len("file:"):] if wh.startswith("file:") else wh
    loc = os.path.join(wh_path, name)
    marker = os.path.join(loc, "_SPARK_GRAFT_BUCKET_SPEC")

    def _part_files(d: str) -> list[str]:
        return [f for f in os.listdir(d) if f.startswith("part-")] if os.path.isdir(d) else []

    if os.path.isfile(marker):
        # A completed build of this EXACT content key already exists —
        # re-attach the bucket spec the in-memory catalog forgot.
        # ADVICE r12/r13: never trust the marker alone — a crash during
        # a later sweep or manual cleanup can leave the marker while
        # part files are gone, and adopting that silently yields wrong
        # row counts.  Validate against the part-file stamp written
        # with the marker; a LEGACY marker with no stamp is equally
        # unverifiable (it may have lost SOME part files), so it fails
        # validation too and falls through to the rebuild.
        with open(marker) as fh:
            spec = json.load(fh)
        actual = len(_part_files(loc))
        expected = spec.get("n_part_files")
        if isinstance(expected, int) and expected > 0 and actual == expected:
            spark.sql(
                f"CREATE TABLE {name} ({spec['schema_ddl']}) USING parquet "
                f"CLUSTERED BY ({spec['key']}) SORTED BY ({spec['key']}) "
                f"INTO {spec['buckets']} BUCKETS LOCATION '{loc}'"
            )
            return name
        shutil.rmtree(loc, ignore_errors=True)
    # No finished build for this key: sweep superseded content keys of
    # the same (table, key, buckets, fixture-tag) — never this name's
    # directory unless it is marker-less debris from a crashed write —
    # then build and mark.
    prefix = name.rsplit("_", 1)[0] + "_"
    for t in spark.catalog.listTables():
        if t.name.startswith(prefix) and t.name != name:
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
    if os.path.isdir(wh_path):
        for stale in glob.glob(os.path.join(wh_path, f"{prefix}*")):
            if os.path.basename(stale) != name:
                shutil.rmtree(stale, ignore_errors=True)
        shutil.rmtree(loc, ignore_errors=True)
    frame = load_table(spark, sf_dir, table)
    (
        frame.repartition(buckets, F.col(key))
        .write.bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(name)
    )
    schema_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in frame.schema.fields
    )
    with open(marker, "w") as fh:
        json.dump(
            {
                "key": key,
                "buckets": buckets,
                "schema_ddl": schema_ddl,
                "n_part_files": len(_part_files(loc)),
            },
            fh,
        )
    return name


def dir_bytes(path: str) -> int:
    """Total data bytes under a local path (cluster deployments swap in
    the Hadoop FileSystem API — only this size probe changes)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ⌈size/target⌉ files.

    Incremental/streaming sinks accrete many small files; since scan
    setup cost is per-file, compaction is routine maintenance at scale.
    Rewrite goes through a temp dir then an atomic-ish swap so a failed
    compaction never destroys the source.  Returns the new file count."""
    size = dir_bytes(path)
    n_files = max(1, math.ceil(size / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    # verify before swap — never drop data on a failed rewrite
    if spark.read.parquet(tmp).count() != df.count():
        raise RuntimeError("compaction row-count mismatch; source left untouched")
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files
