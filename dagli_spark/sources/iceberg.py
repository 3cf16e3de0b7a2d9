"""Iceberg table integration (north-rule storage layer), gated on runtime
availability with a parquet fallback.

The north rule targets "Iceberg tables of image + caption pairs"; this
sandbox ships no iceberg-spark runtime jar, so the module degrades to plain
parquet paths while keeping the table-level API (and the design) identical:

- **Snapshot checkpoints** — ``Checkpointer`` (dagli_spark.checkpoint) keys
  stage outputs by content hash; on Iceberg the same key becomes a snapshot
  tag (``table.snapshot_id``) and resume = time-travel read
  (``spark.read.option("snapshot-id", ...)``).
- **Partition layout** — feature tables are written partitioned by
  ``bucket(entity_id, N)`` (or ``days(event_time)`` for event history) so
  the as-of join's shuffle aligns with the table layout; with Iceberg's
  hidden partitioning + storage-partitioned joins (Spark 3.4+/4.x SPJ,
  ``spark.sql.sources.v2.bucketing.enabled``) the union+LOCF sort-merge
  reads both sides pre-partitioned and skips the exchange entirely.
- **Column pruning** — the fat ``bytes`` column lives in the same table;
  Iceberg/Parquet column projection means scans that do not decode never
  read it (verified by tests/test_plans_skew_sources.py).

To enable on a real cluster::

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
        --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
        --conf spark.sql.catalog.lake.type=hadoop \
        --conf spark.sql.catalog.lake.warehouse=<warehouse-uri> ...
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg SparkCatalog class is on the JVM classpath."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def catalog_conf(catalog: str, warehouse: str) -> dict[str, str]:
    """The spark-submit --conf pairs for a Hadoop-type Iceberg catalog."""
    return {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        # storage-partitioned joins: co-located as-of join without exchange
        "spark.sql.sources.v2.bucketing.enabled": "true",
    }


def _fallback_path(identifier: str) -> str:
    """One mapping for BOTH write and read fallbacks: absolute paths are
    used as-is, dotted table identifiers go under /tmp/dagli_spark_tables
    (an asymmetric mapping would break write/read round trips)."""
    if identifier.startswith("/"):
        return identifier
    return "/tmp/dagli_spark_tables/" + identifier.replace(".", "/")


def write_table(
    df: DataFrame, identifier: str, *,
    partition_by: list[str] | None = None, mode: str = "overwrite",
) -> str:
    """Write to an Iceberg table when the runtime is present, else to a
    parquet directory named by ``identifier`` (dots -> path separators).
    Returns the storage identifier actually used."""
    spark = df.sparkSession
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be 'overwrite' or 'append', got {mode!r}")
    if iceberg_available(spark):
        w = df.writeTo(identifier)
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        (w.createOrReplace() if mode == "overwrite" else w.append())
        return identifier
    path = _fallback_path(identifier)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return path


def read_table(spark: SparkSession, identifier: str, *,
               snapshot_id: int | None = None) -> DataFrame:
    """Read an Iceberg table (optionally at a snapshot — the resume path),
    or the parquet fallback written by :func:`write_table`."""
    if iceberg_available(spark):
        r = spark.read
        if snapshot_id is not None:
            r = r.option("snapshot-id", str(snapshot_id))
        return r.table(identifier)
    if snapshot_id is not None:
        raise NotImplementedError(
            "snapshot time-travel requires the Iceberg runtime; the parquet "
            "fallback exposes content-keyed checkpoints instead "
            "(dagli_spark.checkpoint.Checkpointer)")
    return spark.read.parquet(_fallback_path(identifier))
