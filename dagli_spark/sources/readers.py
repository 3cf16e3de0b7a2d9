"""Source/reader mappings (SURVEY.md §2.1) — the reference's objectio
family re-expressed on Spark's readers. Each function documents which
reference reader it covers; formats the environment lacks (Avro, Kryo)
are gated with a clear error instead of a stub import.

| reference | here |
|---|---|
| DSVReader (data/.../dsv/DSVReader.java:28-49) | :func:`dsv_reader` |
| AvroReader (objectio-avro/.../AvroReader.java:29) | :func:`avro_reader` |
| MultiplexedReader (objectio-core/.../MultiplexedReader.java:11-13) | :func:`multiplexed_union` |
| ConcatenatedReader (objectio-core/.../ConcatenatedReader.java:8-12) | :func:`concat_columns` |
| SampleReader/SampleSegment (objectio-core/.../SampleReader.java:8-11) | :func:`sample_reader` |
| LazyShuffledBufferReader (objectio-core/.../LazyShuffledBufferReader.java:9-14) | :func:`shuffled_reader` |
| LazyMapped/Filtered/FlatMappedReader | select / where / explode (Spark lazy plans are the exact analogue) |
| KryoFileReader / BigListReader (spill & cache) | df.persist(DISK_ONLY) / df.cache() + dagli_spark.checkpoint |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dagli_spark.functions.rand import sample_segment, shuffle_key


def dsv_reader(
    spark: SparkSession, path: str, *, schema: str | None = None,
    delimiter: str = ",", header: bool = True,
) -> DataFrame:
    """CSV/TSV with explicit schema (the reference's RowSchema is mandatory
    typing; schema inference is opt-in only for exploration)."""
    reader = spark.read.option("delimiter", delimiter).option("header", header)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def avro_reader(spark: SparkSession, path: str) -> DataFrame:
    """Avro container files. Requires the spark-avro package on the
    classpath (not bundled in this sandbox)."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "spark-avro is not on the classpath; submit with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
        ) from e


def avro_writer(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """Avro sink (objectio-avro/.../AvroWriter); same classpath gate as
    :func:`avro_reader`."""
    try:
        df.write.mode(mode).format("avro").save(path)
    except Exception as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "spark-avro is not on the classpath; submit with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
        ) from e


def multiplexed_union(*dfs: DataFrame) -> DataFrame:
    """Round-robin union of readers -> unordered unionAll (row order is
    never load-bearing in this engine, §1.4)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def concat_columns(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """Zip readers into tuples — row alignment by explicit key (positional
    zip does not survive distribution; the key IS the example identity)."""
    on = [on] if isinstance(on, str) else list(on)
    return left.join(right, on, "inner")


def sample_reader(df: DataFrame, key, lo: float, hi: float, *, seed: int = 0) -> DataFrame:
    """Deterministic [lo, hi) segment sample by hashed key."""
    return df.where(sample_segment(key, lo, hi, seed))


def shuffled_reader(df: DataFrame, key, *, seed: int = 0) -> DataFrame:
    """Full deterministic shuffle (stronger than the reference's partial
    K-buffer shuffle): order by a seeded hash of the key, with the key
    itself as tiebreak — a hash collision (or duplicate key) must not
    leave relative order to the partition layout."""
    k = F.col(key) if isinstance(key, str) else key
    return df.orderBy(shuffle_key(key, seed), k)


def stratified_sample(
    df: DataFrame, label_col: str, fractions: dict, key, *,
    seed: int = 0, method: str = "xxhash64",
) -> DataFrame:
    """Deterministic per-class sampling (class rebalancing for training-data
    pipelines): keep a row iff hash(key) falls under its label's fraction.

    Unlike ``df.sampleBy`` (RNG per partition, result depends on partition
    layout) this is a pure function of (seed, key) — partition-count
    invariant (§1.4), reproducible across runs, and a plain filter: it
    pushes into the scan, no shuffle. ``method='lcg'`` uses the portable
    Knuth multiplicative hash so an ANSI-SQL oracle can reproduce it
    exactly; 'xxhash64' is the engine default.
    """
    k = F.col(key) if isinstance(key, str) else key
    if method == "xxhash64":
        u = (F.pmod(F.xxhash64(k, F.lit(seed)), F.lit(1 << 32))
             / F.lit(float(1 << 32)))
    elif method == "lcg":
        from dagli_spark.functions.rand import random_double_lcg

        # one definition of the portable uniform (oracle parity depends on
        # the exact formula — a hand-copied twin would drift)
        u = random_double_lcg(k, seed)
    else:
        raise ValueError(method)
    frac = None
    for label, f in sorted(fractions.items()):
        cond = F.col(label_col) == F.lit(label)
        frac = F.when(cond, F.lit(float(f))) if frac is None \
            else frac.when(cond, F.lit(float(f)))
    frac = frac.otherwise(F.lit(0.0))
    return df.where(u < frac)
