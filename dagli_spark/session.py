"""SparkSession factory with scale-appropriate defaults.

Defaults chosen for a large multi-executor cluster but testable on
local[N]:

- AQE on (runtime coalesce / skew-join splitting),
- Arrow on (all heavy Python work is vectorized pandas UDFs — the reference
  streams fixed-size row batches between nodes,
  core/.../dag/MultithreadedDAGExecutor.java:48-72; Arrow record batches are
  the columnar analogue),
- UTC session timezone (temporal semantics must not depend on host TZ),
- shuffle partitions default to 2x cores locally (the reference's
  "2 x logical cores" worker default, core/.../dag/LocalDAGExecutor.java:14);
  on a real cluster leave spark.sql.shuffle.partitions to AQE's coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size mirrors the reference's 5000-row training batches
# (core/.../dag/MultithreadedDAGExecutor.java:72).
ARROW_BATCH_ROWS = 5000


def get_spark(
    app_name: str = "dagli_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is configured — on a real cluster, pass
    ``master=None`` with a pre-configured environment and this is a no-op.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"

    # Python workers must be able to import this package regardless of the
    # driver's cwd (the spark-submit equivalent is --py-files); prepend the
    # repo root to PYTHONPATH before the JVM forks workers.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )

    # One BLAS thread per Python worker: parallelism is Spark's job, not the
    # math library's — otherwise each of N workers spawns one thread per
    # machine core and a local[8] run silently uses every core (and on a
    # real cluster, oversubscribes the executor).
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    builder = SparkSession.builder.appName(app_name).master(master)
    builder = builder.config("spark.executorEnv.PYTHONPATH",
                             os.environ["PYTHONPATH"])
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        builder = builder.config(f"spark.executorEnv.{var}", os.environ[var])

    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        n = n.split(",")[0]  # local[N,maxFailures] carries a second field
        try:
            cores = int(n) if n != "*" else (os.cpu_count() or 8)
        except ValueError:
            cores = 32
        shuffle_partitions = max(8, 2 * cores)

    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": str(ARROW_BATCH_ROWS),
        # Null-propagating edge semantics (Spark 4 defaults ANSI on, which
        # turns double/0 and out-of-range element_at into JOB-KILLING
        # errors mid-pipeline). Operators are additionally hardened with
        # try_divide/try_element_at so they stay safe in ANSI-on sessions
        # the caller may bring (e.g. the correctness driver's own session).
        "spark.sql.ansi.enabled": "false",
        # smaller split size so fat binary-column scans (image decode) get
        # enough tasks to fill all cores on local[N]; a real cluster reading
        # 100 TB has plenty of splits and can keep the 128 MB default.
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        # full ReadSchema lines in explain output: the pruning audit
        # (plans/inspect.scan_columns) refuses truncated schemas
        "spark.sql.maxMetadataStringLength": "10000",
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.aggregatePushdown": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # local[N] puts every "executor" in the driver JVM: size the heap
        # for N concurrent sort/window tasks (a real cluster sets
        # spark.executor.memory per node instead).
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
        "spark.ui.enabled": "false",
        "spark.driver.extraJavaOptions": "-Djava.net.preferIPv4Stack=true",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_all() -> None:
    """Stop the active session if any (used between parallelism-grid tests)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
