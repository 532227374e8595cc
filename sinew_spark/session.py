"""SparkSession construction + package shipping.

The engine is launched with ``spark-submit --py-files sinew_spark.zip`` on a
real cluster (north rule). For local/driver-created sessions, ``get_spark``
zips this package and ships it via ``addPyFile`` so executor Python workers
can import it (they do NOT inherit the driver's sys.path).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))


def package_zip(dest_dir: str | None = None) -> str:
    """Zip the sinew_spark package for --py-files / addPyFile shipping."""
    dest_dir = dest_dir or tempfile.gettempdir()
    zip_path = os.path.join(dest_dir, "sinew_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join("sinew_spark", os.path.relpath(full, _PKG_DIR))
                zf.write(full, rel)
    return zip_path


def get_spark(
    master: str | None = None,
    app_name: str = "sinew-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build a SparkSession tuned for the crawl engine.

    Defaults follow the scale guidance: AQE on (runtime re-plan + skew join),
    Arrow on (all UDFs are Arrow-batched), shuffle partitions sized to cores
    locally (the 200 default over-parallelizes small rounds and
    under-parallelizes 100 TB ones — size per deployment).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else cpus
        shuffle_partitions = (os.cpu_count() or 4) if n == "*" else int(n)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    # ship the package to executors unless it is already importable there
    # (i.e. launched via spark-submit --py-files or PYTHONPATH)
    repo_root = os.path.dirname(_PKG_DIR)
    if repo_root not in os.environ.get("PYTHONPATH", ""):
        spark.sparkContext.addPyFile(package_zip())
    warmup(spark)
    return spark


def warmup(spark: SparkSession) -> None:
    """One-time per-JVM/executor warmups that otherwise land in the first
    unlucky query: ICU collation init and the Python worker pool."""
    warmup_collation(spark)
    warmup_python_workers(spark)


def warmup_collation(spark: SparkSession) -> None:
    """Force Spark 4's CollationAwareUTF8String static init once, up front.

    The first task that executes a collation-aware string function (lower/
    upper/initcap/contains...) triggers ICU initialization inside the class
    initializer — 10-30 s on this box — while every other task in the stage
    blocks on the class-init monitor (observed via jstack: 32 tasks RUNNABLE
    'waiting on the Class initialization monitor for ...CollationAwareUTF8String'
    in CollationSupport$Lower.execBinaryICU). Paying it here keeps it out of
    every first query. One row per core so every executor JVM on a cluster
    initializes, not just the driver."""
    from pyspark.sql import functions as F

    p = spark.sparkContext.defaultParallelism
    (
        spark.range(p)
        .repartition(p)
        .select(F.lower(F.concat(F.lit("Æß"), F.col("id").cast("string"))))
        .count()
    )


def warmup_python_workers(spark: SparkSession) -> None:
    """Pre-fork the Arrow Python worker pool (one per core). Worker creation
    is serialized behind SparkEnv.createPythonWorker's KeyLock (observed via
    jstack), so the first pandas-UDF stage otherwise pays ~32 sequential
    daemon forks; with spark.python.worker.reuse (default) the pool persists
    for the session."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _identity(s):
        return s

    p = spark.sparkContext.defaultParallelism
    spark.range(p).repartition(p).select(_identity(F.col("id"))).count()
