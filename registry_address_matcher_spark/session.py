"""SparkSession factory.

Local-mode defaults tuned for the sandbox (single JVM, N threads); on a real
cluster the same builder is driven by spark-submit conf instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "registry_address_matcher_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    Arrow on (pandas-UDF boundary), AQE on (runtime coalesce + skew-join),
    shuffle partitions sized to the local core count rather than the 200
    default — on a real cluster this is set per-job via spark-submit.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and master == "local[*]":
        master = f"local[{cpus}]"
    cluster_shape = _local_cluster_shape(master)  # (executors, cores_per_exec)
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        if master.startswith("local["):
            inner = master[6:-1]
            if inner.isdigit():
                n = int(inner)
        elif cluster_shape:
            n = cluster_shape[0] * cluster_shape[1]
        shuffle_partitions = max(8, n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if cluster_shape:
        # each executor JVM must size its internal thread pools (GC, JIT,
        # ForkJoin) to ITS core slice, not the host's CPU count — a 1-core
        # executor on a 32-CPU box otherwise spawns ~23 GC threads, and 8
        # such executors thrash each other. Real clusters get this from
        # the container's cpuset; local-cluster needs it explicit.
        builder = builder.config(
            "spark.executor.extraJavaOptions",
            f"-XX:ActiveProcessorCount={cluster_shape[1]}",
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark


def _local_cluster_shape(master: str) -> tuple[int, int] | None:
    """Parse ``local-cluster[n, cores, mem]`` -> (n, cores); None otherwise.

    local-cluster mode launches REAL separate executor JVMs (forked by
    in-process Workers) — the closest in-sandbox stand-in for a
    multi-executor cluster, used by the scaling benchmarks."""
    if not master.startswith("local-cluster["):
        return None
    try:
        parts = master[len("local-cluster["):-1].split(",")
        return int(parts[0].strip()), int(parts[1].strip())
    except (ValueError, IndexError):
        return None


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executors' Python workers.

    pandas-UDF closures are pickled by reference, so workers must import
    ``registry_address_matcher_spark`` themselves. On a cluster the job
    ships it via ``spark-submit --py-files``; for programmatic use we zip
    the package once and ``addPyFile`` it — same mechanism, automatic.
    """
    import registry_address_matcher_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    marker = "__ram_spark_pkg_shipped"
    jconf = spark.sparkContext.getConf()
    if jconf.get(marker, None):
        return
    import tempfile
    import zipfile

    zpath = os.path.join(tempfile.mkdtemp(prefix="ram_spark_"), "registry_address_matcher_spark.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "registry_address_matcher_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    spark.sparkContext.getConf().set(marker, "1")
