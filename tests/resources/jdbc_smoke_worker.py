"""Subprocess worker for the JDBC smoke test.

Runs in its own process because the stub driver jar must be on the
DRIVER classpath before the JVM starts (``spark.driver.extraClassPath``
cannot be applied to a running JVM, and the pytest session already holds
one). Prints one JSON line with the collected rows.

Usage: python jdbc_smoke_worker.py <classpath_dir>
"""

import json
import os
import sys

classpath = sys.argv[1]
# repo root (two levels up) on the path — the worker runs by file path,
# so Python only adds tests/resources/ automatically
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[2]")
    .appName("jdbc-smoke")
    .config("spark.driver.extraClassPath", classpath)
    .config("spark.executor.extraClassPath", classpath)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

from registry_address_matcher_spark.sources.io import read_registry  # noqa: E402

df = read_registry(
    spark,
    "jdbc:stub:mem?rows=7",
    dbtable="registry",
    driver="stubjdbc.StubDriver",
)
rows = [[r["id"], r["name"], r["val"]] for r in df.orderBy("id").collect()]
print(json.dumps({"schema": df.columns, "rows": rows}))
spark.stop()
