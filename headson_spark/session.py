"""SparkSession helpers with scale-appropriate defaults."""

from __future__ import annotations

import os


def get_spark(app: str = "headson_spark", master: str | None = None,
              shuffle_partitions: int | None = None, extra: dict | None = None):
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or max(cpus, 8)
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    b = (SparkSession.builder.appName(app).master(master)
         # local mode: the driver JVM hosts all executor threads — size it
         # for the box (128 GiB available), not Spark's 1g default
         .config("spark.driver.memory", driver_mem)
         .config("spark.driver.maxResultSize", "4g")
         # AQE: runtime coalescing + skew-join splitting — the first line of
         # defense for conv_id skew at 100 TB
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.shuffle.partitions", str(shuffle))
         # Arrow exchange for all pandas UDF / mapInPandas kernels
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
         # timestamps in the transcript schema are UTC event time
         .config("spark.sql.session.timeZone", "UTC"))
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
