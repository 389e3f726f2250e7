"""SparkSession factory tuned for the engine.

Mirrors the reference's context creation/caching (`create-context`,
reference config.clj:302-340) — but the "context" here is a SparkSession
with the engine's scale-oriented defaults: AQE on, Arrow on, sane shuffle
partition count for local testing (overridable for cluster runs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "clj-nlp-parse-spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    parallelism: local core count; default $SPARK_GRAFT_CPUS or 32.
    On a real cluster pass master via spark-submit and these local[]
    settings are ignored.
    """
    cpus = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuf = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime coalesce + skew-join splitting — required at scale.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuf))
        # Arrow for every pandas UDF / applyInPandas crossing.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size bounds JVM-side bytes in flight per task. Image
        # rows are ~27 KB (bytes column): 10k-row batches × 32 tasks would
        # hold >8 GB in flight and turn the job into a GC benchmark; 2048
        # keeps ~55 MB/task while still amortizing the Python call.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("SPARK_GRAFT_ARROW_BATCH", "2048"))
        # Nested-schema pruning: the engine's panon struct columns benefit.
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # UTC session tz: parquet timestamps compare stably with the oracle.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
