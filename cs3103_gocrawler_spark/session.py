"""SparkSession construction with the engine's required configs."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "cs3103_gocrawler_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """local[N] for tests/bench; on a real cluster the same builder runs under
    spark-submit (master/conf come from the submit environment)."""
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        # match parallelism, not the 200 default — avoids tiny-partition overhead
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cores if n in ("", "*") else max(int(n), 1)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # exploit the bucketed pages table's per-bucket SORT order in the
        # fetch SortMergeJoin: without this (off by default since 3.0) every
        # round re-sorts the full payload side (~2.5 KB/row) before the
        # join. Safe here: register_bucketed_pages writes exactly one file
        # per bucket (repartition before bucketBy), the case the sorted-scan
        # metadata requires.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        # Arrow batch sizing is a memory-vs-roundtrip tradeoff, and with wide
        # payload rows (image bytes + html, ~2.5 KB/row) memory wins: 64k-row
        # batches are ~160 MB in flight per task, which at 32 concurrent
        # workers caused multi-GB python-worker RSS spikes, worker kills, and
        # task retries (measured: 120 s vs 18 s for the same 1M-URL round).
        # 8k rows ≈ 20 MB payload batches, and narrow-column UDF stages lose
        # nothing measurable (Arrow overhead amortizes by ~1k rows).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.driver.maxResultSize", "8g")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
