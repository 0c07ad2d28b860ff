"""Structured Streaming surface (SURVEY.md §2.9).

The crawl loop itself uses driver-controlled micro-batch rounds (checkpoint
granularity must be the round — see streaming/rounds.py), but the engine also
exposes the genuine Structured Streaming path for stream-shaped inputs: a
file-source stream of crawl/fetch events with watermarked tumbling-window
aggregation — the continuous analog of the per-round metrics table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812


def stream_event_window_counts(
    spark: SparkSession,
    events_dir: str,
    schema: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
):
    """readStream(files) → watermark → windowed count/sum → memory sink.

    Returns the StreamingQuery (availableNow trigger: drains existing files
    then stops — deterministic for tests; on a cluster the same query runs
    continuously with the identical plan)."""
    src = (
        spark.readStream.schema(schema).parquet(events_dir)
        .withWatermark(ts_col, watermark)
    )
    agg = (
        src.groupBy(F.window(F.col(ts_col), window).alias("win"), key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("value_milli"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            key_col,
            "n_events",
            "value_milli",
        )
    )
    return (
        agg.writeStream.format("memory")
        .queryName("event_window_counts")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streamed_counts_df(spark: SparkSession) -> DataFrame:
    return spark.table("event_window_counts")
