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


def stream_host_running_totals(
    spark: SparkSession,
    events_dir: str,
    schema: str,
    checkpoint_dir: str,
    key_col: str = "event_type",
    query_name: str = "host_running_totals",
):
    """Custom stateful streaming operator via ``applyInPandasWithState`` —
    the continuous analog of the per-host NetworkInfo accumulation
    (crawler.go:186-219): per-key state carries (n_events, value_milli)
    across micro-batches; each batch emits the key's updated running totals.
    This is the plug-point shape for continuous per-host politeness budgets
    (state = token balance) at crawl scale."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, vm = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            vm += int(np.floor(pdf["value"].to_numpy() * 1000).sum())
        state.update((n, vm))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "value_milli": [vm]}
        )

    src = spark.readStream.schema(schema).parquet(events_dir)
    out = src.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} string, n_events long, value_milli long",
        stateStructType="n long, vm long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_events(
    spark: SparkSession,
    events_dir: str,
    schema: str,
    checkpoint_dir: str,
    key_col: str = "event_id",
    ts_col: str = "ts",
    watermark: str = "2 hours",
    query_name: str = "deduped_events",
):
    """Streaming exact dedup — the continuous analog of the crawl's URL-seen
    set (J1/SO1): ``dropDuplicates`` on the key with a watermark bounding the
    dedup state (keys older than the watermark age out of the state store,
    exactly how a production stream keeps the seen-set finite; the batch
    crawl's equivalent bound is the bloom + visited table)."""
    src = (
        spark.readStream.schema(schema).parquet(events_dir)
        .withWatermark(ts_col, watermark)
        .dropDuplicates([key_col])
        .select(key_col, ts_col, "event_type")
    )
    return (
        src.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_sessionize(
    spark: SparkSession,
    events_dir: str,
    schema: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "2 hours",
    query_name: str = "sessionized_events",
):
    """Streaming sessionization via Spark's native ``session_window`` — the
    continuous analog of the batch ``temporal.sessionize`` (T40): per-key
    session aggregates whose windows merge while events arrive within
    ``gap`` of each other; the watermark lets closed sessions age out of the
    state store, so state is bounded by active sessions, not history.

    Boundary semantics differ from T40 by design: ``session_window`` is
    half-open ([ts, ts+gap) per event, merged), so a successor exactly
    ``gap`` later starts a NEW session, where the batch operator's
    ``diff > gap`` rule keeps it. The parity contract here is
    stream ≡ batch ``session_window`` (same built-in, both engines' modes),
    asserted by tests/test_scrape_stream.py."""
    src = (
        spark.readStream.schema(schema).parquet(events_dir)
        .withWatermark(ts_col, watermark)
    )
    agg = _session_agg(src, gap, key_col, ts_col)
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _session_agg(df: DataFrame, gap: str, key_col: str, ts_col: str) -> DataFrame:
    """Shared session-window aggregation — the SAME plan fragment serves the
    batch frame and the stream (stream-batch unification is the point of the
    DataFrame API; the parity test runs this in both modes)."""
    return (
        df.groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"),
            key_col,
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            key_col,
            "n_events",
            "value_cents",
        )
    )
