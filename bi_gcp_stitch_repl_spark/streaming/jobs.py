"""Structured Streaming jobs over the ``events`` table.

The reference has no true streaming (SURVEY §2.10) — its closest semantics
are daily micro-batch crons plus the keyset watermark. The engine models
those as ``Trigger.AvailableNow`` incremental runs (exactly the reference's
"process everything new, then stop" contract, with checkpointed offsets
replacing the Airflow-Variable cursor) and adds the real streaming operators
the extension surface needs: watermarked tumbling windows and session
windows.

Batch-equivalents of these aggregations live in ``queries.windows``
(st_tumbling_window / st_session_windows) where DuckDB can oracle-check the
semantics; these jobs are the same logical plans under ``readStream``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_stream(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """File-source stream over an events directory (parquet). For the
    driver's nanosecond-timestamp fixture, pass the long-typed schema and
    the micros conversion happens here, mirroring queries.catalog.tables."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    # the file stream source wants a directory; a single-file path becomes
    # its parent dir + a glob filter (the driver fixture is one file/table)
    if path.endswith(".parquet"):
        import os

        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    df = reader.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per event type. Late rows
    beyond the watermark are dropped (state is bounded — the property that
    lets this run forever on an unbounded stream)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native session windows (inactivity gap) per user — the streaming
    form of queries.windows.st_session_windows' gaps-and-islands batch
    plan. session_window keeps per-user state only until watermark + gap."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def incremental_merge_stream(
    events: DataFrame,
    table,
    keys: list[str],
    checkpoint: str,
):
    """The reference's S4 incremental-replication pipeline as a streaming
    sink: each micro-batch merge-upserts into the parquet table
    (foreachBatch + sinks.merge.ParquetTable), with offsets checkpointed by
    Spark instead of a hand-rolled watermark variable. AvailableNow trigger
    = the daily-cron semantics; the same job with a processing-time trigger
    is continuous replication."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            table.merge_upsert(batch_df, keys=keys)

    return (
        events.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
