"""Structured-Streaming face of the incremental pipeline.

The reference's replication loop is micro-batch by construction (one
minutely .osc diff per state, /root/reference/src/update.rs:74-144), so
the natural Spark mapping is:

- a diff *stream* (files arriving in a directory, or a rate/Kafka
  source) processed with ``foreachBatch`` — each micro-batch runs the
  same set-based stages as plans/pipeline.run_update and commits through
  the idempotent TableStore (exactly-once via state-keyed MERGE);
- watermarked windowed aggregation for the observability stream
  (events/sec, changes per region per window) — the reference's
  stats counters (/root/reference/src/osmbin.rs:66-77) as a live query.

No watermark is needed for the diff path itself: event-time == state
sequence and states are strictly ordered (reference guarantees
sequential processing; we keep that contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geometry import MultiPolygon
from ..operators.filter import classify_diff
from ..operators.merge import TableStore


def windowed_change_stats(events: DataFrame, window: str = "5 minutes") -> DataFrame:
    """Watermarked tumbling-window stats over a timestamped change/event
    stream: counts + value sum per (window, event_type). Works on a
    batch frame too (same plan, no watermark)."""
    # watermarks require TIMESTAMP (LTZ); parquet often carries NTZ.
    # The session TZ is pinned to UTC, so the cast is lossless.
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts", "10 minutes")
    return src.groupBy(F.window("ts", window).alias("win"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sum_value"),
    ).select(
        F.col("win.start").alias("win_start"),
        "event_type",
        "n",
        "sum_value",
    )


def stream_update(
    diff_stream: DataFrame,
    store: TableStore,
    regions: list[MultiPolygon],
    out_dir: str,
    checkpoint_dir: str,
):
    """Run the incremental update as a streaming query: each micro-batch
    may contain one or more states; they are applied in order through
    the idempotent store (re-delivered batches are no-ops). Returns the
    StreamingQuery handle."""
    from ..plans.pipeline import run_update

    def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        run_update(store, batch_df, regions, out_dir)

    return (
        diff_stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
