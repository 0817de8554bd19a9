"""Structured Streaming: windowed stats over the events stream driven to
completion with a memory sink; foreachBatch incremental update."""

import os

import pytest
from pyspark.sql import functions as F


def test_windowed_stats_stream_matches_batch(spark, sf_dir, tmp_path):
    import shutil

    from osm_replication_rust_spark.streaming.incremental import windowed_change_stats

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {
        (r.win_start, r.event_type): (r.n, round(r.sum_value, 6))
        for r in windowed_change_stats(batch).collect()
    }

    # the streaming file source wants a directory of files
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "part-0.parquet")
    stream = spark.readStream.schema(batch.schema).parquet(str(stream_dir))
    q = (
        windowed_change_stats(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_stats")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.win_start, r.event_type): (r.n, round(r.sum_value, 6))
            for r in spark.sql("SELECT * FROM win_stats").collect()
        }
    finally:
        q.stop()
    assert got == want
    assert len(got) > 10


def test_stream_update_foreachbatch(spark, regions, images_pdf, tmp_path):
    """Drive the incremental MERGE pipeline through a streaming query;
    re-delivery is a no-op thanks to the idempotent store."""
    from osm_replication_rust_spark.datagen.synth import gen_diffs
    from osm_replication_rust_spark.operators.merge import TableStore
    from osm_replication_rust_spark.streaming.incremental import stream_update

    base = spark.createDataFrame(images_pdf[["image_id", "caption", "phash"]].iloc[:200])
    diffs_pdf = gen_diffs(images_pdf.iloc[:200], n_batches=2)
    diff_dir = str(tmp_path / "diffs")
    spark.createDataFrame(diffs_pdf).write.parquet(diff_dir)

    store = TableStore(spark, str(tmp_path / "tbl"))
    store.init(base)

    stream = spark.readStream.schema(
        spark.read.parquet(diff_dir).schema
    ).parquet(diff_dir)
    q = stream_update(
        stream, store, regions, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert store.last_state() == 2
    assert os.path.exists(str(tmp_path / "out/tiles/state=2"))
