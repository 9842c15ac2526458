"""Structured-Streaming incremental indexing (txlog S16 analog):
file-source micro-batches -> segments -> refresh -> queryable; results equal
a batch build over the same rows."""

import os

import pytest

from tantivy4java_spark import queries as Q
from tantivy4java_spark.build import build_index
from tantivy4java_spark.corpus import generate_pandas
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher
from tantivy4java_spark.streaming import StreamingIndexWriter


def _cfg():
    return IndexConfig(
        fields=[FieldConfig("content", "text"), FieldConfig("lang", "string")],
        id_cols=["lang"], content_col="content")


def test_stream_then_refresh_matches_batch(spark, tmp_path):
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    pdf_all = generate_pandas(0, 90, min_tokens=15, max_tokens=40)
    # three "arriving" files
    for i in range(3):
        part = pdf_all.iloc[i * 30:(i + 1) * 30]
        spark.createDataFrame(part).coalesce(1).write.mode("overwrite") \
            .parquet(os.path.join(src, f"f{i}"))

    schema = spark.read.parquet(os.path.join(src, "f0")).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "*")))
    idx = str(tmp_path / "stream_idx")
    w = StreamingIndexWriter(spark, _cfg(), idx)
    q = w.start(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    action = w.refresh()
    assert action["num_docs"] == 90
    s = IndexSearcher(spark, idx)
    assert s.num_docs == 90

    # compare hit sets against a batch build over the same rows
    batch_idx = str(tmp_path / "batch_idx")
    pdf_all = pdf_all.reset_index(drop=True)
    build_index(spark, spark.createDataFrame(pdf_all), _cfg(), batch_idx,
                order_cols=["repo", "path", "commit"])
    sb = IndexSearcher(spark, batch_idx)
    query = Q.Boolean(should=[Q.Term("content", "import"),
                              Q.Term("content", "merge")])
    stream_hits = s.search(query, limit=200).collect()
    batch_hits = sb.search(query, limit=200).collect()
    assert len(stream_hits) == len(batch_hits)
    # doc_ids differ (different id spaces) but the score multiset must match
    assert sorted(round(r["score"], 9) for r in stream_hits) == \
        sorted(round(r["score"], 9) for r in batch_hits)


def test_stream_replay_is_idempotent(spark, tmp_path):
    src = str(tmp_path / "in2")
    os.makedirs(src)
    pdf = generate_pandas(0, 30, min_tokens=10, max_tokens=30)
    spark.createDataFrame(pdf).coalesce(1).write.parquet(os.path.join(src, "f0"))
    schema = spark.read.parquet(os.path.join(src, "f0")).schema
    idx = str(tmp_path / "idem_idx")
    w = StreamingIndexWriter(spark, _cfg(), idx)
    stream = spark.readStream.schema(schema).parquet(os.path.join(src, "*"))
    w.start(stream, checkpoint_dir=str(tmp_path / "ck2")).awaitTermination(300)
    # replaying the same batch id must be a no-op
    batch_df = spark.read.parquet(os.path.join(src, "f0"))
    w.process_batch(batch_df, 0)
    adds = [a for a in w.builder._manifest_actions() if a["action"] == "add"]
    assert len(adds) == 1
    w.refresh()
    assert IndexSearcher(spark, idx).num_docs == 30
