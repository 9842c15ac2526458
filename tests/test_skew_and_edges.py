"""Skew handling evidence (north_rule: mega-terms via split posting shards)
+ degenerate-input robustness."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tantivy4java_spark import queries as Q
from tantivy4java_spark.build import build_index
from tantivy4java_spark.corpus import generate_pandas
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher


def test_mega_term_splits_across_shards(spark, tmp_path):
    """A term present in >30% of docs (FIXTURES.md skew fixture) must spread
    over doc-range shards: every posting-list groupBy key stays bounded by
    the shard width — no hot reducer."""
    n = 600
    rows = [(i, ("megaterm filler%d " % (i % 37)) * 3) for i in range(n)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "content"])
    cfg = IndexConfig(fields=[FieldConfig("content", "text")],
                      id_cols=["doc_id"], content_col="content",
                      shard_bits=7)  # 128-doc shards
    idx = str(tmp_path / "skew_idx")
    build_index(spark, spark.createDataFrame(pdf), cfg, idx, doc_id_col="doc_id")
    s = IndexSearcher(spark, idx)
    blocks = (s.postings().filter(F.col("term") == "megaterm")
              .groupBy("shard").agg(F.sum("count").alias("c")).collect())
    assert len(blocks) == (n + 127) // 128  # spans every shard
    assert all(r["c"] <= 128 for r in blocks)  # bounded per shard
    # and the skewed term still searches correctly
    assert s.count(Q.Term("content", "megaterm")) == n


def test_empty_and_null_content(spark, tmp_path):
    rows = [(0, "real content here", "en"), (1, "", "en"),
            (2, None, "fr"), (3, "more real text", None)]
    df = spark.createDataFrame(rows, ["doc_id", "content", "lang"])
    cfg = IndexConfig(fields=[FieldConfig("content", "text"),
                              FieldConfig("lang", "string")],
                      id_cols=["doc_id", "lang"], content_col="content")
    idx = str(tmp_path / "edge_idx")
    stats = build_index(spark, df, cfg, idx, doc_id_col="doc_id")
    assert stats.num_docs == 4
    s = IndexSearcher(spark, idx)
    assert s.count(Q.Term("content", "real")) == 2
    assert s.count(Q.Term("lang", "en")) == 2
    # empty/null docs exist in the doc store, never match text terms
    assert s.docs().count() == 4
    assert s.count(Q.MatchAll()) == 4


def test_single_doc_index(spark, tmp_path):
    df = spark.createDataFrame([(0, "only one document")], ["doc_id", "content"])
    cfg = IndexConfig(fields=[FieldConfig("content", "text")],
                      id_cols=["doc_id"], content_col="content")
    idx = str(tmp_path / "one_idx")
    build_index(spark, df, cfg, idx, doc_id_col="doc_id")
    s = IndexSearcher(spark, idx)
    hits = s.search(Q.Term("content", "document"), limit=10).collect()
    assert len(hits) == 1 and hits[0]["doc_id"] == 0
