"""Incremental add_documents (S2/S3 analog) + preload/count APIs."""

import pytest

from tantivy4java_spark import queries as Q
from tantivy4java_spark.build import build_index
from tantivy4java_spark.corpus import generate_pandas
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher
from tantivy4java_spark.streaming import add_documents


def _cfg():
    return IndexConfig(fields=[FieldConfig("content", "text"),
                               FieldConfig("lang", "string")],
                       id_cols=["lang"], content_col="content")


def test_add_documents_then_search(spark, tmp_path):
    pdf = generate_pandas(0, 80, min_tokens=12, max_tokens=30)
    idx = str(tmp_path / "appidx")
    build_index(spark, spark.createDataFrame(pdf), _cfg(), idx,
                order_cols=["repo", "path", "commit"], num_segments=2)
    s0 = IndexSearcher(spark, idx)
    n0 = s0.count(Q.Term("content", "import"))

    extra = generate_pandas(1000, 40, min_tokens=12, max_tokens=30)
    add_documents(spark, _cfg(), idx, spark.createDataFrame(extra))

    s1 = IndexSearcher(spark, idx)
    assert s1.num_docs == 120
    n1 = s1.count(Q.Term("content", "import"))
    expected_extra = sum("import" in t.split() for t in extra["content"])
    assert n1 == n0 + expected_extra
    # global stats now reflect both batches (idf consistency)
    assert s1.field_stats["content"]["total_tokens"] > \
        s0.field_stats["content"]["total_tokens"]


def test_preload_and_warmup(spark, tmp_path):
    pdf = generate_pandas(0, 40, min_tokens=10, max_tokens=20)
    idx = str(tmp_path / "preidx")
    build_index(spark, spark.createDataFrame(pdf), _cfg(), idx,
                order_cols=["repo", "path", "commit"])
    s = IndexSearcher(spark, idx)
    s.preload(["terms", "postings"])
    s.warmup_query(Q.Term("content", "import"))
    assert s.postings().is_cached
    hits = s.search(Q.Term("content", "import"), limit=5).collect()
    assert len(hits) <= 5
