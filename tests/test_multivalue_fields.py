"""Multi-value (array) fields (reference: BATCH_PROTOCOL.md:58-66 multi-value
columns; arrays handled at parquet_companion/indexing.rs:1178,1544).

Pinned semantics:
- array<string> TEXT field: each element tokenized, positions continue
  across elements with a gap of 2 (the tantivy multi-value position gap) —
  slop-0 phrases NEVER match across element boundaries, slop>=1 can
- array<string> KEYWORD field: one raw term per element (tag semantics),
  tf = element multiplicity
- fieldnorm/avgdl count real tokens only (the boundary separator is
  position-assigned then dropped)
"""

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tantivy4java_spark import queries as Q
from tantivy4java_spark.build import build_index
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher


@pytest.fixture(scope="module")
def mv_idx(spark, tmp_path_factory):
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("body", T.ArrayType(T.StringType())),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ])
    rows = [
        (0, ["alpha beta", "gamma delta"], ["Red", "Blue"]),
        (1, ["alpha beta gamma delta"], ["Red", "Red", "Green"]),
        (2, ["epsilon zeta"], []),
        (3, None, None),
        (4, ["beta", "gamma"], ["blue"]),
    ]
    df = spark.createDataFrame(rows, schema)
    cfg = IndexConfig(fields=[FieldConfig("body", "text"),
                              FieldConfig("tags", "string")],
                      id_cols=["doc_id"])
    idx = str(tmp_path_factory.mktemp("mvidx"))
    build_index(spark, df, cfg, idx, doc_id_col="doc_id")
    return IndexSearcher(spark, idx)


def test_terms_indexed_per_element(mv_idx):
    hits = {r["doc_id"] for r in
            mv_idx.score_query(Q.Term("body", "gamma")).collect()}
    assert hits == {0, 1, 4}


def test_phrase_not_across_elements_slop0(mv_idx):
    # "beta gamma" is adjacent INSIDE doc 1's single element; in doc 0 it
    # spans the element boundary (positions 1 and 4: gap 2 + normal step)
    hits = {r["doc_id"] for r in
            mv_idx.score_query(Q.Phrase("body", ["beta", "gamma"], 0)).collect()}
    assert hits == {1}
    # inside-element phrases still work
    hits2 = {r["doc_id"] for r in
             mv_idx.score_query(Q.Phrase("body", ["alpha", "beta"], 0)).collect()}
    assert hits2 == {0, 1}


def test_phrase_across_elements_with_slop(mv_idx):
    # boundary gap is 2 -> slop 1 lets the phrase cross (pinned contract):
    # doc 0 crosses "alpha beta|gamma delta", doc 4 crosses "beta|gamma"
    hits = {r["doc_id"] for r in
            mv_idx.score_query(Q.Phrase("body", ["beta", "gamma"], 1)).collect()}
    assert hits == {0, 1, 4}


def test_keyword_array_tag_semantics(mv_idx):
    assert {r["doc_id"] for r in
            mv_idx.score_query(Q.Term("tags", "Red")).collect()} == {0, 1}
    # raw match: case preserved, no tokenization
    assert {r["doc_id"] for r in
            mv_idx.score_query(Q.Term("tags", "blue")).collect()} == {4}
    assert {r["doc_id"] for r in
            mv_idx.score_query(Q.Term("tags", "Blue")).collect()} == {0}


def test_avgdl_counts_real_tokens_only(mv_idx):
    # doc 0: 4 tokens, doc 1: 4, doc 2: 2, doc 3: 0, doc 4: 2 -> avg 12/5
    assert mv_idx.avgdl("body") == pytest.approx(12 / 5)


def test_multivalue_scores_match_flat_equivalent(spark, tmp_path):
    """Single-element arrays must score byte-identically to plain strings."""
    texts = ["alpha beta gamma", "beta beta delta", "gamma alpha"]
    arr_df = spark.createDataFrame(
        [(i, [t]) for i, t in enumerate(texts)],
        T.StructType([T.StructField("doc_id", T.LongType()),
                      T.StructField("body", T.ArrayType(T.StringType()))]))
    flat_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "body"])
    cfg = IndexConfig(fields=[FieldConfig("body", "text")], id_cols=["doc_id"])
    ia, ib = str(tmp_path / "arr"), str(tmp_path / "flat")
    build_index(spark, arr_df, cfg, ia, doc_id_col="doc_id")
    build_index(spark, flat_df, cfg, ib, doc_id_col="doc_id")
    sa, sb = IndexSearcher(spark, ia), IndexSearcher(spark, ib)
    q = Q.Term("body", "beta")
    got_a = [(r["doc_id"], r["score"]) for r in sa.search(q, limit=10).collect()]
    got_b = [(r["doc_id"], r["score"]) for r in sb.search(q, limit=10).collect()]
    assert got_a == got_b
