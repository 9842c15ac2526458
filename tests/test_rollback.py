"""Rollback (S5 — IndexWriter.rollback analog, core/IndexWriter.java:133):
uncommitted segment adds are discarded; committed state is untouched.

Plus the jsonRange cluster-side join: a wide numeric range over a
high-cardinality JSON path must work without collecting term strings to the
driver.
"""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from tantivy4java_spark import maintenance as M
from tantivy4java_spark import queries as Q
from tantivy4java_spark.build import active_segments, build_index, IndexBuilder
from tantivy4java_spark.corpus import generate_pandas
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher
from tantivy4java_spark.streaming import add_documents


def _cfg():
    return IndexConfig(
        fields=[FieldConfig("content", "text"), FieldConfig("lang", "string")],
        id_cols=["lang"], content_col="content")


def test_add_rollback_search_shows_precommit_state(spark, tmp_path):
    idx = str(tmp_path / "rbidx")
    pdf = generate_pandas(0, 80, min_tokens=15, max_tokens=40)
    build_index(spark, spark.createDataFrame(pdf), _cfg(), idx,
                order_cols=["repo", "path", "commit"])
    s = IndexSearcher(spark, idx)
    base_hits = {(r["doc_id"], round(r["score"], 9))
                 for r in s.search(Q.Term("content", "import"), limit=500).collect()}
    assert s.num_docs == 80

    # uncommitted add -> rollback
    extra = generate_pandas(1000, 30, min_tokens=15, max_tokens=40)
    add_documents(spark, _cfg(), idx, spark.createDataFrame(extra), commit=False)
    rolled = M.rollback(spark, idx)
    assert len(rolled) == 1
    # rolled-back segment dir is gone
    import os
    assert not os.path.exists(
        os.path.join(idx, "segments", f"seg={rolled[0]:05d}"))

    # searcher state (merged tables) is untouched
    s2 = IndexSearcher(spark, idx)
    assert s2.num_docs == 80
    got = {(r["doc_id"], round(r["score"], 9))
           for r in s2.search(Q.Term("content", "import"), limit=500).collect()}
    assert got == base_hits

    # a LATER commit must not resurrect the rolled-back rows
    extra2 = generate_pandas(2000, 10, min_tokens=15, max_tokens=40)
    add_documents(spark, _cfg(), idx, spark.createDataFrame(extra2), commit=True)
    s3 = IndexSearcher(spark, idx)
    assert s3.num_docs == 90  # 80 + 10, NOT + 30
    # segment ids are never reused after rollback (opstamp monotonicity)
    builder = IndexBuilder(spark, _cfg(), idx)
    acts = builder._manifest_actions()
    adds = [a["segment"] for a in acts if a["action"] == "add"]
    assert len(adds) == len(set(adds))


def test_rollback_noop_when_committed(spark, tmp_path):
    idx = str(tmp_path / "rbnoop")
    pdf = generate_pandas(0, 40, min_tokens=10, max_tokens=30)
    build_index(spark, spark.createDataFrame(pdf), _cfg(), idx,
                order_cols=["repo", "path", "commit"])
    assert M.rollback(spark, idx) == []  # nothing uncommitted
    assert IndexSearcher(spark, idx).num_docs == 40


def test_kill_then_rollback_then_rebuild(spark, tmp_path):
    """Interrupted multi-segment build -> rollback wipes partial adds ->
    a fresh build() re-runs them (resume semantics respect rollback)."""
    idx = str(tmp_path / "rbkill")
    pdf = generate_pandas(0, 90, min_tokens=10, max_tokens=30)
    df = spark.createDataFrame(pdf)
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, df, _cfg(), idx, order_cols=["repo", "path", "commit"],
                    num_segments=3, fail_after_segments=1)
    rolled = M.rollback(spark, idx)
    assert len(rolled) == 1
    builder = IndexBuilder(spark, _cfg(), idx)
    assert active_segments(builder._manifest_actions()) == []
    stats = build_index(spark, df, _cfg(), idx,
                        order_cols=["repo", "path", "commit"], num_segments=3)
    assert stats.num_docs == 90
    assert IndexSearcher(spark, idx).num_docs == 90


def test_json_range_high_cardinality_cluster_side(spark, tmp_path):
    """jsonRange over 20k distinct path values: correct and collect-free
    (the matched-terms frame joins postings on the cluster)."""
    n = 20_000
    pdf = pd.DataFrame({
        "event_id": range(n),
        "props": [f'{{"k": {i}}}' for i in range(n)],
    })
    cfg = IndexConfig(fields=[FieldConfig("props", "json")],
                      id_cols=["event_id"])
    idx = str(tmp_path / "jsonrange")
    build_index(spark, spark.createDataFrame(pdf), cfg, idx,
                doc_id_col="event_id")
    s = IndexSearcher(spark, idx)
    q = Q.Range("props.k", 500, 15_499, True, True)
    out = s.score_query(q)
    # plan sanity: the postings scan carries the prefix pushdown and a join,
    # not a literal IN list of 15k terms
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "StringStartsWith" in plan
    assert plan.count("Join") >= 1
    assert out.count() == 15_000
    ids = {r["doc_id"] for r in out.collect()}
    assert min(ids) == 500 and max(ids) == 15_499
