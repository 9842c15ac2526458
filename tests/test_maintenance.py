"""Delete / tombstone / merge-with-deletes tests (S6/S7 analogs:
IndexWriter.deleteDocuments*, merge preserving deletes)."""

import pytest

from tantivy4java_spark import maintenance as M
from tantivy4java_spark import queries as Q
from tantivy4java_spark.build import build_index
from tantivy4java_spark.corpus import generate_pandas
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher


@pytest.fixture()
def built(spark, tmp_path):
    pdf = generate_pandas(0, 120, min_tokens=15, max_tokens=50)
    pdf["doc_id"] = range(120)
    cfg = IndexConfig(fields=[FieldConfig("content", "text"),
                              FieldConfig("lang", "string")],
                      id_cols=["doc_id", "lang"], content_col="content")
    idx = str(tmp_path / "delidx")
    build_index(spark, spark.createDataFrame(pdf), cfg, idx, doc_id_col="doc_id")
    return idx, pdf


def test_delete_by_term_then_apply(spark, built):
    idx, pdf = built
    s = IndexSearcher(spark, idx)
    before = {r["doc_id"] for r in
              s.search(Q.Term("content", "import"), limit=200).collect()}
    victims = {r["doc_id"] for r in
               s.score_query(Q.Term("lang", "java")).collect()}
    n = M.delete_by_term(spark, idx, "lang", "java")
    assert n == len(victims) > 0

    # tombstone phase: deleted docs invisible to search and doc store
    s2 = IndexSearcher(spark, idx)
    after = {r["doc_id"] for r in
             s2.search(Q.Term("content", "import"), limit=200).collect()}
    assert after == before - victims
    assert s2.docs().count() == 120 - len(victims)
    # stats unchanged until merge applies deletes (tantivy semantics)
    assert s2.num_docs == 120

    # merge-with-deletes: physical removal + stats refresh
    removed = M.apply_deletes(spark, idx)
    assert removed == len(victims)
    s3 = IndexSearcher(spark, idx)
    assert s3.num_docs == 120 - len(victims)
    assert s3.docs().count() == 120 - len(victims)
    final = {r["doc_id"] for r in
             s3.search(Q.Term("content", "import"), limit=200).collect()}
    assert final == after
    assert not victims & {r["doc_id"] for r in
                          s3.score_query(Q.MatchAll()).collect()}


def test_explain_components(spark, built):
    idx, pdf = built
    s = IndexSearcher(spark, idx)
    hit = s.search(Q.Term("content", "import"), limit=1).collect()[0]
    rows = s.explain(Q.Term("content", "import"), hit["doc_id"]).collect()
    assert len(rows) == 1
    r = rows[0]
    import math
    from tantivy4java_spark.scoring import bm25
    expect = bm25(r["tf"], r["df"], r["quantized_len"], s.num_docs,
                  s.avgdl("content"))
    assert math.isclose(r["score"], expect, rel_tol=1e-9)
    assert math.isclose(r["score"], hit["score"], rel_tol=1e-9)


def test_sort_by_field_and_offset(spark, built):
    idx, pdf = built
    s = IndexSearcher(spark, idx)
    q = Q.Term("content", "import")
    all_hits = s.search(q, limit=200).collect()
    by_field = s.search(q, limit=5, order_by_field="doc_id",
                        ascending=True).collect()
    expect = sorted(r["doc_id"] for r in all_hits)[:5]
    assert [r["doc_id"] for r in by_field] == expect
    paged = s.search(q, limit=5, offset=3).collect()
    assert [r["doc_id"] for r in paged] == \
        [r["doc_id"] for r in all_hits[3:8]]


def test_add_after_apply_deletes_keeps_compacted_docs(spark, built):
    """apply_deletes compacts into a real segment, so a LATER incremental
    add + commit must re-merge without losing the compacted corpus."""
    from tantivy4java_spark.corpus import generate_pandas
    from tantivy4java_spark.streaming import add_documents
    idx, pdf = built
    s0 = IndexSearcher(spark, idx)
    victim_ids = {r["doc_id"] for r in
                  s0.score_query(Q.Term("lang", "java")).collect()}
    victims = M.delete_by_term(spark, idx, "lang", "java")
    assert victims == len(victim_ids) > 0
    assert M.apply_deletes(spark, idx) == victims
    live = 120 - victims
    assert IndexSearcher(spark, idx).num_docs == live

    extra = generate_pandas(5000, 15, min_tokens=10, max_tokens=30)
    cfg = IndexConfig(fields=[FieldConfig("content", "text"),
                              FieldConfig("lang", "string")],
                      id_cols=["doc_id", "lang"], content_col="content")
    add_documents(spark, cfg, idx, spark.createDataFrame(extra), commit=True)
    s = IndexSearcher(spark, idx)
    assert s.num_docs == live + 15  # compacted docs survived the re-merge
    # the original deleted docs stay gone; old and new docs both searchable
    assert not victim_ids & {r["doc_id"] for r in
                             s.score_query(Q.MatchAll()).collect()}
    assert s.score_query(Q.Term("content", "import")).count() > 0


def test_garbage_collect(spark, built):
    import os
    idx, pdf = built
    # orphan a fake temp dir + run a delete/apply cycle to supersede segments
    os.makedirs(os.path.join(idx, "junk__new"), exist_ok=True)
    M.delete_by_term(spark, idx, "lang", "go")
    M.apply_deletes(spark, idx)
    # apply_deletes already removed superseded segment dirs; GC must remove
    # the temp leftover and keep the live compacted segment
    removed = M.garbage_collect(spark, idx)
    assert any(p.endswith("junk__new") for p in removed)
    s = IndexSearcher(spark, idx)
    n = s.num_docs
    assert s.postings().count() > 0
    assert IndexSearcher(spark, idx).score_query(Q.MatchAll()).count() == n
