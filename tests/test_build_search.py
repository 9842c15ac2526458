"""End-to-end: build -> merge -> search, rank-identical to the golden scorer.

Reference analogs: PythonParityTest.java (exact score/rank parity),
WorkflowTest.java / IntegrationTest.java (lifecycle E2E).
"""

import math

import pandas as pd
import pytest

from tantivy4java_spark import queries as Q
from tantivy4java_spark.build import build_index
from tantivy4java_spark.corpus import generate_pandas
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher

from tests.golden import GoldenIndex

N_DOCS = 300
K = 10


@pytest.fixture(scope="module")
def corpus_pdf():
    pdf = generate_pandas(0, N_DOCS, seed=42, min_tokens=20, max_tokens=200)
    pdf["doc_id"] = range(N_DOCS)
    return pdf


@pytest.fixture(scope="module")
def golden(corpus_pdf):
    return GoldenIndex(
        corpus_pdf, "doc_id",
        text_fields={"content": "default"},
        keyword_fields=["repo", "path", "lang"],
    )


@pytest.fixture(scope="module")
def searcher(spark, corpus_pdf, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("e2e_index"))
    cfg = IndexConfig(
        fields=[
            FieldConfig("content", "text", "default"),
            FieldConfig("repo", "string"),
            FieldConfig("path", "string"),
            FieldConfig("lang", "string"),
        ],
        id_cols=["doc_id", "repo", "path", "commit", "lang"],
        content_col="content",
        shard_bits=6,  # 64-doc shards -> exercises multi-shard pruning
    )
    df = spark.createDataFrame(corpus_pdf)
    stats = build_index(spark, df, cfg, index_dir, doc_id_col="doc_id",
                        num_segments=3)
    assert stats.num_docs == N_DOCS
    return IndexSearcher(spark, index_dir)


QUERIES = [
    ("term", Q.Term("content", "shuffle")),
    ("term_highdf", Q.Term("content", "import")),
    ("term_ident", Q.Term("content", "var3")),
    ("bool_and", Q.Boolean(must=[Q.Term("content", "shuffle"),
                                 Q.Term("lang", "java")])),
    ("bool_or", Q.Boolean(should=[Q.Term("content", "executor"),
                                  Q.Term("content", "driver")])),
    ("bool_or_not", Q.Boolean(should=[Q.Term("content", "executor"),
                                      Q.Term("content", "driver")],
                              must_not=[Q.Term("repo", "org0/repo0")])),
    ("field_scoped", Q.Boolean(must=[Q.Term("repo", "org1/repo1"),
                                     Q.Term("content", "partition")])),
    ("phrase0", Q.Phrase("content", ["public", "static"], slop=0)),
    ("phrase2", Q.Phrase("content", ["import", "return"], slop=2)),
    ("boost", Q.Boolean(should=[Q.Boost(Q.Term("content", "merge"), 2.0),
                                Q.Term("content", "index")])),
    ("dismax", Q.DisMax([Q.Term("content", "shuffle"),
                         Q.Term("content", "partition")], tie_breaker=0.3)),
    ("termset", Q.TermSet("lang", ["java", "go"])),
    ("wildcard", Q.Wildcard("content", "shuf*")),
    ("fuzzy", Q.Fuzzy("content", "shufle", distance=1)),
    ("msm2", Q.Boolean(should=[Q.Term("content", "merge"),
                               Q.Term("content", "index"),
                               Q.Term("content", "query")],
                       minimum_should_match=2)),
]


def _assert_rank_identical(spark_rows, golden_topk, name):
    got = [(int(r["doc_id"]), float(r["score"])) for r in spark_rows]
    assert len(got) == len(golden_topk), \
        f"{name}: row count {len(got)} != golden {len(golden_topk)}"
    for (gd, gs), (ed, es) in zip(got, golden_topk):
        assert gd == ed, f"{name}: rank order differs: got {got} want {golden_topk}"
        assert math.isclose(gs, es, rel_tol=1e-9, abs_tol=1e-12), \
            f"{name}: score {gs} != {es} for doc {gd}"


@pytest.mark.parametrize("name,query", QUERIES, ids=[n for n, _ in QUERIES])
def test_rank_identity(searcher, golden, name, query):
    rows = searcher.search(query, limit=K).collect()
    _assert_rank_identical(rows, golden.topk(query, K), name)


@pytest.mark.parametrize("k", [1, 10, 100])
def test_topk_sizes_with_pruning(searcher, golden, k):
    q = Q.Boolean(should=[Q.Term("content", "shuffle"), Q.Term("content", "merge")])
    rows = searcher.search(q, limit=k, prune=True).collect()
    _assert_rank_identical(rows, golden.topk(q, k), f"or_k{k}")
    rows_np = searcher.search(q, limit=k, prune=False).collect()
    _assert_rank_identical(rows_np, golden.topk(q, k), f"or_k{k}_noprune")


def test_pruning_skips_shards(searcher, monkeypatch):
    monkeypatch.setattr(IndexSearcher, "LOCAL_TOPK_MAX_ROWS", 0)
    searcher.search(Q.Term("content", "import"), limit=1).collect()
    m = searcher.last_metrics
    assert m.get("shards_total", 0) >= 2
    assert m.get("shards_scored", 99) <= m["shards_total"]


def test_sha256_invariant(searcher, spark, corpus_pdf):
    """Per-row invariant: content sha256 equality vs the source table."""
    import hashlib
    docs = searcher.docs().select("doc_id", "content_sha256").collect()
    src = {int(r.doc_id): hashlib.sha256(r.content.encode()).hexdigest()
           for r in corpus_pdf.itertuples()}
    assert len(docs) == N_DOCS
    for r in docs:
        assert r["content_sha256"] == src[int(r["doc_id"])]


def test_retrieve_joins_source(searcher, spark, corpus_pdf):
    hits = searcher.search(Q.Term("content", "shuffle"), limit=5)
    src = spark.createDataFrame(corpus_pdf)
    out = searcher.retrieve(hits, src).collect()
    assert len(out) == 5
    assert all(r["content"] is not None for r in out)


def test_exists_and_range(searcher, golden):
    q = Q.Range("doc_id", lower=10, upper=20, include_upper=False)
    rows = searcher.score_query(q).collect()
    assert sorted(int(r["doc_id"]) for r in rows) == list(range(10, 20))
