"""JSON field queries (Q11: jsonTermQuery / jsonRangeQuery / jsonExistsQuery
with dot-path addressing — query/Query.java:320-417, README.md:111-179)."""

import json

import pytest

from tantivy4java_spark import queries as Q
from tantivy4java_spark.build import build_index
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher


@pytest.fixture(scope="module")
def jsearcher(spark, tmp_path_factory):
    rows = []
    for i in range(60):
        data = {
            "k": i % 10,
            "address": {"city": ["paris", "tokyo", "oslo"][i % 3],
                        "zip": 10000 + i},
            "tags": ["alpha", "beta"] if i % 2 == 0 else ["gamma"],
        }
        if i % 5 == 0:
            data["flag"] = True
        rows.append((i, json.dumps(data), f"cat{i % 4}"))
    df = spark.createDataFrame(rows, ["doc_id", "data", "category"])
    cfg = IndexConfig(
        fields=[FieldConfig("data", "json"), FieldConfig("category", "string")],
        id_cols=["doc_id", "category"])
    idx = str(tmp_path_factory.mktemp("json_idx"))
    build_index(spark, df, cfg, idx, doc_id_col="doc_id")
    return IndexSearcher(spark, idx)


def test_json_term_int(jsearcher):
    hits = jsearcher.score_query(Q.Term("data.k", 7)).collect()
    assert sorted(r["doc_id"] for r in hits) == [i for i in range(60) if i % 10 == 7]


def test_json_term_nested_path(jsearcher):
    hits = jsearcher.score_query(Q.Term("data.address.city", "tokyo")).collect()
    assert sorted(r["doc_id"] for r in hits) == [i for i in range(60) if i % 3 == 1]


def test_json_term_array_element(jsearcher):
    hits = jsearcher.score_query(Q.Term("data.tags", "gamma")).collect()
    assert sorted(r["doc_id"] for r in hits) == [i for i in range(60) if i % 2 == 1]


def test_json_term_bool(jsearcher):
    hits = jsearcher.score_query(Q.Term("data.flag", True)).collect()
    assert sorted(r["doc_id"] for r in hits) == list(range(0, 60, 5))


def test_json_range(jsearcher):
    hits = jsearcher.score_query(
        Q.Range("data.address.zip", 10010, 10019, True, True)).collect()
    assert sorted(r["doc_id"] for r in hits) == list(range(10, 20))


def test_json_exists_subpath(jsearcher):
    hits = jsearcher.score_query(Q.Exists("data.flag")).collect()
    assert sorted(r["doc_id"] for r in hits) == list(range(0, 60, 5))
    all_hits = jsearcher.score_query(Q.Exists("data.k")).collect()
    assert len(all_hits) == 60


def test_json_in_boolean_with_keyword(jsearcher):
    q = Q.Boolean(must=[Q.Term("data.k", 3), Q.Term("category", "cat3")])
    hits = jsearcher.search(q, limit=100).collect()
    assert sorted(r["doc_id"] for r in hits) == \
        [i for i in range(60) if i % 10 == 3 and i % 4 == 3]


def test_json_bm25_scores_sane(jsearcher):
    # rarer path-token must outscore a common one for the same doc shape
    from tantivy4java_spark.scoring import bm25
    rare = jsearcher.score_query(Q.Term("data.flag", True)).collect()
    common = jsearcher.score_query(Q.Term("data.tags", "alpha")).collect()
    assert rare and common
    assert rare[0]["score"] > common[0]["score"]


# -- phrase over dot-paths (JsonFieldQueryTest.java; positions per path) -----

@pytest.fixture(scope="module")
def jphrase(spark, tmp_path_factory):
    rows = [
        (0, json.dumps({"title": "fast vector search engine",
                        "body": {"note": "batch stream merge"}})),
        (1, json.dumps({"title": "vector search is fast",
                        "body": {"note": "stream batch"}})),
        # array elements must NOT phrase-match across the boundary
        (2, json.dumps({"title": ["fast", "vector search"],
                        "tags": ["red green", "blue"]})),
        (3, json.dumps({"title": "fast and vector search engine"})),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "data"])
    cfg = IndexConfig(fields=[FieldConfig("data", "json")],
                      id_cols=["doc_id"])
    idx = str(tmp_path_factory.mktemp("json_phrase_idx"))
    build_index(spark, df, cfg, idx, doc_id_col="doc_id")
    return IndexSearcher(spark, idx)


def _ids(searcher, q):
    return sorted(r["doc_id"] for r in searcher.score_query(q).collect())


def test_json_phrase_adjacent(jphrase):
    assert _ids(jphrase, Q.Phrase("data.title", ["vector", "search"])) == \
        [0, 1, 2, 3]
    assert _ids(jphrase, Q.Phrase("data.title",
                                  ["fast", "vector"])) == [0]


def test_json_phrase_nested_path(jphrase):
    assert _ids(jphrase, Q.Phrase("data.body.note",
                                  ["batch", "stream"])) == [0]
    assert _ids(jphrase, Q.Phrase("data.body.note",
                                  ["stream", "batch"])) == [1]


def test_json_phrase_slop(jphrase):
    # "fast ... vector" with one word between (doc 3) needs slop >= 1.
    # doc 2 also matches at slop 1: the array-element gap is 2 (tantivy's
    # position-gap-2 convention), indistinguishable from one word between.
    assert _ids(jphrase, Q.Phrase("data.title",
                                  ["fast", "vector"], slop=1)) == [0, 2, 3]


def test_json_phrase_not_across_array_boundary(jphrase):
    # doc 2: title = ["fast", "vector search"] — "fast vector" spans two
    # array elements (position gap 2) and must not match at slop 0
    assert 2 not in _ids(jphrase, Q.Phrase("data.title",
                                           ["fast", "vector"]))
    # but within one element it does
    assert 2 in _ids(jphrase, Q.Phrase("data.title",
                                       ["vector", "search"]))
    assert _ids(jphrase, Q.Phrase("data.tags", ["green", "blue"])) == []
    assert _ids(jphrase, Q.Phrase("data.tags", ["red", "green"])) == [2]


def test_json_phrase_multiword_value_string(jphrase):
    # a phrase given as ONE string value tokenizes like the json indexer
    assert _ids(jphrase, Q.Phrase("data.body.note",
                                  ["batch stream"])) == [0]


def test_json_phrase_respects_path_isolation(jphrase):
    # "vector search" exists under title, not under body.note
    assert _ids(jphrase, Q.Phrase("data.body.note",
                                  ["vector", "search"])) == []
