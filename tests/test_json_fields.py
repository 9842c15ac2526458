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
