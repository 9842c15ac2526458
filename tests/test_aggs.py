"""Aggregation tests vs DuckDB oracle on the driver's events table
(reference analogs: *AggregationTest.java family)."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from tantivy4java_spark import aggs as A

EVENTS = os.path.join(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"),
                      "sf0.001", "events.parquet")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(EVENTS)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{EVENTS}')")
    return con


def test_stats(events, duck):
    got = A.apply_agg(events, A.Stats("value"), "v").collect()[0]
    exp = duck.execute(
        "SELECT count(value), sum(value), avg(value), min(value), max(value) FROM events"
    ).fetchone()
    assert got["v_count"] == exp[0]
    assert abs(got["v_sum"] - exp[1]) < 1e-6
    assert abs(got["v_avg"] - exp[2]) < 1e-9
    assert got["v_min"] == exp[3] and got["v_max"] == exp[4]


def test_cardinality_exact(events, duck):
    got = A.apply_agg(events, A.Cardinality("user_id", exact=True), "c").collect()[0]["c"]
    exp = duck.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert got == exp


def test_terms_with_sub(events, duck):
    got = A.apply_agg(
        events, A.Terms("event_type", size=3, sub={"avg_value": A.Avg("value")})
    ).collect()
    exp = duck.execute("""
        SELECT event_type, count(*) dc, avg(value) av FROM events
        GROUP BY 1 ORDER BY dc DESC, event_type LIMIT 3""").fetchall()
    assert [(r["event_type"], r["doc_count"]) for r in got] == \
        [(e[0], e[1]) for e in exp]
    for r, e in zip(got, exp):
        assert abs(r["avg_value"] - e[2]) < 1e-9


def test_multi_terms(events, duck):
    got = A.apply_agg(events, A.MultiTerms(["event_type", "user_id"], size=5)).collect()
    exp = duck.execute("""
        SELECT event_type, user_id, count(*) dc FROM events
        GROUP BY 1,2 ORDER BY dc DESC, event_type LIMIT 5""").fetchall()
    assert [r["doc_count"] for r in got] == [e[2] for e in exp]


def test_histogram(events, duck):
    got = A.apply_agg(events, A.Histogram("value", interval=10.0)).collect()
    exp = duck.execute("""
        SELECT floor(value/10.0)*10.0 k, count(*) FROM events GROUP BY 1 ORDER BY 1
    """).fetchall()
    assert [(r["key"], r["doc_count"]) for r in got] == [(e[0], e[1]) for e in exp]


def test_date_histogram(events, duck):
    got = A.apply_agg(events, A.DateHistogram("ts", "1d")).collect()
    exp = duck.execute("""
        SELECT time_bucket(INTERVAL '1 day', ts) k, count(*) FROM events
        GROUP BY 1 ORDER BY 1""").fetchall()
    assert len(got) == len(exp)
    assert [r["doc_count"] for r in got] == [e[1] for e in exp]


def test_range_agg(events, duck):
    got = A.apply_agg(events, A.RangeAgg("value", [
        ("low", None, 20.0), ("mid", 20.0, 60.0), ("high", 60.0, None)])).collect()
    exp = dict(duck.execute("""
        SELECT CASE WHEN value < 20 THEN 'low'
                    WHEN value < 60 THEN 'mid' ELSE 'high' END k, count(*)
        FROM events GROUP BY 1""").fetchall())
    for r in got:
        assert r["doc_count"] == exp[r["key"]]


def test_aggregate_over_query(spark, tmp_path):
    """SplitSearcher.aggregate analog: agg over query matches."""
    import pandas as pd
    from tantivy4java_spark import queries as Q
    from tantivy4java_spark.build import build_index
    from tantivy4java_spark.corpus import generate_pandas
    from tantivy4java_spark.schema import FieldConfig, IndexConfig
    from tantivy4java_spark.searcher import IndexSearcher

    pdf = generate_pandas(0, 120, min_tokens=20, max_tokens=60)
    pdf["doc_id"] = range(len(pdf))
    cfg = IndexConfig(fields=[FieldConfig("content", "text"),
                              FieldConfig("lang", "string")],
                      id_cols=["doc_id", "lang"], content_col="content")
    d = str(tmp_path / "aggidx")
    build_index(spark, spark.createDataFrame(pdf), cfg, d, doc_id_col="doc_id")
    s = IndexSearcher(spark, d)
    res = A.aggregate(s, Q.Term("content", "import"),
                      {"by_lang": A.Terms("lang", size=10)})
    rows = res["by_lang"].collect()
    # oracle: count docs containing token 'import' per lang
    exp = {}
    for r in pdf.itertuples():
        if "import" in r.content.split():
            exp[r.lang] = exp.get(r.lang, 0) + 1
    got = {r["lang"]: r["doc_count"] for r in rows}
    assert got == dict(sorted(exp.items(), key=lambda kv: -kv[1])[:10])
