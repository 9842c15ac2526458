"""ES-compatible aggregation JSON DSL (the reference's wire format).

parse_aggregations accepts the exact JSON the reference's
toAggregationJson() methods emit (aggregation/*.java); to_aggregation_json
emits it back.  Round-trips and an executed JSON-spec request are pinned.
"""

import json

import pytest

from tantivy4java_spark import aggs as A
from tantivy4java_spark.aggs_json import (parse_aggregations,
                                          to_aggregation_json)


def test_parse_reference_shapes():
    spec = json.dumps({
        "langs": {"terms": {"field": "lang", "size": 5, "shard_size": 50},
                  "aggs": {"n": {"value_count": {"field": "doc_id"}},
                           "s": {"stats": {"field": "n_tokens"}}}},
        "total": {"sum": {"field": "n_tokens"}},
        "uniq": {"cardinality": {"field": "lang"}},
        "hist": {"histogram": {"field": "n", "interval": 50, "offset": 7,
                               "min_doc_count": 2,
                               "hard_bounds": {"min": 0, "max": 400}}},
        "daily": {"date_histogram": {"field": "ts", "fixed_interval": "1d",
                                     "offset": "+6h",
                                     "time_zone": "America/New_York",
                                     "extended_bounds": {
                                         "min": 1704067200000,
                                         "max": 1706745600000}}},
        "buckets": {"range": {"field": "n",
                              "ranges": [{"to": 100},
                                         {"key": "mid", "from": 100,
                                          "to": 300},
                                         {"from": 300}]}},
        "pairs": {"multi_terms": {"terms": [{"field": "lang"},
                                            {"field": "source"}],
                                  "size": 3}},
    })
    aggs = parse_aggregations(spec)
    assert isinstance(aggs["langs"], A.Terms) and aggs["langs"].size == 5
    assert set(aggs["langs"].sub) == {"n", "s"}
    assert isinstance(aggs["langs"].sub["n"], A.Count)
    assert isinstance(aggs["total"], A.Sum)
    assert isinstance(aggs["uniq"], A.Cardinality)
    h = aggs["hist"]
    assert (h.interval, h.offset, h.min_doc_count) == (50.0, 7.0, 2)
    assert h.hard_bounds == (0.0, 400.0)
    d = aggs["daily"]
    assert d.fixed_interval == "1d" and d.offset == "+6h"
    assert d.time_zone == "America/New_York"
    import datetime as dt
    assert d.extended_bounds[0] == dt.datetime(2024, 1, 1,
                                               tzinfo=dt.timezone.utc)
    r = aggs["buckets"]
    # ES auto-keys for unkeyed ranges
    assert [x[0] for x in r.ranges] == ["*-100.0", "mid", "300.0-*"]
    assert r.ranges[0][1] is None and r.ranges[0][2] == 100.0
    m = aggs["pairs"]
    assert list(m.fields) == ["lang", "source"] and m.size == 3


def test_round_trip():
    aggs = {
        "t": A.Terms("lang", size=7, sub={"c": A.Count("doc_id")}),
        "h": A.Histogram("n", interval=25.0, offset=3.0, min_doc_count=1,
                         extended_bounds=(-50.0, 500.0)),
        "d": A.DateHistogram("ts", fixed_interval="12h", offset="-2h",
                             min_doc_count=3),
        "dc": A.DateHistogram("ts", fixed_interval=None,
                              calendar_interval="1M",
                              time_zone="Europe/Paris"),
        "r": A.RangeAgg("n", ranges=[("lo", None, 10.0), ("hi", 10.0, None)],
                        sub={"mx": A.Max("n")}),
        "m": A.MultiTerms(["a", "b"], size=4),
        "s": A.Stats("n"), "v": A.Avg("n"), "mn": A.Min("n"),
        "mx": A.Max("n"), "cd": A.Cardinality("n"),
    }
    emitted = {k: to_aggregation_json(v) for k, v in aggs.items()}
    parsed = parse_aggregations(json.dumps(emitted))
    for k, want in aggs.items():
        got = parsed[k]
        if isinstance(want, A.Cardinality):
            # exact flag is a local oracle convenience, not wire state
            assert got.field == want.field
        else:
            assert got == want, k


def test_date_bounds_emitted_as_epoch_millis():
    import datetime as dt
    d = A.DateHistogram("ts", fixed_interval="1d", min_doc_count=0,
                        extended_bounds=(
                            dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc),
                            "2024-02-01T00:00:00Z"))
    j = to_aggregation_json(d)
    assert j["date_histogram"]["extended_bounds"] == {
        "min": 1704067200000, "max": 1706745600000}


def test_parse_errors():
    with pytest.raises(ValueError, match="exactly one type"):
        parse_aggregations({"x": {"sum": {"field": "a"},
                                  "avg": {"field": "b"}}})
    with pytest.raises(ValueError, match="unknown aggregation"):
        parse_aggregations({"x": {"percentiles": {"field": "a"}}})
    with pytest.raises(ValueError, match="metric"):
        parse_aggregations({"x": {"sum": {"field": "a"},
                                  "aggs": {"y": {"avg": {"field": "b"}}}}})
    with pytest.raises(ValueError, match="fixed_interval or"):
        parse_aggregations({"x": {"date_histogram": {"field": "ts"}}})


def test_unsupported_options_raise():
    """Options the executor cannot honor fail loudly (never a silently
    different result set): ES terms "order"/"missing", metric "missing",
    unknown histogram knobs, extra range-bucket keys."""
    with pytest.raises(ValueError, match="unsupported option.*order"):
        parse_aggregations({"x": {"terms": {
            "field": "a", "order": {"_count": "asc"}}}})
    with pytest.raises(ValueError, match="unsupported option.*missing"):
        parse_aggregations({"x": {"avg": {"field": "a", "missing": 0}}})
    with pytest.raises(ValueError, match="unsupported option"):
        parse_aggregations({"x": {"histogram": {
            "field": "a", "interval": 5, "missing": 0}}})
    with pytest.raises(ValueError, match="range bucket"):
        parse_aggregations({"x": {"range": {
            "field": "a", "ranges": [{"from": 0, "to": 1, "missing": 9}]}}})
    # keys the REFERENCE emits are all accepted, incl. the dropped-by-design
    # shard_size (terms/multi_terms) and keyed (histogram family)
    parse_aggregations({"x": {"terms": {
        "field": "a", "size": 5, "shard_size": 25}}})
    parse_aggregations({"x": {"histogram": {
        "field": "a", "interval": 5, "keyed": True}}})
    with pytest.raises(ValueError, match="body must be an object"):
        parse_aggregations({"x": {"terms": "a"}})


def test_aggregate_accepts_json_spec(spark, tmp_path_factory):
    """aggregate() runs a JSON spec identically to the dataclass request."""
    from tantivy4java_spark import queries as Q
    from tantivy4java_spark.build import build_index
    from tantivy4java_spark.corpus import generate_pandas
    from tantivy4java_spark.schema import FieldConfig, IndexConfig
    from tantivy4java_spark.searcher import IndexSearcher

    pdf = generate_pandas(0, 120, seed=5, min_tokens=10, max_tokens=30)
    pdf["doc_id"] = range(120)
    pdf["n"] = [i % 50 for i in range(120)]
    d = str(tmp_path_factory.mktemp("aggjson") / "idx")
    cfg = IndexConfig(fields=[FieldConfig("content", "text"),
                              FieldConfig("n", "i64", fast=True)],
                      id_cols=["doc_id"], content_col="content")
    build_index(spark, spark.createDataFrame(pdf), cfg, d,
                doc_id_col="doc_id")
    s = IndexSearcher(spark, d)
    spec = json.dumps({"h": {"histogram": {"field": "n", "interval": 10},
                             "aggs": {"c": {"value_count":
                                            {"field": "doc_id"}}}}})
    got = A.aggregate(s, Q.Term("content", "import"), spec)["h"]
    want = A.aggregate(s, Q.Term("content", "import"),
                       {"h": A.Histogram("n", interval=10.0,
                                         sub={"c": A.Count("doc_id")})})["h"]
    assert [tuple(r) for r in got.collect()] == \
        [tuple(r) for r in want.collect()]
    assert got.schema == want.schema


def test_format_round_trips():
    # setFormat (DateHistogramAggregation.java:135-139, toAggregationJson
    # :249-251): "format" parses into DateHistogram.format and emits back
    spec = {"daily": {"date_histogram": {
        "field": "ts", "fixed_interval": "1d", "format": "yyyy-MM-dd"}}}
    parsed = parse_aggregations(json.dumps(spec))
    assert parsed["daily"].format == "yyyy-MM-dd"
    assert to_aggregation_json(parsed["daily"])["date_histogram"]["format"] \
        == "yyyy-MM-dd"
