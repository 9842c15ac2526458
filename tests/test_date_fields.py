"""DATE fields end-to-end (reference: DateMicrosecondPrecisionTest.java,
TimestampMicrosecondPrecisionTest.java, SchemaBuilder.java:234-247):
microsecond-precision timestamp fast fields, typed term/range lowering, ISO
bounds through the query-string parser."""

import datetime as dtm

import pandas as pd
import pytest

from tantivy4java_spark import queries as Q
from tantivy4java_spark.build import build_index
from tantivy4java_spark.parser import parse_iso_datetime, parse_query
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher


T0 = dtm.datetime(2024, 3, 1, 12, 0, 0, 0)


@pytest.fixture(scope="module")
def date_idx(spark, tmp_path_factory):
    # 10 docs, 1 microsecond apart — precision must survive the round trip
    rows = pd.DataFrame({
        "doc_id": range(10),
        "ts": [T0 + dtm.timedelta(microseconds=i) for i in range(10)],
        "day": [(T0 + dtm.timedelta(days=i)).date() for i in range(10)],
        "tag": [f"d{i}" for i in range(10)],
    })
    cfg = IndexConfig(fields=[FieldConfig("ts", "date", fast=True),
                              FieldConfig("day", "date", fast=True),
                              FieldConfig("tag", "string")],
                      id_cols=["doc_id", "tag"])
    idx = str(tmp_path_factory.mktemp("dateidx"))
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    build_index(spark, spark.createDataFrame(rows), cfg, idx,
                doc_id_col="doc_id")
    return IndexSearcher(spark, idx)


def test_parse_iso_datetime_shapes():
    assert parse_iso_datetime("2024-01-01") == dtm.datetime(2024, 1, 1)
    assert parse_iso_datetime("2024-01-01T08:30:00Z") == \
        dtm.datetime(2024, 1, 1, 8, 30)
    assert parse_iso_datetime("2024-01-01T08:30:00.000123Z") == \
        dtm.datetime(2024, 1, 1, 8, 30, 0, 123)
    # timezone offsets normalize to UTC
    assert parse_iso_datetime("2024-01-01T10:30:00+02:00") == \
        dtm.datetime(2024, 1, 1, 8, 30)
    assert parse_iso_datetime("import") is None
    assert parse_iso_datetime("12345") is None


def test_microsecond_range(date_idx):
    s = date_idx
    # [T0+2us, T0+5us) -> docs 2,3,4 exactly
    got = sorted(r["doc_id"] for r in s.score_query(
        Q.Range("ts",
                T0 + dtm.timedelta(microseconds=2),
                T0 + dtm.timedelta(microseconds=5),
                True, False)).collect())
    assert got == [2, 3, 4]
    # ISO string bounds lower identically (typed lowering in the searcher)
    got2 = sorted(r["doc_id"] for r in s.score_query(
        Q.Range("ts", "2024-03-01T12:00:00.000002Z",
                "2024-03-01T12:00:00.000005Z", True, False)).collect())
    assert got2 == [2, 3, 4]


def test_microsecond_term_equality(date_idx):
    got = [r["doc_id"] for r in date_idx.score_query(
        Q.Term("ts", "2024-03-01T12:00:00.000007Z")).collect()]
    assert got == [7]


def test_parser_date_range(date_idx):
    q = parse_query("ts:[2024-03-01T12:00:00.000003Z TO *]", [])
    assert isinstance(q, Q.Range)
    assert q.lower == dtm.datetime(2024, 3, 1, 12, 0, 0, 3)
    got = sorted(r["doc_id"] for r in date_idx.score_query(q).collect())
    assert got == list(range(3, 10))


def test_date_column_range(date_idx):
    got = sorted(r["doc_id"] for r in date_idx.score_query(
        Q.Range("day", "2024-03-03", "2024-03-06", True, True)).collect())
    assert got == [2, 3, 4, 5]


def test_date_shaped_string_still_raw_matches(spark, tmp_path):
    """A date-shaped value on a STRING field must stay a raw string match
    (the parser's eager datetime coercion is undone at lowering)."""
    rows = pd.DataFrame({"doc_id": [0, 1],
                         "label": ["2024-01-01", "other"],
                         "body": ["alpha beta", "gamma delta"]})
    cfg = IndexConfig(fields=[FieldConfig("body", "text"),
                              FieldConfig("label", "string")],
                      id_cols=["doc_id", "label"])
    idx = str(tmp_path / "strdate")
    build_index(spark, spark.createDataFrame(rows), cfg, idx,
                doc_id_col="doc_id")
    s = IndexSearcher(spark, idx)
    assert [r["doc_id"] for r in
            s.score_query(Q.Term("label", "2024-01-01")).collect()] == [0]


def test_rfc3339_parsequery_parity(spark, tmp_path):
    """Mirrors SplitDateParseQueryTest.java:110-148: RFC3339 strings (with
    and without Z) through parseQuery over a DATE fast field."""
    rows = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "timestamp": [dtm.datetime(2025, 11, 7, h) for h in (5, 6, 7)],
        "body": ["a", "b", "c"],
    })
    cfg = IndexConfig(fields=[FieldConfig("body", "text"),
                              FieldConfig("timestamp", "date", fast=True)],
                      id_cols=["doc_id"])
    idx = str(tmp_path / "rfc")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    build_index(spark, spark.createDataFrame(rows), cfg, idx,
                doc_id_col="doc_id")
    s = IndexSearcher(spark, idx)

    def hits(qs):
        return sorted(r["doc_id"] for r in
                      s.score_query(parse_query(qs, ["body"])).collect())

    # equality via 1-second half-open range, Z suffix (expected 1 hit)
    assert hits("timestamp:[2025-11-07T05:00:00Z TO 2025-11-07T05:00:01Z}") == [0]
    # range spanning hours (expected: the 06:00 doc only)
    assert hits("timestamp:[2025-11-07T05:30:00Z TO 2025-11-07T06:30:00Z]") == [1]
    # open-ended (expected 2: 06:00 and 07:00)
    assert hits("timestamp:[2025-11-07T06:00:00Z TO *]") == [1, 2]
    # WITHOUT the Z suffix (naive form) — same results
    assert hits("timestamp:[2025-11-07T05:00:00 TO 2025-11-07T05:00:01}") == [0]
    assert hits("timestamp:[2025-11-07T06:00:00 TO *]") == [1, 2]
