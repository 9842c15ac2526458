"""date_histogram / histogram parameter tail
(DateHistogramAggregation.java:92-165: calendar_interval, offset, time_zone,
extended_bounds/hard_bounds, min_doc_count; HistogramAggregation hard/extended
bounds)."""

import datetime as dtm

import pandas as pd
import pytest

from pyspark.sql import functions as F

from tantivy4java_spark import aggs as A


@pytest.fixture(scope="module")
def events_df(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = []
    # 2024-01-30 .. 2024-03-02, one event per day at 03:30 UTC, value = day#
    d = dtm.datetime(2024, 1, 30, 3, 30)
    i = 0
    while d < dtm.datetime(2024, 3, 3):
        rows.append({"doc_id": i, "ts": d, "value": float(i)})
        d += dtm.timedelta(days=1)
        i += 1
    return spark.createDataFrame(pd.DataFrame(rows))


def _buckets(df):
    return [(r["key"], r["doc_count"]) for r in df.collect()]


def test_calendar_month(spark, events_df):
    out = A.apply_agg(events_df, A.DateHistogram(
        "ts", calendar_interval="1M"))
    got = _buckets(out)
    assert [k.strftime("%Y-%m-%d") for k, _ in got] == \
        ["2024-01-01", "2024-02-01", "2024-03-01"]
    assert [c for _, c in got] == [2, 29, 2]  # Jan 30-31; leap Feb; Mar 1-2


def test_calendar_month_with_timezone(spark, events_df):
    """America/New_York (UTC-5): an 03:30Z event is the PREVIOUS local day,
    so the month boundary shifts — 2024-02-01T03:30Z is still local January."""
    out = A.apply_agg(events_df, A.DateHistogram(
        "ts", calendar_interval="1M", time_zone="America/New_York"))
    got = _buckets(out)
    # local-month bucket starts, reported as UTC instants (05:00Z offsets)
    assert [k.strftime("%Y-%m-%dT%H") for k, _ in got] == \
        ["2024-01-01T05", "2024-02-01T05", "2024-03-01T05"]
    # Jan 30,31 + Feb 1 (03:30Z = Jan 31 22:30 local) -> 3 local-Jan events
    assert [c for _, c in got] == [3, 29, 1]


def test_fixed_interval_offset(spark, events_df):
    """+6h offset: day buckets run 06:00->06:00, so every 03:30 event falls
    in the PREVIOUS day's bucket."""
    out = A.apply_agg(events_df, A.DateHistogram(
        "ts", "1d", offset="+6h"))
    got = _buckets(out)
    assert got[0][0] == dtm.datetime(2024, 1, 29, 6, 0)
    assert all(k.hour == 6 for k, _ in got)
    assert sum(c for _, c in got) == 33


def test_min_doc_count_zero_fills_gaps(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = pd.DataFrame({
        "ts": [dtm.datetime(2024, 1, 1), dtm.datetime(2024, 1, 4)],
        "value": [1.0, 2.0]})
    df = spark.createDataFrame(rows)
    out = A.apply_agg(df, A.DateHistogram("ts", "1d", min_doc_count=0,
                                          sub={"v": A.Sum("value")}))
    got = out.collect()
    assert [r["key"].day for r in got] == [1, 2, 3, 4]
    assert [r["doc_count"] for r in got] == [1, 0, 0, 1]
    assert [r["v"] for r in got] == [1.0, None, None, 2.0]


def test_extended_and_hard_bounds(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = pd.DataFrame({
        "ts": [dtm.datetime(2024, 1, 2), dtm.datetime(2024, 1, 5)],
        "value": [1.0, 2.0]})
    df = spark.createDataFrame(rows)
    # extended_bounds widen the empty-bucket span beyond the data
    out = A.apply_agg(df, A.DateHistogram(
        "ts", "1d", min_doc_count=0,
        extended_bounds=("2024-01-01", "2024-01-07")))
    got = _buckets(out)
    assert [k.day for k, _ in got] == [1, 2, 3, 4, 5, 6, 7]
    assert [c for _, c in got] == [0, 1, 0, 0, 1, 0, 0]
    # hard_bounds drop buckets (and their docs) outside the window
    out2 = A.apply_agg(df, A.DateHistogram(
        "ts", "1d", hard_bounds=("2024-01-03", "2024-01-31")))
    got2 = _buckets(out2)
    assert [(k.day, c) for k, c in got2] == [(5, 1)]


def test_histogram_bounds(spark):
    rows = pd.DataFrame({"value": [5.0, 15.0, 45.0]})
    df = spark.createDataFrame(rows)
    out = A.apply_agg(df, A.Histogram(
        "value", interval=10.0, extended_bounds=(0.0, 60.0)))
    got = [(r["key"], r["doc_count"]) for r in out.collect()]
    assert got == [(0.0, 1), (10.0, 1), (20.0, 0), (30.0, 0),
                   (40.0, 1), (50.0, 0), (60.0, 0)]
    out2 = A.apply_agg(df, A.Histogram(
        "value", interval=10.0, hard_bounds=(10.0, 20.0)))
    assert [(r["key"], r["doc_count"]) for r in out2.collect()] == [(10.0, 1)]


def test_calendar_quarter_year_week(spark, events_df):
    q = A.apply_agg(events_df, A.DateHistogram("ts", calendar_interval="1q"))
    assert [(k.month, c) for k, c in _buckets(q)] == [(1, 33)]
    y = A.apply_agg(events_df, A.DateHistogram("ts", calendar_interval="1y"))
    assert [(k.year, c) for k, c in _buckets(y)] == [(2024, 33)]
    w = A.apply_agg(events_df, A.DateHistogram("ts", calendar_interval="1w"))
    got = _buckets(w)
    assert all(k.weekday() == 0 for k, _ in got)  # Monday starts
    assert sum(c for _, c in got) == 33


def test_format_key_as_string(spark, events_df):
    # setFormat (DateHistogramAggregation.java:135-139): a key_as_string
    # column renders each bucket key with the given pattern
    out = A.apply_agg(events_df, A.DateHistogram(
        "ts", calendar_interval="1M", format="yyyy-MM-dd"))
    rows = out.collect()
    assert "key_as_string" in out.columns
    assert [r["key_as_string"] for r in rows] == \
        ["2024-01-01", "2024-02-01", "2024-03-01"]


def test_format_renders_in_agg_time_zone(spark, events_df):
    # bucket keys are UTC instants; key_as_string shows the agg zone's
    # wall-clock (daily buckets in UTC+9 start at 15:00 UTC the day before)
    out = A.apply_agg(events_df, A.DateHistogram(
        "ts", fixed_interval="1d", time_zone="Asia/Tokyo",
        format="yyyy-MM-dd HH:mm"))
    first = out.orderBy("key").first()
    assert first["key"].strftime("%H:%M") == "15:00"
    assert first["key_as_string"].endswith("00:00")


def test_format_independent_of_session_time_zone(spark, events_df):
    out_utc = A.apply_agg(events_df, A.DateHistogram(
        "ts", fixed_interval="1d", format="yyyy-MM-dd HH:mm"))
    want = [r["key_as_string"] for r in out_utc.collect()]
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        out_ny = A.apply_agg(events_df, A.DateHistogram(
            "ts", fixed_interval="1d", format="yyyy-MM-dd HH:mm"))
        assert [r["key_as_string"] for r in out_ny.collect()] == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_format_fills_empty_buckets(spark):
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame({
        "ts": [dtm.datetime(2024, 1, 1), dtm.datetime(2024, 1, 4)]}))
    out = A.apply_agg(df, A.DateHistogram(
        "ts", fixed_interval="1d", min_doc_count=0, format="yyyy-MM-dd"))
    rows = out.orderBy("key").collect()
    assert [r["key_as_string"] for r in rows] == \
        ["2024-01-0%d" % d for d in (1, 2, 3, 4)]
    assert [r["doc_count"] for r in rows] == [1, 0, 0, 1]


def test_format_rejected_on_inner_date_histogram(spark, events_df):
    with pytest.raises(ValueError, match="format is not supported"):
        A.apply_agg(events_df, A.Terms(
            "value", sub={"per_day": A.DateHistogram(
                "ts", fixed_interval="1d", format="yyyy-MM-dd")}))
