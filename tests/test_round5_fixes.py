"""Round-5 fixes, each pinned by a test (VERDICT.md round-4 items 2-7 and
ADVICE.md):

- max-buckets guard on the eager multi-agg collect and both fill paths
- inner-bucket option validation (nested histogram min_doc_count/bounds)
- positions() memoization
- fuzzy zero-job driver-side expansion (parity vs the cluster path; classic
  Levenshtein batch DP vs the scalar reference)
- WAND pruning engages for Boost(pure-term) with identical, scaled results
- build resume refuses a changed input file listing (fingerprint check)
- mechanical driver-window rotation (least-recently-verified first)
"""

import os

import numpy as np
import pytest

from tantivy4java_spark import aggs as A
from tantivy4java_spark import queries as Q
from tantivy4java_spark.build import IndexBuilder, build_index
from tantivy4java_spark.corpus import generate_pandas
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import (IndexSearcher, _edit_distance,
                                         _osa_within_batch)

N = 200


def _cfg():
    return IndexConfig(
        fields=[FieldConfig("content", "text"), FieldConfig("lang", "string")],
        id_cols=["doc_id", "lang"], content_col="content")


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    pdf = generate_pandas(0, N, min_tokens=15, max_tokens=50)
    pdf["doc_id"] = range(N)
    df = spark.createDataFrame(pdf)
    d = str(tmp_path_factory.mktemp("r5") / "idx")
    build_index(spark, df, _cfg(), d, doc_id_col="doc_id", num_segments=2)
    return d


# ---------------------------------------------------------------------------
# max-buckets guard
# ---------------------------------------------------------------------------
def test_histogram_fill_guard(spark, monkeypatch):
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame({"v": [0.0, 1000.0]}))
    monkeypatch.setattr(A, "MAX_BUCKETS", 100)
    agg = A.Histogram("v", interval=1.0, min_doc_count=0,
                      extended_bounds=(0.0, 1000.0))
    with pytest.raises(A.TooManyBucketsError, match="coarser interval"):
        A.apply_agg(df, agg).collect()


def test_date_histogram_fill_guard(spark, monkeypatch):
    import datetime as dt
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame({
        "ts": [dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 1)]}))
    monkeypatch.setattr(A, "MAX_BUCKETS", 1000)
    agg = A.DateHistogram("ts", fixed_interval="1s", min_doc_count=0)
    with pytest.raises(A.TooManyBucketsError, match="coarser interval"):
        A.apply_agg(df, agg).collect()


def test_multi_agg_collect_guard(spark, idx, monkeypatch):
    s = IndexSearcher(spark, idx)
    monkeypatch.setattr(A, "MAX_BUCKETS", 2)
    with pytest.raises(A.TooManyBucketsError, match="single aggregation"):
        A.aggregate(s, Q.MatchAll(),
                    {"by_lang": A.Terms("lang", size=10),
                     "n": A.Count("doc_id")})


def test_multi_agg_under_cap_still_works(spark, idx):
    s = IndexSearcher(spark, idx)
    out = A.aggregate(s, Q.MatchAll(),
                      {"by_lang": A.Terms("lang", size=10),
                       "n": A.Count("doc_id")})
    assert out["n"].collect()[0]["n"] == N
    assert len(out["by_lang"].collect()) >= 1


# ---------------------------------------------------------------------------
# inner-bucket option validation (ADVICE item 1)
# ---------------------------------------------------------------------------
def test_inner_histogram_options_rejected(spark):
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame(
        {"k": ["a", "b"], "v": [1.0, 2.0]}))
    bad = A.Terms("k", sub={"h": A.Histogram("v", 1.0, min_doc_count=5)})
    with pytest.raises(ValueError, match="min_doc_count"):
        A.apply_agg(df, bad).collect()
    bad2 = A.Terms("k", sub={"h": A.Histogram("v", 1.0,
                                              hard_bounds=(0.0, 1.0))})
    with pytest.raises(ValueError, match="bounds"):
        A.apply_agg(df, bad2).collect()
    # defaults still pass
    ok = A.Terms("k", sub={"h": A.Histogram("v", 1.0)})
    assert len(A.apply_agg(df, ok).collect()) == 2


def test_inner_date_histogram_options_rejected(spark):
    import datetime as dt
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame(
        {"k": ["a"], "ts": [dt.datetime(2024, 1, 1)]}))
    bad = A.Terms("k", sub={"h": A.DateHistogram("ts", "1d",
                                                 min_doc_count=0)})
    with pytest.raises(ValueError, match="min_doc_count"):
        A.apply_agg(df, bad).collect()


# ---------------------------------------------------------------------------
# positions() memoization (VERDICT item 4)
# ---------------------------------------------------------------------------
def test_positions_memoized(spark, idx):
    s = IndexSearcher(spark, idx)
    assert s.positions() is s.positions()
    assert "positions" in s._frames


def test_preload_default_pins_positions(spark, idx):
    s = IndexSearcher(spark, idx)
    s.preload()  # content is position-indexed -> default includes positions
    try:
        assert s._frames["positions"].is_cached
    finally:
        for df in s._frames.values():
            df.unpersist()


# ---------------------------------------------------------------------------
# fuzzy: zero-job local expansion == cluster expansion (VERDICT item 5)
# ---------------------------------------------------------------------------
def _fuzzy_results(s, **kw):
    q = Q.Fuzzy("content", "merg", distance=1, **kw)
    return [(r["doc_id"], round(r["score"], 9))
            for r in s.search(q, limit=50).collect()]


@pytest.mark.parametrize("osa", [True, False])
def test_fuzzy_local_matches_cluster(spark, idx, osa, monkeypatch):
    s_local = IndexSearcher(spark, idx)
    got_local = _fuzzy_results(s_local, transposition_cost_one=osa)
    s_cluster = IndexSearcher(spark, idx)
    # force the cluster path by disqualifying the local dictionary read
    monkeypatch.setattr(IndexSearcher, "MAX_LOCAL_DICT_ROWS", -1)
    got_cluster = _fuzzy_results(s_cluster, transposition_cost_one=osa)
    assert got_local == got_cluster
    assert len(got_local) > 0


def test_fuzzy_local_path_taken(spark, idx):
    s = IndexSearcher(spark, idx)
    out = s._fuzzy_local_expansion(Q.Fuzzy("content", "merg", 1), "merg", 1,
                                   True)
    assert out is not None and len(out) > 0
    # dfs warmed into the cache as a side effect
    assert all((("content", t) in s._df_cache) for t in out)


def test_batch_dp_classic_levenshtein_matches_scalar():
    terms = ["merge", "emrge", "marge", "mergex", "xmerge", "mrege", "zzz"]
    got = _osa_within_batch("merge", terms, 1, osa=False)
    want = [_edit_distance("merge", t, 1, osa=False) <= 1 for t in terms]
    assert got.tolist() == want
    # OSA vs classic differ exactly on transpositions
    assert _osa_within_batch("merge", ["emrge"], 1, osa=True).tolist() == [True]
    assert _osa_within_batch("merge", ["emrge"], 1, osa=False).tolist() == [False]


# ---------------------------------------------------------------------------
# WAND pruning for Boost wrappers (VERDICT item 6)
# ---------------------------------------------------------------------------
def test_boost_term_uses_pruned_path(spark, idx, monkeypatch):
    s = IndexSearcher(spark, idx)
    calls = []
    orig = IndexSearcher._scored_pruned

    def spy(self, mode, pairs, k):
        calls.append((mode, pairs, k))
        return orig(self, mode, pairs, k)

    monkeypatch.setattr(IndexSearcher, "_scored_pruned", spy)
    monkeypatch.setattr(IndexSearcher, "LOCAL_TOPK_MAX_ROWS", 0)
    boosted = s.search(Q.Boost(Q.Term("content", "merge"), 2.0),
                       limit=10).collect()
    assert calls, "Boost(Term) did not engage the WAND pruned path"
    plain = s.search(Q.Term("content", "merge"), limit=10).collect()
    assert [r["doc_id"] for r in boosted] == [r["doc_id"] for r in plain]
    for rb, rp in zip(boosted, plain):
        assert rb["score"] == pytest.approx(2.0 * rp["score"], rel=1e-12)


def test_boost_full_path_identical(spark, idx):
    s = IndexSearcher(spark, idx)
    q = Q.Boost(Q.Term("content", "merge"), 2.0)
    pruned = s.search(q, limit=10).collect()
    full = s.search(q, limit=10, prune=False).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in pruned] == \
        [(r["doc_id"], round(r["score"], 9)) for r in full]


def test_const_score_not_pruned(spark, idx):
    """ConstScore ties break by doc_id — must stay on the full path."""
    s = IndexSearcher(spark, idx)
    q = Q.ConstScore(Q.Term("content", "merge"), 3.0)
    got = s.search(q, limit=5).collect()
    want = sorted(r["doc_id"] for r in
                  s.score_query(Q.Term("content", "merge")).collect())[:5]
    assert [r["doc_id"] for r in got] == want
    assert all(r["score"] == 3.0 for r in got)


# ---------------------------------------------------------------------------
# resume input-fingerprint check (VERDICT item 7)
# ---------------------------------------------------------------------------
def test_resume_refuses_changed_input_listing(spark, tmp_path):
    pdf = generate_pandas(0, N, min_tokens=10, max_tokens=30)
    pdf["doc_id"] = range(N)
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf).repartition(4).write.parquet(src)
    df = spark.read.parquet(src)
    idx = str(tmp_path / "idx")
    b = IndexBuilder(spark, _cfg(), idx, num_segments=4)
    with pytest.raises(RuntimeError, match="injected failure"):
        b.build(df, doc_id_col="doc_id", fail_after_segments=2)

    # reorder/extend the input listing: add one more parquet file
    extra = generate_pandas(0, 10, min_tokens=10, max_tokens=30)
    extra["doc_id"] = range(N, N + 10)
    spark.createDataFrame(extra).coalesce(1).write.mode("append").parquet(src)

    df2 = spark.read.parquet(src)
    b2 = IndexBuilder(spark, _cfg(), idx, num_segments=4)
    with pytest.raises(ValueError, match="refusing to resume"):
        b2.build(df2, doc_id_col="doc_id")

    # unchanged listing still resumes fine
    idx2 = str(tmp_path / "idx2")
    b3 = IndexBuilder(spark, _cfg(), idx2, num_segments=4)
    with pytest.raises(RuntimeError, match="injected failure"):
        b3.build(df2, doc_id_col="doc_id", fail_after_segments=2)
    stats = IndexBuilder(spark, _cfg(), idx2, num_segments=4) \
        .build(df2, doc_id_col="doc_id")
    assert stats.num_docs == N + 10


# ---------------------------------------------------------------------------
# mechanical rotation (VERDICT item 3 / ADVICE item 3)
# ---------------------------------------------------------------------------
def test_rotation_orders_stale_first():
    import importlib.util
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "entry_r5", os.path.join(here, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    green = mod._last_green_round()
    keys = list(mod.queries())
    assert list(mod.oracle_sql()) and set(mod.oracle_sql()) <= set(keys)
    rounds = [green.get(k, 0) for k in keys]
    assert rounds == sorted(rounds), \
        "queries() must be ordered least-recently-verified first"
    # anything beyond the 50-row window must be at least as fresh as
    # everything inside it
    if len(keys) > 50:
        assert min(green.get(k, 0) for k in keys[50:]) >= \
            max(green.get(k, 0) for k in keys[:len(keys) - 50])
