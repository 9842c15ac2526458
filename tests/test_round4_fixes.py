"""Regression tests for the round-3 VERDICT/ADVICE findings.

1. index_changes with a caller-owned doc_id column: reused ids are refused
   in 'tombstone' mode (global tombstones would hide the new version too —
   the round-3 ADVICE high), handled correctly by 'upsert_rewrite'
   (tombstone + physical compaction), and fresh-per-version caller ids keep
   working under plain 'tombstone'.
2. date_histogram min_doc_count=0 fill in a non-UTC tz keeps counted
   buckets across DST transitions (fill keys were generated on a fixed UTC
   stride).
3. histogram min_doc_count=0 fill with a non-integral interval keeps
   counted buckets (fill join was on double equality — last-ulp mismatch).
4. hard_bounds endpoints falling mid-bucket keep the boundary bucket
   (bounds are snapped to bucket keys before comparing).
5. >=4-term sloppy phrases use cumulative total-moves slop semantics
   (Lucene/tantivy), not the round-3 pairwise budget.
"""

import datetime as dtm

import pandas as pd
import pytest

from pyspark.sql import functions as F

from tantivy4java_spark import aggs as A
from tantivy4java_spark import queries as Q
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher
from tantivy4java_spark.streaming import index_changes


def _kv_cfg():
    return IndexConfig(fields=[FieldConfig("content", "text"),
                               FieldConfig("key", "string")],
                       id_cols=["key"], content_col="content")


# -- 1. caller-owned doc_id upserts -------------------------------------------

def test_index_changes_reused_docid_refused(spark, tmp_path):
    """Delta carries doc_id and re-uses the prior id for a changed key:
    'tombstone' mode must refuse BEFORE writing any tombstone, leaving the
    index state unchanged (the ADVICE bug left the key with ZERO visible
    versions)."""
    cfg = _kv_cfg()
    idx = str(tmp_path / "idx")
    snap = str(tmp_path / "snap")
    v1 = pd.DataFrame({
        "doc_id": [100, 101, 102],
        "key": ["a", "b", "c"],
        "content": ["alpha one", "alpha two", "alpha three"],
    })
    index_changes(spark, cfg, idx, spark.createDataFrame(v1), snap, ["key"])
    assert IndexSearcher(spark, idx).num_docs == 3

    v2 = v1.copy()
    v2.loc[1, "content"] = "bravo replaced"  # key b keeps doc_id 101
    with pytest.raises(ValueError, match="re-use a doc_id"):
        index_changes(spark, cfg, idx, spark.createDataFrame(v2), snap,
                      ["key"])
    # refused atomically: old version of b still visible, nothing tombstoned
    s = IndexSearcher(spark, idx)
    assert s.score_query(Q.Term("key", "b")).count() == 1
    assert s.score_query(Q.Term("content", "alpha")).count() == 3


def test_index_changes_upsert_rewrite_reused_docid(spark, tmp_path):
    """'upsert_rewrite' compacts the tombstoned priors away, so the re-added
    version (same doc_id) is the ONLY visible one."""
    cfg = _kv_cfg()
    idx = str(tmp_path / "idx")
    snap = str(tmp_path / "snap")
    v1 = pd.DataFrame({
        "doc_id": [100, 101, 102],
        "key": ["a", "b", "c"],
        "content": ["alpha one", "alpha two", "alpha three"],
    })
    index_changes(spark, cfg, idx, spark.createDataFrame(v1), snap, ["key"])
    v2 = v1.copy()
    v2.loc[1, "content"] = "bravo replaced"
    index_changes(spark, cfg, idx, spark.createDataFrame(v2), snap, ["key"],
                  on_update="upsert_rewrite")
    s = IndexSearcher(spark, idx)
    assert s.num_docs == 3
    hits = s.score_query(Q.Term("key", "b")).collect()
    assert [h["doc_id"] for h in hits] == [101]
    assert s.score_query(Q.Term("content", "bravo")).count() == 1
    assert s.score_query(Q.Boolean(
        must=[Q.Term("content", "alpha"), Q.Term("key", "b")])).count() == 0
    # idempotent second pass: unchanged table -> noop
    act = index_changes(spark, cfg, idx, spark.createDataFrame(v2), snap,
                        ["key"], on_update="upsert_rewrite")
    assert act["action"] == "noop"


def test_index_changes_fresh_caller_ids_tombstone_ok(spark, tmp_path):
    """Caller-owned ids that are fresh per version (no reuse) work under
    plain 'tombstone': prior version hidden, new visible."""
    cfg = _kv_cfg()
    idx = str(tmp_path / "idx")
    snap = str(tmp_path / "snap")
    v1 = pd.DataFrame({
        "doc_id": [100, 101],
        "key": ["a", "b"],
        "content": ["alpha one", "alpha two"],
    })
    index_changes(spark, cfg, idx, spark.createDataFrame(v1), snap, ["key"])
    v2 = v1.copy()
    v2.loc[1, "doc_id"] = 201  # version-stamped fresh id
    v2.loc[1, "content"] = "bravo replaced"
    index_changes(spark, cfg, idx, spark.createDataFrame(v2), snap, ["key"])
    s = IndexSearcher(spark, idx)
    hits = s.score_query(Q.Term("key", "b")).collect()
    assert [h["doc_id"] for h in hits] == [201]
    assert s.score_query(Q.Term("content", "alpha")).count() == 1


# -- 2. date_histogram fill across a DST transition ---------------------------

def test_date_fill_keeps_counted_buckets_across_dst(spark):
    """America/New_York springs forward 2024-03-10: local-midnight bucket
    keys jump from 05:00Z to 04:00Z, so a fixed-UTC-stride fill sequence
    misses every post-DST key.  The old left join then DROPPED the counted
    buckets; the fill must keep them and add the empty gap day."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    days = [8, 9, 11, 12]  # skip the 10th -> one genuinely empty bucket
    rows = [{"doc_id": i, "ts": dtm.datetime(2024, 3, d, 12, 0)}
            for i, d in enumerate(days)]
    out = A.apply_agg(spark.createDataFrame(pd.DataFrame(rows)),
                      A.DateHistogram("ts", "1d", min_doc_count=0,
                                      time_zone="America/New_York"))
    got = [(r["key"].strftime("%Y-%m-%dT%H"), r["doc_count"])
           for r in out.collect()]
    assert got == [("2024-03-08T05", 1), ("2024-03-09T05", 1),
                   ("2024-03-10T05", 0), ("2024-03-11T04", 1),
                   ("2024-03-12T04", 1)]


# -- 3. numeric fill join on bucket index (no double-equality drops) ----------

def test_numeric_fill_non_integral_interval(spark):
    """interval=0.1 keys differ in the last ulp between the grouped floor
    formula and lo + i*interval; the fill join must not drop counted
    buckets."""
    vals = [i / 10.0 + 0.05 for i in range(10)]  # one value per 0.1 bucket
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(10), "v": vals}))
    out = A.apply_agg(df, A.Histogram("v", 0.1, min_doc_count=0,
                                      extended_bounds=(0.0, 1.2)))
    got = [(round(r["key"], 6), r["doc_count"]) for r in out.collect()]
    # every data bucket keeps its count; the two extension buckets are empty
    assert sum(c for _, c in got) == 10
    assert all(c == 1 for k, c in got if k < 0.95)
    assert [c for k, c in got if k > 0.95] == [0, 0, 0]  # 1.0, 1.1, 1.2
    assert len(got) == 13


# -- 10. nested bucket sub-aggregations ---------------------------------------

def _nested_fixture(spark):
    rows = []
    i = 0
    for day in (1, 2, 3):
        for et, n in (("click", 6 - day), ("view", 3), ("buy", 1)):
            for _ in range(n):
                rows.append({"doc_id": i, "ts": dtm.datetime(2024, 1, day),
                             "event_type": et, "value": float(i % 40)})
                i += 1
    return spark.createDataFrame(pd.DataFrame(rows))


def test_date_histogram_terms_nested(spark):
    """DateHistogram -> Terms sub-aggregation (the reference's
    DateHistogramAggregationTest.java:569 shape): flat rows, outer
    doc_count = whole day, inner cut = top-size per day."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = _nested_fixture(spark)
    out = A.apply_agg(df, A.DateHistogram(
        "ts", "1d", sub={"types": A.Terms("event_type", size=2)}))
    rows = [(r["key"].day, r["doc_count"], r["types_event_type"],
             r["types_doc_count"]) for r in out.collect()]
    # day1: click 5, view 3, buy 1 -> top2 click/view; outer doc_count 9
    assert rows == [
        (1, 9, "click", 5), (1, 9, "view", 3),
        (2, 8, "click", 4), (2, 8, "view", 3),
        (3, 7, "click", 3), (3, 7, "view", 3),
    ]


def test_terms_histogram_nested_with_metrics(spark):
    """Terms -> Histogram with a metric INSIDE the inner bucket; outer size
    cut keeps whole outer buckets (dense_rank, not row limit)."""
    df = _nested_fixture(spark)
    out = A.apply_agg(df, A.Terms("event_type", size=2, sub={
        "hist": A.Histogram("value", 20.0, sub={"avg_v": A.Avg("value")})}))
    rows = [(r["event_type"], r["doc_count"], r["hist_key"],
             r["hist_doc_count"]) for r in out.collect()]
    # click 12 total (values 0-19 -> one bucket), view 9 (buckets 0 and 20);
    # buy (3) cut by size=2; every surviving outer bucket keeps ALL its
    # inner buckets
    assert rows == [("click", 12, 0.0, 12),
                    ("view", 9, 0.0, 6), ("view", 9, 20.0, 3)]
    avg_cols = [r["avg_v"] for r in out.collect()]
    assert all(v is not None for v in avg_cols)


def test_nested_bucket_errors(spark):
    df = _nested_fixture(spark)
    with pytest.raises(TypeError, match="at most one bucket"):
        A.apply_agg(df, A.Terms("event_type", sub={
            "a": A.Terms("event_type"), "b": A.Terms("event_type")}))
    with pytest.raises(TypeError, match="metric siblings"):
        A.apply_agg(df, A.Terms("event_type", sub={
            "a": A.Terms("event_type"), "m": A.Avg("value")}))
    with pytest.raises(TypeError, match="one level deep"):
        A.apply_agg(df, A.Terms("event_type", sub={
            "a": A.Terms("event_type",
                         sub={"b": A.Terms("event_type")})}))
    with pytest.raises(ValueError, match="not supported"):
        A.apply_agg(df, A.DateHistogram(
            "ts", "1d", min_doc_count=0,
            sub={"t": A.Terms("event_type")}))


# -- 12. multiple aggregations per request ------------------------------------

def test_multiple_aggregations_one_request(spark, tmp_path):
    """MultipleAggregationsPanicTest.java:123 shape: several aggregations
    over one query's matches, all consistent; the matched base is persisted
    so the query evaluates once."""
    from tantivy4java_spark import aggs as AG
    from tantivy4java_spark.build import build_index
    docs = spark.createDataFrame(
        [(i, f"common text {i}", float(i + 1)) for i in range(10)],
        "doc_id long, text string, score double")
    cfg = IndexConfig(fields=[FieldConfig("text", "text"),
                              FieldConfig("score", "f64", fast=True)],
                      id_cols=["doc_id", "score"])
    idx = str(tmp_path / "magg")
    build_index(spark, docs, cfg, idx, doc_id_col="doc_id")
    s = IndexSearcher(spark, idx)
    out = AG.aggregate(s, Q.Term("text", "common"), {
        "doc_count": AG.Count("doc_id"),
        "score_sum": AG.Sum("score"),
        "score_stats": AG.Stats("score"),
    })
    assert out["doc_count"].collect()[0][0] == 10
    assert abs(out["score_sum"].collect()[0][0] - 55.0) < 1e-9
    st = out["score_stats"].collect()[0]
    assert st["score_stats_count"] == 10 and st["score_stats_max"] == 10.0


# -- 11. self-review fixes ----------------------------------------------------

def test_nested_range_outer_doc_count_counts_all_docs(spark):
    """Docs outside every inner range still count toward the OUTER bucket's
    doc_count (ES semantics); only their null-key inner ROW is dropped."""
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(8),
                      "cat": ["a"] * 5 + ["b"] * 3,
                      "v": [1.0, 2.0, 50.0, 60.0, 70.0, 5.0, 50.0, 55.0]}))
    out = A.apply_agg(df, A.Terms("cat", sub={
        "r": A.RangeAgg("v", [("low", 0.0, 10.0)])}))
    rows = [(r["cat"], r["doc_count"], r["r_key"], r["r_doc_count"])
            for r in out.collect()]
    # cat a: 5 docs total, 2 in 'low'; cat b: 3 docs, 1 in 'low'
    assert rows == [("a", 5, "low", 2), ("b", 3, "low", 1)]


def test_hourly_fill_dst_gap_no_duplicate_buckets(spark):
    """Sub-daily fill across spring-forward: the nonexistent local 02:00
    maps onto the same UTC instant as 03:00 — the fill must not emit the
    07:00Z bucket twice."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = [{"doc_id": i, "ts": dtm.datetime(2024, 3, 10, 5 + i)}
            for i in range(5)]  # 05:00Z..09:00Z spans the 07:00Z local gap
    out = A.apply_agg(spark.createDataFrame(pd.DataFrame(rows)),
                      A.DateHistogram("ts", "1h", min_doc_count=0,
                                      time_zone="America/New_York"))
    got = [(r["key"], r["doc_count"]) for r in out.collect()]
    keys = [k for k, _ in got]
    assert len(keys) == len(set(keys)), f"duplicate bucket keys: {got}"
    assert sum(c for _, c in got) == 5


def test_terms_null_values_excluded(spark):
    """ES terms buckets exclude docs missing the field: a null bucket must
    not exist, let alone displace a real bucket from the size cut."""
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(5), "cat": ["a", "a", None, None,
                                                  None]}))
    out = A.apply_agg(df, A.Terms("cat", size=1))
    assert [(r["cat"], r["doc_count"]) for r in out.collect()] == [("a", 2)]
    # nested path: null outer bucket excluded there too
    df2 = df.withColumn("v", F.col("doc_id").cast("double"))
    out2 = A.apply_agg(df2, A.Terms("cat", size=2, sub={
        "h": A.Histogram("v", 10.0)}))
    assert [(r["cat"], r["doc_count"]) for r in out2.collect()] == [("a", 2)]


def test_histogram_null_values_ignored(spark):
    """Docs with a null field are ignored by histograms (no null-key
    bucket), with and without the min_doc_count=0 fill."""
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(6),
                      "v": [1.0, 2.0, None, 11.0, None, 12.0]}))
    plain = A.apply_agg(df, A.Histogram("v", 10.0, min_doc_count=1))
    assert [(r["key"], r["doc_count"]) for r in plain.collect()] == \
        [(0.0, 2), (10.0, 2)]
    filled = A.apply_agg(df, A.Histogram("v", 10.0, min_doc_count=0,
                                         extended_bounds=(0.0, 30.0)))
    got = [(r["key"], r["doc_count"]) for r in filled.collect()]
    assert all(k is not None for k, _ in got)
    assert got == [(0.0, 2), (10.0, 2), (20.0, 0), (30.0, 0)]


def test_upsert_rewrite_refuses_before_tombstoning_with_uncommitted(
        spark, tmp_path):
    """Uncommitted segment adds: upsert_rewrite must refuse BEFORE writing
    tombstones (old bug shape: tombstone, then apply_deletes raises ->
    zero visible versions)."""
    import pandas as _pd
    from tantivy4java_spark.streaming import add_documents
    cfg = _kv_cfg()
    idx = str(tmp_path / "idx")
    snap = str(tmp_path / "snap")
    v1 = _pd.DataFrame({"doc_id": [1, 2], "key": ["a", "b"],
                        "content": ["alpha one", "alpha two"]})
    index_changes(spark, cfg, idx, spark.createDataFrame(v1), snap, ["key"])
    # leave an uncommitted add dangling
    extra = _pd.DataFrame({"doc_id": [50], "key": ["z"],
                           "content": ["zulu text"]})
    add_documents(spark, cfg, idx, spark.createDataFrame(extra),
                  commit=False)
    v2 = v1.copy()
    v2.loc[0, "content"] = "bravo new"  # key a keeps doc_id 1 (reuse)
    with pytest.raises(ValueError, match="uncommitted segment adds"):
        index_changes(spark, cfg, idx, spark.createDataFrame(v2), snap,
                      ["key"], on_update="upsert_rewrite")
    # nothing tombstoned: both old versions still visible
    s = IndexSearcher(spark, idx)
    assert s.score_query(Q.Term("content", "alpha")).count() == 2


# -- 9. iceberg append-only range detection (pure, runtime-free) --------------

def test_nonappend_ops_in_range():
    from tantivy4java_spark.tables import _nonappend_ops_in_range
    snaps = [(1, 100, "append"), (2, 200, "append"),
             (3, 300, "overwrite"), (4, 400, "append")]
    assert _nonappend_ops_in_range(snaps, 3) == []        # only appends after
    assert _nonappend_ops_in_range(snaps, 1) == ["overwrite"]
    assert _nonappend_ops_in_range(snaps, 4) == []
    # expired/unknown from-snapshot: not replayable
    assert _nonappend_ops_in_range(snaps, 99) == ["<from-snapshot expired>"]


def test_nonappend_same_tick_lineage():
    """Same committed_at tick (coarse clock, fast consecutive commits):
    parent lineage resolves order — an ANCESTOR overwrite in the same tick
    was already replayed (no false positive); a DESCENDANT overwrite in
    the same tick must be detected; without lineage a tie is conservative."""
    from tantivy4java_spark.tables import _nonappend_ops_in_range
    # rows: (snapshot_id, committed_at, operation, parent_id)
    lin = [(100, 1000, "overwrite", 50), (101, 1000, "append", 100),
           (102, 2000, "append", 101)]
    # synced at 101: overwrite 100 is 101's PARENT (same tick) -> replayed
    assert _nonappend_ops_in_range(lin, 101) == []
    # synced at 100: append-only descendants -> fine
    assert _nonappend_ops_in_range(lin, 100) == []
    # descendant overwrite in the same tick IS caught
    lin2 = [(100, 1000, "append", 50), (101, 1000, "overwrite", 100)]
    assert _nonappend_ops_in_range(lin2, 100) == ["overwrite"]
    # no lineage columns: tie stays conservative (counts as after)
    nolin = [(100, 1000, "overwrite"), (101, 1000, "append")]
    assert _nonappend_ops_in_range(nolin, 101) == ["overwrite"]


def test_manifest_multi_retry_clobber_chain(spark, tmp_path, monkeypatch):
    """A writer that loses SEVERAL consecutive races must keep advancing
    versions and land its action: simulate K clobbers by making create
    'succeed' but leave a foreign writer's payload at the claimed version."""
    import json as _json
    import os

    from tantivy4java_spark import fsio, manifest

    idx = str(tmp_path / "chain")
    real = fsio.create_text_exclusive
    clobbers = {"left": 3}

    def clobbering_create(sp, path, text):
        if os.path.exists(path):
            return False
        if clobbers["left"] > 0 and "_manifest" in path:
            clobbers["left"] -= 1
            foreign = _json.dumps({"action": "foreign", "txn": "other"})
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as fh:
                fh.write(foreign)  # another writer's PUT won this version
            return True  # we think we created it...
        return real(sp, path, text)

    monkeypatch.setattr(fsio, "create_text_exclusive", clobbering_create)
    monkeypatch.setattr(manifest, "WRITE_VERIFY", True)
    manifest.append_action(spark, idx, {"action": "probe", "w": 7})
    acts = manifest.read_actions(spark, idx)
    # three foreign versions + ours at version 3, nothing lost or looping
    assert [a["action"] for a in acts] == ["foreign"] * 3 + ["probe"]
    assert acts[-1]["w"] == 7
    names = sorted(os.listdir(os.path.join(idx, "_manifest")))
    assert names == [f"{i:08d}.json" for i in range(4)]


# -- 8. explain() components for regex / wildcard / termset -------------------

def test_explain_regex_wildcard_termset(spark, tmp_path):
    from tantivy4java_spark.build import build_index
    docs = spark.createDataFrame(
        [(0, "merge merger mercy", "en"), (1, "vector window", "de")],
        "doc_id long, text string, lang string")
    cfg = IndexConfig(fields=[FieldConfig("text", "text"),
                              FieldConfig("lang", "string")],
                      id_cols=["doc_id"])
    idx = str(tmp_path / "expl4")
    build_index(spark, docs, cfg, idx, doc_id_col="doc_id")
    s = IndexSearcher(spark, idx)

    wrows = s.explain(Q.Wildcard("text", "mer*"), 0).collect()
    assert {r.kind for r in wrows} == {"wildcard-term"}
    assert {r.term for r in wrows} == {"merge", "merger", "mercy"}
    assert all(r.score == 1.0 and r.df == 1 and r.tf == 1 for r in wrows)

    rrows = s.explain(Q.Regex("text", "merge.?"), 0).collect()
    assert {r.term for r in rrows} == {"merge", "merger"}
    assert {r.kind for r in rrows} == {"regex-term"}

    trows = s.explain(Q.TermSet("lang", ["en", "de"]), 0).collect()
    assert [(r.kind, r.term) for r in trows] == [("termset-term", "en")]

    # a doc that matches none of the expansion gets zero component rows
    assert s.explain(Q.Wildcard("text", "mer*"), 1).count() == 0


# -- 7. manifest append survives a NON-atomic create (raw-S3 shape) -----------

def test_manifest_putput_clobber_detected(spark, tmp_path, monkeypatch):
    """Simulate raw S3's non-atomic create (HEAD-then-PUT, last-writer-wins,
    atomic per object) and FORCE the worst interleaving with barriers: both
    writers HEAD-miss version 0, both PUT it, then both verify.  Exactly
    one writer's txn occupies v0; the other must detect the clobber via
    read-back and land its action at v1 — nothing lost, deterministically.
    (Scheduling-free atomicity needs a conditional PUT / atomic create —
    posix, HDFS, abfs, S3 If-None-Match — documented residual otherwise.)"""
    import os
    import threading

    from tantivy4java_spark import fsio, manifest

    idx = str(tmp_path / "s3sim")
    head_sync = threading.Barrier(2)
    put_sync = threading.Barrier(2)

    def racy_create(sp, path, text):
        if os.path.exists(path):  # HEAD
            return False
        contended = path.endswith("00000000.json")
        if contended:
            head_sync.wait(timeout=10)  # both saw HEAD-miss
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # atomic last-writer-wins PUT (tmp + rename — object stores never
        # interleave partial writes)
        tmp = f"{path}.tmp-{threading.get_ident()}"
        with open(tmp, "w") as fh:
            fh.write(text)
        os.replace(tmp, path)
        if contended:
            put_sync.wait(timeout=10)  # both PUTs landed before any verify
        return True

    monkeypatch.setattr(fsio, "create_text_exclusive", racy_create)
    monkeypatch.setattr(manifest, "WRITE_VERIFY", True)

    errs = []

    def writer(wid):
        try:
            manifest.append_action(spark, idx, {"action": "probe", "w": wid})
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    acts = manifest.read_actions(spark, idx)
    assert {a["w"] for a in acts} == {0, 1}, acts
    names = sorted(os.listdir(os.path.join(idx, "_manifest")))
    assert names == ["00000000.json", "00000001.json"]


# -- 6. batch-vectorized OSA edit distance ------------------------------------

def test_osa_batch_matches_scalar():
    import random
    import string

    import numpy as np
    from tantivy4java_spark.searcher import _edit_distance, _osa_within_batch

    rnd = random.Random(3)
    alpha = "abcde"  # tight alphabet -> plenty of near-misses/transpositions
    for _ in range(30):
        query = "".join(rnd.choice(alpha) for _ in range(rnd.randint(2, 8)))
        cap = rnd.randint(1, 2)
        terms = ["".join(rnd.choice(alpha)
                         for _ in range(rnd.randint(1, 10)))
                 for _ in range(50)]
        got = _osa_within_batch(query, terms, cap)
        want = np.array([_edit_distance(query, t, cap, True) <= cap
                         for t in terms])
        assert (got == want).all(), (query, cap,
                                     [t for t, g, w in zip(terms, got, want)
                                      if g != w])
    # transposition-specific: OSA says 1, classic Levenshtein says 2
    assert _osa_within_batch("merge", ["mergé", "emrge", "mreged"], 1).tolist() \
        == [True, True, False]


def test_fuzzy_osa_end_to_end(spark, tmp_path):
    """OSA fuzzy query through the index: a transposed term matches at
    distance 1 with transposition_cost_one, not with classic."""
    from tantivy4java_spark.build import build_index
    docs = spark.createDataFrame(
        [(0, "the emrge operator"), (1, "the merge operator"),
         (2, "unrelated words here")], "doc_id long, text string")
    cfg = IndexConfig(fields=[FieldConfig("text", "text")],
                      id_cols=["doc_id"])
    idx = str(tmp_path / "osa")
    build_index(spark, docs, cfg, idx, doc_id_col="doc_id")
    s = IndexSearcher(spark, idx)
    osa_hits = {r["doc_id"] for r in s.score_query(
        Q.Fuzzy("text", "merge", distance=1,
                transposition_cost_one=True)).collect()}
    assert osa_hits == {0, 1}
    classic_hits = {r["doc_id"] for r in s.score_query(
        Q.Fuzzy("text", "merge", distance=1,
                transposition_cost_one=False)).collect()}
    assert classic_hits == {1}


# -- 4. hard_bounds mid-bucket keeps the boundary bucket ----------------------

def test_histogram_hard_bounds_mid_bucket(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(40), "v": [float(i) for i in range(40)]}))
    out = A.apply_agg(df, A.Histogram("v", 10.0, hard_bounds=(5.0, 25.0)))
    got = [(r["key"], r["doc_count"]) for r in out.collect()]
    # 5 falls inside bucket 0 and 25 inside bucket 20 -> both kept
    assert got == [(0.0, 10), (10.0, 10), (20.0, 10)]


# -- 5. batch-vectorized phrase tf + rarest-term pre-intersection -------------

def test_phrase_freq_batch_matches_scalar():
    """_phrase_freq_batch (lifted doc-offset sweep over a whole Arrow batch)
    must agree with the per-doc scalar _phrase_freq on random ragged
    batches, for slop 0 and slop>0."""
    import numpy as np
    from tantivy4java_spark import codec
    from tantivy4java_spark.searcher import _phrase_freq, _phrase_freq_batch

    rng = np.random.default_rng(11)
    for trial in range(40):
        nterms = int(rng.integers(2, 5))
        ndocs = int(rng.integers(1, 30))
        slop = int(rng.integers(0, 4))
        docs = []
        for _ in range(ndocs):
            docs.append([np.unique(rng.integers(0, 50, size=int(
                rng.integers(1, 10))).astype(np.int64))
                for _ in range(nterms)])
        bufs_per_term = [[codec.encode_positions(d[i]) for d in docs]
                         for i in range(nterms)]
        got = _phrase_freq_batch(bufs_per_term, slop)
        want = np.array([_phrase_freq(d, slop) for d in docs], dtype=np.int64)
        assert (got == want).all(), (trial, slop, got, want)


def test_phrase_rare_term_preintersection_plan(spark, tmp_path):
    """Stopword+rare phrase: the positions scan must be pruned by a
    BROADCAST semi-join on the rare term's doc set before the groupBy
    (round-3 verdict: phrase cost ~min-df, not sum-of-df), and the result
    must equal the un-pruned semantics."""
    rows = []
    for i in range(300):
        body = f"the filler number {i} goes the on and the on"
        if i % 60 == 0:
            body = f"the zebra crossing {i}"
        rows.append((i, body))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = IndexConfig(fields=[FieldConfig("text", "text")],
                      id_cols=["doc_id"])
    idx = str(tmp_path / "ppidx")
    from tantivy4java_spark.build import build_index
    build_index(spark, docs, cfg, idx, doc_id_col="doc_id")
    s = IndexSearcher(spark, idx)
    q = Q.Phrase("text", ["the", "zebra"], slop=0)
    scored = s.score_query(q)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    hits = {r["doc_id"] for r in scored.collect()}
    assert hits == {i for i in range(300) if i % 60 == 0}
    # balanced dfs skip the extra scan (gate: sum(df) > 4*min(df))
    bal = s.score_query(Q.Phrase("text", ["zebra", "crossing"], slop=0))
    bplan = bal._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" not in bplan
    assert bal.count() == 5


def test_date_histogram_hard_bounds_mid_bucket(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = [{"doc_id": i, "ts": dtm.datetime(2024, 1, 1 + i, 6, 0)}
            for i in range(6)]
    out = A.apply_agg(spark.createDataFrame(pd.DataFrame(rows)),
                      A.DateHistogram("ts", "1d", hard_bounds=(
                          "2024-01-02T12:00:00", "2024-01-04T12:00:00")))
    got = [(r["key"].strftime("%Y-%m-%d"), r["doc_count"])
           for r in out.collect()]
    # both mid-day bounds keep their containing day buckets
    assert got == [("2024-01-02", 1), ("2024-01-03", 1), ("2024-01-04", 1)]
