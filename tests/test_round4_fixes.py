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

import pandas as pd
import pytest

from pyspark.sql import functions as F

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
