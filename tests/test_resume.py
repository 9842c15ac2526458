"""Checkpoint/resume kill-test (north_rule: interrupted build resumes with
zero recomputation of completed partitions; txlog analog
native/src/txlog/actions.rs Add/MergeSkip).
"""

import json
import os

import pytest

from tantivy4java_spark import queries as Q
from tantivy4java_spark.build import IndexBuilder
from tantivy4java_spark.corpus import generate_pandas
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher

N = 160


def _cfg():
    return IndexConfig(
        fields=[FieldConfig("content", "text"), FieldConfig("lang", "string")],
        id_cols=["doc_id", "lang"], content_col="content")


def _manifest(index_dir):
    from tantivy4java_spark import manifest
    return manifest.read_actions(None, index_dir)


def test_kill_and_resume(spark, tmp_path):
    pdf = generate_pandas(0, N, min_tokens=15, max_tokens=50)
    pdf["doc_id"] = range(N)
    df = spark.createDataFrame(pdf)
    idx = str(tmp_path / "resume_idx")

    b = IndexBuilder(spark, _cfg(), idx, num_segments=4)
    with pytest.raises(RuntimeError, match="injected failure"):
        b.build(df, doc_id_col="doc_id", fail_after_segments=2)

    acts = _manifest(idx)
    adds = [a for a in acts if a["action"] == "add"]
    assert len(adds) == 2  # exactly the completed segments committed
    assert not any(a["action"] == "commit" for a in acts)
    seg_mtimes = {a["segment"]: os.path.getmtime(
        os.path.join(idx, "segments", f"seg={a['segment']:05d}", "postings"))
        for a in adds}

    # resume: must NOT recompute segments 0/1 (mtime unchanged), must finish
    b2 = IndexBuilder(spark, _cfg(), idx, num_segments=4)
    stats = b2.build(df, doc_id_col="doc_id")
    assert stats.num_docs == N
    acts = _manifest(idx)
    adds = [a for a in acts if a["action"] == "add"]
    assert sorted(a["segment"] for a in adds) == [0, 1, 2, 3]
    assert any(a["action"] == "commit" for a in acts)
    for seg, mt in seg_mtimes.items():
        now = os.path.getmtime(
            os.path.join(idx, "segments", f"seg={seg:05d}", "postings"))
        assert now == mt, f"segment {seg} was recomputed on resume"

    # the resumed index answers queries identically to a clean build
    idx2 = str(tmp_path / "clean_idx")
    IndexBuilder(spark, _cfg(), idx2, num_segments=4).build(df, doc_id_col="doc_id")
    s1, s2 = IndexSearcher(spark, idx), IndexSearcher(spark, idx2)
    q = Q.Boolean(should=[Q.Term("content", "import"), Q.Term("content", "return")])
    r1 = [(r["doc_id"], round(r["score"], 9)) for r in s1.search(q, 20).collect()]
    r2 = [(r["doc_id"], round(r["score"], 9)) for r in s2.search(q, 20).collect()]
    assert r1 == r2


def test_merge_skips_corrupt_segment(spark, tmp_path):
    """Resilient merge (merge_impl.rs:88-101): a corrupted segment is skipped
    and recorded, the rest of the index still commits."""
    pdf = generate_pandas(0, 80, min_tokens=15, max_tokens=40)
    pdf["doc_id"] = range(80)
    df = spark.createDataFrame(pdf)
    idx = str(tmp_path / "corrupt_idx")
    b = IndexBuilder(spark, _cfg(), idx, num_segments=2)
    with pytest.raises(RuntimeError):
        b.build(df, doc_id_col="doc_id", fail_after_segments=2)
    # corrupt segment 1's postings
    seg1 = os.path.join(idx, "segments", "seg=00001", "postings")
    for f in os.listdir(seg1):
        if f.endswith(".parquet"):
            with open(os.path.join(seg1, f), "wb") as fh:
                fh.write(b"corrupted")
    merge_action = b._merge([0, 1])
    assert merge_action["skipped"] == [1]
    acts = _manifest(idx)
    assert any(a["action"] == "merge_skip" and a["segment"] == 1 for a in acts)
    s = IndexSearcher(spark, idx)
    assert s.num_docs == 40  # segment 0 only
