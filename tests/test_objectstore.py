"""Object-store-capable index roots (reference: mixed s3://, azure://,
file:// split URLs, merge_impl.rs:70-294).

In this sandbox the non-posix scheme available to Hadoop is ``file://`` —
any other scheme (s3a://, abfs://) takes the IDENTICAL code path in fsio
(Hadoop FileSystem via the JVM), so an E2E pass over a file:// root proves
the scheme-routing layer end to end: manifest append/read, stats.json,
segment probes, tombstones, apply-deletes swap.
"""

import json
import os

import pytest

from tantivy4java_spark import fsio
from tantivy4java_spark import maintenance as M
from tantivy4java_spark import queries as Q
from tantivy4java_spark.build import build_index
from tantivy4java_spark.corpus import generate_pandas
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher


def test_fsio_roundtrip_scheme_path(spark, tmp_path):
    root = f"file://{tmp_path}/meta"
    p = fsio.join(root, "a", "b.txt")
    assert p == f"file://{tmp_path}/meta/a/b.txt"
    assert not fsio.exists(spark, p)
    fsio.makedirs(spark, fsio.join(root, "a"))
    fsio.write_text(spark, p, "hello\n")
    fsio.append_text(spark, p, "world\n")
    assert fsio.read_text(spark, p) == "hello\nworld\n"
    assert fsio.exists(spark, p)
    assert fsio.listdir(spark, fsio.join(root, "a")) == ["b.txt"]
    assert fsio.isdir_nonempty(spark, fsio.join(root, "a"))
    fsio.rename(spark, p, fsio.join(root, "a", "c.txt"))
    assert fsio.read_text(spark, fsio.join(root, "a", "c.txt")) == "hello\nworld\n"
    fsio.delete(spark, fsio.join(root, "a"))
    assert not fsio.exists(spark, fsio.join(root, "a"))
    assert fsio.relpath(fsio.join(root, "x", "y"), root) == "x/y"


def test_build_search_delete_on_scheme_root(spark, tmp_path):
    """Full lifecycle against a scheme'd (non-posix-code-path) index root."""
    pdf = generate_pandas(0, 150, min_tokens=15, max_tokens=40)
    pdf["doc_id"] = range(150)
    cfg = IndexConfig(fields=[FieldConfig("content", "text"),
                              FieldConfig("lang", "string")],
                      id_cols=["doc_id", "lang"], content_col="content")
    idx = f"file://{tmp_path}/remote_idx"
    stats = build_index(spark, spark.createDataFrame(pdf), cfg, idx,
                        doc_id_col="doc_id", num_segments=2)
    assert stats.num_docs == 150
    # metadata actually landed under the scheme'd root
    local = str(tmp_path / "remote_idx")
    assert os.path.exists(os.path.join(local, "stats.json"))
    # versioned manifest: one numbered action file per action
    acts = [f for f in os.listdir(os.path.join(local, "_manifest"))
            if f.endswith(".json")]
    assert len(acts) >= 4  # protocol, metadata, adds, commit

    s = IndexSearcher(spark, idx)
    hits = s.search(Q.Term("content", "import"), limit=10).collect()
    assert hits
    # posix comparison build must give identical results
    idx2 = str(tmp_path / "local_idx")
    build_index(spark, spark.createDataFrame(pdf), cfg, idx2,
                doc_id_col="doc_id", num_segments=2)
    s2 = IndexSearcher(spark, idx2)
    hits2 = s2.search(Q.Term("content", "import"), limit=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in hits] == \
        [(r["doc_id"], round(r["score"], 9)) for r in hits2]

    # tombstone + physical delete lifecycle through the scheme'd root
    victim = hits[0]["doc_id"]
    n = M.delete_by_query(spark, idx, Q.Range("doc_id", victim, victim))
    assert n == 1
    s3 = IndexSearcher(spark, idx)
    assert victim not in {r["doc_id"]
                          for r in s3.search(Q.Term("content", "import"),
                                             limit=200).collect()}
    assert M.apply_deletes(spark, idx) == 1
    s4 = IndexSearcher(spark, idx)
    assert s4.num_docs == 149
    assert victim not in {r["doc_id"]
                          for r in s4.search(Q.Term("content", "import"),
                                             limit=200).collect()}


def test_terms_dictionary_is_range_sharded(spark, tmp_path):
    """The terms table must be multiple range-partitioned sorted files (no
    single-reducer dictionary), and term lookups must prune files via
    Parquet min/max stats."""
    pdf = generate_pandas(0, 400, min_tokens=30, max_tokens=120)
    pdf["doc_id"] = range(400)
    cfg = IndexConfig(fields=[FieldConfig("content", "text"),
                              FieldConfig("lang", "string")],
                      id_cols=["doc_id", "lang"], content_col="content")
    idx = str(tmp_path / "sharded_terms")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    build_index(spark, spark.createDataFrame(pdf), cfg, idx,
                doc_id_col="doc_id", shuffle_partitions=16)
    files = [f for f in os.listdir(os.path.join(idx, "terms"))
             if f.endswith(".parquet")]
    assert len(files) > 1, "terms dictionary written through one reducer"
    # global order across files: per-file (min,max) ranges must not overlap
    import pyarrow.parquet as pq
    ranges = []
    for f in files:
        t = pq.read_table(os.path.join(idx, "terms", f),
                          columns=["field", "term"])
        if t.num_rows:
            ranges.append(((t["field"][0].as_py(), t["term"][0].as_py()),
                           (t["field"][-1].as_py(), t["term"][-1].as_py())))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "range files overlap — not a sorted range layout"
    # and the searcher still resolves dfs correctly through the sharded table
    s = IndexSearcher(spark, idx)
    assert s.term_df("content", "import") > 0
