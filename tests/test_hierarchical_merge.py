"""Hierarchical (multi-level, bounded fan-in) merge — S9 analog; results must
be identical to the single-level merge."""

import json
import os

import pytest

from tantivy4java_spark import queries as Q
from tantivy4java_spark.build import IndexBuilder
from tantivy4java_spark.corpus import generate_pandas
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher


def test_hierarchical_merge_matches_flat(spark, tmp_path):
    pdf = generate_pandas(0, 180, min_tokens=15, max_tokens=40)
    pdf["doc_id"] = range(180)
    cfg = IndexConfig(fields=[FieldConfig("content", "text"),
                              FieldConfig("lang", "string")],
                      id_cols=["doc_id", "lang"], content_col="content")
    idx = str(tmp_path / "hier_idx")
    b = IndexBuilder(spark, cfg, idx, num_segments=6)
    b.build(spark.createDataFrame(pdf), doc_id_col="doc_id")

    s1 = IndexSearcher(spark, idx)
    q = Q.Boolean(should=[Q.Term("content", "import"),
                          Q.Term("content", "merge")])
    flat = [(r["doc_id"], round(r["score"], 10))
            for r in s1.search(q, limit=50).collect()]
    pq = Q.Phrase("content", ["import", "return"], 1)
    flat_phrase = [(r["doc_id"], round(r["score"], 10))
                   for r in s1.search(pq, limit=20).collect()]

    # redo the merge hierarchically with fan-in 2 (3 levels for 6 segments)
    action = b.merge_hierarchical(list(range(6)), fanin=2)
    b._append_manifest(action)
    levels = [a for a in b._manifest_actions() if a["action"] == "merge_level"]
    assert len(levels) >= 3  # 6 -> 3 -> 2 with fanin 2

    s2 = IndexSearcher(spark, idx)
    assert s2.num_docs == 180
    hier = [(r["doc_id"], round(r["score"], 10))
            for r in s2.search(q, limit=50).collect()]
    assert hier == flat
    hier_phrase = [(r["doc_id"], round(r["score"], 10))
                   for r in s2.search(pq, limit=20).collect()]
    assert hier_phrase == flat_phrase
