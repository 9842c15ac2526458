"""Round-2 surface additions:
- custom tokenizer registration (registerTokenizer analog, index.rs:541)
- BYTES field type (SchemaBuilder.java:350-363)
- incremental changed-row reads (getChangesSince analog,
  iceberg/IcebergTableReader.java:543)
"""

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tantivy4java_spark import queries as Q
from tantivy4java_spark.analysis import register_tokenizer, tokenize_text
from tantivy4java_spark.build import build_index
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher
from tantivy4java_spark.streaming import changes_since, index_changes


# -- custom tokenizers --------------------------------------------------------
def test_register_tokenizer_both_paths(spark, tmp_path):
    register_tokenizer("path_seg", match_pattern=r"[^/]+",
                       split_pattern="/", lowercase=False)
    assert tokenize_text("src/Main/File.java", "path_seg") == \
        [("src", 0), ("Main", 1), ("File.java", 2)]

    rows = pd.DataFrame({"doc_id": [0, 1],
                         "path": ["src/Main/App.java", "lib/util/app.java"]})
    cfg = IndexConfig(fields=[FieldConfig("path", "text", "path_seg")],
                      id_cols=["doc_id"])
    for sql_tok in (True, False):
        idx = str(tmp_path / f"tok{sql_tok}")
        build_index(spark, spark.createDataFrame(rows), cfg, idx,
                    doc_id_col="doc_id", use_sql_tokenizer=sql_tok)
        s = IndexSearcher(spark, idx)
        # case preserved (lowercase=False), '/' is the only delimiter
        assert {r["doc_id"] for r in
                s.score_query(Q.Term("path", "Main")).collect()} == {0}
        assert {r["doc_id"] for r in
                s.score_query(Q.Term("path", "App.java")).collect()} == {0}
        assert {r["doc_id"] for r in
                s.score_query(Q.Term("path", "app.java")).collect()} == {1}


def test_register_tokenizer_guards():
    with pytest.raises(ValueError):
        register_tokenizer("default", r"\w+")  # can't override built-ins
    with pytest.raises(Exception):
        register_tokenizer("badrx", r"[unclosed")


# -- BYTES fields -------------------------------------------------------------
def test_bytes_field_term_and_range(spark, tmp_path):
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("digest", T.BinaryType()),
                           T.StructField("body", T.StringType())])
    rows = [(i, bytes([i, i + 1, i + 2]), f"doc number {i}") for i in range(6)]
    df = spark.createDataFrame(rows, schema)
    cfg = IndexConfig(fields=[FieldConfig("body", "text"),
                              FieldConfig("digest", "bytes", fast=True)],
                      id_cols=["doc_id"])
    idx = str(tmp_path / "bytesidx")
    build_index(spark, df, cfg, idx, doc_id_col="doc_id")
    s = IndexSearcher(spark, idx)
    # exact binary term (bytes value and hex-string spelling)
    assert [r["doc_id"] for r in
            s.score_query(Q.Term("digest", bytes([2, 3, 4]))).collect()] == [2]
    assert [r["doc_id"] for r in
            s.score_query(Q.Range("digest", "020304", "020304")).collect()] == [2]
    # binary range (big-endian byte order == unsigned lexicographic)
    got = sorted(r["doc_id"] for r in s.score_query(
        Q.Range("digest", bytes([1, 2, 3]), bytes([4, 5, 6]), True, True))
        .collect())
    assert got == [1, 2, 3, 4]
    assert s.score_query(Q.Exists("digest")).count() == 6


# -- incremental changed-row reads -------------------------------------------
def test_changes_since_and_index_changes(spark, tmp_path):
    snap = str(tmp_path / "snap")
    idx = str(tmp_path / "incidx")
    cfg = IndexConfig(fields=[FieldConfig("content", "text"),
                              FieldConfig("k", "string")],
                      id_cols=["k"], content_col="content")

    v1 = spark.createDataFrame(pd.DataFrame({
        "k": [f"k{i}" for i in range(10)],
        "content": [f"alpha doc {i}" for i in range(10)]}))
    # first pass: everything is new
    changed, record = changes_since(spark, v1, snap, ["k"])
    assert changed.count() == 10
    record()
    # second pass on identical table: empty delta
    changed2, _ = changes_since(spark, v1, snap, ["k"])
    assert changed2.count() == 0

    # mutate 2 rows + add 1
    pdf = v1.toPandas()
    pdf.loc[pdf["k"] == "k3", "content"] = "alpha doc 3 CHANGED"
    pdf.loc[pdf["k"] == "k7", "content"] = "alpha doc 7 CHANGED"
    v2 = spark.createDataFrame(
        pd.concat([pdf, pd.DataFrame({"k": ["k10"],
                                      "content": ["brand new doc"]})]))
    changed3, _ = changes_since(spark, v2, snap, ["k"])
    assert {r["k"] for r in changed3.select("k").collect()} == {"k3", "k7", "k10"}

    # full incremental indexing flow: v1 -> index, v2 delta -> index
    import shutil
    shutil.rmtree(snap, ignore_errors=True)
    a1 = index_changes(spark, cfg, idx, v1, snap, ["k"])
    assert a1["num_docs"] == 10
    a2 = index_changes(spark, cfg, idx, v2, snap, ["k"])
    assert a2["num_docs"] == 3
    # no-op on an unchanged table
    a3 = index_changes(spark, cfg, idx, v2, snap, ["k"])
    assert a3["action"] == "noop"
    s = IndexSearcher(spark, idx)
    assert {r["doc_id"] for r in
            s.score_query(Q.Term("content", "changed")).collect()} and \
        s.score_query(Q.Term("content", "brand")).count() == 1
