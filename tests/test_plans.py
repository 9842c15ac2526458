"""Physical-plan assertions: predicates must reach the Parquet scans
(the data-skipping analogs of SURVEY.md §4 O1/O2 come free ONLY if the plan
keeps filters pushable — pin that property)."""

import pytest

from tantivy4java_spark import queries as Q
from tantivy4java_spark.build import build_index
from tantivy4java_spark.corpus import generate_pandas
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    pdf = generate_pandas(0, 200, min_tokens=15, max_tokens=40)
    pdf["doc_id"] = range(200)
    cfg = IndexConfig(fields=[FieldConfig("content", "text"),
                              FieldConfig("lang", "string")],
                      id_cols=["doc_id", "lang"], content_col="content")
    idx = str(tmp_path_factory.mktemp("plan_idx"))
    build_index(spark, spark.createDataFrame(pdf), cfg, idx, doc_id_col="doc_id")
    return IndexSearcher(spark, idx)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_term_filter_pushed_to_postings_scan(searcher):
    plan = _plan(searcher._decoded_postings([("content", "import")]))
    assert "EqualTo(term,import)" in plan
    assert "EqualTo(field,content)" in plan


def test_range_filter_pushed_and_columns_pruned(searcher):
    plan = _plan(searcher.score_query(Q.Range("doc_id", 10, 50)))
    assert "GreaterThanOrEqual(doc_id,10)" in plan
    assert "LessThanOrEqual(doc_id,50)" in plan
    # column pruning: the docs scan must read doc_id only
    scan_lines = [l for l in plan.split("\n")
                  if "FileScan" in l and "/docs" in l]
    assert scan_lines and "ReadSchema: struct<doc_id:bigint>" in scan_lines[0]


def test_positions_scan_filters_terms(searcher):
    plan = _plan(searcher.score_query(
        Q.Phrase("content", ["import", "return"], 0)))
    assert "EqualTo(field,content)" in plan
    assert "In(term, [import,return])" in plan or \
        ("import" in plan and "return" in plan)


def test_shard_filter_pushed_when_pruning(searcher):
    df = searcher._decoded_postings([("content", "import")], shards=[0])
    plan = _plan(df)
    # the PushedFilters list is display-truncated; IsNotNull(shard) proves
    # the shard predicate reached the scan's pushdown set
    assert "IsNotNull(shard)" in plan


def test_terms_lookup_pushdown_on_sharded_dictionary(searcher):
    """Term-df lookups against the range-sharded terms dir must push the
    (field, term) predicates to the scan (file/row-group pruning via the
    sorted range files' min/max stats)."""
    from pyspark.sql import functions as F
    df = (searcher.terms()
          .filter((F.col("field") == "content") & (F.col("term") == "import"))
          .select("df"))
    plan = _plan(df)
    assert "EqualTo(field,content)" in plan
    assert "EqualTo(term,import)" in plan


def test_fuzzy_classic_levenshtein_stays_jvm(searcher):
    """transposition_cost_one=False keeps the expansion in codegen: no
    Python-UDF eval node in the terms-filter plan."""
    from pyspark.sql import functions as F
    cand = (searcher.terms()
            .filter(F.col("field") == "content")
            .filter(F.abs(F.length("term") - F.lit(6)) <= 1)
            .filter(F.levenshtein(F.lit("shufle"), F.col("term"), 1) >= 0))
    plan = _plan(cand)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "levenshtein" in plan
