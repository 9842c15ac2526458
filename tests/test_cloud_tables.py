"""Cloud-table readers (S11/S12): snapshot-diff incremental indexing.

The parquet TableRef path (content-hash diff) runs everywhere.  The Delta
and Iceberg paths need their Spark runtimes on the classpath — they are
import/env-gated and SKIP in environments without the packages (this
sandbox has no network and no delta/iceberg jars); on a real cluster they
run the full build -> query -> append-snapshot -> incremental-reindex cycle
the reference covers in IcebergTableReader.java:111-543 and
delta/DeltaTableReader.java.
"""

import pytest

from tantivy4java_spark import queries as Q
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher
from tantivy4java_spark.tables import (TableRef, current_snapshot,
                                       index_table_changes)


def _cfg():
    return IndexConfig(fields=[FieldConfig("text", "text"),
                               FieldConfig("k", "long")], id_cols=["k"])


# -- parquet path: runs everywhere --------------------------------------------

def test_parquet_table_incremental_upsert(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    idx = str(tmp_path / "idx")
    ref = TableRef(tbl, "parquet")

    v1 = spark.createDataFrame([(i, f"version one {i}") for i in range(30)],
                               "k long, text string")
    v1.write.mode("overwrite").parquet(tbl)
    a1 = index_table_changes(spark, _cfg(), idx, ref, ["k"])
    assert a1["num_docs"] == 30

    # no table change -> noop
    assert index_table_changes(spark, _cfg(), idx, ref, ["k"])["action"] == "noop"

    # update one key + add one: incremental step must upsert
    v2 = spark.createDataFrame(
        [(i, f"version one {i}") for i in range(30) if i != 5]
        + [(5, "version two changed"), (99, "version one 99")],
        "k long, text string")
    v2.write.mode("overwrite").parquet(tbl)
    a2 = index_table_changes(spark, _cfg(), idx, ref, ["k"])
    assert a2["num_docs"] == 2

    s = IndexSearcher(spark, idx)
    hit_ks = {r.k for r in s.retrieve(
        s.search(Q.Term("text", "changed"), limit=10), s._table("docs"),
        fields=["k"]).collect()}
    assert hit_ks == {5}
    old5 = s.retrieve(s.search(Q.Phrase("text", ["version", "one"]),
                               limit=100), s._table("docs"),
                      fields=["k"]).collect()
    assert 5 not in {r.k for r in old5}
    assert 99 in {r.k for r in old5}


def test_current_snapshot_parquet_is_none(spark, tmp_path):
    tbl = str(tmp_path / "t2")
    ref = TableRef(tbl, "parquet")
    assert current_snapshot(spark, ref) is None


# -- delta path: gated on the delta-spark runtime ------------------------------
# (importorskip INSIDE the fixture so the parquet tests above still run in
# environments without the package — this sandbox has no network/jars)


@pytest.fixture(scope="module")
def delta_spark():
    delta = pytest.importorskip(
        "delta", reason="delta-spark not installed (no network in sandbox); "
        "on a cluster this exercises S12 end-to-end")
    from pyspark.sql import SparkSession
    builder = (SparkSession.builder.master("local[4]")
               .appName("t4s-delta-e2e")
               .config("spark.sql.extensions",
                       "io.delta.sql.DeltaSparkSessionExtension")
               .config("spark.sql.catalog.spark_catalog",
                       "org.apache.spark.sql.delta.catalog.DeltaCatalog")
               .config("spark.sql.shuffle.partitions", "8"))
    sp = delta.configure_spark_with_delta_pip(builder).getOrCreate()
    yield sp
    sp.stop()


def test_delta_table_incremental_upsert(delta_spark, tmp_path):
    spark = delta_spark
    tbl = str(tmp_path / "dtbl")
    idx = str(tmp_path / "didx")
    ref = TableRef(tbl, "delta")

    v1 = spark.createDataFrame([(i, f"version one {i}") for i in range(30)],
                               "k long, text string")
    (v1.write.format("delta")
     .option("delta.enableChangeDataFeed", "true").save(tbl))
    assert current_snapshot(spark, ref) == 0
    a1 = index_table_changes(spark, _cfg(), idx, ref, ["k"])
    assert a1["num_docs"] == 30 and a1["snapshot_id"] == 0

    # idempotent at the same version
    assert index_table_changes(spark, _cfg(), idx, ref, ["k"])["action"] == "noop"

    # append a snapshot: MERGE updates k=5, inserts k=99
    from delta.tables import DeltaTable
    upd = spark.createDataFrame([(5, "version two changed"),
                                 (99, "version one 99")],
                                "k long, text string")
    (DeltaTable.forPath(spark, tbl).alias("t")
     .merge(upd.alias("u"), "t.k = u.k")
     .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute())
    snap = current_snapshot(spark, ref)
    assert snap and snap >= 1

    a2 = index_table_changes(spark, _cfg(), idx, ref, ["k"])
    assert a2["num_docs"] == 2 and a2["snapshot_id"] == snap

    s = IndexSearcher(spark, idx)
    assert {r.k for r in s.retrieve(
        s.search(Q.Term("text", "changed"), limit=10), s._table("docs"),
        fields=["k"]).collect()} == {5}
    one = {r.k for r in s.retrieve(
        s.search(Q.Phrase("text", ["version", "one"]), limit=100),
        s._table("docs"), fields=["k"]).collect()}
    assert 5 not in one and 99 in one


# -- iceberg path: gated on an iceberg-enabled session --------------------------


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    """Needs iceberg-spark-runtime on the classpath (no network in this
    sandbox).  Set T4S_ICEBERG_JAR to the runtime jar to enable."""
    import os
    jar = os.environ.get("T4S_ICEBERG_JAR")
    if not jar:
        pytest.skip("iceberg-spark-runtime not available "
                    "(set T4S_ICEBERG_JAR); on a cluster this exercises "
                    "S11 end-to-end")
    from pyspark.sql import SparkSession
    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    sp = (SparkSession.builder.master("local[4]")
          .appName("t4s-iceberg-e2e")
          .config("spark.jars", jar)
          .config("spark.sql.extensions",
                  "org.apache.iceberg.spark.extensions"
                  ".IcebergSparkSessionExtensions")
          .config("spark.sql.catalog.local",
                  "org.apache.iceberg.spark.SparkCatalog")
          .config("spark.sql.catalog.local.type", "hadoop")
          .config("spark.sql.catalog.local.warehouse", wh)
          .config("spark.sql.shuffle.partitions", "8")
          .getOrCreate())
    yield sp
    sp.stop()


def test_iceberg_table_incremental_upsert(iceberg_spark, tmp_path):
    spark = iceberg_spark
    tname = "local.db.t4s_docs"
    idx = str(tmp_path / "iidx")
    ref = TableRef(tname, "iceberg")

    spark.sql(f"DROP TABLE IF EXISTS {tname}")
    spark.createDataFrame([(i, f"version one {i}") for i in range(30)],
                          "k long, text string") \
        .writeTo(tname).create()
    snap0 = current_snapshot(spark, ref)
    assert snap0 is not None
    a1 = index_table_changes(spark, _cfg(), idx, ref, ["k"])
    assert a1["num_docs"] == 30 and a1["snapshot_id"] == snap0
    assert index_table_changes(spark, _cfg(), idx, ref, ["k"])["action"] == "noop"

    # append a snapshot (iceberg incremental scans cover appends)
    spark.createDataFrame([(99, "version one 99"),
                           (100, "version two changed")],
                          "k long, text string").writeTo(tname).append()
    snap1 = current_snapshot(spark, ref)
    assert snap1 != snap0
    a2 = index_table_changes(spark, _cfg(), idx, ref, ["k"])
    assert a2["num_docs"] == 2 and a2["snapshot_id"] == snap1

    s = IndexSearcher(spark, idx)
    assert {r.k for r in s.retrieve(
        s.search(Q.Term("text", "changed"), limit=10), s._table("docs"),
        fields=["k"]).collect()} == {100}
