"""Deterministic hash-bucket sampling / dataset-split operators.

The property that matters at 100 TB: assignments depend only on (salt, id),
never on row order, partitioning, or corpus size — so re-runs and backfills
cannot leak val/test rows into train."""

import pytest

from tantivy4java_spark.pipeline import sampling as SM


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, "en" if i % 3 else "de", f"text {i}") for i in range(2000)],
        "doc_id long, lang string, text string").cache()


def test_hash_split_fractions_and_totality(spark, docs):
    out = SM.hash_split(docs, "doc_id",
                        {"train": 0.75, "val": 0.125, "test": 0.125})
    counts = {r["split"]: r["cnt"] for r in
              out.groupBy("split").agg(
                  SM.F.count(SM.F.lit(1)).alias("cnt")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    assert abs(counts["train"] / 2000 - 0.75) < 0.05
    assert abs(counts["val"] / 2000 - 0.125) < 0.04


def test_hash_split_stable_under_growth_and_partitioning(spark, docs):
    fr = {"train": 0.75, "val": 0.125, "test": 0.125}
    base = {r["doc_id"]: r["split"]
            for r in SM.hash_split(docs, "doc_id", fr).collect()}
    # grow the corpus AND change the physical layout: old rows keep splits
    grown = docs.unionByName(
        spark.createDataFrame([(10_000 + i, "en", "new") for i in range(500)],
                              "doc_id long, lang string, text string")
    ).repartition(17)
    after = {r["doc_id"]: r["split"]
             for r in SM.hash_split(grown, "doc_id", fr).collect()}
    assert all(after[k] == v for k, v in base.items())


def test_hash_split_bad_fractions(spark, docs):
    with pytest.raises(ValueError, match="sum to 1"):
        SM.hash_split(docs, "doc_id", {"a": 0.5, "b": 0.4})


def test_hash_sample_deterministic_subset(spark, docs):
    s1 = {r["doc_id"] for r in
          SM.hash_sample(docs, "doc_id", 0.2).select("doc_id").collect()}
    s2 = {r["doc_id"] for r in
          SM.hash_sample(docs.repartition(31), "doc_id", 0.2)
          .select("doc_id").collect()}
    assert s1 == s2 and abs(len(s1) / 2000 - 0.2) < 0.04
    # smaller fraction with the same salt nests inside the larger one
    s_small = {r["doc_id"] for r in
               SM.hash_sample(docs, "doc_id", 0.1).select("doc_id").collect()}
    assert s_small <= s1


def test_stratified_sample_rate_per_stratum(spark, docs):
    out = SM.stratified_hash_sample(docs, ["lang"], "doc_id", 0.3)
    rates = {r["lang"]: r["cnt"] for r in out.groupBy("lang").agg(
        SM.F.count(SM.F.lit(1)).alias("cnt")).collect()}
    # en stratum has 1333 rows, de 667 — each sampled near 30%
    assert abs(rates["en"] / 1333 - 0.3) < 0.06
    assert abs(rates["de"] / 667 - 0.3) < 0.07
