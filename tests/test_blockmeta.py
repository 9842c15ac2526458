"""Metadata-only merge (no full-data rewrite at commit).

Contract:
- the commit writes NO root postings dir: payloads stay in segment dirs
  (stats.postings_dirs), clustered by (field, term, shard, doc_id)
- blockmeta/ holds per-block WAND bounds computed WITHOUT decoding, from
  (max_tf, min_norm_id) + global idf/avgdl
- every blockmeta bound is a TRUE upper bound on the block's per-doc BM25
  contribution (WAND correctness requires never underestimating)
"""

import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from tantivy4java_spark import queries as Q
from tantivy4java_spark.build import build_index
from tantivy4java_spark.corpus import generate_pandas
from tantivy4java_spark.fieldnorm import FIELDNORM_TABLE
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.scoring import B, K1, idf_weight
from tantivy4java_spark.searcher import IndexSearcher, _DECODED_SCHEMA, _decode_blocks


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = generate_pandas(0, 300, min_tokens=20, max_tokens=120)
    pdf["doc_id"] = range(300)
    cfg = IndexConfig(fields=[FieldConfig("content", "text"),
                              FieldConfig("lang", "string")],
                      id_cols=["doc_id", "lang"], content_col="content",
                      shard_bits=6)
    idx = str(tmp_path_factory.mktemp("bm_idx"))
    build_index(spark, spark.createDataFrame(pdf), cfg, idx,
                doc_id_col="doc_id", num_segments=3)
    return idx


def test_no_postings_rewrite_at_commit(spark, built):
    s = IndexSearcher(spark, built)
    assert not os.path.isdir(os.path.join(built, "postings")), \
        "commit must not rewrite posting payloads into a root dir"
    assert os.path.isdir(os.path.join(built, "blockmeta"))
    dirs = s._stats.get("postings_dirs")
    assert dirs and all(d.startswith("segments/") for d in dirs)
    for d in dirs:
        assert os.path.isdir(os.path.join(built, d))
    # the searcher still serves every posting through the dir list
    assert s.postings().count() == s.blockmeta().count()


def test_blockmeta_is_true_upper_bound(spark, built):
    """Decode every block and verify max true score <= recorded bound."""
    s = IndexSearcher(spark, built)
    decoded = (s.postings().filter(F.col("field") == "content")
               .mapInPandas(_decode_blocks, _DECODED_SCHEMA).toPandas())
    dfs = decoded.groupby("term")["doc_id"].nunique().to_dict()
    avgdl = s.avgdl("content")
    N = s.num_docs
    lens = np.asarray(FIELDNORM_TABLE, dtype=np.float64)[
        decoded["norm_id"].to_numpy()]
    tf = decoded["tf"].to_numpy(dtype=np.float64)
    idf = decoded["term"].map(lambda t: idf_weight(dfs[t], N)).to_numpy()
    decoded["true_score"] = idf * tf / (tf + K1 * (1.0 - B + B * lens / avgdl))
    decoded["shard"] = decoded["doc_id"].to_numpy() >> 6
    true_max = (decoded.groupby(["term", "shard"])["true_score"].max())
    bm = (s.blockmeta().filter(F.col("field") == "content")
          .groupBy("term", "shard")
          .agg(F.max("block_max_score").alias("bound")).toPandas()
          .set_index(["term", "shard"])["bound"])
    joined = true_max.to_frame().join(bm.to_frame(), how="left")
    assert joined["bound"].notna().all()
    assert (joined["bound"] + 1e-12 >= joined["true_score"]).all(), \
        "blockmeta underestimates a block's max score — WAND would drop hits"


def test_pruned_topk_equals_unpruned(spark, built):
    s = IndexSearcher(spark, built)
    for q in (Q.Term("content", "import"),
              Q.Boolean(must=[Q.Term("content", "import"),
                              Q.Term("content", "shuffle")]),
              Q.Boolean(should=[Q.Term("content", "merge"),
                                Q.Term("content", "partition")])):
        pruned = [(r["doc_id"], round(r["score"], 9))
                  for r in s.search(q, limit=10, prune=True).collect()]
        full = [(r["doc_id"], round(r["score"], 9))
                for r in s.search(q, limit=10, prune=False).collect()]
        assert pruned == full
