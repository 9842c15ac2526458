"""Index maintenance: deletes, delete-application at merge, GC.

Reference surface (SURVEY.md §2.1 S6): IndexWriter.deleteDocuments(field,val),
deleteDocumentsByQuery(q), deleteAllDocuments(), garbageCollectFiles()
(core/IndexWriter.java:143-202).  Tantivy deletes are tombstones that
segments carry until a merge physically removes them — mirrored here:

- delete_* append doc_ids to an ``_deletes`` parquet dir + a manifest line;
  the searcher anti-joins them at query time.
- apply_deletes() rewrites postings/docs dropping tombstoned docs and
  recomputes stats (the "merge preserving deletes" semantics of S7).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tantivy4java_spark import fsio
from tantivy4java_spark import queries as Q


def _append_manifest(spark: SparkSession, index_dir: str, action: dict) -> None:
    path = fsio.join(index_dir, "_manifest", "manifest.jsonl")
    fsio.append_text(spark, path,
                     json.dumps(dict(action, ts=time.time()), sort_keys=True) + "\n")


def delete_by_query(spark: SparkSession, index_dir: str, query: Q.Query) -> int:
    """Tombstone every doc matching the query; returns the count (opstamp
    analog: the manifest line records it)."""
    from tantivy4java_spark.searcher import IndexSearcher
    s = IndexSearcher(spark, index_dir)
    matched = s.score_query(query).select("doc_id").distinct()
    n = matched.count()
    if n:
        matched.write.mode("append").parquet(fsio.join(index_dir, "_deletes"))
    _append_manifest(spark, index_dir, {"action": "delete", "num_docs": int(n),
                                        "query": repr(query)})
    return int(n)


def delete_by_term(spark: SparkSession, index_dir: str,
                   field: str, value) -> int:
    """IndexWriter.deleteDocuments(field, value) analog."""
    return delete_by_query(spark, index_dir, Q.Term(field, value))


def delete_all(spark: SparkSession, index_dir: str) -> int:
    from tantivy4java_spark.searcher import IndexSearcher
    s = IndexSearcher(spark, index_dir)
    return delete_by_query(spark, index_dir, Q.MatchAll())


def rollback(spark: SparkSession, index_dir: str) -> list:
    """Discard uncommitted segment adds (IndexWriter.rollback analog,
    core/IndexWriter.java:133): every segment added since the last ``commit``
    manifest action is removed from the effective set (a ``rollback`` action
    names them) and its directory is deleted.  Returns the rolled-back
    segment ids.

    Documented deviation: delete_by_query tombstones in this engine apply
    immediately (searcher-side anti-join) and are NOT transactional, so they
    are not unwound by rollback."""
    manifest = fsio.join(index_dir, "_manifest", "manifest.jsonl")
    if not fsio.exists(spark, manifest):
        return []
    actions = [json.loads(line)
               for line in fsio.read_text(spark, manifest).splitlines()
               if line.strip()]
    last_commit = -1
    for i, a in enumerate(actions):
        if a.get("action") == "commit":
            last_commit = i
    tail = actions[last_commit + 1:]
    already = {s for a in tail if a.get("action") == "rollback"
               for s in a.get("segments", [])}
    rolled = []
    for a in tail:
        if a.get("action") == "add" and a["segment"] not in already \
                and a["segment"] not in rolled:
            rolled.append(a["segment"])
    if not rolled:
        return []
    for sid in rolled:
        fsio.delete(spark, fsio.join(index_dir, "segments", f"seg={sid:05d}"))
    _append_manifest(spark, index_dir,
                     {"action": "rollback", "segments": rolled})
    return rolled


def apply_deletes(spark: SparkSession, index_dir: str) -> int:
    """Physically remove tombstoned docs (merge-with-deletes, S7): rewrite
    docs + postings without them, refresh stats, clear ``_deletes``."""
    from tantivy4java_spark.build import _POSTINGS_SCHEMA
    from tantivy4java_spark.fieldnorm import FIELDNORM_TABLE
    from tantivy4java_spark.scoring import K1
    from tantivy4java_spark.searcher import IndexSearcher, _DECODED_SCHEMA, _decode_blocks

    del_dir = fsio.join(index_dir, "_deletes")
    if not fsio.isdir_nonempty(spark, del_dir):
        return 0
    s = IndexSearcher(spark, index_dir)
    tomb = spark.read.parquet(del_dir).distinct().persist()
    n_del = tomb.count()

    # docs: rewrite without tombstones
    live_docs = s._table("docs").join(tomb, "doc_id", "left_anti")
    tmp_docs = os.path.join(index_dir, "docs__new")
    live_docs.write.mode("overwrite").parquet(tmp_docs)

    # stats from the rewritten docs
    docs_new = spark.read.parquet(tmp_docs)
    len_cols = [c for c in docs_new.columns if c.startswith("len_")]
    row = docs_new.agg(F.count(F.lit(1)).alias("_n"),
                       *[F.sum(c).alias(c) for c in len_cols]).collect()[0]
    num_docs = int(row["_n"])
    stats = dict(s._stats)
    stats["num_docs"] = num_docs
    for c in len_cols:
        fname = c[len("len_"):]
        tot = int(row[c] or 0)
        stats["fields"][fname] = {
            "num_docs": num_docs, "total_tokens": tot,
            "avgdl": (float(tot) / num_docs) if num_docs else 0.0}

    # postings: decode -> drop tombstoned -> re-encode with refreshed stats
    avgdl_map = {f: v["avgdl"] for f, v in stats["fields"].items()}
    for fobj in s._meta.get("fields", []):
        avgdl_map.setdefault(fobj["name"], 1.0)
    decoded = s.postings().mapInPandas(_decode_blocks, _DECODED_SCHEMA)
    live = decoded.join(tomb, "doc_id", "left_anti")
    live = live.withColumn("shard", F.shiftright(
        "doc_id", s._meta.get("shard_bits", 16)).cast("long"))
    # re-derive df and idf during the encode pass via the merge fn: feed it
    # block-shaped rows (one block per (f,t,shard) group re-encoded)
    from tantivy4java_spark.build import _encode_blocks_fn
    nparts = spark.sparkContext.defaultParallelism
    terms_new = (live.groupBy("field", "term")
                 .agg(F.count(F.lit(1)).cast("long").alias("df"),
                      F.sum("tf").cast("long").alias("total_tf")))
    idf_df = terms_new.withColumn(
        "idf_w",
        F.log(F.lit(1.0) + (F.lit(float(num_docs)) - F.col("df") + F.lit(0.5))
              / (F.col("df") + F.lit(0.5))) * F.lit(K1 + 1.0)
    ).select("field", "term", "idf_w")
    enc = _encode_blocks_fn(s._meta.get("block_size", 128), with_scores=True,
                            norm_decode=FIELDNORM_TABLE, avgdl_map=avgdl_map)
    tmp_post = os.path.join(index_dir, "postings__new")
    (live.join(F.broadcast(idf_df), ["field", "term"])
     .repartition(nparts, "field", "term", "shard")
     .sortWithinPartitions("field", "term", "shard", "doc_id")
     .mapInPandas(enc, _POSTINGS_SCHEMA)
     .write.mode("overwrite").parquet(tmp_post))
    tmp_terms = os.path.join(index_dir, "terms__new")
    # range-sharded terms dictionary (same layout as the merge writes: file
    # min/max stats on the sorted ranges give pruned lookups at scale)
    terms_new.repartitionByRange(max(1, nparts // 4), "field", "term") \
        .sortWithinPartitions("field", "term") \
        .write.mode("overwrite").parquet(tmp_terms)

    # positions: phrase queries scan these and rely on the tombstone
    # anti-join, so they MUST be rewritten before the tombstones are dropped
    # (otherwise physically deleted docs reappear in phrase results).
    # postings were decoded from the per-segment dirs (metadata-only-merge
    # layout) and are being rewritten as ONE root postings/ dir with
    # embedded block bounds — drop the dir list, the blockmeta table, and
    # the superseded segment payloads
    old_post_dirs = [fsio.join(index_dir, d)
                     for d in (s._stats.get("postings_dirs") or [])]
    stats.pop("postings_dirs", None)

    pos_rel_dirs = s._stats.get("positions_dirs")
    has_positions = bool(pos_rel_dirs) or \
        fsio.exists(spark, fsio.join(index_dir, "positions"))
    tmp_pos = fsio.join(index_dir, "positions__new")
    old_pos_dirs = []
    if has_positions:
        old_pos_dirs = ([fsio.join(index_dir, d) for d in pos_rel_dirs]
                        if pos_rel_dirs
                        else [fsio.join(index_dir, "positions")])
        (s.positions().join(tomb, "doc_id", "left_anti")
         .repartition(max(1, nparts // 2), "field", "term")
         .sortWithinPartitions("field", "term", "doc_id")
         .write.mode("overwrite").parquet(tmp_pos))
        stats["positions_dirs"] = ["positions"]
    tomb.unpersist()

    # atomic-ish swap
    swaps = [("docs", tmp_docs), ("postings", tmp_post), ("terms", tmp_terms)]
    if has_positions:
        swaps.append(("positions", tmp_pos))
    for name, tmp in swaps:
        final = fsio.join(index_dir, name)
        fsio.delete(spark, final)
        fsio.rename(spark, tmp, final)
    # drop superseded per-segment positions dirs (now folded into positions/)
    final_pos = fsio.join(index_dir, "positions")
    for d in old_pos_dirs:
        if d.rstrip("/") != final_pos.rstrip("/"):
            fsio.delete(spark, d)
    final_post = fsio.join(index_dir, "postings")
    for d in old_post_dirs:
        if d.rstrip("/") != final_post.rstrip("/"):
            fsio.delete(spark, d)
    fsio.delete(spark, fsio.join(index_dir, "blockmeta"))
    fsio.write_text(spark, fsio.join(index_dir, "stats.json"),
                    json.dumps(stats, indent=2, sort_keys=True))
    fsio.delete(spark, del_dir)
    _append_manifest(spark, index_dir, {"action": "apply_deletes",
                                        "removed": int(n_del),
                                        "num_docs": num_docs})
    return int(n_del)
