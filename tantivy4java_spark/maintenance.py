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
    from tantivy4java_spark import manifest
    manifest.append_action(spark, index_dir, action)


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


def garbage_collect(spark: SparkSession, index_dir: str) -> list:
    """garbageCollectFiles analog (core/IndexWriter.java:202): delete index
    subdirectories no live reader references — temp ``*__new`` leftovers
    from interrupted swaps, rolled-back segment dirs, and segment dirs whose
    postings/positions are no longer listed by stats.json (e.g. superseded
    by apply_deletes or by a later hierarchical merge level).  Active
    segment payloads referenced by stats stay.  Returns the deleted paths.
    """
    from tantivy4java_spark.build import active_segments
    stats = json.loads(fsio.read_text(spark, fsio.join(index_dir, "stats.json")))
    referenced = set()
    for key in ("postings_dirs", "positions_dirs"):
        for d in stats.get(key) or []:
            # keep the whole segment dir a referenced table lives under
            referenced.add(d.split("/postings")[0].split("/positions")[0])
    from tantivy4java_spark import manifest
    actions = manifest.read_actions(spark, index_dir)
    active = {f"segments/seg={sid:05d}" for sid in active_segments(actions)}
    deleted = []
    for name in fsio.listdir(spark, index_dir):
        if name.endswith("__new"):
            deleted.append(fsio.join(index_dir, name))
    seg_root = fsio.join(index_dir, "segments")
    if fsio.exists(spark, seg_root):
        for name in fsio.listdir(spark, seg_root):
            rel = f"segments/{name}"
            if rel in referenced or rel in active:
                continue
            deleted.append(fsio.join(seg_root, name))
    for path in deleted:
        fsio.delete(spark, path)
    if deleted:
        _append_manifest(spark, index_dir,
                         {"action": "gc", "removed": len(deleted)})
    return deleted


def rollback(spark: SparkSession, index_dir: str) -> list:
    """Discard uncommitted segment adds (IndexWriter.rollback analog,
    core/IndexWriter.java:133): every segment added since the last ``commit``
    manifest action is removed from the effective set (a ``rollback`` action
    names them) and its directory is deleted.  Returns the rolled-back
    segment ids.

    Documented deviation: delete_by_query tombstones in this engine apply
    immediately (searcher-side anti-join) and are NOT transactional, so they
    are not unwound by rollback."""
    from tantivy4java_spark import manifest
    actions = manifest.read_actions(spark, index_dir)
    if not actions:
        return []
    tail = actions[manifest.last_commit_index(actions) + 1:]
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


def _config_from_meta(meta: dict):
    """Reconstruct the IndexConfig the merge needs from the manifest's
    metadata action (the persisted schema — SchemaBuilder round trip)."""
    from tantivy4java_spark.schema import FieldConfig, IndexConfig
    fields = [FieldConfig(f["name"], f.get("type", "text"),
                          f.get("tokenizer", "default"),
                          f.get("index_option", "position"))
              for f in meta.get("fields", [])]
    return IndexConfig(fields=fields,
                       shard_bits=meta.get("shard_bits", 16),
                       block_size=meta.get("block_size", 128))


def apply_deletes(spark: SparkSession, index_dir: str) -> int:
    """Physically remove tombstoned docs (merge-with-deletes, S7) by
    COMPACTION: the live rows of every table are written as ONE new segment,
    a ``compact`` manifest action clears the prior adds, and the normal
    merge rebuilds the canonical root tables (terms, docs, blockmeta, stats)
    from the compacted segment.  Incremental adds after apply_deletes keep
    working because the manifest's active set matches what's on disk."""
    from tantivy4java_spark.build import (_POSTINGS_SCHEMA, IndexBuilder,
                                          _encode_blocks_fn)
    from tantivy4java_spark.searcher import IndexSearcher, _DECODED_SCHEMA, _decode_blocks

    del_dir = fsio.join(index_dir, "_deletes")
    if not fsio.isdir_nonempty(spark, del_dir):
        return 0
    from tantivy4java_spark import manifest as _mf
    pending = _mf.uncommitted_adds(_mf.read_actions(spark, index_dir))
    if pending:
        # the compaction folds the COMMITTED searcher view (stats.json) and
        # deletes every other segment dir — running it now would silently
        # destroy segments added with add_documents(commit=False) since the
        # last commit (data loss, not rollback)
        raise ValueError(
            f"apply_deletes would destroy uncommitted segment adds "
            f"{pending}; commit them first (add_documents(commit=True) / "
            f"StreamingIndexWriter.refresh()) or rollback()")
    s = IndexSearcher(spark, index_dir)
    builder = IndexBuilder(spark, _config_from_meta(s._meta), index_dir)
    tomb = spark.read.parquet(del_dir).distinct().persist()
    n_del = tomb.count()

    acts = builder._manifest_actions()
    used = [a["segment"] for a in acts if a.get("action") == "add"]
    sid = (max(used) + 1) if used else 0
    seg_dir = builder._p("segments", f"seg={sid:05d}")
    nparts = spark.sparkContext.defaultParallelism

    # live docs -> compact segment
    live_docs = s._table("docs").join(tomb, "doc_id", "left_anti")
    live_docs.write.mode("overwrite").parquet(fsio.join(seg_dir, "docs"))
    num_docs = spark.read.parquet(fsio.join(seg_dir, "docs")).count()

    # live postings: decode -> drop tombstoned -> re-encode (segment layout,
    # no scores — the merge recomputes blockmeta from min_norm_id/max_tf)
    decoded = s.postings().mapInPandas(_decode_blocks, _DECODED_SCHEMA)
    live = (decoded.join(tomb, "doc_id", "left_anti")
            .withColumn("shard", F.shiftright(
                "doc_id", s._meta.get("shard_bits", 16)).cast("long")))
    enc = _encode_blocks_fn(s._meta.get("block_size", 128), with_scores=False)
    (live.select("field", "term", "shard", "doc_id", "tf",
                 F.col("norm_id").cast("long").alias("norm_id"))
     .repartition(nparts, "field", "term", "shard")
     .sortWithinPartitions("field", "term", "shard", "doc_id")
     .mapInPandas(enc, _POSTINGS_SCHEMA)
     .write.mode("overwrite").parquet(fsio.join(seg_dir, "postings")))
    (live.groupBy("field", "term")
     .agg(F.count(F.lit(1)).cast("long").alias("df"),
          F.sum("tf").cast("long").alias("total_tf"))
     .write.mode("overwrite").parquet(fsio.join(seg_dir, "termstats")))

    # live positions (phrase queries must not resurrect deleted docs)
    if s._stats.get("positions_dirs") or \
            fsio.exists(spark, fsio.join(index_dir, "positions")):
        (s.positions().join(tomb, "doc_id", "left_anti")
         .repartition(max(1, nparts // 2), "field", "term")
         .sortWithinPartitions("field", "term", "doc_id")
         .write.mode("overwrite").parquet(fsio.join(seg_dir, "positions")))
    tomb.unpersist()

    # manifest: clear prior adds, register the compacted segment, re-merge
    old_seg_names = set()
    if fsio.exists(spark, builder._p("segments")):
        old_seg_names = {n for n in fsio.listdir(spark, builder._p("segments"))
                         if n != f"seg={sid:05d}"}
    _append_manifest(spark, index_dir, {"action": "compact",
                                        "folded": sorted(used)})
    _append_manifest(spark, index_dir, {"action": "add", "segment": sid,
                                        "num_docs": int(num_docs),
                                        "compacted": True})
    builder._append_manifest(builder._merge([sid]))

    # cleanup: tombstones, legacy root postings/positions, superseded
    # segment dirs (the fresh stats references only the compact segment)
    fsio.delete(spark, del_dir)
    fsio.delete(spark, fsio.join(index_dir, "postings"))
    fsio.delete(spark, fsio.join(index_dir, "positions"))
    for name in old_seg_names:
        fsio.delete(spark, fsio.join(index_dir, "segments", name))
    _append_manifest(spark, index_dir, {"action": "apply_deletes",
                                        "removed": int(n_del),
                                        "num_docs": int(num_docs)})
    return int(n_del)
