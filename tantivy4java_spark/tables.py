"""Cloud-table readers: Iceberg / Delta / parquet sources for index builds
and snapshot-diff incremental indexing.

Reference analog: `iceberg/IcebergTableReader.java:111-543` (snapshot
listing + `getChangesSince` at :543) and `delta/DeltaTableReader.java` /
`docs/DISTRIBUTED_TABLE_SCANNER_GUIDE.md:26-100` — the reference ships full
table readers whose job is (a) scan the current snapshot and (b) enumerate
rows added/changed since a known snapshot so the index can catch up
incrementally.

Spark-first translation: Spark already HAS the table readers
(`iceberg-spark-runtime`, `delta-spark`); what this module adds is the thin
snapshot bookkeeping the incremental-indexing loop needs:

  current_snapshot(spark, ref)       -> opaque snapshot/version id
  changes_between(spark, ref, from_) -> DataFrame of rows appended/changed
                                        since `from_` (engine-native diff)
  index_table_changes(...)           -> read diff -> tombstone prior
                                        versions -> append delta segment
                                        (reuses streaming.index_changes
                                        semantics, engine diff instead of
                                        content-hash diff when available)

All three degrade gracefully: with no Iceberg/Delta runtime on the
classpath the constructors raise ImportError-style errors, and the
parquet TableRef path uses the content-hash diff from
`streaming.changes_since` (works everywhere, costs one scan).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession

from tantivy4java_spark import fsio
from tantivy4java_spark.schema import IndexConfig


@dataclass(frozen=True)
class TableRef:
    """A source table: `fmt` in {'parquet', 'delta', 'iceberg'};
    `location` is a path (parquet/delta) or a catalog table name
    (iceberg, e.g. 'local.db.events')."""
    location: str
    fmt: str = "parquet"


def _require_delta(spark: SparkSession) -> None:
    try:
        spark._jvm.io.delta.tables.DeltaTable  # noqa: B018 probe only
    except Exception as e:  # pragma: no cover - runtime-dependent
        raise RuntimeError(
            "Delta runtime not on the Spark classpath; start the session "
            "with spark.jars.packages=io.delta:delta-spark_2.13:<ver> and "
            "the DeltaSparkSessionExtension") from e


def read_table(spark: SparkSession, ref: TableRef) -> DataFrame:
    """Current-snapshot scan (IcebergTableReader.java:111 analog: the plain
    read IS the snapshot scan — Spark's DSv2 readers handle manifest
    pruning/column projection)."""
    if ref.fmt == "iceberg":
        return spark.read.table(ref.location)
    return spark.read.format(ref.fmt).load(ref.location)


def current_snapshot(spark: SparkSession, ref: TableRef) -> Optional[int]:
    """Opaque snapshot id: Iceberg snapshot-id, Delta version, None for
    parquet (no native snapshot concept — content-hash diff instead)."""
    if ref.fmt == "iceberg":
        row = (spark.sql(
            f"SELECT snapshot_id FROM {ref.location}.snapshots "
            f"ORDER BY committed_at DESC LIMIT 1").collect())
        return int(row[0][0]) if row else None
    if ref.fmt == "delta":
        _require_delta(spark)
        from delta.tables import DeltaTable
        hist = (DeltaTable.forPath(spark, ref.location)
                .history(1).select("version").collect())
        return int(hist[0][0]) if hist else None
    return None


class NonAppendSnapshotError(ValueError):
    """The Iceberg incremental append scan cannot represent the range: a
    snapshot in (from, now] is an overwrite/delete/replace (MERGE, rewrite,
    compaction).  Callers fall back to a full-scan content-hash diff."""


def _nonappend_ops_in_range(snapshots, from_snapshot: int) -> List[str]:
    """Non-append operations committed AFTER `from_snapshot`, given the
    collected (snapshot_id, committed_at, operation[, parent_id]) rows of
    the `.snapshots` metadata table.  An unknown `from_snapshot` (expired
    by snapshot retention) counts as non-append: the range is not
    replayable.  Pure function so the restriction check is unit-testable
    without an Iceberg runtime.

    Same-committed_at ticks (coarse timestamp granularity on fast
    consecutive commits) are resolved by parent LINEAGE when the rows
    carry parent_id: an ancestor of from_snapshot is before it (already
    replayed), a descendant is after; without lineage a tie counts as
    after — missing an overwrite silently under-indexes, the conservative
    error only costs a full-scan re-sync."""
    by_id = {int(s[0]): s for s in snapshots}
    fid = int(from_snapshot)
    if fid not in by_id:
        return ["<from-snapshot expired>"]
    t0 = by_id[fid][1]

    def _ancestor_of(maybe_anc: int, start: int) -> bool:
        seen, cur = set(), by_id.get(start)
        while cur is not None and len(cur) > 3 and cur[3] is not None:
            pid = int(cur[3])
            if pid == maybe_anc:
                return True
            if pid in seen:
                break
            seen.add(pid)
            cur = by_id.get(pid)
            if cur is not None and cur[1] < t0:
                break  # walked past the tick window
        return False

    def _after(s) -> bool:
        sid = int(s[0])
        if s[1] > t0:
            return True
        if s[1] < t0 or sid == fid:
            return False
        if len(s) > 3:  # lineage available: resolve the tie exactly
            if _ancestor_of(sid, fid):
                return False  # s is behind from_snapshot: already replayed
            return True  # descendant or unrelated branch: count as after
        return True  # no lineage: conservative

    return [str(s[2]) for s in snapshots
            if _after(s) and str(s[2] or "").lower() != "append"]


def changes_between(spark: SparkSession, ref: TableRef,
                    from_snapshot: int) -> DataFrame:
    """Rows appended/changed after `from_snapshot` (exclusive), engine-native
    (getChangesSince analog, IcebergTableReader.java:543):
    - iceberg: incremental append scan (start-snapshot-id exclusive).
      RESTRICTION: the scan replays append snapshots only — if the range
      contains an overwrite/delete/replace snapshot (MERGE, rewrite_files,
      expire), raises NonAppendSnapshotError instead of erroring mid-read
      or silently missing updated rows; index_table_changes catches it and
      falls back to the content-hash diff.
    - delta: Change Data Feed when enabled, else version-diff via
      readVersionAsOf anti-join is the caller's fallback (we surface CDF
      because it is the O(delta) path a 100-TB table needs)
    """
    if ref.fmt == "iceberg":
        snaps = spark.sql(
            f"SELECT snapshot_id, committed_at, operation, parent_id "
            f"FROM {ref.location}.snapshots").collect()
        bad = _nonappend_ops_in_range(snaps, int(from_snapshot))
        if bad:
            raise NonAppendSnapshotError(
                f"snapshot range after {from_snapshot} on {ref.location} "
                f"contains non-append operations {bad}; the incremental "
                f"append scan cannot replay it — use a full-scan "
                f"content-hash diff")
        return (spark.read.format("iceberg")
                .option("start-snapshot-id", str(from_snapshot))
                .table(ref.location))
    if ref.fmt == "delta":
        _require_delta(spark)
        df = (spark.read.format("delta")
              .option("readChangeFeed", "true")
              .option("startingVersion", int(from_snapshot) + 1)
              .load(ref.location))
        # CDF emits delete/update_preimage rows too; the index wants the
        # post-image of inserts and updates
        return (df.filter(df["_change_type"].isin("insert",
                                                  "update_postimage"))
                .drop("_change_type", "_commit_version", "_commit_timestamp"))
    raise ValueError(f"no native snapshot diff for fmt={ref.fmt!r}; "
                     f"use streaming.index_changes (content-hash diff)")


_STATE_FILE = "_table_sync.json"


def _read_state(spark: SparkSession, index_dir: str) -> dict:
    p = fsio.join(index_dir, _STATE_FILE)
    if not fsio.exists(spark, p):
        return {}
    return json.loads(fsio.read_text(spark, p))


def _write_state(spark: SparkSession, index_dir: str, state: dict) -> None:
    fsio.write_text(spark, fsio.join(index_dir, _STATE_FILE),
                    json.dumps(state, sort_keys=True))


def index_table_changes(spark: SparkSession, config: IndexConfig,
                        index_dir: str, ref: TableRef,
                        key_cols: List[str], commit: bool = True,
                        on_update: str = "tombstone") -> dict:
    """One catch-up step: diff the table against the last indexed snapshot,
    tombstone superseded versions of changed keys, append the delta segment,
    record the new snapshot id.  First call indexes the full table.

    For iceberg/delta the diff is the engine's own O(delta) incremental
    read; for parquet it falls back to streaming.changes_since (one full
    scan + content-hash anti-join)."""
    from tantivy4java_spark import streaming

    if ref.fmt == "parquet":
        snap_dir = fsio.join(index_dir, "_snapshot")
        return streaming.index_changes(
            spark, config, index_dir, read_table(spark, ref), snap_dir,
            key_cols, commit=commit, on_update=on_update)

    state = _read_state(spark, index_dir)
    last = state.get("snapshot_id")
    now = current_snapshot(spark, ref)
    if now is None:
        raise ValueError(f"table {ref.location} has no snapshot yet")
    if last is not None and int(last) == int(now):
        return {"action": "noop", "num_docs": 0, "snapshot_id": int(now)}

    if last is None:
        delta = read_table(spark, ref)
    else:
        try:
            delta = changes_between(spark, ref, int(last))
        except NonAppendSnapshotError:
            # MERGE/rewrite in the range: the append scan can't replay it.
            # Fall back to the content-hash diff over the current snapshot.
            # The hash snapshot under _snapshot is only maintained by
            # fallback passes, so rows indexed through the incremental path
            # since the last fallback LOOK changed here — they are
            # re-indexed with their priors tombstoned (correct, one wasted
            # pass), which is why 'append' must refuse: it would duplicate
            # every such row instead of superseding it.
            if on_update == "append":
                raise ValueError(
                    f"non-append snapshots on {ref.location} force a "
                    f"content-hash re-sync, which re-indexes rows the "
                    f"incremental path already indexed; on_update='append' "
                    f"would duplicate them. Use 'tombstone' or "
                    f"'upsert_rewrite'") from None
            act = streaming.index_changes(
                spark, config, index_dir, read_table(spark, ref),
                fsio.join(index_dir, "_snapshot"), key_cols,
                commit=commit, on_update=on_update)
            _write_state(spark, index_dir, {"snapshot_id": int(now),
                                            "fmt": ref.fmt,
                                            "location": ref.location})
            return dict(act, snapshot_id=int(now), fallback="content-hash")
    delta = delta.persist()
    try:
        n = delta.count()
        if n == 0:
            _write_state(spark, index_dir, {"snapshot_id": int(now),
                                            "fmt": ref.fmt,
                                            "location": ref.location})
            return {"action": "noop", "num_docs": 0, "snapshot_id": int(now)}
        if on_update in ("tombstone", "upsert_rewrite"):
            _, n_reused = streaming._tombstone_prior_versions(
                spark, index_dir, delta, list(key_cols),
                refuse_on_reuse=(on_update == "tombstone"))
            if n_reused:
                from tantivy4java_spark.maintenance import apply_deletes
                apply_deletes(spark, index_dir)
        elif on_update != "append":
            raise ValueError(f"on_update must be 'tombstone', "
                             f"'upsert_rewrite' or 'append', "
                             f"got {on_update!r}")
        action = streaming.add_documents(spark, config, index_dir, delta,
                                         commit=commit)
        _write_state(spark, index_dir, {"snapshot_id": int(now),
                                        "fmt": ref.fmt,
                                        "location": ref.location})
        return dict(action, snapshot_id=int(now))
    finally:
        delta.unpersist()
