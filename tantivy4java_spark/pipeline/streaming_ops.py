"""Stateful streaming operators for training-data pipelines.

`streaming_exact_dedup`: cross-micro-batch exact deduplication with
`applyInPandasWithState` — the state is keyed BY CONTENT DIGEST, one tiny
boolean per distinct digest, so per-micro-batch state I/O is O(rows in the
batch) and never rewrites previously-seen history (the round-1 design kept a
sorted digest array per hash bucket and rewrote it every batch — O(corpus /
n_buckets) per batch, unbounded growth).  The Spark state store (RocksDB /
HDFS-backed at scale) is built for many small groups; the shuffle key is the
digest itself, uniform by construction.

This is the streaming counterpart of dedup.exact_dedup and the pattern to
follow for custom stateful operators (grouped state + append mode).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "seen BOOLEAN"


def streaming_exact_dedup(stream_df: DataFrame, col: str,
                          n_buckets: int = 0) -> DataFrame:
    """Streaming DataFrame -> same schema, first occurrence of each exact
    `col` value only (across all micro-batches).

    State shape: one boolean per distinct digest (group key = digest).  A
    digest's state is written once, on first sight; later duplicates read
    one tiny state entry and emit nothing.  ``n_buckets`` is retained for
    API compatibility and ignored (bucketing is no longer needed — the
    state store shards by group key).
    """
    digest = F.sha2(F.col(col).cast("string"), 256)
    keyed = stream_df.withColumn("_sha", digest)
    out_schema = T.StructType(keyed.schema.fields)

    def dedup(key: Tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            for _ in pdfs:  # drain; digest already emitted in a prior batch
                pass
            return
        emitted = False
        for pdf in pdfs:
            if not emitted and len(pdf):
                yield pdf.iloc[:1]
                emitted = True
        if emitted:
            state.update((True,))

    deduped = keyed.groupBy("_sha").applyInPandasWithState(
        dedup, out_schema, _STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)
    return deduped.drop("_sha")


def _simhash_batch(texts: pd.Series) -> pd.Series:
    """Per-row SimHash identical to dedup.simhash's Catalyst form (same
    md5-derived bit votes, same sign assembly) so streaming output is
    directly comparable to the batch operator.  Token hashes are memoized
    per Arrow batch — cost is O(distinct tokens), not O(token instances)."""
    import hashlib
    import re

    import numpy as np

    cache: dict = {}

    def token_votes(tok: str) -> "np.ndarray":
        v = cache.get(tok)
        if v is None:
            hx = hashlib.md5(tok.encode("utf-8")).hexdigest()[:16]
            chunks = [int(hx[4 * k:4 * k + 4], 16) for k in range(4)]
            bits = np.array([(chunks[j // 16] >> (j % 16)) & 1
                             for j in range(64)], dtype=np.int64)
            v = bits * 2 - 1
            cache[tok] = v
        return v

    out = np.zeros(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        toks = [t for t in re.split(r"\s+", text or "") if t]
        if not toks:
            continue
        votes = np.zeros(64, dtype=np.int64)
        for t in toks:
            votes += token_votes(t)
        h = 0
        for j in range(63):
            if votes[j] > 0:
                h |= 1 << j
        if votes[63] > 0:
            h -= 1 << 63
        out[i] = h
    return pd.Series(out)


def streaming_simhash_dedup(stream_df: DataFrame, col: str, id_col: str,
                            max_hamming: int = 3,
                            max_bucket_state: int = 10_000) -> DataFrame:
    """Streaming near-duplicate candidate pairs across micro-batches:
    (id_a, id_b, hamming, blk) with id_a < id_b and hamming <= max_hamming.

    The streaming counterpart of dedup.simhash_dup_pairs, same pigeonhole
    decomposition: a pair within Hamming distance d must agree exactly on
    at least one of d+1 bit blocks, so the shuffle/state key is
    (block index, block value) and a new document is compared ONLY against
    its own buckets' residents — never a cross join, state sharded by the
    same uniform key the batch join uses.

    A pair that agrees on several blocks is emitted once per agreeing
    block (the blk column says which); distinct-ify on (id_a, id_b)
    downstream when consuming.  Per-bucket state is capped at
    ``max_bucket_state`` resident signatures (the streaming analog of the
    batch operator's ``max_block_df`` degenerate-bucket cap): residents
    past the cap stop being added, so a pathological bucket (e.g. empty
    documents, all simhash 0) degrades to bounded recall instead of
    unbounded state growth — fold exact duplicates with
    streaming_exact_dedup first, which is O(rows)."""
    import numpy as np

    nblocks = max_hamming + 1
    width = 64 // nblocks
    sig = F.pandas_udf(_simhash_batch, T.LongType())
    base = stream_df.select(F.col(id_col).alias("_id").cast("long"),
                            F.col(col).cast("string").alias("_txt"))
    base = base.withColumn("_h", sig(F.col("_txt")))
    blocks = base.select(
        "_id", "_h",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("blk"),
                     F.shiftrightunsigned(F.col("_h"), i * width)
                     .bitwiseAND(F.lit((1 << width) - 1)).alias("bval"))
            for i in range(nblocks)])).alias("bb"))
    blocks = blocks.select("_id", "_h", F.col("bb.blk").alias("blk"),
                           F.col("bb.bval").alias("bval"))

    out_schema = T.StructType([
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("hamming", T.LongType()),
        T.StructField("blk", T.IntegerType()),
    ])
    state_schema = "ids ARRAY<LONG>, hs ARRAY<LONG>"

    def match(key: Tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        blk = int(key[0])
        if state.exists:
            ids, hs = state.get
            ids, hs = list(ids), list(hs)
        else:
            ids, hs = [], []
        out_a, out_b, out_d = [], [], []
        for pdf in pdfs:
            for rid, rh in zip(pdf["_id"].astype("int64"),
                               pdf["_h"].astype("int64")):
                rid, rh = int(rid), int(rh)
                for oid, oh in zip(ids, hs):
                    d = ((rh ^ oh) & 0xFFFFFFFFFFFFFFFF).bit_count()
                    if d <= max_hamming and rid != oid:
                        out_a.append(min(rid, oid))
                        out_b.append(max(rid, oid))
                        out_d.append(d)
                if len(ids) < max_bucket_state:
                    ids.append(rid)
                    hs.append(rh)
        state.update((ids, hs))
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b,
                                "hamming": out_d,
                                "blk": np.full(len(out_a), blk,
                                               dtype=np.int32)})

    return blocks.groupBy("blk", "bval").applyInPandasWithState(
        match, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout)


def windowed_event_agg(stream_df: DataFrame, ts_col: str,
                       window: str = "1 hour", slide: str = None,
                       watermark: str = "2 hours", keys=(),
                       value_col: str = None) -> DataFrame:
    """Event-time windowed aggregation with a watermark for late data —
    the canonical Structured Streaming shape (built-in `window()` +
    `withWatermark`, whole pipeline stays in Catalyst: tumbling when
    `slide` is None, sliding otherwise).

    Returns (window_start, window_end, *keys, doc_count[, value_sum,
    value_avg]).  In append output mode a window emits once, when the
    watermark passes its end; events arriving later than `watermark`
    behind the max seen event time are dropped by the engine — O(open
    windows) state, bounded by the watermark horizon, which is what a
    100-TB/day stream needs (state never grows with history).
    """
    wm = stream_df.withWatermark(ts_col, watermark)
    wcol = F.window(F.col(ts_col), window, slide or window)
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    if value_col is not None:
        aggs += [F.sum(value_col).alias("value_sum"),
                 F.avg(value_col).alias("value_avg")]
    return (wm.groupBy(wcol.alias("win"), *[F.col(k) for k in keys])
            .agg(*aggs)
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    *keys, "doc_count",
                    *(["value_sum", "value_avg"]
                      if value_col is not None else [])))
