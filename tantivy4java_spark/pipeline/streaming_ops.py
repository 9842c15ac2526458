"""Stateful streaming operators for training-data pipelines.

`streaming_exact_dedup`: cross-micro-batch exact deduplication with
`applyInPandasWithState` — the state per hash-prefix group is the set of
content digests already emitted; later duplicates (within or across batches)
are dropped.  This is the streaming counterpart of dedup.exact_dedup and the
pattern to follow for any custom stateful operator (watermark + grouped
state), per the task brief's Structured Streaming requirements.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "seen ARRAY<STRING>"


def streaming_exact_dedup(stream_df: DataFrame, col: str,
                          n_buckets: int = 64) -> DataFrame:
    """Streaming DataFrame -> same schema, first occurrence of each exact
    `col` value only (across all micro-batches).

    Scale shape: state is partitioned by a hash-prefix bucket so each group's
    state stays bounded and the shuffle key is uniform; at 10^12 scale raise
    n_buckets (state per group ~ corpus_digests / n_buckets).
    """
    digest = F.sha2(F.col(col).cast("string"), 256)
    bucketed = stream_df.withColumn("_sha", digest).withColumn(
        "_bucket", (F.abs(F.xxhash64("_sha")) % n_buckets).cast("int"))
    out_schema = T.StructType(bucketed.schema.fields)

    def dedup(key: Tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        new_seen = set(seen)
        for pdf in pdfs:
            fresh_mask = []
            for sha in pdf["_sha"]:
                if sha in new_seen:
                    fresh_mask.append(False)
                else:
                    new_seen.add(sha)
                    fresh_mask.append(True)
            out = pdf[pd.Series(fresh_mask, index=pdf.index)]
            if len(out):
                yield out
        state.update((sorted(new_seen),))

    deduped = bucketed.groupBy("_bucket").applyInPandasWithState(
        dedup, out_schema, _STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)
    return deduped.drop("_sha", "_bucket")
