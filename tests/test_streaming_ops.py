"""Stateful streaming dedup (applyInPandasWithState) across micro-batches."""

import os

import pytest

from tantivy4java_spark.pipeline.streaming_ops import streaming_exact_dedup


def test_streaming_exact_dedup(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    # file 0: a,b,a(dup-in-batch) ; file 1: b(dup-across-batch),c
    spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")],
        ["id", "text"]).coalesce(1).write.parquet(os.path.join(src, "f0"))
    spark.createDataFrame(
        [(4, "beta text"), (5, "gamma text")],
        ["id", "text"]).coalesce(1).write.parquet(os.path.join(src, "f1"))

    schema = spark.read.parquet(os.path.join(src, "f0")).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "*")))
    deduped = streaming_exact_dedup(stream, "text", n_buckets=4)
    q = (deduped.writeStream.format("memory").queryName("dedup_sink")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM dedup_sink").collect()
    texts = sorted(r["text"] for r in rows)
    assert texts == ["alpha text", "beta text", "gamma text"]
    # the first occurrence is kept (ids 1,2,5 — batch order by file)
    assert sorted(r["id"] for r in rows) == [1, 2, 5] or len(rows) == 3


def test_streaming_dedup_state_is_per_digest(spark, tmp_path):
    """State growth contract: per-batch state writes are O(batch), keyed by
    digest — verified via the state-operator progress metrics across
    batches (updated rows == NEW digests in that batch, not corpus size)."""
    src = str(tmp_path / "in2")
    os.makedirs(src)
    # batch 0: 20 distinct; batch 1: same 20 again + 5 new
    rows0 = [(i, f"text {i}") for i in range(20)]
    rows1 = [(100 + i, f"text {i}") for i in range(20)] + \
            [(200 + i, f"new {i}") for i in range(5)]
    spark.createDataFrame(rows0, ["id", "text"]).coalesce(1) \
        .write.parquet(os.path.join(src, "f0"))
    spark.createDataFrame(rows1, ["id", "text"]).coalesce(1) \
        .write.parquet(os.path.join(src, "f1"))
    schema = spark.read.parquet(os.path.join(src, "f0")).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "*")))
    q = (streaming_exact_dedup(stream, "text")
         .writeStream.format("memory").queryName("dedup_state_sink")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    assert spark.sql("SELECT count(*) c FROM dedup_state_sink").collect()[0]["c"] == 25
    progress = [p for p in q.recentProgress if p["stateOperators"]]
    updated = [p["stateOperators"][0]["numRowsUpdated"] for p in progress]
    total_state = progress[-1]["stateOperators"][0]["numRowsTotal"]
    # batch 1 wrote only the 5 NEW digests, not the 25-digest corpus
    assert updated and updated[-1] <= 5
    assert total_state == 25


def test_windowed_event_agg_watermark(spark, tmp_path):
    """Event-time tumbling windows + watermark: (1) windows emit in append
    mode once the watermark passes them; (2) an event arriving LATER than
    the watermark horizon is dropped, not resurrected into a closed
    window."""
    import datetime as dtm

    from tantivy4java_spark.pipeline.streaming_ops import windowed_event_agg

    src = str(tmp_path / "win_in")
    os.makedirs(src)
    base = dtm.datetime(2024, 1, 1, 0, 0)

    def rows(*mins):
        return [(i, base + dtm.timedelta(minutes=m), float(m))
                for i, m in enumerate(mins)]

    cols = ["id", "ts", "v"]
    # run 1: events in hours 0 and 1, plus one far ahead (hour 6) that
    # drives the watermark past hours 0-4
    spark.createDataFrame(rows(5, 10, 65, 70, 75, 360), cols) \
        .coalesce(1).write.parquet(os.path.join(src, "f0"))
    schema = spark.read.parquet(os.path.join(src, "f0")).schema

    outdir = str(tmp_path / "win_out")

    def run_once():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(os.path.join(src, "*")))
        agg = windowed_event_agg(stream, "ts", window="1 hour",
                                 watermark="2 hours", value_col="v")
        q = (agg.writeStream.format("parquet").option("path", outdir)
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "wck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    run_once()
    got = {(r["window_start"].hour, r["doc_count"])
           for r in spark.read.parquet(outdir).collect()}
    # hours 0 (2 events) and 1 (3 events) are past the watermark -> emitted
    assert got == {(0, 2), (1, 3)}

    # run 2 (same checkpoint): one event in hour 0 — now ~6h late, far
    # beyond the 2h watermark -> DROPPED; plus on-time events in hour 7
    # that close hour 6 (the earlier 360-min event, count 1)
    spark.createDataFrame(rows(15) + [(90, base + dtm.timedelta(minutes=600),
                                       1.0)], cols) \
        .coalesce(1).write.parquet(os.path.join(src, "f1"))
    run_once()
    got2 = {(r["window_start"].hour, r["doc_count"])
            for r in spark.read.parquet(outdir).collect()}
    assert (0, 3) not in got2          # late event did NOT reopen hour 0
    assert (6, 1) in got2              # hour-6 window closed and emitted


def test_streaming_simhash_matches_batch(spark, tmp_path):
    """Cross-micro-batch near-dup pairs == the batch operator's pairs on
    the union (same md5 bit votes, same pigeonhole blocks)."""
    from tantivy4java_spark.pipeline.dedup import simhash_dup_pairs
    from tantivy4java_spark.pipeline.streaming_ops import \
        streaming_simhash_dedup

    base = ("the quick brown fox jumps over the lazy dog while "
            "spark builds posting lists in parallel across executors "
            "and merges them into a global inverted index")
    rows0 = [(1, base), (2, base)]                       # exact dup in-batch
    rows1 = [(3, base),                                  # dup ACROSS batches
             (5, base.replace("lazy", "sleepy")),        # near or not — the
             (4, "completely different content about embedding vectors "   #
                 "ann search and lsh bucketed candidate generation only")]  #
    # (whatever the batch operator says about id 5, the stream must agree)
    src = str(tmp_path / "in3")
    os.makedirs(src)
    spark.createDataFrame(rows0, ["id", "text"]).coalesce(1) \
        .write.parquet(os.path.join(src, "f0"))
    spark.createDataFrame(rows1, ["id", "text"]).coalesce(1) \
        .write.parquet(os.path.join(src, "f1"))
    schema = spark.read.parquet(os.path.join(src, "f0")).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "*")))
    q = (streaming_simhash_dedup(stream, "text", "id", max_hamming=3)
         .writeStream.format("memory").queryName("sh_sink")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck3"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in
           spark.sql("SELECT DISTINCT id_a, id_b, hamming "
                     "FROM sh_sink").collect()}
    union = spark.createDataFrame(rows0 + rows1, ["id", "text"])
    want = {(r["id_a"], r["id_b"], r["hamming"]) for r in
            simhash_dup_pairs(union, "text", "id", max_hamming=3).collect()}
    assert got == want
    assert (1, 2, 0) in got          # exact pair, in-batch
    assert (1, 3, 0) in got and (2, 3, 0) in got   # pairs ACROSS batches
    assert not any(4 in (a, b) for a, b, _ in got)  # unrelated doc clean


def test_streaming_simhash_bucket_cap(spark, tmp_path):
    """Past max_bucket_state residents a bucket stops growing (bounded
    state) — identical docs beyond the cap produce no new pairs."""
    from tantivy4java_spark.pipeline.streaming_ops import \
        streaming_simhash_dedup
    rows = [(i, "same text everywhere") for i in range(6)]
    src = str(tmp_path / "in4")
    os.makedirs(src)
    spark.createDataFrame(rows, ["id", "text"]).coalesce(1) \
        .write.parquet(os.path.join(src, "f0"))
    schema = spark.read.parquet(os.path.join(src, "f0")).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "*")))
    q = (streaming_simhash_dedup(stream, "text", "id", max_hamming=3,
                                 max_bucket_state=2)
         .writeStream.format("memory").queryName("sh_cap_sink")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck4"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    pairs = {(r["id_a"], r["id_b"]) for r in
             spark.sql("SELECT DISTINCT id_a, id_b FROM sh_cap_sink")
             .collect()}
    # residents capped at 2 per bucket: ids 0 and 1 enter state; every
    # later doc pairs against those two only -> pairs are exactly
    # {(0,1)} + {(0,k),(1,k) for k>=2}; never (2,3) etc.
    assert (0, 1) in pairs
    assert (2, 3) not in pairs and (3, 4) not in pairs
    assert all(a in (0, 1) for a, b in pairs)
