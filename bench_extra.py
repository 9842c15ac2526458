"""Extra benchmarks for optimization work (guide §1.4): isolates pieces of
the frozen bench.py steps with noop sinks so computation is timed, not sinks.

NOT part of the measured bench — bench.py is frozen.  Run:
    python bench_extra.py [piece ...]
Pieces: corpus, build, simhash, stream, queries (default: all).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def _ephemeral_root() -> str:
    env = os.environ.get("SPARK_GRAFT_WORKDIR")
    if env:
        return env
    return "/dev/shm" if os.access("/dev/shm", os.W_OK) else tempfile.gettempdir()


def _session(cpus: int, workdir: str):
    from pyspark.sql import SparkSession
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("t4s-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.local.dir", os.path.join(workdir, "spark-local"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _t(label, fn, out):
    t0 = time.time()
    r = fn()
    dt = time.time() - t0
    out[label] = round(dt, 3)
    print(f"  {label}: {dt:.3f}s", flush=True)
    return r


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# Appended: docs-table build piece (bench.py step 2 isolation)
def docs_build_piece(spark, workdir):
    import time as _t
    from tantivy4java_spark.build import build_index
    from tantivy4java_spark.schema import documents_config
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs_dir = os.path.join(workdir, "docs_index")
    t0 = _t.time()
    stats = build_index(spark, docs, documents_config(), docs_dir,
                        doc_id_col="doc_id", num_segments=2)
    print(f"  build_documents: {_t.time()-t0:.3f}s "
          f"(seg {stats.segment_wall_sec:.3f} merge {stats.merge_wall_sec:.3f})",
          flush=True)


def main():
    pieces = set(sys.argv[1:]) or {"corpus", "build", "simhash", "stream"}
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))
    workdir = tempfile.mkdtemp(prefix="t4s_extra_", dir=_ephemeral_root())
    spark = _session(cpus, workdir)
    sc = spark.sparkContext
    out: dict = {}
    from pyspark.sql import functions as F
    from tantivy4java_spark.corpus import corpus_df

    # warmup (same as bench.py)
    spark.range(0, 2_000_000, 1, 32).select(F.sum("id")).collect()
    corpus_df(spark, 2000).select(F.count(F.lit(1))).collect()

    if "corpus" in pieces:
        sc.setJobDescription("corpus 20k noop")
        _t("corpus_20k_noop", lambda: noop(corpus_df(spark, n_docs)), out)
        sc.setJobDescription("corpus 1M noop")
        _t("corpus_1m_noop", lambda: noop(
            corpus_df(spark, 1_000_000, min_tokens=30, max_tokens=120)), out)

    if "build" in pieces:
        from tantivy4java_spark.build import build_index
        from tantivy4java_spark.schema import code_corpus_config
        code_dir = os.path.join(workdir, "code_index")
        corpus = corpus_df(spark, n_docs)
        sc.setJobDescription("build code corpus")
        t0 = time.time()
        stats = build_index(spark, corpus, code_corpus_config(), code_dir,
                            num_segments=4)
        out["build_code_corpus"] = round(time.time() - t0, 3)
        out["build_segment_wall"] = round(stats.segment_wall_sec, 3)
        out["build_merge_wall"] = round(stats.merge_wall_sec, 3)
        print(f"  build: total={out['build_code_corpus']} "
              f"segments={out['build_segment_wall']} "
              f"merge={out['build_merge_wall']}", flush=True)

    if "simhash" in pieces:
        from tantivy4java_spark.pipeline.dedup import simhash
        sh_df = corpus_df(spark, 1_000_000, min_tokens=30, max_tokens=120) \
            .withColumn("id", F.monotonically_increasing_id())
        sc.setJobDescription("simhash full (bench shape)")
        _t("simhash_full", lambda: simhash(sh_df, "content", "id", "h")
           .agg(F.count("h")).collect(), out)

    if "docsbuild" in pieces:
        docs_build_piece(spark, workdir)

    if "stream" in pieces:
        sh_df = corpus_df(spark, 1_000_000, min_tokens=30, max_tokens=120) \
            .withColumn("id", F.monotonically_increasing_id())
        bulk_dir = os.path.join(workdir, "bulk_docs")
        sc.setJobDescription("bulk write (untimed in bench)")
        _t("bulk_write", lambda: sh_df.write.mode("overwrite").parquet(bulk_dir), out)
        bdf = spark.read.parquet(bulk_dir)
        sc.setJobDescription("bulk toArrow stream")
        _t("bulk_stream_1", lambda: bdf.toArrow().num_rows, out)
        _t("bulk_stream_2", lambda: bdf.toArrow().num_rows, out)

    print(json.dumps(out))
    spark.stop()
    import shutil
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()

