"""Two-parallelism scaling evidence (north_rule: efficiency >= 0.8 from N to
4N executors; sandbox stand-in = same job at local[N] and local[4N] cores).

Runs the identical index build (synthetic code corpus, input_hint shape) at
two core counts in separate SparkSessions and reports throughput at both plus
scaling efficiency = (throughput_4N / throughput_N) / 4.

INTERLEAVED PAIRED PROTOCOL (round-4 verdict item 1).  This sandbox shares
one disk with co-tenants whose load drifts +/-16-60% over hours; rounds 3
and 4 measured 0.961 and 0.798 on byte-identical build code because their
legs ran hours apart.  The fix is a protocol the noise cannot flip: legs
alternate N-core / 4N-core within one session (A1 B1 A2 B2 ... -- adjacent
legs see the same co-tenant load), efficiency is computed per adjacent PAIR,
and the reported figure is the MEDIAN pair.  Per-leg results stream as they
finish, so a killed run keeps its completed evidence.

Usage: python scale_bench.py [n_docs] [n_small] [n_large] [pairs]
Prints one JSON line per leg/pair plus a final summary line; results are
recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _build_at(cpus: int, n_docs: int) -> dict:
    from pyspark.sql import SparkSession
    from tantivy4java_spark.build import build_index
    from tantivy4java_spark.corpus import corpus_df
    from tantivy4java_spark.schema import code_corpus_config

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"t4s-scale-{cpus}")
        # partitions sized to the cluster (cpus*4), as any real deployment
        # would: with a FIXED count the merge/commit phase (terms/blockmeta
        # writes at nparts//4 partitions) runs at the same width on both
        # legs and shows up as Amdahl-serial — a harness artifact, not an
        # engine property.  At 2 cores this equals the old max(cpus, 8).
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SCALE_DRIVER_MEM", "12g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        # a 4M-doc run once deadlocked in the idle-python-worker reuse
        # handshake (worker blocked in recv, executor blocked in epoll read,
        # both 0% CPU for an hour); tasks here are few and large, so a fresh
        # worker per task costs ~ms and removes that hang class entirely
        .config("spark.python.worker.reuse", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    workdir = tempfile.mkdtemp(prefix=f"t4s_scale_{cpus}_")
    try:
        # materialize the synthetic input BEFORE the timer: generating the
        # corpus is input production, not index-build work
        corpus = corpus_df(spark, n_docs, partitions=cpus * 2).persist()
        corpus.count()
        t0 = time.time()
        stats = build_index(spark, corpus, code_corpus_config(),
                            os.path.join(workdir, "idx"), num_segments=2)
        wall = time.time() - t0
        corpus.unpersist()
        return {"cpus": cpus, "n_docs": stats.num_docs,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(stats.num_docs / wall, 1),
                "segment_phase_sec": round(stats.segment_wall_sec, 2),
                "merge_phase_sec": round(stats.merge_wall_sec, 2)}
    finally:
        spark.stop()
        shutil.rmtree(workdir, ignore_errors=True)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_large = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    factor = n_large / n_small
    pairs = []
    for i in range(n_pairs):
        # one adjacent A/B pair: both legs bracket the same ~10-minute slice
        # of co-tenant load, so their RATIO is insensitive to the slow drift
        # that broke the hours-apart protocol
        a = _build_at(n_small, n_docs)
        print(json.dumps({"pair": i + 1, "leg": "small", **a}), flush=True)
        b = _build_at(n_large, n_docs)
        print(json.dumps({"pair": i + 1, "leg": "large", **b}), flush=True)
        eff = (b["docs_per_sec"] / a["docs_per_sec"]) / factor
        pair = {"pair": i + 1, "small_wall_sec": a["wall_sec"],
                "large_wall_sec": b["wall_sec"],
                "speedup": round(b["docs_per_sec"] / a["docs_per_sec"], 3),
                "efficiency": round(eff, 3)}
        print(json.dumps(pair), flush=True)
        pairs.append(pair)
    effs = sorted(p["efficiency"] for p in pairs)
    n = len(effs)
    median = effs[n // 2] if n % 2 else (effs[n // 2 - 1] + effs[n // 2]) / 2
    print(json.dumps({
        "metric": "index-build scaling efficiency N->4N cores "
                  "(interleaved paired legs, median pair)",
        "n_docs": n_docs,
        "n_small": n_small,
        "n_large": n_large,
        "pairs": pairs,
        "scaling_efficiency": round(median, 3),
        "min_pair_efficiency": round(effs[0], 3),
        "max_pair_efficiency": round(effs[-1], 3),
    }), flush=True)


if __name__ == "__main__":
    main()
