"""Two-parallelism scaling evidence (north_rule: efficiency >= 0.8 from N to
4N executors; sandbox stand-in = same job at local[N] and local[4N] cores).

Runs the identical index build (synthetic code corpus, input_hint shape) at
two core counts and reports throughput at both plus scaling efficiency =
(throughput_4N / throughput_N) / 4.

INTERLEAVED PAIRED PROTOCOL (round-4 verdict item 1).  This sandbox shares
one box with co-tenants whose load drifts +/-16-60% over hours; rounds 3
and 4 measured 0.961 and 0.798 on byte-identical build code because their
legs ran hours apart.  Legs alternate N-core / 4N-core in adjacent pairs
(A1 B1 A2 B2 ... -- both legs of a pair see the same co-tenant slice),
efficiency is computed per pair, and the reported figure is the MEDIAN
pair.  Per-leg results stream as they finish, so a killed run keeps its
completed evidence.

HONEST-N-CORE LEGS (round 5).  Two measurement artifacts surfaced when the
in-process protocol produced 0.65-0.92 pair spread on identical code:

1. pyspark's JVM gateway survives spark.stop(), so all legs of an
   in-process run share ONE JVM: the first leg pays cold JIT while later
   legs run warm, and per-leg driver JVM options silently do not apply
   after leg 1.  -> each leg now runs in its OWN subprocess (fresh JVM,
   uniform cold start -- exactly how a real cluster launches executors).
2. a local[2] JVM still sees all 32 host cores, so GC/JIT/common-pool
   threads free-ride on 30 idle cores -- parallelism a real 2-core
   executor host does not have, flattering the narrow leg.  -> each leg is
   pinned with `taskset -c 0..N-1` (children -- python workers -- inherit
   the mask) and told `-XX:ActiveProcessorCount=N`, making it a truthful
   N-core machine.

Controls kept from the round-5 investigation (all report per-leg whole-box
busy/iowait/steal percentages from /proc/stat):
  SCALE_WORKDIR=/dev/shm   disk-isolation control (tmpfs shuffle+output)
  SCALE_MODE=cluster       separate executor JVMs (local-cluster[N/2,2,m])
  SCALE_WORKER_REUSE=0     fresh python worker per task (debug only;
                           reuse follows Spark's production default ON --
                           OFF charged the wide leg ~30% extra core-s of
                           worker spawn + numpy import, a pure artifact)
  SCALE_NO_PIN=1           disable taskset/ActiveProcessorCount (compare)

Usage: python scale_bench.py [n_docs] [n_small] [n_large] [pairs]
Prints one JSON line per leg/pair plus a final summary line; results are
recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def _cpu_sample() -> list:
    """Whole-box /proc/stat cpu counters (user nice sys idle iowait irq
    softirq steal) — deltas over a leg attribute wall-time loss: high
    steal% = the hypervisor gave our vCPUs to a co-tenant; high iowait% =
    disk; high busy% with neither = we were genuinely compute-bound."""
    with open("/proc/stat") as fh:
        return [int(x) for x in fh.readline().split()[1:9]]


def _cpu_delta(before: list, after: list) -> dict:
    d = [a - b for a, b in zip(after, before)]
    total = sum(d) or 1
    busy = d[0] + d[1] + d[2] + d[5] + d[6]
    return {"busy_pct": round(100.0 * busy / total, 1),
            "iowait_pct": round(100.0 * d[4] / total, 1),
            "steal_pct": round(100.0 * d[7] / total, 1)}


def _mhz_sampler(cpus: int, stop, acc: list) -> None:
    """Sample /proc/cpuinfo MHz for the leg's pinned cores every 5 s.
    Four interleaved runs showed monotone within-run degradation of the
    wide leg at ~0 iowait/steal — the signature of frequency/thermal
    throttling, which hits sustained 8-core load harder than 2-core load.
    Reporting the leg's mean clock makes that loss attributable instead of
    read as engine inefficiency (a real cluster spreads legs across
    machines and never shares a thermal envelope)."""
    while not stop.wait(5.0):
        try:
            with open("/proc/cpuinfo") as fh:
                freqs = [float(line.split(":")[1])
                         for line in fh if line.startswith("cpu MHz")]
            acc.extend(freqs[:cpus])
        except Exception:
            return


def _build_at(cpus: int, n_docs: int) -> dict:
    """ONE leg: build the index at `cpus` cores, return stats.  Runs inside
    its own pinned subprocess (see _run_leg)."""
    from pyspark.sql import SparkSession
    from tantivy4java_spark.build import build_index
    from tantivy4java_spark.corpus import corpus_df
    from tantivy4java_spark.schema import code_corpus_config

    workdir = tempfile.mkdtemp(prefix=f"t4s_scale_{cpus}_",
                               dir=os.environ.get("SCALE_WORKDIR"))
    builder = SparkSession.builder
    if os.environ.get("SCALE_MODE") == "cluster":
        mem_mb = os.environ.get("SCALE_EXEC_MEM_MB", "16384")
        master = f"local-cluster[{max(1, cpus // 2)},2,{mem_mb}]"
        # local-cluster's third arg is the Worker allocation; the executor
        # JVM heap is spark.executor.memory and must be set too
        builder = builder.config("spark.executor.memory", f"{mem_mb}m")
    else:
        master = f"local[{cpus}]"
    jvm_opts = "-XX:+UseParallelGC"
    if not os.environ.get("SCALE_NO_PIN"):
        # the JVM must size GC/JIT/common pools for the leg's core count,
        # not the host's 32 (taskset already bounds actual execution)
        jvm_opts += f" -XX:ActiveProcessorCount={cpus}"
    spark = (
        builder.master(master)
        .appName(f"t4s-scale-{cpus}")
        .config("spark.local.dir", os.path.join(workdir, "spark-local"))
        .config("spark.executorEnv.PYTHONPATH",
                os.path.dirname(os.path.abspath(__file__)))
        # partitions sized to the cluster (cpus*4), as any real deployment
        # would: a FIXED count makes the commit phase run at the same width
        # on both legs and read as Amdahl-serial — a harness artifact
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SCALE_DRIVER_MEM", "12g"))
        .config("spark.driver.extraJavaOptions", jvm_opts)
        # python worker reuse follows Spark's production default (ON).
        # Reuse OFF makes every task pay a fresh worker spawn + numpy
        # import (~1-2 CPU-s) and the 4N leg runs 4x the tasks — that
        # artifact alone depressed measured efficiency by ~0.1-0.15.
        .config("spark.python.worker.reuse",
                "false" if os.environ.get("SCALE_WORKER_REUSE") == "0"
                else "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        # materialize the synthetic input BEFORE the timer: generating the
        # corpus is input production, not index-build work
        corpus = corpus_df(spark, n_docs, partitions=cpus * 2).persist()
        corpus.count()
        import threading
        stop, mhz = threading.Event(), []
        sampler = threading.Thread(target=_mhz_sampler, args=(cpus, stop, mhz),
                                   daemon=True)
        sampler.start()
        cpu0 = _cpu_sample()
        t0 = time.time()
        stats = build_index(spark, corpus, code_corpus_config(),
                            os.path.join(workdir, "idx"), num_segments=2)
        wall = time.time() - t0
        cpu = _cpu_delta(cpu0, _cpu_sample())
        stop.set()
        sampler.join(timeout=1.0)
        corpus.unpersist()
        return {"cpus": cpus, "n_docs": stats.num_docs,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(stats.num_docs / wall, 1),
                "segment_phase_sec": round(stats.segment_wall_sec, 2),
                "merge_phase_sec": round(stats.merge_wall_sec, 2),
                "cpu_mhz_mean": round(sum(mhz) / len(mhz), 0) if mhz else None,
                **cpu}
    finally:
        spark.stop()
        shutil.rmtree(workdir, ignore_errors=True)


def _probe_worker(kind: str, q, seconds: float, core: int = None) -> None:
    import numpy as np
    if core is not None:
        try:  # pin BEFORE the timed loop starts (ADVICE r05: pinning from
            os.sched_setaffinity(0, {core})  # the parent raced the loop)
        except OSError:
            pass
    if kind == "cpu":
        import hashlib
        buf = b"x" * 4096
        t0, n = time.time(), 0
        while time.time() - t0 < seconds:
            for _ in range(200):
                hashlib.md5(buf).digest()
            n += 200
        q.put(n / (time.time() - t0))
    else:
        a = np.random.rand(8 * 1024 * 1024)  # 64 MB, touched pages
        b = a.copy()
        t0, n = time.time(), 0
        while time.time() - t0 < seconds:
            np.copyto(b, a)
            n += 1
        q.put(n * a.nbytes * 2 / (time.time() - t0) / 1e9)


def _host_probe(n_small: int, n_large: int, seconds: float = 5.0) -> dict:
    """Host-capability scaling control, recorded alongside the legs: a
    cache-resident compute kernel (md5) and a DRAM-streaming kernel
    (64 MB copies), each run per-process core-pinned at n_small and
    n_large cores.  If the ENGINE scales far below what the HOST scales
    for both kernels, the legs measured the hypervisor (vCPU preemption /
    bandwidth contention), not the engine — exactly the failure mode the
    round-5 confirmation run hit (engine pairs 0.37-0.60 on a day the
    recorded-protocol number was 0.818 on identical code)."""
    import multiprocessing as mp

    def run(kind, ncpu):
        q = mp.Queue()
        ps = []
        for i in range(ncpu):
            p = mp.Process(target=_probe_worker, args=(kind, q, seconds, i))
            p.start()
            ps.append(p)
        vals = [q.get() for _ in ps]
        for p in ps:
            p.join()
        return sum(vals)

    factor = n_large / n_small
    out = {}
    for kind in ("cpu", "mem"):
        small, large = run(kind, n_small), run(kind, n_large)
        out[f"{kind}_eff"] = round((large / small) / factor, 3) if small else None
    return out


def _run_leg(cpus: int, n_docs: int) -> dict:
    """Launch one leg as a pinned subprocess and parse its result line."""
    cmd = [sys.executable, os.path.abspath(__file__),
           "--leg", str(cpus), str(n_docs)]
    if not os.environ.get("SCALE_NO_PIN"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    env = dict(os.environ)
    env.setdefault("PYTHONPATH", os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            out = json.loads(line)
            if "wall_sec" in out:
                return out
        except ValueError:
            continue
    raise RuntimeError(
        f"leg cpus={cpus} produced no result (rc={proc.returncode}):\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        cpus, n_docs = int(sys.argv[2]), int(sys.argv[3])
        print(json.dumps(_build_at(cpus, n_docs)), flush=True)
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_large = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    factor = n_large / n_small
    cooldown = int(os.environ.get("SCALE_COOLDOWN_SEC", "45"))
    probe = {}
    if os.environ.get("SCALE_NO_PROBE") != "1":
        probe = _host_probe(n_small, n_large)
        print(json.dumps({"host_probe": probe}), flush=True)
    if os.environ.get("SCALE_WARMUP", "1") != "0":
        # one DISCARDED wide leg before pair 1: every recorded leg then
        # starts from the same OS/page-cache/thermal state.  Without it the
        # very first small leg runs on a cold box and every run's pair 1
        # reads systematically high (observed 0.83-0.92 for pair 1 vs
        # 0.65-0.79 for later pairs across four protocol variants).
        w = _run_leg(n_large, max(n_docs // 4, 50_000))
        print(json.dumps({"warmup": True, **w}), flush=True)
    pairs = []
    for i in range(n_pairs):
        # one adjacent A/B pair: both legs bracket the same ~10-minute slice
        # of co-tenant load, so their RATIO is insensitive to the slow drift
        # that broke the hours-apart protocol
        time.sleep(cooldown)  # equalize thermal/writeback state per leg
        a = _run_leg(n_small, n_docs)
        print(json.dumps({"pair": i + 1, "leg": "small", **a}), flush=True)
        time.sleep(cooldown)
        b = _run_leg(n_large, n_docs)
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
                  "(interleaved paired legs, pinned N-core JVMs, median pair)",
        "n_docs": n_docs,
        "n_small": n_small,
        "n_large": n_large,
        "pairs": pairs,
        "scaling_efficiency": round(median, 3),
        "min_pair_efficiency": round(effs[0], 3),
        "max_pair_efficiency": round(effs[-1], 3),
        "host_probe": probe,
    }), flush=True)


if __name__ == "__main__":
    main()
