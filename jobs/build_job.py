"""spark-submit entry point: build (or resume) the inverted index.

Usage:
  spark-submit --py-files tantivy4java_spark.zip jobs/build_job.py \\
      --input /path/or/table --format parquet|iceberg|delta \\
      --index-dir s3://bucket/index --segments 64 \\
      [--content-col content] [--doc-id-col id] [--shard-bits 16] \\
      [--fields content:text repo:string path:string lang:string]

Resume is automatic: segments already recorded in the index's
_manifest versioned action files are skipped (txlog semantics).  Run the identical
command at any cluster size; per-segment lineage makes the build restartable
at 10^12-file scale.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_fields(specs):
    from tantivy4java_spark.schema import FieldConfig
    out = []
    for spec in specs:
        name, _, ftype = spec.partition(":")
        out.append(FieldConfig(name, ftype or "text"))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "iceberg", "delta", "json"])
    p.add_argument("--index-dir", required=True)
    p.add_argument("--segments", type=int, default=16)
    p.add_argument("--fields", nargs="+",
                   default=["content:text", "repo:string", "path:string",
                            "lang:string", "commit:string"])
    p.add_argument("--id-cols", nargs="+",
                   default=["repo", "path", "commit", "lang"])
    p.add_argument("--content-col", default="content")
    p.add_argument("--doc-id-col", default=None)
    p.add_argument("--shard-bits", type=int, default=16)
    p.add_argument("--hierarchical-fanin", type=int, default=0,
                   help=">0: use multi-level merge with this fan-in")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from tantivy4java_spark.build import IndexBuilder
    from tantivy4java_spark.schema import IndexConfig

    spark = SparkSession.builder.appName("t4s-build").getOrCreate()
    from tantivy4java_spark.tables import TableRef, read_table
    if args.format == "json":
        df = spark.read.format("json").load(args.input)
    else:
        df = read_table(spark, TableRef(args.input, args.format))

    cfg = IndexConfig(fields=parse_fields(args.fields), id_cols=args.id_cols,
                      content_col=args.content_col, shard_bits=args.shard_bits)
    builder = IndexBuilder(spark, cfg, args.index_dir,
                           num_segments=args.segments)
    if args.hierarchical_fanin > 0:
        # run segments via build() then redo the merge hierarchically
        stats = builder.build(df, doc_id_col=args.doc_id_col)
        action = builder.merge_hierarchical(
            list(range(args.segments)), fanin=args.hierarchical_fanin)
        builder._append_manifest(action)
    else:
        stats = builder.build(df, doc_id_col=args.doc_id_col)
    print(json.dumps({"num_docs": stats.num_docs, "segments": stats.segments,
                      "wall_sec": round(stats.wall_sec, 2),
                      "docs_per_sec": round(stats.docs_per_sec, 1)}))


if __name__ == "__main__":
    main()
