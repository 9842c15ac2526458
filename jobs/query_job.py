"""spark-submit entry point: run queries against a built index.

Usage:
  spark-submit --py-files tantivy4java_spark.zip jobs/query_job.py \\
      --index-dir s3://bucket/index \\
      --query 'content:shuffle AND lang:java' --k 10 \\
      [--default-fields content] [--source /path/to/docs --retrieve]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--default-fields", nargs="+", default=["content"])
    p.add_argument("--source", default=None,
                   help="doc-store path for field retrieval")
    p.add_argument("--source-format", default="parquet")
    p.add_argument("--no-prune", action="store_true")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from tantivy4java_spark.parser import parse_query
    from tantivy4java_spark.searcher import IndexSearcher

    spark = SparkSession.builder.appName("t4s-query").getOrCreate()
    s = IndexSearcher(spark, args.index_dir)
    q = parse_query(args.query, args.default_fields)
    hits = s.search(q, limit=args.k, prune=not args.no_prune)
    # stored fields live in the index's docs table (id cols + sha256)
    doc_cols = [c for c in s.docs().columns
                if not c.startswith(("len_", "norm_", "_ipnum_"))]
    hits = s.retrieve(hits, s.docs().select(*doc_cols))
    if args.source:
        # join the full source row back on the natural keys (doc-store join)
        src = spark.read.format(args.source_format).load(args.source)
        keys = [c for c in doc_cols
                if c in src.columns and c not in ("doc_id", "content_sha256")]
        if keys:
            hits = hits.join(src, keys, "left")
    # the retrieve join does not preserve sort order — restore rank order
    from pyspark.sql import functions as F
    for row in hits.orderBy(F.desc("score"), F.asc("doc_id")).collect():
        print(json.dumps(row.asDict(), default=str))
    if s.last_metrics:
        print(json.dumps({"metrics": s.last_metrics}))


if __name__ == "__main__":
    main()
