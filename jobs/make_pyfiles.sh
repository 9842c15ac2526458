#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f tantivy4java_spark.zip
zip -qr tantivy4java_spark.zip tantivy4java_spark
echo "wrote $(pwd)/tantivy4java_spark.zip"
