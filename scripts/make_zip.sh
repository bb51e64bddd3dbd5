#!/usr/bin/env bash
# Package the library for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f maestro_spark.zip
zip -qr maestro_spark.zip maestro_spark -x '*__pycache__*'
echo "wrote $(pwd)/maestro_spark.zip"
