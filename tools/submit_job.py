"""spark-submit entry point: run the full KG pipeline.

Usage (via tools/submit.sh):
    tools/submit.sh <transcripts_parquet> <out_dir> [state_dir]

The module imports coco_search_spark from the --py-files zip, so it runs
unchanged on a real cluster.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    transcripts_path = sys.argv[1]
    out_dir = sys.argv[2]
    state_dir = sys.argv[3] if len(sys.argv) > 3 else None

    spark = SparkSession.builder.appName("coco_search_spark_submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from coco_search_spark.pipeline import run_pipeline

    transcripts = spark.read.parquet(transcripts_path)
    res = run_pipeline(spark, transcripts, out_dir=out_dir, state_dir=state_dir)
    print(json.dumps(res.metrics))
    spark.stop()


if __name__ == "__main__":
    main()
