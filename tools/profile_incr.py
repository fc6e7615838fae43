"""Profile the incremental (cold → warm) pipeline path in isolation.

Replicates bench.py's incremental receipt (replicate the fixture to a
64-file corpus, cold run, patch 1 then 8 files, warm runs) in a FRESH
Spark session with nothing else in the JVM, and prints each run's wall
and per-stage timings. Use this to attribute warm-run cost to stages
without the headline bench's session residue or its full query suite.

  SPARK_GRAFT_BENCH_CONVS=500 SPARK_GRAFT_CPUS=8 python tools/profile_incr.py
"""
import glob as _glob
import json
import os
import shutil
import sys
import time
from urllib.parse import unquote, urlparse

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from coco_search_spark.pipeline import run_pipeline  # noqa: E402
from coco_search_spark.session import get_spark  # noqa: E402

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
sf = bench._sf_of(sf_dir)
fixture_path = bench._fixture_parquet(sf)

spark = get_spark(
    cpus,
    app_name="profile_incr",
    shuffle_partitions=max(cpus, 8),
    extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
)

catalog = spark.read.parquet(os.path.join(os.path.dirname(fixture_path), "catalog.parquet"))
transcripts = spark.read.parquet(fixture_path)

work = "/tmp/profile_incr"
shutil.rmtree(work, ignore_errors=True)
corpus_dir = os.path.join(work, "corpus")
incr_out = os.path.join(work, "out")
state_dir = os.path.join(work, "state")

n_files = max(cpus * 8, 64)
transcripts.repartition(n_files, "conv_id").write.mode("overwrite").parquet(corpus_dir)
disk = spark.read.parquet(corpus_dir)

t0 = time.perf_counter()
res_c = run_pipeline(spark, disk, catalog=catalog, out_dir=incr_out, state_dir=state_dir)
cold = round(time.perf_counter() - t0, 3)
print("COLD", cold, json.dumps(res_c.metrics.get("stage_timings", {})))

all_files = sorted(f for f in disk.inputFiles() if f.endswith(".parquet"))


def _patch(targets):
    for target in targets:
        sub = spark.read.schema(disk.schema).parquet(target)
        tmp_patch = corpus_dir + "_patch"
        sub.withColumn(
            "text", F.concat(F.col("text"), F.lit(" deltapatch marker"))
        ).coalesce(1).write.mode("overwrite").parquet(tmp_patch)
        part = _glob.glob(os.path.join(tmp_patch, "*.parquet"))[0]
        tpath = unquote(urlparse(target).path)
        os.replace(part, tpath)
        crc = os.path.join(os.path.dirname(tpath), f".{os.path.basename(tpath)}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        shutil.rmtree(tmp_patch, ignore_errors=True)


for label, targets in (("WARM1", all_files[:1]), ("WARM8", all_files[1:9])):
    _patch(targets)
    t0 = time.perf_counter()
    res = run_pipeline(
        spark,
        spark.read.parquet(corpus_dir),
        catalog=catalog,
        out_dir=incr_out,
        state_dir=state_dir,
    )
    wall = round(time.perf_counter() - t0, 3)
    print(label, wall, json.dumps(res.metrics.get("stage_timings", {})),
          "nodes_mode=", res.metrics.get("nodes_mode"))

spark.stop()
shutil.rmtree(work, ignore_errors=True)
