"""spark-submit entry point — the north rule's deployment mode.

Build per-key sketches over a parquet table with checkpointed resume,
lineage, and metrics, exactly as you would on a multi-executor cluster:

    python tools/submit_job.py --input /root/testdata/sf0.1 \
        --table documents --keys lang --sketch hll --p 14 \
        --checkpoint /tmp/dash_ckpt --output /tmp/dash_out

    # identical invocation on a real cluster:
    spark-submit --py-files "$(python - <<'PY'
    from dashing_spark.operators.ship import package_zip_path
    print(package_zip_path())
    PY
    )" tools/submit_job.py --input s3://bucket/warehouse --table pages ...

No hard-coded master: the session comes from spark-submit's conf (local
runs fall back to local[*]). Prints one JSON metrics line on success.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: spark-submit --conf recipe for the 10^12-doc / ~100 TB regime. Sizing
#: logic: 256 MiB input splits keep a scan task's Arrow batches in worker
#: memory next to its (n_keys x 2^p) partial-sketch dict; shuffle
#: partition count starts at 2-4x total cores and AQE coalesces the
#: (tiny, one-row-per-key-per-partition) sketch shuffles down while
#: skew-join splitting absorbs hot keys in the dedup/pair stages. Print
#: as flags with: python tools/submit_job.py --print-conf
RECOMMENDED_CLUSTER_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.files.maxPartitionBytes": "268435456",
    "spark.sql.shuffle.partitions": "8192",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    "spark.shuffle.compress": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def make_sketch_factory(kind: str, p: int):
    from dashing_spark.functions import HLL, KLL, BloomFilter, CountMinSketch, TDigest

    return {
        "hll": lambda: HLL.empty(p),
        "kll": lambda: KLL.empty(200),
        "tdigest": lambda: TDigest.empty(100),
        "bloom": lambda: BloomFilter.empty(p + 6, 4),
        "cms": lambda: CountMinSketch.empty(p, 4),
    }[kind]


def main() -> int:
    if "--print-conf" in sys.argv:
        print(
            " ".join(f"--conf {k}={v}" for k, v in RECOMMENDED_CLUSTER_CONF.items())
        )
        return 0
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir containing <table>.parquet")
    ap.add_argument("--table", default="documents")
    ap.add_argument("--keys", default="lang", help="comma-separated key columns")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--sketch", default="hll", choices=["hll", "kll", "tdigest", "bloom", "cms"])
    ap.add_argument("--p", type=int, default=14)
    ap.add_argument("--shingle-w", type=int, default=1)
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--output", default=None, help="optional estimates parquet dir")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from dashing_spark.operators import agg
    from dashing_spark.params import SketchParams
    from dashing_spark.plans.pipeline import build_or_resume_sketch_table

    builder = SparkSession.builder.appName("dashing_spark_submit")
    if "SPARK_GRAFT_CPUS" in os.environ:
        builder = builder.master(f"local[{os.environ['SPARK_GRAFT_CPUS']}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    df = spark.read.parquet(os.path.join(args.input, f"{args.table}.parquet"))
    keys = args.keys.split(",")
    sketches, metrics = build_or_resume_sketch_table(
        df,
        keys,
        make_sketch_factory(args.sketch, args.p),
        args.checkpoint,
        params=SketchParams(p=args.p, shingle_w=args.shingle_w),
        text_col=args.text_col,
        salt=args.salt,
    )
    if args.output:
        est = sketches.select(
            *keys, agg.estimate_expr()(agg.SKETCH_COL).alias("estimate")
        )
        est.write.mode("overwrite").parquet(args.output)
    print(metrics.to_json())
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
