"""Dump .explain("formatted") plans of the r7-touched bench queries to
plans/r07/ (judge evidence; guide §7.2).

Usage: python tools/dump_plans_r07.py SUFFIX [--sf DIR]
  SUFFIX: "before" (run on the round-start tree) or "after".
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.1"
suffix = sys.argv[1]
if "--sf" in sys.argv:
    SF_DIR = sys.argv[sys.argv.index("--sf") + 1]
OUT = os.path.join(REPO, "plans", "r07")
os.makedirs(OUT, exist_ok=True)


def main():
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("dump_plans_r07")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from dashing_spark.operators import dedup

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    def dump(name, df):
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print("wrote", name, suffix)

    dump("q7_minhash_lsh_dedup", dedup.minhash_lsh_dedup(docs, "doc_id", threshold=0.9))
    dump(
        "q14_ngram_jaccard",
        dedup.ngram_jaccard_pairs(
            docs.filter(F.col("doc_id") < 2000), "doc_id", n=3, threshold=0.6
        ),
    )

    # q20: the real epoch plan via the env hook — 2 epochs into a temp
    # state dir; epoch 1's plan shows the batch-vs-index shape
    import shutil
    import tempfile

    from dashing_spark.streaming import dedup_stream

    state = tempfile.mkdtemp(prefix="dump_dd_")
    os.environ["SPARK_GRAFT_DD_EXPLAIN"] = OUT
    try:
        for e in range(2):
            batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(5)) == e)
            dedup_stream.apply_dedup_batch(
                batch, e, id_col="doc_id", state_dir=state, threshold=0.9
            )
        for e in range(2):
            src = os.path.join(OUT, f"dd_epoch_{e}_plan.txt")
            dst = os.path.join(OUT, f"q20_streaming_epoch{e}_{suffix}.txt")
            if os.path.exists(src):
                os.replace(src, dst)
                print("wrote", f"q20_streaming_epoch{e}", suffix)
    finally:
        os.environ.pop("SPARK_GRAFT_DD_EXPLAIN", None)
        shutil.rmtree(state, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
