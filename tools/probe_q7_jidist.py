"""Sampled JI distribution over q7 LSH candidates at sf1.0, plus the
candidate mass surviving alternative bandings (r=8 selectivity)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")


def main():
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe_q7_jidist")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from dashing_spark.operators.dedup import (
        _set_digest_expr, _shingle_set_expr, minhash_signatures,
        lsh_band_rows, pick_lsh_bands, capped_band_join,
        exact_ji_for_pairs,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    id_col, text_col, n_hashes = "doc_id", "text", 128
    item_set = _shingle_set_expr(text_col, 1)
    sets = docs.select(
        F.col(id_col).alias("__id"),
        _set_digest_expr(F.sort_array(item_set)).alias("__sk"),
        F.size(item_set).alias("__nitems"),
    ).filter(F.col("__nitems") > 0)
    reps = sets.groupBy("__sk").agg(F.min("__id").alias("rep_id"))
    rep_docs = docs.join(reps, docs[id_col] == reps["rep_id"], "left_semi").cache()
    rep_docs.count()
    sigs = minhash_signatures(rep_docs, id_col, text_col, n_hashes, 1)
    sigs = sigs.localCheckpoint(eager=False)
    banded = lsh_band_rows(sigs, id_col, n_hashes=n_hashes, bands=32)
    banded = banded.localCheckpoint(eager=False)
    a = banded.select(F.col(id_col).alias("a_id"), "band", "bhash")
    b = banded.select(F.col(id_col).alias("b_id"), "band", "bhash")
    # sample pairs cheaply: hash-select ~0.5% of pairs BEFORE distinct
    raw = capped_band_join(a, b, bucket_cap=1024, symmetric=True).filter(
        F.col("a_id") < F.col("b_id")
    )
    samp = raw.filter(F.pmod(F.xxhash64("a_id", "b_id"), F.lit(200)) == 0).distinct().cache()
    n = samp.count()
    print(f"sampled distinct candidates: {n:,} (~x200)")
    ji = exact_ji_for_pairs(rep_docs, samp, id_col, text_col, 1).cache()
    qs = ji.approxQuantile("ji", [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99], 0.001)
    print("ji quantiles 1/10/25/50/75/90/99%:", [round(q, 3) for q in qs])
    hist = (
        ji.select(F.floor(F.col("ji") * 10).alias("bin"))
        .groupBy("bin").count().orderBy("bin").collect()
    )
    for r in hist:
        print(f"  ji [{r['bin']/10:.1f},{r['bin']/10+0.1:.1f}): {r['count']:,}")
    # survival under r=8 banding: P(pair candidate) = 1-(1-ji^8)^b
    import math
    for (r_, b_) in ((8, 32), (8, 40), (8, 48)):
        miss09 = (1 - 0.9**r_) ** b_
        surv = ji.select(
            F.sum(1 - F.pow(1 - F.pow("ji", r_), b_)).alias("s")
        ).first()["s"]
        print(f"r={r_} b={b_}: miss@0.9={miss09:.2e} expected surviving frac={surv/max(1,n):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
