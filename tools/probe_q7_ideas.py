"""Measure the two exact-preserving q7 reductions at sf1.0:
1. unique-bucket collapse factor (identical member sets across bands)
2. size-ratio pruning factor on candidates (JI <= min/max set size)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")


def main():
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe_q7")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F
    from dashing_spark.operators import dedup
    from dashing_spark.operators.dedup import (
        _set_digest_expr, _shingle_set_expr, minhash_signatures,
        lsh_band_rows, pick_lsh_bands,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    id_col, text_col, threshold, n_hashes = "doc_id", "text", 0.9, 128
    item_set = _shingle_set_expr(text_col, 1)
    sets = docs.select(
        F.col(id_col).alias("__id"),
        _set_digest_expr(F.sort_array(item_set)).alias("__sk"),
        F.size(item_set).alias("__nitems"),
    ).filter(F.col("__nitems") > 0).cache()
    sets.count()
    reps = sets.groupBy("__sk").agg(
        F.min("__id").alias("rep_id"), F.first("__nitems").alias("__nitems")
    ).cache()
    rep_docs = docs.join(reps, docs[id_col] == reps["rep_id"], "left_semi")
    sigs = minhash_signatures(rep_docs, id_col, text_col, n_hashes, 1)
    sigs = sigs.localCheckpoint(eager=False)
    bands = pick_lsh_bands(n_hashes, threshold)
    banded = lsh_band_rows(sigs, id_col, n_hashes=n_hashes, bands=bands).cache()
    nrows = banded.count()
    t0 = time.time()
    buckets = banded.groupBy("band", "bhash").agg(
        F.sort_array(F.collect_list(id_col)).alias("m")
    ).filter(F.size("m") >= 2).cache()
    nb = buckets.count()
    t1 = time.time()
    uniq = buckets.select("m").distinct().cache()
    nu = uniq.count()
    t2 = time.time()
    mass_all = buckets.agg(F.sum(F.size("m") * F.size("m"))).first()[0]
    mass_uniq = uniq.agg(F.sum(F.size("m") * F.size("m"))).first()[0]
    print(f"band rows={nrows} buckets(>=2)={nb} unique member sets={nu}")
    print(f"pair mass all={mass_all:,} unique={mass_uniq:,} factor={mass_all/max(1,mass_uniq):.2f}")
    print(f"bucket agg {t1-t0:.2f}s, distinct arrays {t2-t1:.2f}s")
    # size-ratio pruning on unique-bucket pairs: attach nitems by id
    szs = reps.select(F.col("rep_id").alias("id"), "__nitems")
    bkeyed = uniq.withColumn("bkey", F.monotonically_increasing_id()).select(
        "bkey", F.explode("m").alias("id")
    ).join(szs, "id")
    a = bkeyed.select(F.col("id").alias("a_id"), F.col("__nitems").alias("na"), "bkey")
    b = bkeyed.select(F.col("id").alias("b_id"), F.col("__nitems").alias("nb"), "bkey")
    t3 = time.time()
    rawp = a.join(b, "bkey").filter(F.col("a_id") < F.col("b_id"))
    n_raw = rawp.count()
    t4 = time.time()
    n_kept = rawp.filter(
        F.least("na", "nb") >= F.greatest("na", "nb") * threshold
    ).count()
    t5 = time.time()
    print(f"unique-bucket raw pairs={n_raw:,} ({t4-t3:.1f}s) size-ratio kept={n_kept:,} ({t5-t4:.1f}s)")
    spark.stop()


if __name__ == "__main__":
    main()
