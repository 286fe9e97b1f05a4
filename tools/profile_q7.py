"""Stage-by-stage profile of q7 (minhash_lsh_dedup) at $SPARK_GRAFT_SF_DIR.

Times each internal stage of the pipeline with noop sinks so the
superlinear component at sf1.0 can be located (guide §1.4).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profile_q7")
        .config("spark.sql.shuffle.partitions", str(max(8, CPUS)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from dashing_spark.operators import dedup
    from dashing_spark.operators.dedup import (
        _set_digest_expr,
        _shingle_set_expr,
        minhash_signatures,
        lsh_band_rows,
        lsh_candidate_pairs,
        exact_ji_for_pairs,
        pick_lsh_bands,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.count()
    id_col, text_col, threshold, n_hashes = "doc_id", "text", 0.9, 128

    def t(name, fn):
        t0 = time.time()
        r = fn()
        print(f"{name}: {time.time()-t0:.2f}s  {r if r is not None else ''}", flush=True)
        return r

    item_set = _shingle_set_expr(text_col, 1)
    sets = docs.select(
        F.col(id_col).alias("__id"),
        _set_digest_expr(F.sort_array(item_set)).alias("__sk"),
        F.size(item_set).alias("__nitems"),
    ).filter(F.col("__nitems") > 0)
    sets = sets.cache()
    t("sets build+count", lambda: sets.count())

    s_a = sets.select(F.col("__id").alias("a_id"), "__sk")
    s_b = sets.select(F.col("__id").alias("b_id"), "__sk")
    intra = (
        s_a.join(s_b, "__sk").filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", F.lit(1.0).alias("ji"))
    )
    t("intra pairs count", lambda: intra.count())

    reps = sets.groupBy("__sk").agg(F.min("__id").alias("rep_id")).cache()
    t("n reps", lambda: reps.count())
    rep_docs = docs.join(reps, docs[id_col] == reps["rep_id"], "left_semi").cache()
    t("rep_docs count", lambda: rep_docs.count())

    sigs = minhash_signatures(rep_docs, id_col, text_col, n_hashes, 1)
    sigs = sigs.localCheckpoint(eager=False)
    t("signatures (localCheckpoint+count)", lambda: sigs.count())

    bands = pick_lsh_bands(n_hashes, threshold)
    print(f"bands={bands}")
    banded = lsh_band_rows(sigs, id_col, n_hashes=n_hashes, bands=bands)
    banded = banded.localCheckpoint(eager=False)
    t("band rows", lambda: banded.count())

    a = banded.select(F.col(id_col).alias("a_id"), "band", "bhash")
    b = banded.select(F.col(id_col).alias("b_id"), "band", "bhash")
    raw = dedup.capped_band_join(a, b, bucket_cap=1024, symmetric=True)
    t("capped_band_join raw pair rows", lambda: raw.count())
    cands = raw.filter(F.col("a_id") < F.col("b_id")).distinct()
    cands = cands.cache()
    t("distinct candidates", lambda: cands.count())

    rep_pairs = exact_ji_for_pairs(rep_docs, cands, id_col, text_col, 1).filter(
        F.col("ji") >= threshold
    )
    rep_pairs = rep_pairs.cache()
    t("exact verify (>=thr)", lambda: rep_pairs.count())

    rk = reps.select(F.col("rep_id"), F.col("__sk"))
    keyed = (
        rep_pairs.join(rk.withColumnRenamed("__sk", "__sk_a"), F.col("a_id") == F.col("rep_id"))
        .drop("rep_id", "a_id")
        .join(rk.withColumnRenamed("__sk", "__sk_b"), F.col("b_id") == F.col("rep_id"))
        .drop("rep_id", "b_id")
    )
    cross = (
        keyed.join(sets.select(F.col("__id").alias("ma"), F.col("__sk").alias("__sk_a")), "__sk_a")
        .join(sets.select(F.col("__id").alias("mb"), F.col("__sk").alias("__sk_b")), "__sk_b")
        .select(F.least("ma", "mb").alias("a_id"), F.greatest("ma", "mb").alias("b_id"), "ji")
    )
    t("cross expansion count", lambda: cross.count())

    t("FULL minhash_lsh_dedup count", lambda: dedup.minhash_lsh_dedup(docs, id_col, threshold=0.9).count())
    spark.stop()


if __name__ == "__main__":
    main()
