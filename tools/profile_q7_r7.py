"""Stage-by-stage profile of the CURRENT q7 pipeline (minimal banding +
size-ratio prefilter + clustered reps) at $SPARK_GRAFT_SF_DIR.
Guide §1.4: each stage timed with a count/noop so the dominant stage of
the 100 TB-shaped cost is visible. Measurement aid only."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/sfgen/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profile_q7_r7")
        .config("spark.sql.shuffle.partitions", str(max(8, CPUS)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from dashing_spark.operators import dedup
    from dashing_spark.operators.dedup import (
        _set_digest_expr,
        _shingle_set_expr,
        minhash_signatures,
        lsh_band_rows,
        exact_ji_for_pairs,
        pick_lsh_banding,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.count()
    id_col, text_col, threshold = "doc_id", "text", 0.9

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
    ).filter(F.col("__nitems") > 0).cache()
    t("sets build+count", lambda: sets.count())

    s_a = sets.select(F.col("__id").alias("a_id"), "__sk")
    s_b = sets.select(F.col("__id").alias("b_id"), "__sk")
    intra = (
        s_a.join(s_b, "__sk").filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", F.lit(1.0).alias("ji"))
    )
    t("intra pairs count", lambda: intra.count())

    reps = sets.groupBy("__sk").agg(
        F.min("__id").alias("rep_id"), F.first("__nitems").alias("__nsz")
    ).cache()
    t("n reps", lambda: reps.count())
    rep_docs = docs.join(reps, docs[id_col] == reps["rep_id"], "left_semi").cache()
    t("rep_docs count", lambda: rep_docs.count())

    bands_n, n_used = pick_lsh_banding(128, threshold)
    print(f"bands={bands_n} n_hashes_used={n_used}")
    sigs = minhash_signatures(rep_docs, id_col, text_col, n_used, 1)
    sigs = sigs.localCheckpoint(eager=False)
    t("signatures (localCheckpoint+count)", lambda: sigs.count())

    banded = lsh_band_rows(sigs, id_col, n_hashes=n_used, bands=bands_n)
    banded = banded.localCheckpoint(eager=False)
    t("band rows", lambda: banded.count())

    rep_sizes = reps.select(F.col("rep_id").alias(id_col), "__nsz")
    bsz = banded.join(rep_sizes.select(F.col(id_col), F.col("__nsz")), id_col)
    a = bsz.select(F.col(id_col).alias("a_id"), "band", "bhash", F.col("__nsz").alias("__na"))
    b = bsz.select(F.col(id_col).alias("b_id"), "band", "bhash", F.col("__nsz").alias("__nb"))
    raw = dedup.capped_band_join(a, b, symmetric=True)
    t("capped_band_join raw pair rows", lambda: raw.count())
    filt = raw.filter(
        (F.col("a_id") < F.col("b_id"))
        & (F.least("__na", "__nb") + F.lit(2) >= F.greatest("__na", "__nb") * F.lit(threshold))
    )
    t("after a<b + size-ratio filter", lambda: filt.count())
    cands = dedup.distinct_pairs(filt).cache()
    t("distinct candidates", lambda: cands.count())

    rep_pairs = exact_ji_for_pairs(rep_docs, cands, id_col, text_col, 1).filter(
        F.col("ji") >= threshold
    ).cache()
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
    t("union intra+cross count", lambda: intra.unionByName(cross).count())

    t("FULL minhash_lsh_dedup count", lambda: dedup.minhash_lsh_dedup(docs, id_col, threshold=0.9).count())
    spark.stop()


if __name__ == "__main__":
    main()
