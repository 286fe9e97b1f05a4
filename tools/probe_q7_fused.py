"""Probe: q7 candidate-verify orderings at $SPARK_GRAFT_SF_DIR.

Variants (all must produce the identical verified pair multiset):
  A. current: distinct 900M candidates, then array_intersect verify
  B. fused:   broadcast-attach items + verify INSIDE the band-join
              stage, distinct only the survivors (no 900M exchange)
  C. fused + r=8 banding (264 hashes, 33 bands) — fewer collisions per
     sub-threshold pair
Measurement aid only."""
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
        .appName("probe_q7_fused")
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
    sets.count()
    reps = sets.groupBy("__sk").agg(
        F.min("__id").alias("rep_id"), F.first("__nitems").alias("__nsz")
    ).cache()
    reps.count()
    rep_docs = docs.join(reps, docs[id_col] == reps["rep_id"], "left_semi").cache()
    rep_docs.count()
    rep_items = dedup.hashed_item_sets(rep_docs, id_col).cache()
    rep_items.count()

    def run_variant(name, bands_n, n_used, fused):
        sigs = minhash_signatures(rep_docs, id_col, text_col, n_used, 1)
        sigs = sigs.localCheckpoint(eager=False)
        banded = lsh_band_rows(sigs, id_col, n_hashes=n_used, bands=bands_n)
        banded = banded.localCheckpoint(eager=False)
        rep_sizes = reps.select(F.col("rep_id").alias(id_col), "__nsz")
        bsz = banded.join(rep_sizes, id_col)
        a = bsz.select(F.col(id_col).alias("a_id"), "band", "bhash", F.col("__nsz").alias("__na"))
        b = bsz.select(F.col(id_col).alias("b_id"), "band", "bhash", F.col("__nsz").alias("__nb"))
        raw = dedup.capped_band_join(a, b, symmetric=True).filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.least("__na", "__nb") + F.lit(2) >= F.greatest("__na", "__nb") * F.lit(threshold))
        )
        if fused:
            ia = F.broadcast(rep_items.select(F.col("id").alias("a_id"), F.col("items").alias("a_items")))
            ib = F.broadcast(rep_items.select(F.col("id").alias("b_id"), F.col("items").alias("b_items")))
            ver = (
                raw.select("a_id", "b_id")
                .join(ia, "a_id")
                .join(ib, "b_id")
                .withColumn("t2", F.size(F.array_intersect("a_items", "b_items")))
                .withColumn(
                    "ji",
                    F.col("t2").cast("double")
                    / (F.size("a_items") + F.size("b_items") - F.col("t2")),
                )
                .filter(F.col("ji") >= threshold)
                .select("a_id", "b_id", "ji")
            )
            out = ver.dropDuplicates(["a_id", "b_id"])
        else:
            cands = dedup.distinct_pairs(raw)
            out = dedup.exact_ji_for_pairs(rep_docs, cands, id_col, text_col, 1).filter(
                F.col("ji") >= threshold
            )
        n = t(name, lambda: out.count())
        return n

    run_variant("B fused r4/b18 (72h)", 18, 72, fused=True)
    run_variant("C fused r8/b33 (264h)", 33, 264, fused=True)
    run_variant("A current r4/b18 (72h)", 18, 72, fused=False)
    spark.stop()


if __name__ == "__main__":
    main()
