"""Two-point scale evidence for the MinHash-LSH dedup family
(VERDICT r4 #6) plus the adversarial template-family load-bound check
(VERDICT r4 #2 "completes ~linearly" evidence).

Section A — organic two-point scaling. The sf0.1 documents table (5000
docs, the largest driver-generated fixture) is replicated R× with
doc_id offsets and an INJECTIVE per-replica token renaming, so every
within-replica Jaccard equals the original corpus's exactly and
cross-replica JI is 0: true pair mass grows linearly in R (organic
growth of a web corpus with a fixed dup rate), not quadratically
(which naive replication would fabricate) and not sub-linearly (which
a perturbation that also degrades within-replica JI would). For each
point the three stages are timed/counted separately: candidate
generation (banded join), exact verify, and total pipeline. The
candidate:true ratio and the time-scaling exponent
log(t_R/t_1)/log(R) pin whether the pipeline is output-bound (~1.0)
or hides a super-linear join (→2.0).

Section B — adversarial template family. B near-identical-but-distinct
docs (one serial token each) collide in most bands; output is
genuinely O(B²) pairs, so wall time CANNOT be linear in B — the
scale property the bucket cap buys is bounded PER-REDUCER load. Both
are reported: wall time capped vs uncapped, and the direct load
evidence — the max per-(band,bhash)-bucket pair count the uncapped
join materializes on one reducer vs the max per-grid-cell pair count
after the capped split.

Usage: python bench/dedup_scaling.py [--replicas 10] [--family 10000]
Prints one JSON line per section; paste the table into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("dedup_scaling")
        .config("spark.sql.shuffle.partitions", str(max(8, CPUS)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def replicated_docs(spark, docs, replicas: int):
    """R copies with offset ids; replica r's tokens are renamed with an
    injective per-replica prefix, so every within-replica Jaccard
    equals the original corpus exactly (the near-dup structure — and
    true pair mass — scales LINEARLY in R, like organic growth at a
    fixed dup rate) while cross-replica JI is 0 (disjoint token
    universes). A suffix-perturbation variant was rejected: it lowered
    within-replica JI too, silently deleting the structure the scaling
    point is supposed to carry."""
    from pyspark.sql import functions as F

    n = docs.selectExpr("max(doc_id)").collect()[0][0] + 1
    out = []
    for r in range(replicas):
        d = docs.select(
            (F.col("doc_id") + F.lit(r * n)).alias("doc_id"), "text"
        )
        if r > 0:
            renamed = F.array_join(
                F.transform(
                    F.split("text", " ", -1),
                    lambda t: F.concat(F.lit(f"r{r}_"), t),
                ),
                " ",
            )
            d = d.select("doc_id", renamed.alias("text"))
        out.append(d)
    u = out[0]
    for d in out[1:]:
        u = u.unionByName(d)
    return u


def section_a(spark, replicas: int):
    from pyspark.sql import functions as F

    from dashing_spark.operators import dedup

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    points = []
    for r in (1, replicas):
        corpus = replicated_docs(spark, docs, r).cache()
        n_docs = corpus.count()
        sigs = dedup.minhash_signatures(corpus, "doc_id").cache()
        sigs.count()
        t0 = time.time()
        cands = dedup.lsh_candidate_pairs(sigs, "doc_id")
        n_cands = cands.count()
        t_cand = time.time() - t0
        t0 = time.time()
        n_true = (
            dedup.exact_ji_for_pairs(corpus, cands, "doc_id")
            .filter(F.col("ji") >= 0.9)
            .count()
        )
        t_verify = time.time() - t0
        t0 = time.time()
        n_pipeline = dedup.minhash_lsh_dedup(
            corpus, "doc_id", threshold=0.9
        ).count()
        t_total = time.time() - t0
        sigs.unpersist(blocking=True)
        corpus.unpersist(blocking=True)
        points.append(
            {
                "replicas": r,
                "n_docs": n_docs,
                "candidates": n_cands,
                "true_pairs": n_true,
                "pipeline_pairs": n_pipeline,
                "cand_to_true": round(n_cands / max(1, n_true), 3),
                "t_candidates": round(t_cand, 2),
                "t_verify": round(t_verify, 2),
                "t_pipeline": round(t_total, 2),
            }
        )
    import math

    p1, pR = points
    rr = pR["n_docs"] / p1["n_docs"]
    exponent = {
        k: round(math.log(pR[k] / p1[k]) / math.log(rr), 3)
        for k in ("t_candidates", "t_verify", "t_pipeline")
        if p1[k] > 0
    }
    return {
        "section": "A_two_point_scaling",
        "sf": SF_DIR,
        "cpus": CPUS,
        "points": points,
        "scaling_exponent": exponent,
    }


def section_b(spark, family: int):
    from pyspark.sql import functions as F

    from dashing_spark.operators import dedup

    base = " ".join(f"tok{i}" for i in range(60))
    docs = spark.range(family).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(base + " serial"), F.col("id")).alias("text"),
    )
    sigs = dedup.minhash_signatures(docs, "doc_id").cache()
    sigs.count()
    banded = dedup.lsh_band_rows(sigs, "doc_id").cache()
    # direct load evidence: pairs one reducer materializes per bucket
    sizes = banded.groupBy("band", "bhash").count()
    max_bucket = sizes.agg(F.max("count")).collect()[0][0]
    cap = dedup.DEFAULT_BUCKET_CAP
    banded.unpersist()
    out = {
        "section": "B_template_family",
        "family": family,
        "max_bucket_rows": int(max_bucket),
        "uncapped_max_reducer_pairs": int(max_bucket) * (int(max_bucket) - 1) // 2,
        "bucket_cap": cap,
        "capped_max_reducer_pairs_bound": cap * cap,
    }
    for name, bc in (("capped", cap), ("uncapped", None)):
        t0 = time.time()
        n = dedup.lsh_candidate_pairs(sigs, "doc_id", bucket_cap=bc).count()
        out[f"t_{name}"] = round(time.time() - t0, 2)
        out[f"pairs_{name}"] = n
    sigs.unpersist(blocking=True)
    return out


def section_b2(spark, family: int, cap: int):
    """Structural per-reducer load evidence at a family size past the
    old 128-block clamp (r5 verdict #4). Materializing the pair set at
    10⁵ docs is output-bound (C(10⁵,2) ≈ 5·10⁹ pairs) regardless of
    capping, so this section measures the LOAD BOUND analytically from
    the real band rows and the real id-hash block assignment: the max
    per-grid-cell pair count is (max a-block) × (max b-block) for the
    hottest bucket — exactly what one reducer materializes. Reported
    for the unclamped grid (G = ceil(n/cap)) and for a simulation of
    the old clamp (G = min(ceil(n/cap), 128))."""
    from pyspark.sql import functions as F

    from dashing_spark.operators import dedup

    base = " ".join(f"tok{i}" for i in range(60))
    docs = spark.range(family).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(base + " serial"), F.col("id")).alias("text"),
    )
    sigs = dedup.minhash_signatures(docs, "doc_id")
    banded = dedup.lsh_band_rows(sigs, "doc_id").cache()
    sizes = banded.groupBy("band", "bhash").agg(F.count("*").alias("n"))
    out = {
        "section": "B2_structural_load_at_family",
        "family": family,
        "bucket_cap": cap,
        "max_bucket_rows": int(
            sizes.agg(F.max("n")).collect()[0][0]
        ),
    }
    for tag, clamp in (("unclamped", None), ("old_128_clamp", 128)):
        # the unclamped layout reuses the EXACT expressions the join
        # executes (exported from dedup.py, r6 review find) — only the
        # retired-clamp simulation wraps them in least()
        g = dedup.grid_blocks_expr("n", cap)
        if clamp is not None:
            g = F.least(g, F.lit(clamp))
        blocks = (
            banded.join(sizes, ["band", "bhash"])
            .filter(F.col("n") > cap)
            .select(
                "band",
                "bhash",
                dedup.grid_block_key("doc_id", g).alias("blk"),
            )
            .groupBy("band", "bhash", "blk")
            .agg(F.count("*").alias("bn"))
        )
        mx = blocks.agg(F.max("bn")).collect()[0][0] or 0
        out[f"max_block_rows_{tag}"] = int(mx)
        out[f"max_reducer_pairs_{tag}"] = int(mx) * int(mx)
    out["cap_squared_bound"] = cap * cap
    banded.unpersist()
    return out


def section_c(spark, replicas: int):
    """Two-point scaling for the ExactSubstr REWRITE
    (dedup.remove_duplicate_runs): the injective-rename replication
    preserves every within-replica duplicated run exactly and creates
    no cross-replica spans, so removed-token mass must scale EXACTLY
    R x and the wall exponent log(t_R/t_1)/log(R) pins whether the
    span shuffle + anti join + rebuild chain stays linear."""
    from pyspark.sql import functions as F

    from dashing_spark.operators import dedup

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    # untimed warmup: the first execution of this plan shape pays JVM
    # JIT + python-worker spin-up that would otherwise invert the
    # two-point exponent (bench run(warmup=True) convention)
    dedup.remove_duplicate_runs(
        docs, "doc_id", w=8, min_len=16, span_key="hash"
    ).agg(F.sum("n_tokens_removed")).collect()
    points = []
    for r in (1, replicas):
        corpus = replicated_docs(spark, docs, r).cache()
        n_docs = corpus.count()
        t0 = time.time()
        removed = (
            dedup.remove_duplicate_runs(
                corpus, "doc_id", w=8, min_len=16, span_key="hash"
            )
            .agg(F.sum("n_tokens_removed"))
            .collect()[0][0]
        )
        wall = time.time() - t0
        corpus.unpersist(blocking=True)
        points.append(
            {
                "replicas": r,
                "n_docs": n_docs,
                "tokens_removed": int(removed),
                "wall_s": round(wall, 2),
            }
        )
    import math

    p1, pr = points
    exponent = None
    if pr["replicas"] > 1 and p1["wall_s"] > 0 and pr["wall_s"] > 0:
        exponent = round(
            math.log(pr["wall_s"] / p1["wall_s"]) / math.log(pr["replicas"]), 3
        )
    return {
        "section": "C_substring_rewrite_scaling",
        "points": points,
        "removed_scales_exactly_R": pr["tokens_removed"]
        == p1["tokens_removed"] * pr["replicas"],
        "wall_exponent": exponent,
    }


def main():
    replicas = 10
    family = 10_000
    only = ""
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--replicas":
            i += 1
            replicas = int(argv[i])
        elif argv[i] == "--family":
            i += 1
            family = int(argv[i])
        elif argv[i] == "--only":
            i += 1
            only = argv[i]
        else:
            raise SystemExit(f"unknown arg {argv[i]}")
        i += 1
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    if not only or "a" in only:
        print(json.dumps(section_a(spark, replicas)))
    if not only or "b" in only:
        print(json.dumps(section_b(spark, family)))
        print(json.dumps(section_b2(spark, 100_000, 256)))
    if not only or "c" in only:
        print(json.dumps(section_c(spark, replicas)))
    spark.stop()


if __name__ == "__main__":
    main()
