"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
 "sf": ..., "docs_per_sec": ...}

The headline metric mirrors BASELINE.json: documents/sec sketch-build
throughput (per-lang HLL over the documents table), plus the operator
suite's per-query wall times. Run `python bench/scaling.py` for the
N-vs-4N parallelism scaling report.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def host_bandwidth_sentinel(n_bytes: int = 1 << 28, repeats: int = 3) -> float:
    """Single-thread memory-copy bandwidth in GB/s (read+write counted),
    best of ``repeats`` passes over a ``n_bytes`` buffer.

    This sandbox VM drifts through degraded memory-bandwidth phases
    (r5: q0 +14% on UNCHANGED code, machine verified idle) — a
    wall-time record without a host-health sentinel is ambiguous
    between a code regression and a sick host. The sentinel is pure
    numpy memcpy: no Spark, no allocator churn in the timed region,
    deterministic input, ~50 ms per pass. Compare the emitted
    ``host_sentinel_gbps`` across rounds before reading any per-query
    delta as real."""
    import numpy as np

    a = np.ones(n_bytes // 8, dtype=np.int64)
    b = np.empty_like(a)
    np.copyto(b, a)  # touch both buffers before timing
    best = 0.0
    for _ in range(repeats):
        t = time.perf_counter()
        np.copyto(b, a)
        dt = time.perf_counter() - t
        best = max(best, 2 * a.nbytes / dt / 1e9)
    return round(best, 2)


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("dashing_spark_bench")
        .config("spark.sql.shuffle.partitions", str(max(8, CPUS)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    from pyspark.sql import functions as F

    from dashing_spark.functions import HLL, KLL, CountMinSketch
    from dashing_spark.operators import agg, dedup, dist, freq, similarity, text

    sentinel_start = host_bandwidth_sentinel()
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    lineitem = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    n_docs = docs.count()  # also warms the JVM/parquet footer cache

    # global warm-up: python worker spawn + whole-stage codegen + Arrow
    # serde paths. Without it the first UDF-bearing query absorbs tens
    # of seconds of cold start and round-over-round bench numbers drift.
    warm = docs.limit(50).cache()
    warm.count()
    agg.sketch_tokens_by_key(warm, ["lang"], lambda: HLL.empty(10)).count()
    dedup.minhash_lsh_dedup(warm, "doc_id", threshold=0.9).count()
    dedup.simhash_near_dups(warm, "doc_id").count()
    freq.cms_by_key(warm, ["lang"], lg_width=12, depth=2).count()
    warm.unpersist()

    timings: dict[str, float] = {}
    drift: dict[str, list[float]] = {}
    # VERDICT r3 #8: this VM's heavy queries swing ±30-50% run-to-run,
    # which would eventually mask a real regression — time each query
    # REPEATS times, report the BEST (the number closest to the plan's
    # intrinsic cost) and carry the [min, max] band alongside
    repeats_default = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

    runs: dict[str, int] = {}

    # SPARK_GRAFT_BENCH_FILTER=q18d,q7 runs only queries whose name
    # contains one of the comma-separated tokens — iteration aid; the
    # driver's full-record runs leave it unset
    only = [
        t for t in os.environ.get("SPARK_GRAFT_BENCH_FILTER", "").split(",") if t
    ]

    def want(*names):
        """True when any of these query names survives the filter —
        gates the heavy UNTIMED setup (caches, collects, synthesis)
        each block pays for its run() calls."""
        return not only or any(t in n for n in names for t in only)

    def run(name, fn, repeats=None, warmup=False):
        if only and not any(t in name for t in only):
            return
        # warmup=True: one UNTIMED execution first (VERDICT r4 #7) —
        # iterative/broadcast-heavy queries absorb tens of seconds of
        # JVM/codegen first-run cost that otherwise dominates the drift
        # band and masks real regressions
        if warmup:
            fn()
        times = []
        for _ in range(max(1, repeats or repeats_default)):
            # release Python refs to prior queries' localCheckpoint
            # frames so ContextCleaner can evict their executor blocks
            # before timing — accumulated blocks were one source of the
            # 6-8x outlier runs in the r4/r5 driver bands
            gc.collect()
            t0 = time.time()
            fn()
            times.append(round(time.time() - t0, 3))
        timings[name] = min(times)
        runs[name] = len(times)
        if len(times) > 1:  # a single run has no measured band
            drift[name] = [min(times), max(times)]

    # q0: headline throughput at meaningful scale — 1M JVM-synthesized
    # pages (the sf tables are tiny; this is the docs/sec number that
    # matters). Warm run excluded (python worker cold start).
    from dashing_spark.sources.tables import synth_pages

    n_synth = int(os.environ.get("SPARK_GRAFT_BENCH_SYNTH_DOCS", "1000000"))
    # html is irrelevant to the sketch build and (r6) is now full messy
    # markup -- select it away so the cached columnar layout (and the
    # untimed cache-build cost) stay what every prior round measured
    if want("q0_synth_sketch_build_1m", "q0b_synth_sketch_build_jvmhash"):
        pages = synth_pages(spark, n_synth).select("url", "text", "lang").repartition(128).cache()
        pages.count()
        agg.sketch_tokens_by_key(pages, ["lang"], lambda: HLL.empty(14), salt=8).count()
    run(
        "q0_synth_sketch_build_1m",
        lambda: agg.sketch_tokens_by_key(
            pages, ["lang"], lambda: HLL.empty(14), salt=8
        ).count(),
    )
    run(
        "q0b_synth_sketch_build_jvmhash",
        lambda: agg.sketch_tokens_by_key(
            pages, ["lang"], lambda: HLL.empty(14), salt=8, hasher="jvm"
        ).count(),
    )
    if want("q0_synth_sketch_build_1m", "q0b_synth_sketch_build_jvmhash"):
        pages.unpersist(blocking=True)  # async unpersist skews later queries

    # q1: flagship sketch build — per-lang HLL p=14 over documents
    run(
        "q1_hll_sketch_build_lang",
        lambda: agg.sketch_tokens_by_key(
            docs, ["lang"], lambda: HLL.empty(14), salt=8
        ).count(),
    )
    # q2: per-source sketch build (more keys)
    run(
        "q2_hll_sketch_build_source",
        lambda: agg.sketch_tokens_by_key(
            docs, ["source"], lambda: HLL.empty(14), salt=8
        ).count(),
    )
    # q3: union of per-lang sketches + estimate
    if want("q3_union_estimate"):
        sk = agg.sketch_tokens_by_key(docs, ["lang"], lambda: HLL.empty(14)).cache()
        sk.count()
    run(
        "q3_union_estimate",
        lambda: agg.union_all_sketches(sk)
        .select(agg.estimate_expr()("sketch"))
        .collect(),
    )
    # q4: all-pairs distance matrix over per-source sketches (190 pairs)
    if want("q4_all_pairs_dist"):
        sks = agg.sketch_tokens_by_key(docs, ["source"], lambda: HLL.empty(14)).cache()
        sks.count()
    run(
        "q4_all_pairs_dist",
        lambda: dist.all_pairs(
            sks, ["source"], measures=("ji", "mash_dist", "containment"), ksinv=1 / 3
        ).count(),
    )
    if want("q3_union_estimate"):
        sk.unpersist(blocking=True)
    if want("q4_all_pairs_dist"):
        sks.unpersist(blocking=True)
    # q5: CMS heavy hitters per lang
    run(
        "q5_cms_heavy_hitters",
        lambda: freq.cms_point_query(
            freq.top_k_tokens(docs, ["lang"], 10),
            freq.cms_by_key(docs, ["lang"], lg_width=16, depth=4),
            ["lang"],
        ).count(),
    )
    # q6: KLL doc-length quantiles per lang
    run(
        "q6_kll_quantiles",
        lambda: agg.sketch_numeric_by_key(docs, ["lang"], lambda: KLL.empty(200), "n_chars")
        .select(agg.quantile_expr([0.25, 0.5, 0.75, 0.95])("sketch"))
        .collect(),
    )
    # q7: MinHash-LSH near-dup mining (candidates + exact verify)
    run(
        "q7_minhash_lsh_dedup",
        lambda: dedup.minhash_lsh_dedup(docs, "doc_id", threshold=0.9).count(),
    )
    # q8: ANN cosine top-k, blocked numpy path, 100 queries
    if want("q8_ann_cosine_topk"):
        qrows = [
            (r["vec_id"], r["embedding"])
            for r in emb.filter(F.col("vec_id") < 100).collect()
        ]
    run(
        "q8_ann_cosine_topk",
        lambda: similarity.cosine_topk_blocked(emb, qrows, k=10).count(),
    )
    # q9: HLL over a precomputed hash column (TPC-H lineitem, JVM hashing)
    run(
        "q9_hll_lineitem_partkeys",
        lambda: agg.sketch_hash_col_by_key(
            lineitem.withColumn("__h", F.xxhash64("l_partkey")),
            ["l_returnflag"],
            lambda: HLL.empty(14),
            "__h",
            salt=8,
        ).count(),
    )
    # q10: CMS over events values by type + KLL quantiles
    run(
        "q10_events_sketches",
        lambda: agg.sketch_numeric_by_key(
            events, ["event_type"], lambda: KLL.empty(200), "value"
        ).count(),
    )
    # q11: text analysis pass (token stats + lang id + quality)
    run(
        "q11_text_analysis",
        lambda: (
            text.token_stats(docs, ["lang"]).count(),
            text.lang_id_predict(docs).groupBy("pred_lang").count().count(),
        ),
    )
    # q11b: the published rule sets (Gopher A.1.1 + A.1.2 + C4 §2.2)
    # over the full docs table — quality/C4 are zero-exchange
    # projections; repetition adds the doc-keyed gram groupBys + one
    # window
    run(
        "q11b_published_rule_sets",
        lambda: (
            text.gopher_quality_rules(docs).agg(
                F.sum(F.col("gopher_keep").cast("int"))
            ).collect(),
            text.gopher_repetition_rules(docs, "doc_id").agg(
                F.sum(F.col("gopher_rep_keep").cast("int"))
            ).collect(),
            text.c4_rules(docs).agg(
                F.sum(F.col("c4_keep").cast("int"))
            ).collect(),
        ),
    )
    # q12: simhash near-dup pairs
    run(
        "q12_simhash_near_dups",
        lambda: dedup.simhash_near_dups(docs, "doc_id", max_hamming=3).count(),
    )
    # q13: query×reference panel with the Ertl joint-MLE triple estimator
    if want("q13_panel_joint_mle"):
        qsk = agg.sketch_hash_col_by_key(
            lineitem.select(
                F.col("l_returnflag").alias("key"), F.xxhash64("l_orderkey").alias("__h")
            ),
            ["key"], lambda: HLL.empty(14), "__h",
        ).cache()
        rsk = agg.sketch_hash_col_by_key(
            lineitem.select(
                F.col("l_linestatus").alias("key"), F.xxhash64("l_orderkey").alias("__h")
            ),
            ["key"], lambda: HLL.empty(14), "__h",
        ).cache()
        qsk.count(); rsk.count()
    run(
        "q13_panel_joint_mle",
        lambda: dist.query_reference(
            qsk, rsk, ["key"], measures=("containment",), estimator="ertl_joint_mle"
        ).count(),
    )
    if want("q13_panel_joint_mle"):
        qsk.unpersist(blocking=True)
        rsk.unpersist(blocking=True)
    # q14: char-n-gram exact-Jaccard near-dup pairs (capped to 2000 docs so
    # the suite stays bounded; the full-table cost is tracked in BENCH.md)
    from dashing_spark.operators import dedup as _dedup

    ngram_docs = docs.filter(F.col("doc_id") < 2000)
    run(
        "q14_ngram_jaccard_capped",
        lambda: _dedup.ngram_jaccard_pairs(
            ngram_docs, "doc_id", n=3, threshold=0.6
        ).count(),
    )
    # q15: minhash-family pair stage at >=10^4 pairs — 256 per-bucket KMV
    # sketches -> 32,640 pairs through the batched (stacked-matrix) kernel;
    # evidence for the vectorized non-HLL pair path at dist -8 scale
    from dashing_spark.functions import KMV

    if want("q15_kmv_pair_stage_32k", "q15b_kmv_pair_stage_grid"):
        bsk = agg.sketch_tokens_by_key(
            docs.withColumn("bucket", F.pmod(F.col("doc_id"), F.lit(256))),
            ["bucket"],
            lambda: KMV(1024),
        ).cache()
        bsk.count()
    run(
        "q15_kmv_pair_stage_32k",
        lambda: dist.all_pairs(bsk, ["bucket"], measures=("ji",)).count(),
    )
    # q15b: same pairs through the grid theta-join (the strategy for
    # sketch tables too large to broadcast) — records the constant
    # overhead paid for broadcast-independence at this (small) scale
    run(
        "q15b_kmv_pair_stage_grid",
        lambda: dist.all_pairs(
            bsk, ["bucket"], measures=("ji",), n_blocks=8
        ).count(),
    )
    if want("q15_kmv_pair_stage_32k", "q15b_kmv_pair_stage_grid"):
        bsk.unpersist(blocking=True)
    # q16: readfilt-style per-DOC containment against a broadcast reference
    # sketch with the joint-MLE estimator (the reference binary's readfilt
    # default) — carries evidence the per-batch tiny-HLL path scales
    from dashing_spark.operators import filter as _filter

    if want("q16_readfilt_containment_jointmle"):
        ref_blob = (
            agg.sketch_tokens_by_key(
                docs.filter(F.col("lang") == "en"), ["lang"], lambda: HLL.empty(10)
            )
            .select("sketch")
            .first()[0]
        )
    run(
        "q16_readfilt_containment_jointmle",
        lambda: _filter.containment_scores(
            docs.select("doc_id", "text"),
            bytes(ref_blob),
            estimator="ertl_joint_mle",
        ).count(),
    )
    # q17: connected components over a 1M-node pair graph (31k chains of
    # 32 — diameter 32 forces the pointer-jumping rounds; near-dup
    # graphs are easier). Isolates the iterative dedup-closure operator.
    chain = (
        spark.range(1_000_000)
        .filter(F.pmod(F.col("id"), F.lit(32)) != 31)
        .select(F.col("id").alias("a_id"), (F.col("id") + 1).alias("b_id"))
    )
    run(
        "q17_connected_components_1m",
        lambda: _dedup.connected_components(chain).groupBy("comp").count().count(),
        warmup=True,
    )
    # q18: cross-doc duplicated 8-token spans over the full docs table in
    # the production (hash-key) configuration — one shuffle keyed by an
    # 8-byte span hash, cost linear in corpus token count
    run(
        "q18_duplicate_spans",
        lambda: _dedup.duplicate_span_stats(
            docs, "doc_id", ["lang"], w=8, span_key="hash"
        ).count(),
    )
    # q18b: maximal duplicated runs — the arbitrary-length substring
    # signal (span shuffle + one doc-partitioned window on top of q18's
    # cost model)
    run(
        "q18b_duplicate_runs",
        lambda: _dedup.duplicate_run_stats(
            docs, "doc_id", ["lang"], w=8, min_len=16, span_key="hash"
        ).count(),
    )
    # q18c: C4 line dedup over a two-line split of the corpus — two
    # line-keyed linear shuffles (keeper agg + reassembly), no window;
    # same split construction as the gate query (dedup.two_line_split)
    run(
        "q18c_line_dedup",
        lambda: _dedup.line_dedup(
            _dedup.two_line_split(docs), "doc_id", "t2"
        )
        .agg(F.sum("n_kept"))
        .collect(),
    )
    # q18d: ExactSubstr REWRITE — islands cut from every doc and the
    # text rebuilt (q18b's cost model + an interval->position explode,
    # a composite-key anti join, and one per-doc rebuild aggregation)
    run(
        "q18d_substring_rewrite",
        lambda: _dedup.remove_duplicate_runs(
            docs, "doc_id", w=8, min_len=16, span_key="hash"
        )
        .agg(F.sum("n_tokens_removed"))
        .collect(),
    )
    # q19: benchmark decontamination — exact broadcast-join overlap plus
    # the Bloom probe over every training gram (two mapInPandas passes)
    from dashing_spark.operators import contamination as _contam

    run(
        "q19_benchmark_decontamination",
        lambda: _contam.benchmark_overlap(
            docs.filter(F.col("doc_id") % 97 != 0),
            docs.filter(F.col("doc_id") % 97 == 0),
            key_cols=(),
            w=8,
        ).count(),
        warmup=True,
    )

    # q20: streaming ingestion-time dedup across 5 epochs (VERDICT r3
    # #3) — the docs table arrives in thirds; each epoch is indexed and
    # joined against the ACCUMULATED band index, so per-epoch time
    # isolates the one cost that grows with index size, not batch size.
    # Asymptotics: epoch e scans an index of (e-1)/3 of the corpus →
    # per-epoch cost ~ c_batch + c_scan·(e-1); at a fixed ingest rate
    # the index term is linear in corpus age unless the index is
    # time-partitioned (the epoch dirs are exactly that partitioning —
    # a TTL or compaction policy caps the scan at a constant window).
    import shutil
    import tempfile

    from dashing_spark.streaming import dedup_stream

    state_dir = tempfile.mkdtemp(prefix="bench_dd_state_")
    epoch_secs = []
    n_stream_pairs = 0
    # the epoch loop bypasses run() (stateful, single-pass) — apply the
    # same name filter by hand
    q20_on = not only or any(t in "q20_streaming_dedup_5epochs" for t in only)
    try:
        # 5 epochs with max_segments=3: after epoch 3 the manifest
        # exceeds the policy and auto-compacts to ["c2", "3"], so epoch
        # 4 runs against a COMPACTED index mid-stream — the maintenance
        # boundary the policy exists for (r4 left it manual-invoke)
        for e in range(5 if q20_on else 0):
            batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(5)) == e)
            t0 = time.time()
            dedup_stream.apply_dedup_batch(
                batch, e, id_col="doc_id", state_dir=state_dir,
                threshold=0.9, max_segments=3,
            )
            epoch_secs.append(round(time.time() - t0, 3))
        if q20_on:
            t0 = time.time()
            n_stream_pairs = dedup_stream.read_pairs(spark, state_dir).count()
            epoch_secs.append(round(time.time() - t0, 3))  # pair-union read
            # single pass — epochs are stateful (committed epochs are
            # no-op on retry), so q20 has runs=1 and no drift band
            timings["q20_streaming_dedup_5epochs"] = round(sum(epoch_secs), 3)
            runs["q20_streaming_dedup_5epochs"] = 1
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)

    # q21: panel at realistic size (VERDICT r3 #5) — ~1k query × ~1k
    # reference sketches through query_reference's broadcast rectangular
    # join (partdist_loop analogue): 1M pairs through the batched
    # inclusion-exclusion kernel, broadcast side ~1k × 1 KiB blobs.
    n_panel_pairs = 0
    if want("q21_panel_1kx1k", "q21b_panel_1kx1k_grid"):
        psrc = synth_pages(spark, 200_000).select(
            F.pmod(F.xxhash64("url"), F.lit(1000)).alias("qkey"),
            F.pmod(F.xxhash64("url", F.lit(7)), F.lit(1000)).alias("rkey"),
            F.xxhash64("text").alias("__h"),
        ).cache()
        psrc.count()
        pq = agg.sketch_hash_col_by_key(
            psrc.select(F.col("qkey").alias("key"), "__h"),
            ["key"], lambda: HLL.empty(10), "__h",
        ).cache()
        pr = agg.sketch_hash_col_by_key(
            psrc.select(F.col("rkey").alias("key"), "__h"),
            ["key"], lambda: HLL.empty(10), "__h",
        ).cache()
        n_panel_pairs = pq.count() * pr.count()
    run(
        "q21_panel_1kx1k",
        lambda: dist.query_reference(
            pq, pr, ["key"], measures=("containment",)
        ).count(),
    )
    # same panel through the reference-blocked grid (the physical
    # strategy an unbroadcastable 10^6-sketch reference would take)
    run(
        "q21b_panel_1kx1k_grid",
        lambda: dist.query_reference(
            pq, pr, ["key"], measures=("containment",), n_blocks=8
        ).count(),
    )
    if want("q21_panel_1kx1k", "q21b_panel_1kx1k_grid"):
        psrc.unpersist(blocking=True)
        pq.unpersist(blocking=True)
        pr.unpersist(blocking=True)

    # q22: sequence packing (concat-and-chunk) over 1M synthetic pages —
    # the distributed-prefix-sum formulation (range exchange + windowed
    # local cumsum + broadcast offsets), slim projection only
    from dashing_spark.operators import corpus as _corpus

    n_pack = 0
    if want("q22_pack_sequences_1m"):
        pack_pages = synth_pages(spark, n_synth).select("text", "lang").withColumn(
            "doc_id", F.monotonically_increasing_id()
        ).cache()
        n_pack = pack_pages.count()
    run(
        "q22_pack_sequences_1m",
        lambda: _corpus.pack_sequences(pack_pages, "doc_id", 2048).count(),
    )
    if want("q22_pack_sequences_1m"):
        pack_pages.unpersist(blocking=True)

    total = round(sum(timings.values()), 3)
    def _rate(n, key):
        return round(n / timings[key], 1) if key in timings else None
    sketch_docs_per_sec = _rate(n_synth, "q0_synth_sketch_build_1m")
    # Rich diagnostics (drift bands, run counts, streaming epochs) go to an
    # EARLIER stdout line and a sidecar file; the driver only keeps a ~2 KB
    # stdout *tail*, and round 4 lost its per-query record when the
    # one-line dump outgrew that window (BENCH_r04.json parsed:null).
    sentinel_end = host_bandwidth_sentinel()
    detail = {
        "host_sentinel_gbps_start": sentinel_start,
        "host_sentinel_gbps_end": sentinel_end,
        "runs_per_query": runs,
        "drift_band": drift,
        "streaming_epoch_secs": epoch_secs,
        "streaming_pairs": n_stream_pairs,
        "panel_pairs": n_panel_pairs,
        "panel_pairs_per_sec": _rate(n_panel_pairs, "q21_panel_1kx1k"),
        "pack_docs_per_sec": _rate(n_pack, "q22_pack_sequences_1m"),
        "n_docs": n_docs,
        "pairs_per_sec_kmv_stage": _rate(32640, "q15_kmv_pair_stage_32k"),
    }
    print(json.dumps({"detail": detail}))
    if not only:  # filtered runs never overwrite the full record
        try:
            with open(
                os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
                "w",
            ) as fh:
                json.dump(detail, fh, indent=1)
        except OSError:
            pass
    # Compact driver-parseable record: ALWAYS the last stdout line.
    print(
        json.dumps(
            {
                "metric": "dashing_spark operator suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
                "cpus": CPUS,
                "docs_per_sec_sketch_build": sketch_docs_per_sec,
                # host-health sentinel (min of start/end single-thread
                # memcpy GB/s): read per-query deltas vs other rounds
                # ONLY after comparing this number — r5's "+14% on
                # unchanged code" was a degraded-VM phase, not code
                "host_sentinel_gbps": min(sentinel_start, sentinel_end),
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
