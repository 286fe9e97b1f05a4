"""Benchmark decontamination — flag training documents that overlap an
evaluation/benchmark set at the token-n-gram level.

No dashing counterpart (its containment operates on whole-file sketches);
this is the training-data-pipeline operator every serious pretraining run
needs: before training, any document sharing enough w-gram spans with a
held-out benchmark must be dropped or flagged (the GPT-3 paper's 13-gram
rule; PaLM/Llama use the same shape with different w).

Two coupled paths, both computed in ONE plan:

- **exact** (the correctness gate): distinct training (doc, gram) rows
  broadcast-semi-joined against the distinct benchmark gram set. A
  benchmark is small relative to a 100 TB corpus by construction, so
  the broadcast hash join IS the scale-correct physical plan — the
  training side streams map-side, nothing shuffles but the final per-doc
  rollup (keyed by doc id, partial-aggregated).
- **bloom** (the constant-memory variant): the benchmark gram set is
  compressed into one BloomFilter blob (functions/bloom.py) and probed
  per training gram in an Arrow-batched kernel. Zero false negatives by
  construction — the Bloom count can only over-count (FP rate
  (1-e^{-kn/m})^k) — so ``bloom_overlap >= exact_overlap`` row-wise.
  This is the path for a benchmark too large to broadcast as a hash
  relation but fine as an O(2^lg_bits)-bit blob.

The emitted per-doc frame carries both counts; query-level aggregation
hash-gates the exact integers and emits the Bloom guarantees as `*_ok`
booleans, mirroring `bloom_en_membership`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from dashing_spark.operators.ship import ensure_shipped
from dashing_spark.operators.text import token_ngrams_col


def _doc_grams(df: DataFrame, id_col: str, key_cols, text_col: str, w: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("__id"),
        *key_cols,
        F.explode(token_ngrams_col(text_col, w)).alias("__gram"),
    ).distinct()


def benchmark_overlap(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    key_cols=("lang",),
    text_col: str = "text",
    w: int = 8,
    lg_bits: int = 20,
    n_bloom_hashes: int = 4,
    with_bloom: bool = True,
) -> DataFrame:
    """Per-training-doc overlap against the benchmark gram set.

    Returns (``__id``, *key_cols, ``n_grams``, ``exact_overlap``,
    ``bloom_overlap``) — one row per training doc that has >= 1 gram
    (docs shorter than w tokens carry no contamination evidence and are
    excluded, symmetrically in the oracle). ``with_bloom=False`` skips
    the Bloom blob build (a driver-side collect) and the probe pass
    over every training gram, dropping the ``bloom_overlap`` column —
    for consumers that only read the exact counts.
    """
    from dashing_spark.functions import BloomFilter, sketch_from_bytes
    from dashing_spark.functions import hashing

    spark = train.sparkSession
    ensure_shipped(spark)
    bench_grams = (
        _doc_grams(bench, id_col, (), text_col, w).select("__gram").distinct()
    )

    train_grams = _doc_grams(train, id_col, key_cols, text_col, w)
    if not with_bloom:
        hit = train_grams.join(
            F.broadcast(bench_grams.withColumn("__exact_hit", F.lit(True))),
            "__gram",
            "left",
        ).fillna({"__exact_hit": False})
        return hit.groupBy("__id", *key_cols).agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("__exact_hit"), 1).otherwise(0)).alias(
                "exact_overlap"
            ),
        )

    # bloom blob over benchmark gram hashes, built distributed then
    # merged driver-side (one blob — the only collect, O(2^lg_bits) bits)
    def build_fn(batches):
        import pandas as pd

        bf = BloomFilter.empty(lg_bits, n_bloom_hashes)
        for pdf in batches:
            # whole-gram hashes (one per row — NOT the tokenizing kernel)
            bf.update_hashes(hashing.hash_str_array(pdf["__gram"]))
        yield pd.DataFrame({"blob": [bf.to_bytes()]})

    blob_schema = T.StructType([T.StructField("blob", T.BinaryType(), False)])
    # The blob collect (eager, here) and the broadcast exact join (lazy,
    # in the returned plan) each scan bench_grams once. A session-long
    # .cache() would dedupe those two scans but pin the gram set in
    # executor storage with no safe place to unpersist (the second
    # consumer materializes whenever the CALLER acts on the result), so
    # we accept recomputing the small benchmark-side distinct instead —
    # it is dwarfed by the train-corpus pass either way.
    parts = bench_grams.mapInPandas(build_fn, schema=blob_schema).collect()
    bf = BloomFilter.empty(lg_bits, n_bloom_hashes)
    for row in parts:
        bf = bf.merge(sketch_from_bytes(bytes(row["blob"])))
    blob = bf.to_bytes()


    probe_schema = T.StructType(
        [
            train_grams.schema["__id"],
            *[train_grams.schema[c] for c in key_cols],
            T.StructField("__gram", T.StringType(), True),
            T.StructField("__bloom_hit", T.BooleanType(), False),
        ]
    )

    def probe_fn(batches):
        pf = sketch_from_bytes(blob)
        for pdf in batches:
            out = pdf.copy()
            out["__bloom_hit"] = pf.contains_hashes(
                hashing.hash_str_array(pdf["__gram"])
            )
            yield out

    probed = train_grams.mapInPandas(probe_fn, schema=probe_schema)
    hit = probed.join(
        F.broadcast(bench_grams.withColumn("__exact_hit", F.lit(True))),
        "__gram",
        "left",
    ).fillna({"__exact_hit": False})
    return hit.groupBy("__id", *key_cols).agg(
        F.count("*").alias("n_grams"),
        F.sum(F.when(F.col("__exact_hit"), 1).otherwise(0)).alias("exact_overlap"),
        F.sum(F.when(F.col("__bloom_hit"), 1).otherwise(0)).alias("bloom_overlap"),
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 8,
    max_overlap_frac: float = 0.3,
    **kwargs,
) -> DataFrame:
    """Keeper frame: training docs whose exact benchmark-gram overlap
    fraction is below ``max_overlap_frac`` (docs with no grams are kept
    — no evidence). Returns the filtered training DataFrame. Only the
    exact counts drive the filter, so the Bloom build/probe is skipped."""
    kwargs.setdefault("with_bloom", False)
    per_doc = benchmark_overlap(
        train, bench, id_col=id_col, key_cols=(), text_col=text_col, w=w, **kwargs
    )
    dropped = per_doc.filter(
        F.col("exact_overlap") / F.col("n_grams") >= max_overlap_frac
    ).select(F.col("__id").alias(id_col))
    return train.join(dropped, id_col, "left_anti")
