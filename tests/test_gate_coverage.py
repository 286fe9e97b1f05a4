"""Canary for the driver correctness gate's 50-row cap.

Round-3 lesson: the driver gates the first ~50 entries of
``__spark_entry__.queries()`` in dict order. Appending new queries past
position 50 silently removes operators from the hard gate. These tests
fail the suite the moment that can happen again:

* the registry must hold at most ``GATE_CAP`` entries,
* every operator class in COVERAGE.md must have its representative
  query inside the first ``GATE_CAP`` positions,
* every query needs an oracle twin with the same key (and vice versa).
"""

import __spark_entry__ as entry

GATE_CAP = 50

#: one covering query per operator class — the COVERAGE.md row → query
#: mapping collapsed to the minimal representative set. If an operator
#: class gains a new covering query, update the entry; never delete a
#: row without a replacement.
REPRESENTATIVES = {
    # §2.1 sources / sinks
    "cardinality_sink",  # cardinality sink + `view` register dump
    "checkpoint_resume",  # sketch cache write/resume (-W)
    "distmat_sinks_roundtrip",  # UT-TSV / PHYLIP / packed binary + reader
    # §2.2 sketch constructors
    "hll_card_by_lang",  # HLL estimators, multi-file groups as one set
    "hll_card_by_doc",  # per-sequence sketching
    "hll_users_by_day",  # temporal rollup, non-text input
    "bloom_en_membership",  # Bloom filter
    "minhash_family_pairs",  # KMV + BBMH + HyperMinHash + SuperMinHash
    "counting_wji_pairs",  # CountingKMV (CRMH) + counting b-bit minhash
    "heavy_hitters",  # count-min + HeavyKeeper point estimates
    "min_count_tokens_by_lang",  # --min-count pre-filter
    "weighted_jaccard_pairs",  # weighted (multiset) adapter, exact mode
    "weighted_jaccard_cm",  # weighted adapter, CM occurrence indexing
    "kll_quantiles_by_lang",  # KLL (north rule)
    "tdigest_quantiles_by_lang",  # t-digest (north rule)
    # §2.3 merge / reshape
    "hll_card_union",  # union tree merge
    "hll_fold_by_lang",  # fold precision compress
    "hll_fold_cross_merge",  # cross-precision merge (fold's purpose)
    "multi_k_flatten",  # flatten multi-k stack
    # §2.4 comparison measures
    "jaccard_pairs_lang",  # JI + SIZES
    "mash_containment_pairs",  # the full distance-transform family
    # §2.5 pairwise topologies
    "panel_containment",  # query×reference + joint estimator
    "topk_neighbors_lang",  # k-NN emission
    "containment_filter",  # readfilt stream filter
    "multi_k_mash_slope",  # mkdist slope regression
    "multi_w_shingle_ji",  # multi-width shingle sweep
    # streaming
    "streaming_users_by_day",  # Structured Streaming incremental state
    "stateful_users_by_day",  # applyInPandasWithState
    "streaming_dedup_pairs",  # ingestion-time incremental LSH dedup
    # LLM-pipeline tier
    "dedup_exact_by_lang",
    "dedup_tokenset_by_lang",
    "minhash_lsh_dedup",
    "dedup_cluster_components",
    "ngram_jaccard_pairs",
    "simhash_near_dups",
    "ann_cosine_topk",
    "embedding_near_dup_pairs",
    "lsh_cosine_topk",
    "ivf_cosine_topk",
    "token_stats_by_lang",
    "bpe_token_stats",
    "quality_scores",
    "lang_id_confusion",
    "fingerprint_stats",  # md5 + winnowing tiers
    "multimodal_stats",  # payload metadata + real decode tiers
    "corpus_curation",
    "repetition_ratio",
    "duplicate_span_stats",
    "benchmark_decontamination",
    "corpus_sample_mix",
}


def test_registry_fits_the_gate():
    assert len(entry.queries()) <= GATE_CAP


def test_every_operator_representative_is_gated():
    gated = set(list(entry.queries())[:GATE_CAP])
    missing = REPRESENTATIVES - gated
    assert not missing, (
        f"operator representatives pushed past the driver's {GATE_CAP}-row "
        f"gate: {sorted(missing)}"
    )


def test_representatives_exist():
    # guards against renaming a query without updating REPRESENTATIVES
    unknown = REPRESENTATIVES - set(entry.queries())
    assert not unknown, f"REPRESENTATIVES not in queries(): {sorted(unknown)}"


def test_oracles_and_queries_align():
    q, o = set(entry.queries()), set(entry.oracle_sql())
    assert q == o, f"only-query: {sorted(q - o)}; only-oracle: {sorted(o - q)}"


def test_legacy_dicts_align():
    lq, lo = set(entry.legacy_queries()), set(entry.legacy_oracle_sql())
    assert lq == lo
    # a legacy query must never shadow a gated one
    assert not lq & set(entry.queries())
