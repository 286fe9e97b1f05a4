"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry pairs our sketch-engine computation with exact
values computed JVM-side in the same plan; sketch estimates are emitted
as boolean bound-checks (`*_ok`) against the algorithm's published error
bound (BASELINE.md §b), while the exact columns must hash-match the
DuckDB ``oracle_sql()``. This mirrors the reference's own validation
strategy: estimates vs `--use-full-khash-sets` ground truth
(/root/reference/README.md:116).
"""

from __future__ import annotations

import math
import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dashing_spark.functions import HLL, KLL, TDigest
from dashing_spark.operators import agg, dist, freq

P_HLL = 14
_HLL_RSE3 = 3 * 1.04 / math.sqrt(1 << P_HLL)  # 3σ relative error bound
QUANTILE_PS = (0.25, 0.5, 0.75, 0.95)
RANK_EPS = 0.05


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _hll_ok(est_col, exact_col):
    slack = F.greatest(F.lit(_HLL_RSE3) * exact_col, F.lit(2.0))
    return (F.abs(est_col - exact_col) <= slack).alias("hll_ok")


def _lang_tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "lang", F.explode(F.split("text", " ", -1)).alias("token")
    )


# ---------------------------------------------------------------------------
# cardinality queries (dashing sketch/card/union/fold analogues)
# ---------------------------------------------------------------------------


def q_hll_card_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    sk = agg.sketch_tokens_by_key(docs, ["lang"], lambda: HLL.empty(P_HLL), salt=4)
    est = sk.select("lang", agg.estimate_expr("ertl_mle")("sketch").alias("est"))
    exact = (
        _lang_tokens(docs)
        .groupBy("lang")
        .agg(F.countDistinct("token").alias("exact_distinct"))
    )
    return est.join(exact, "lang").select(
        "lang", "exact_distinct", _hll_ok(F.col("est"), F.col("exact_distinct"))
    )


def q_hll_card_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dashing union`: merge per-lang sketches into one global sketch."""
    docs = _docs(spark, sf_dir)
    sk = agg.sketch_tokens_by_key(docs, ["lang"], lambda: HLL.empty(P_HLL))
    u = agg.union_all_sketches(sk)
    est = u.select(agg.estimate_expr("ertl_mle")("sketch").alias("est"))
    exact = _lang_tokens(docs).agg(
        F.countDistinct("token").alias("exact_distinct")
    )
    return est.crossJoin(exact).select(
        "exact_distinct", _hll_ok(F.col("est"), F.col("exact_distinct"))
    )


def q_hll_fold_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dashing fold`: p=14 sketch folded to p=10, still within p=10 bound."""
    docs = _docs(spark, sf_dir)
    sk = agg.sketch_tokens_by_key(docs, ["lang"], lambda: HLL.empty(P_HLL))
    folded = sk.select("lang", agg.fold_expr(10)("sketch").alias("sketch"))
    est = folded.select("lang", agg.estimate_expr("ertl_mle")("sketch").alias("est"))
    exact = (
        _lang_tokens(docs)
        .groupBy("lang")
        .agg(F.countDistinct("token").alias("exact_distinct"))
    )
    slack10 = F.greatest(
        F.lit(3 * 1.04 / math.sqrt(1 << 10)) * F.col("exact_distinct"), F.lit(2.0)
    )
    return est.join(exact, "lang").select(
        "lang",
        "exact_distinct",
        (F.abs(F.col("est") - F.col("exact_distinct")) <= slack10).alias("fold_ok"),
    )


def q_hll_card_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sequence sketching analogue: different groupBy key (source)."""
    docs = _docs(spark, sf_dir)
    sk = agg.sketch_tokens_by_key(docs, ["source"], lambda: HLL.empty(P_HLL), salt=4)
    est = sk.select("source", agg.estimate_expr("ertl_mle")("sketch").alias("est"))
    exact = (
        docs.select("source", F.explode(F.split("text", " ", -1)).alias("token"))
        .groupBy("source")
        .agg(F.countDistinct("token").alias("exact_distinct"))
    )
    return est.join(exact, "source").select(
        "source", "exact_distinct", _hll_ok(F.col("est"), F.col("exact_distinct"))
    )


# ---------------------------------------------------------------------------
# quantile queries (KLL / t-digest, north-rule additions)
# ---------------------------------------------------------------------------


def _quantile_query(spark, sf_dir, make_sketch, ok_name: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    sk = agg.sketch_numeric_by_key(docs, ["lang"], make_sketch, "n_chars")
    qhat = sk.select(
        "lang",
        F.posexplode(agg.quantile_expr(list(QUANTILE_PS))("sketch")).alias(
            "pi", "qhat"
        ),
    )
    ps = F.array(*[F.lit(p) for p in QUANTILE_PS])
    qhat = qhat.withColumn("p", F.element_at(ps, F.col("pi") + 1)).drop("pi")
    ranks = (
        docs.join(qhat, "lang")
        .groupBy("lang", "p")
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum(F.when(F.col("n_chars") < F.col("qhat"), 1).otherwise(0))
             / F.count("*")).alias("rank_lt"),
            (F.sum(F.when(F.col("n_chars") <= F.col("qhat"), 1).otherwise(0))
             / F.count("*")).alias("rank_le"),
        )
    )
    # under heavy ties the true rank is an interval [rank_lt, rank_le]
    ok = (F.col("p") >= F.col("rank_lt") - RANK_EPS) & (
        F.col("p") <= F.col("rank_le") + RANK_EPS
    )
    return ranks.select("lang", "p", "n_docs", ok.alias(ok_name))


def q_kll_quantiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _quantile_query(spark, sf_dir, lambda: KLL.empty(200), "kll_ok")


def q_tdigest_quantiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _quantile_query(spark, sf_dir, lambda: TDigest.empty(100), "tdigest_ok")


# ---------------------------------------------------------------------------
# frequency queries (count-min)
# ---------------------------------------------------------------------------


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    top = freq.top_k_tokens(docs, ["lang"], k=5)
    sketches = freq.cms_by_key(docs, ["lang"], lg_width=16, depth=4)
    est = freq.cms_point_query(top, sketches, ["lang"])
    totals = _lang_tokens(docs).groupBy("lang").agg(F.count("*").alias("n_tok"))
    eps = math.e / (1 << 16)
    out = est.join(totals, "lang")
    ok = (F.col("cm_est") >= F.col("cnt")) & (
        (F.col("cm_est") - F.col("cnt"))
        <= F.greatest(F.lit(eps) * F.col("n_tok"), F.lit(2.0))
    )
    return out.select("lang", "token", "cnt", "rank", ok.alias("cm_ok"))


def q_min_count_tokens_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`--min-count` pre-filter: distinct tokens with freq ≥ 5 per lang,
    HLL built over the surviving tokens."""
    docs = _docs(spark, sf_dir)
    kept = freq.min_count_filter(docs, ["lang"], min_count=5)
    kept = kept.withColumn("__h", F.xxhash64("token"))
    sk = agg.sketch_hash_col_by_key(kept, ["lang"], lambda: HLL.empty(P_HLL), "__h")
    est = sk.select("lang", agg.estimate_expr("ertl_mle")("sketch").alias("est"))
    exact = kept.groupBy("lang").agg(F.count("*").alias("n_tokens_ge5"))
    return est.join(exact, "lang").select(
        "lang", "n_tokens_ge5", _hll_ok(F.col("est"), F.col("n_tokens_ge5"))
    )


# ---------------------------------------------------------------------------
# pairwise distance queries (dashing dist)
# ---------------------------------------------------------------------------


def q_jaccard_pairs_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    exact = dist.exact_pair_measures(
        _lang_tokens(docs), "lang", "token", measures=("ji", "sizes")
    )
    sk = agg.sketch_tokens_by_key(docs, ["lang"], lambda: HLL.empty(P_HLL))
    est = dist.all_pairs(sk, ["lang"], measures=("ji",)).select(
        F.col("a_lang").alias("a_key"),
        F.col("b_lang").alias("b_key"),
        F.col("ji").alias("ji_est"),
    )
    out = exact.join(est, ["a_key", "b_key"])
    return out.select(
        "a_key",
        "b_key",
        F.round("ji", 9).alias("ji"),
        F.col("sizes").alias("inter_size"),
        (F.abs(F.col("ji_est") - F.col("ji")) <= 0.05).alias("hll_ji_ok"),
    )


def q_mash_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full measure family from exact set triples (result_cmp semantics)."""
    docs = _docs(spark, sf_dir)
    ksinv = 1.0 / 3.0  # k=3 shingle convention for the distance transforms
    exact = dist.exact_pair_measures(
        _lang_tokens(docs),
        "lang",
        "token",
        measures=(
            "mash_dist",
            "full_mash_dist",
            "containment",
            "containment_dist",
            "symmetric_containment",
        ),
        ksinv=ksinv,
    )
    return exact.select(
        "a_key",
        "b_key",
        F.round("mash_dist", 6).alias("mash_dist"),
        F.round("full_mash_dist", 6).alias("full_mash_dist"),
        F.round("containment", 6).alias("containment"),
        F.round("containment_dist", 6).alias("containment_dist"),
        F.round("symmetric_containment", 6).alias("symmetric_containment"),
    )


def q_topk_neighbors_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """--nearest-neighbors 2 on exact JI (deterministic tie-break)."""
    docs = _docs(spark, sf_dir)
    ut = dist.exact_pair_measures(_lang_tokens(docs), "lang", "token", ("ji",))
    sw = ut.select(
        F.col("b_key").alias("a_key"), F.col("a_key").alias("b_key"), "ji"
    )
    both = ut.select("a_key", "b_key", "ji").unionByName(sw)
    w = Window.partitionBy("a_key").orderBy(F.col("ji").desc(), F.col("b_key").asc())
    return (
        both.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
        .select("a_key", "b_key", F.round("ji", 9).alias("ji"), "rank")
    )


def q_weighted_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted/multiset Jaccard (WeightedSketcher semantics): exact via
    Σ min(cnt) / Σ max(cnt); sketch check via weighted HLL pairs."""
    docs = _docs(spark, sf_dir)
    c = freq.token_counts(docs, ["lang"])
    tot = c.groupBy("lang").agg(F.sum("cnt").alias("n"))
    a = c.select(F.col("lang").alias("a_key"), "token", F.col("cnt").alias("ca"))
    b = c.select(F.col("lang").alias("b_key"), "token", F.col("cnt").alias("cb"))
    smin = (
        a.join(b, "token")
        .filter(F.col("a_key") < F.col("b_key"))
        .groupBy("a_key", "b_key")
        .agg(F.sum(F.least("ca", "cb")).alias("smin"))
    )
    ta = tot.select(F.col("lang").alias("a_key"), F.col("n").alias("na"))
    tb = tot.select(F.col("lang").alias("b_key"), F.col("n").alias("nb"))
    exact = (
        smin.join(ta, "a_key")
        .join(tb, "b_key")
        .withColumn(
            "wji",
            F.col("smin").cast("double")
            / (F.col("na") + F.col("nb") - F.col("smin")),
        )
    )
    wsk = agg.sketch_tokens_by_key(
        docs, ["lang"], lambda: HLL.empty(P_HLL), weighted=True
    )
    west = dist.all_pairs(wsk, ["lang"], measures=("ji",)).select(
        F.col("a_lang").alias("a_key"),
        F.col("b_lang").alias("b_key"),
        F.col("ji").alias("wji_est"),
    )
    out = exact.join(west, ["a_key", "b_key"])
    return out.select(
        "a_key",
        "b_key",
        F.round("wji", 9).alias("wji"),
        (F.abs(F.col("wji_est") - F.col("wji")) <= 0.05).alias("whll_ok"),
    )


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-lang distinct-token HLL vs exact on sf0.001."""
    return q_hll_card_by_lang(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "hll_card_by_lang": q_hll_card_by_lang,
        "hll_card_union": q_hll_card_union,
        "hll_fold_by_lang": q_hll_fold_by_lang,
        "hll_card_by_source": q_hll_card_by_source,
        "kll_quantiles_by_lang": q_kll_quantiles_by_lang,
        "tdigest_quantiles_by_lang": q_tdigest_quantiles_by_lang,
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "min_count_tokens_by_lang": q_min_count_tokens_by_lang,
        "jaccard_pairs_lang": q_jaccard_pairs_lang,
        "mash_containment_pairs": q_mash_containment_pairs,
        "topk_neighbors_lang": q_topk_neighbors_lang,
        "weighted_jaccard_pairs": q_weighted_jaccard_pairs,
    }


_TOKS = "SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents"
_QP_VALUES = "SELECT * FROM (VALUES (0.25), (0.5), (0.75), (0.95)) AS t(p)"


def oracle_sql() -> dict[str, str]:
    return {
        "hll_card_by_lang": f"""
            SELECT lang, count(DISTINCT token) AS exact_distinct, true AS hll_ok
            FROM ({_TOKS}) GROUP BY lang
        """,
        "hll_card_union": f"""
            SELECT count(DISTINCT token) AS exact_distinct, true AS hll_ok
            FROM ({_TOKS})
        """,
        "hll_fold_by_lang": f"""
            SELECT lang, count(DISTINCT token) AS exact_distinct, true AS fold_ok
            FROM ({_TOKS}) GROUP BY lang
        """,
        "hll_card_by_source": """
            SELECT source, count(DISTINCT token) AS exact_distinct, true AS hll_ok
            FROM (SELECT source, unnest(string_split(text, ' ')) AS token
                  FROM documents)
            GROUP BY source
        """,
        "kll_quantiles_by_lang": f"""
            SELECT lang, p, count(*) AS n_docs, true AS kll_ok
            FROM documents CROSS JOIN ({_QP_VALUES})
            GROUP BY lang, p
        """,
        "tdigest_quantiles_by_lang": f"""
            SELECT lang, p, count(*) AS n_docs, true AS tdigest_ok
            FROM documents CROSS JOIN ({_QP_VALUES})
            GROUP BY lang, p
        """,
        "cms_heavy_hitters": f"""
            SELECT lang, token, cnt, rank, true AS cm_ok FROM (
                SELECT lang, token, cnt,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY cnt DESC, token ASC) AS rank
                FROM (SELECT lang, token, count(*) AS cnt
                      FROM ({_TOKS}) GROUP BY lang, token)
            ) WHERE rank <= 5
        """,
        "min_count_tokens_by_lang": f"""
            SELECT lang, count(*) AS n_tokens_ge5, true AS hll_ok
            FROM (SELECT lang, token, count(*) AS c
                  FROM ({_TOKS}) GROUP BY lang, token HAVING count(*) >= 5)
            GROUP BY lang
        """,
        "jaccard_pairs_lang": f"""
            WITH toks AS (SELECT DISTINCT lang, token FROM ({_TOKS})),
            sizes AS (SELECT lang, count(*) AS sz FROM toks GROUP BY lang),
            inter AS (
                SELECT a.lang AS a_key, b.lang AS b_key, count(*) AS t2
                FROM toks a JOIN toks b ON a.token = b.token AND a.lang < b.lang
                GROUP BY 1, 2
            )
            SELECT s1.lang AS a_key, s2.lang AS b_key,
                   round(CAST(COALESCE(i.t2, 0) AS DOUBLE)
                         / (s1.sz + s2.sz - COALESCE(i.t2, 0)), 9) AS ji,
                   CAST(COALESCE(i.t2, 0) AS DOUBLE) AS inter_size,
                   true AS hll_ji_ok
            FROM sizes s1 JOIN sizes s2 ON s1.lang < s2.lang
            LEFT JOIN inter i ON i.a_key = s1.lang AND i.b_key = s2.lang
        """,
        "mash_containment_pairs": f"""
            WITH toks AS (SELECT DISTINCT lang, token FROM ({_TOKS})),
            sizes AS (SELECT lang, count(*) AS sz FROM toks GROUP BY lang),
            inter AS (
                SELECT a.lang AS a_key, b.lang AS b_key, count(*) AS t2
                FROM toks a JOIN toks b ON a.token = b.token AND a.lang < b.lang
                GROUP BY 1, 2
            ),
            tri AS (
                SELECT s1.lang AS a_key, s2.lang AS b_key,
                       CAST(s1.sz - COALESCE(i.t2, 0) AS DOUBLE) AS t0,
                       CAST(s2.sz - COALESCE(i.t2, 0) AS DOUBLE) AS t1,
                       CAST(COALESCE(i.t2, 0) AS DOUBLE) AS t2
                FROM sizes s1 JOIN sizes s2 ON s1.lang < s2.lang
                LEFT JOIN inter i ON i.a_key = s1.lang AND i.b_key = s2.lang
            ),
            m AS (
                SELECT a_key, b_key,
                       t2 / (t0 + t1 + t2) AS ji,
                       t2 / (t0 + t2) AS c,
                       t2 / (least(t0, t1) + t2) AS sci
                FROM tri
            )
            SELECT a_key, b_key,
                   round(CASE WHEN ji > 0 THEN -ln(2*ji/(1+ji)) / 3.0
                              ELSE 1.0 END, 6) AS mash_dist,
                   round(CASE WHEN ji > 0 THEN 1.0 - pow(2*ji/(1+ji), 1.0/3.0)
                              ELSE 1.0 END, 6) AS full_mash_dist,
                   round(c, 6) AS containment,
                   round(CASE WHEN c > 0 THEN -ln(c) / 3.0 ELSE 1.0 END, 6)
                       AS containment_dist,
                   round(sci, 6) AS symmetric_containment
            FROM m
        """,
        "topk_neighbors_lang": f"""
            WITH toks AS (SELECT DISTINCT lang, token FROM ({_TOKS})),
            sizes AS (SELECT lang, count(*) AS sz FROM toks GROUP BY lang),
            inter AS (
                SELECT a.lang AS a_key, b.lang AS b_key, count(*) AS t2
                FROM toks a JOIN toks b ON a.token = b.token AND a.lang < b.lang
                GROUP BY 1, 2
            ),
            ut AS (
                SELECT s1.lang AS a_key, s2.lang AS b_key,
                       CAST(COALESCE(i.t2, 0) AS DOUBLE)
                       / (s1.sz + s2.sz - COALESCE(i.t2, 0)) AS ji
                FROM sizes s1 JOIN sizes s2 ON s1.lang < s2.lang
                LEFT JOIN inter i ON i.a_key = s1.lang AND i.b_key = s2.lang
            ),
            mirrored AS (
                SELECT a_key, b_key, ji FROM ut
                UNION ALL
                SELECT b_key AS a_key, a_key AS b_key, ji FROM ut
            )
            SELECT a_key, b_key, round(ji, 9) AS ji, rank FROM (
                SELECT a_key, b_key, ji,
                       row_number() OVER (PARTITION BY a_key
                                          ORDER BY ji DESC, b_key ASC) AS rank
                FROM mirrored
            ) WHERE rank <= 2
        """,
        "weighted_jaccard_pairs": f"""
            WITH c AS (SELECT lang, token, count(*) AS cnt
                       FROM ({_TOKS}) GROUP BY lang, token),
            tot AS (SELECT lang, sum(cnt) AS n FROM c GROUP BY lang),
            m AS (
                SELECT a.lang AS a_key, b.lang AS b_key,
                       sum(least(a.cnt, b.cnt)) AS smin
                FROM c a JOIN c b ON a.token = b.token AND a.lang < b.lang
                GROUP BY 1, 2
            )
            SELECT m.a_key, m.b_key,
                   round(CAST(m.smin AS DOUBLE) / (ta.n + tb.n - m.smin), 9)
                       AS wji,
                   true AS whll_ok
            FROM m JOIN tot ta ON ta.lang = m.a_key
                   JOIN tot tb ON tb.lang = m.b_key
        """,
    }
