"""Pairwise comparison kernel — the reference's `result_cmp`.

Reproduces the scalar kernel at /root/reference/src/dashing.h:568-592:
every measure derives from either the Jaccard index or the set triple
(|A\\B|, |B\\A|, |A∩B|) (`set_triple` src/dashing.h:189-192). Formula
table and sources in SURVEY.md §2.4. For CONTAINMENT_INDEX we implement
the *documented* semantics |A∩B|/|A| (README.md:86, and the per-type
implementations src/khset64.h:150-153, src/readfilt.cpp:118-121), not the
result_cmp quirk that divides by the union.

``ksinv`` is 1/k where k is the shingle width (the reference's k-mer
length) — it scales the Mash-style distance transforms.
"""

from __future__ import annotations

import math

import numpy as np

from dashing_spark.functions.bbmh import BBitMinHash, bbmh_jaccard
from dashing_spark.functions.bloom import BloomFilter
from dashing_spark.functions.hll import HLL
from dashing_spark.functions.hll import set_triple as hll_set_triple
from dashing_spark.functions.kmv import KMV, kmv_set_triple

MEASURES = (
    "ji",
    "mash_dist",
    "full_mash_dist",
    "sizes",
    "containment",
    "containment_dist",
    "full_containment_dist",
    "symmetric_containment",
    "symmetric_containment_dist",
)

#: measures where smaller = more similar (top-k sorts ascending,
#: emt2nntype analogue /root/reference/src/dashing.h:268-280)
DISTANCE_MEASURES = frozenset(
    {"mash_dist", "full_mash_dist", "containment_dist",
     "full_containment_dist", "symmetric_containment_dist"}
)


def set_triple_any(a, b, estimator: str = "default") -> tuple[float, float, float]:
    """(|A\\B|, |B\\A|, |A∩B|) for any comparable sketch pair."""
    if isinstance(a, HLL):
        est = "ertl_mle" if estimator == "default" else estimator
        return hll_set_triple(a, b, est)
    if isinstance(a, KMV):
        return kmv_set_triple(a, b)
    if isinstance(a, BloomFilter):
        u = BloomFilter(a.lg_bits, a.k, np.bitwise_or(a.words, b.words))
        ca, cb, cu = a.estimate(), b.estimate(), u.estimate()
        inter = max(0.0, ca + cb - cu)
        return max(0.0, cu - cb), max(0.0, cu - ca), inter
    if isinstance(a, BBitMinHash):
        ji = bbmh_jaccard(a, b)
        ca, cb = a.estimate(), b.estimate()
        # solve inter from ji = inter/(ca+cb-inter)
        inter = ji * (ca + cb) / (1.0 + ji) if ji > 0 else 0.0
        return max(0.0, ca - inter), max(0.0, cb - inter), inter
    from dashing_spark.functions.hmh import HyperMinHash, hmh_jaccard

    if isinstance(a, HyperMinHash):
        ji = hmh_jaccard(a, b)
        ca, cb = a.estimate(), b.estimate()
        inter = ji * (ca + cb) / (1.0 + ji) if ji > 0 else 0.0
        return max(0.0, ca - inter), max(0.0, cb - inter), inter
    raise TypeError(f"no set_triple for sketch type {type(a).__name__}")


def measure_from_triple(
    t0: float, t1: float, t2: float, measure: str, ksinv: float = 1.0
) -> float:
    """All §2.4 measures from the set triple (src/dashing.h:572-592)."""
    union = t0 + t1 + t2
    ji = t2 / union if union > 0 else 0.0
    if measure == "ji":
        return ji
    if measure == "sizes":
        return t2
    if measure == "mash_dist":  # dist_index, src/dashing.h:149-156
        return -math.log(2.0 * ji / (1.0 + ji)) * ksinv if ji > 0 else 1.0
    if measure == "full_mash_dist":  # full_dist_index, src/dashing.h:167-174
        return 1.0 - (2.0 * ji / (1.0 + ji)) ** ksinv if ji > 0 else 1.0
    ca = t0 + t2  # |A|
    c = t2 / ca if ca > 0 else 0.0
    if measure == "containment":
        return c
    if measure == "containment_dist":  # src/dashing.h:158-165
        return -math.log(c) * ksinv if c > 0 else 1.0
    if measure == "full_containment_dist":  # src/dashing.h:176-183
        return 1.0 - c**ksinv if c > 0 else 1.0
    sci_den = min(t0, t1) + t2
    sci = t2 / sci_den if sci_den > 0 else 0.0
    if measure == "symmetric_containment":  # src/dashing.h:562-566
        return sci
    if measure == "symmetric_containment_dist":
        return -math.log(sci) * ksinv if sci > 0 else 1.0
    raise ValueError(f"unknown measure: {measure}")


def compare(a, b, measure: str, ksinv: float = 1.0, estimator: str = "default") -> float:
    t0, t1, t2 = set_triple_any(a, b, estimator)
    return measure_from_triple(t0, t1, t2, measure, ksinv)


# ---------------------------------------------------------------------------
# Vectorized HLL batch kernel (the hot path of the pair stage)
# ---------------------------------------------------------------------------


def _sigma_vec(x: np.ndarray) -> np.ndarray:
    y = np.ones_like(x)
    z = x.copy()
    x = x.copy()
    for _ in range(64):
        x *= x
        z_prev = z.copy()
        z += x * y
        y += y
        if np.all((z == z_prev) | ~np.isfinite(z)):
            break
    z[x >= 1.0] = np.inf  # x==1 input ⇒ divergent series
    return z


def _tau_vec(x: np.ndarray) -> np.ndarray:
    out_zero = (x == 0.0) | (x == 1.0)
    x = x.copy()
    y = np.ones_like(x)
    z = 1.0 - x
    for _ in range(64):
        x = np.sqrt(x)
        z_prev = z.copy()
        y *= 0.5
        z -= ((1.0 - x) ** 2) * y
        if np.all(z == z_prev):
            break
    z /= 3.0
    z[out_zero] = 0.0
    return z


def hll_estimate_batch(regs: np.ndarray, p: int) -> np.ndarray:
    """Ertl improved-raw estimates for a (nrows, m) uint8 register matrix
    — whole-batch, no per-row Python. Used by the pair-comparison UDF."""
    nrows, m = regs.shape
    q = 64 - p
    # per-row histogram via one flat bincount
    offsets = (np.arange(nrows, dtype=np.int64) * (q + 2))[:, None]
    flat = (regs.astype(np.int64) + offsets).ravel()
    c = np.bincount(flat, minlength=nrows * (q + 2)).reshape(nrows, q + 2).astype(np.float64)
    denom = m * _tau_vec(1.0 - c[:, q + 1] / m)
    for k in range(q, 0, -1):
        denom += c[:, k]
        denom *= 0.5
    denom += m * _sigma_vec(c[:, 0] / m)
    alpha_inf = 1.0 / (2.0 * math.log(2.0))
    return alpha_inf * m * m / denom


def hll_triple_batch(
    a_regs: np.ndarray, b_regs: np.ndarray, p: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized set triples for row-aligned HLL register matrices."""
    u = np.maximum(a_regs, b_regs)
    ca = hll_estimate_batch(a_regs, p)
    cb = hll_estimate_batch(b_regs, p)
    cu = hll_estimate_batch(u, p)
    inter = np.maximum(0.0, ca + cb - cu)
    return np.maximum(0.0, cu - cb), np.maximum(0.0, cu - ca), inter


def measure_from_triple_batch(
    t0: np.ndarray, t1: np.ndarray, t2: np.ndarray, measure: str, ksinv: float = 1.0
) -> np.ndarray:
    """Vectorized measure_from_triple."""
    with np.errstate(divide="ignore", invalid="ignore"):
        union = t0 + t1 + t2
        ji = np.where(union > 0, t2 / union, 0.0)
        if measure == "ji":
            return ji
        if measure == "sizes":
            return t2
        if measure == "mash_dist":
            return np.where(ji > 0, -np.log(2 * ji / (1 + ji)) * ksinv, 1.0)
        if measure == "full_mash_dist":
            return np.where(ji > 0, 1.0 - (2 * ji / (1 + ji)) ** ksinv, 1.0)
        ca = t0 + t2
        c = np.where(ca > 0, t2 / ca, 0.0)
        if measure == "containment":
            return c
        if measure == "containment_dist":
            return np.where(c > 0, -np.log(c) * ksinv, 1.0)
        if measure == "full_containment_dist":
            return np.where(c > 0, 1.0 - c**ksinv, 1.0)
        sci_den = np.minimum(t0, t1) + t2
        sci = np.where(sci_den > 0, t2 / sci_den, 0.0)
        if measure == "symmetric_containment":
            return sci
        if measure == "symmetric_containment_dist":
            return np.where(sci > 0, -np.log(sci) * ksinv, 1.0)
    raise ValueError(f"unknown measure: {measure}")
