"""Counting range MinHash — dashing's COUNTING_RANGE_MINHASH.

Reference: sketch type enum /root/reference/src/dashing.h:223-235; its
pairwise similarity is histogram intersection over the retained
(hash, count) pairs (`histogram_intersection`, src/dashing.h:142-144).
A KMV bottom-k sketch whose entries carry multiplicities: the k smallest
distinct item hashes, each with the total count of occurrences seen.

Monoid: merge = union of hash sets with count addition, truncated to the
k smallest — deterministic, so merges are bit-identical under any
partitioning (count addition is exact). Distinct-cardinality estimate is
the usual KMV k-th minimum; weighted (multiset) Jaccard is estimated by
histogram intersection over the union's bottom-k sample.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"DSH1"
TYPE_ID = 8
_U64_MAX = float(2**64)


class CountingKMV:
    __slots__ = ("k", "mins", "counts")

    def __init__(self, k: int = 1024, mins: np.ndarray | None = None, counts: np.ndarray | None = None):
        if k < 2:
            raise ValueError("k must be >= 2")
        self.k = k
        self.mins = (
            np.empty(0, dtype=np.uint64) if mins is None else np.asarray(mins, dtype=np.uint64)
        )
        self.counts = (
            np.empty(0, dtype=np.int64) if counts is None else np.asarray(counts, dtype=np.int64)
        )

    @classmethod
    def empty(cls, k: int = 1024) -> "CountingKMV":
        return cls(k)

    def _combine(self, hashes: np.ndarray, counts: np.ndarray) -> None:
        h = np.concatenate([self.mins, hashes])
        c = np.concatenate([self.counts, counts])
        order = np.argsort(h, kind="stable")
        h, c = h[order], c[order]
        uniq_mask = np.empty(len(h), dtype=bool)
        if len(h):
            uniq_mask[0] = True
            uniq_mask[1:] = h[1:] != h[:-1]
        group_ids = np.cumsum(uniq_mask) - 1
        sums = np.zeros(int(group_ids[-1]) + 1 if len(h) else 0, dtype=np.int64)
        np.add.at(sums, group_ids, c)
        hu = h[uniq_mask]
        self.mins = hu[: self.k]
        self.counts = sums[: self.k]

    def update_hashes(self, hashes: np.ndarray, weights: np.ndarray | None = None) -> "CountingKMV":
        if len(hashes) == 0:
            return self
        h = np.asarray(hashes, dtype=np.uint64)
        if weights is None:
            hu, cu = np.unique(h, return_counts=True)
            cu = cu.astype(np.int64)
        else:
            # integer-count semantics (same as CMS/HeavyKeeper):
            # fractional weights truncate toward zero — pass integers
            order = np.argsort(h, kind="stable")
            hs, ws = h[order], np.asarray(weights, dtype=np.int64)[order]
            mask = np.empty(len(hs), dtype=bool)
            mask[0] = True
            mask[1:] = hs[1:] != hs[:-1]
            gid = np.cumsum(mask) - 1
            cu = np.zeros(int(gid[-1]) + 1, dtype=np.int64)
            np.add.at(cu, gid, ws)
            hu = hs[mask]
        self._combine(hu, cu)
        return self

    def merge(self, other: "CountingKMV") -> "CountingKMV":
        if other.k != self.k:
            raise ValueError("cannot merge CountingKMV with different k")
        self._combine(other.mins, other.counts)
        return self

    def estimate(self, estimator: str = "default") -> float:
        n = len(self.mins)
        if n < self.k:
            return float(n)
        kth = float(self.mins[self.k - 1]) + 1.0
        return (self.k - 1) * _U64_MAX / kth

    def total_weight(self) -> int:
        return int(self.counts.sum())

    def to_bytes(self) -> bytes:
        return (
            _MAGIC
            + struct.pack("<BII", TYPE_ID, self.k, len(self.mins))
            + self.mins.tobytes()
            + self.counts.tobytes()
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountingKMV":
        if b[:4] != _MAGIC or b[4] != TYPE_ID:
            raise ValueError("not a CountingKMV blob")
        k, n = struct.unpack_from("<II", b, 5)
        off = 13
        mins = np.frombuffer(b[off : off + 8 * n], dtype=np.uint64).copy()
        off += 8 * n
        counts = np.frombuffer(b[off : off + 8 * n], dtype=np.int64).copy()
        return cls(k, mins, counts)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, CountingKMV)
            and self.k == other.k
            and bool(np.array_equal(self.mins, other.mins))
            and bool(np.array_equal(self.counts, other.counts))
        )


def crmh_histogram_intersection(a: CountingKMV, b: CountingKMV) -> float:
    """Weighted-Jaccard estimate: Σ min(ca,cb) / Σ max(ca,cb) over the
    union's bottom-k hashes (histogram_intersection semantics,
    /root/reference/src/dashing.h:142-144). Exact when the union has
    fewer than k distinct hashes."""
    k = min(a.k, b.k)
    hu = np.union1d(a.mins, b.mins)[:k]
    if len(hu) == 0:
        return 0.0

    def lookup(sk: CountingKMV) -> np.ndarray:
        out = np.zeros(len(hu), dtype=np.int64)
        if len(sk.mins):
            i = np.searchsorted(sk.mins, hu)
            hit = (i < len(sk.mins)) & (sk.mins[np.minimum(i, len(sk.mins) - 1)] == hu)
            out[hit] = sk.counts[i[hit]]
        return out

    ca, cb = lookup(a), lookup(b)
    smax = np.maximum(ca, cb).sum()
    if smax == 0:
        return 0.0
    return float(np.minimum(ca, cb).sum() / smax)
