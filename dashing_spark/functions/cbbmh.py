"""Counting b-bit one-permutation MinHash — COUNTING_BB_MINHASH.

Reference enum: /root/reference/src/dashing.h:233 (CountingBBitMinHasher,
selected by `--use-counting-bb-minhash`): the b-bit minhash state plus a
per-bucket multiplicity counter, so matched registers can be weighted by
occurrence counts — the multiset (weighted-Jaccard) analogue of BBMH,
mirroring how CRMH extends KMV.

State: uint64[r] per-bucket minima (UINT64_MAX = empty) + uint32[r]
counts of how many times the current minimum was observed. Merge keeps
the smaller minimum; equal minima ADD counts — a commutative monoid
(same-element multiplicities accumulate exactly like a counter).

Weighted similarity: on registers where the b-bit truncations match,
the pair behaves like a multiset intersection sample; the Ruzicka-style
estimate is Σ min(ca, cb) over matching registers divided by
Σ max(ca, cb) over registers where either side is filled (collision-
corrected like plain BBMH).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"DSH1"
TYPE_ID = 11
_EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)


class CountingBBitMinHash:
    __slots__ = ("lg_r", "b", "mins", "counts")

    def __init__(
        self,
        lg_r: int = 10,
        b: int = 16,
        mins: np.ndarray | None = None,
        counts: np.ndarray | None = None,
    ):
        if not 2 <= lg_r <= 20:
            raise ValueError(f"lg_r out of range: {lg_r}")
        self.lg_r = lg_r
        self.b = b
        r = 1 << lg_r
        self.mins = (
            np.full(r, _EMPTY, dtype=np.uint64)
            if mins is None
            else np.asarray(mins, dtype=np.uint64)
        )
        self.counts = (
            np.zeros(r, dtype=np.uint32)
            if counts is None
            else np.asarray(counts, dtype=np.uint32)
        )
        if self.mins.shape != (r,) or self.counts.shape != (r,):
            raise ValueError("register shape mismatch")

    @classmethod
    def empty(cls, lg_r: int = 10, b: int = 16) -> "CountingBBitMinHash":
        return cls(lg_r, b)

    def update_hashes(self, hashes: np.ndarray) -> "CountingBBitMinHash":
        """Add a batch of item hashes (multiset: duplicates count)."""
        if len(hashes) == 0:
            return self
        h = np.asarray(hashes, dtype=np.uint64)
        bucket = (h >> np.uint64(64 - self.lg_r)).astype(np.int64)
        # batch-local minima and their multiplicities, then one merge
        order = np.lexsort((h, bucket))
        hb, bb = h[order], bucket[order]
        first = np.ones(len(hb), dtype=bool)
        first[1:] = bb[1:] != bb[:-1]
        starts = np.flatnonzero(first)
        batch_min = hb[starts]
        batch_bucket = bb[starts]
        # multiplicity of the bucket-min value within the batch
        is_min = hb == np.repeat(batch_min, np.diff(np.append(starts, len(hb))))
        cnt = np.add.reduceat(is_min.astype(np.int64), starts)
        self._merge_arrays(batch_bucket, batch_min, cnt)
        return self

    def _merge_arrays(self, buckets: np.ndarray, mins: np.ndarray, cnts: np.ndarray):
        cur = self.mins[buckets]
        smaller = mins < cur
        equal = mins == cur
        idx_s = buckets[smaller]
        self.mins[idx_s] = mins[smaller]
        self.counts[idx_s] = cnts[smaller]
        idx_e = buckets[equal]
        self.counts[idx_e] += cnts[equal].astype(np.uint32)

    def merge(self, other: "CountingBBitMinHash") -> "CountingBBitMinHash":
        if (other.lg_r, other.b) != (self.lg_r, self.b):
            raise ValueError("cannot merge CountingBBitMinHash with different params")
        smaller = other.mins < self.mins
        equal = (other.mins == self.mins) & (self.mins != _EMPTY)
        self.mins[smaller] = other.mins[smaller]
        self.counts[smaller] = other.counts[smaller]
        self.counts[equal] += other.counts[equal]
        return self

    def b_registers(self) -> np.ndarray:
        mask = np.uint64((1 << self.b) - 1)
        return self.mins & mask

    def estimate(self, estimator: str = "default") -> float:
        """Distinct-item estimate (same estimator family as BBMH)."""
        from dashing_spark.functions.bbmh import BBitMinHash

        return BBitMinHash(self.lg_r, self.b, self.mins.copy()).estimate(estimator)

    def to_bytes(self) -> bytes:
        return (
            _MAGIC
            + struct.pack("<BBB", TYPE_ID, self.lg_r, self.b)
            + self.mins.tobytes()
            + self.counts.tobytes()
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountingBBitMinHash":
        if blob[:4] != _MAGIC or blob[4] != TYPE_ID:
            raise ValueError("not a CountingBBitMinHash blob")
        lg_r, b = blob[5], blob[6]
        r = 1 << lg_r
        off = 7
        mins = np.frombuffer(blob[off : off + 8 * r], dtype=np.uint64).copy()
        counts = np.frombuffer(blob[off + 8 * r : off + 12 * r], dtype=np.uint32).copy()
        return cls(lg_r, b, mins, counts)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, CountingBBitMinHash)
            and (self.lg_r, self.b) == (other.lg_r, other.b)
            and bool(np.array_equal(self.mins, other.mins))
            and bool(np.array_equal(self.counts, other.counts))
        )


def cbbmh_weighted_jaccard(a: CountingBBitMinHash, b: CountingBBitMinHash) -> float:
    """Ruzicka-style weighted JI from matched b-bit registers."""
    if (a.lg_r, a.b) != (b.lg_r, b.b):
        raise ValueError("param mismatch")
    fa = a.mins != _EMPTY
    fb = b.mins != _EMPTY
    either = fa | fb
    if not either.any():
        return 0.0
    match = (a.b_registers() == b.b_registers()) & fa & fb
    ca = a.counts.astype(np.float64)
    cb = b.counts.astype(np.float64)
    num = np.minimum(ca, cb)[match].sum()
    den = (
        np.maximum(np.where(fa, ca, 0.0), np.where(fb, cb, 0.0))[either].sum()
    )
    if den <= 0.0:
        return 0.0
    raw = float(num / den)
    c = 2.0 ** (-a.b)
    return max(0.0, (raw - c) / (1.0 - c))
