"""Count-min sketch — frequency estimation + min-count pre-filter.

Reference semantics: the CM filter gates sketch insertion
(`if(cm.addh(kmer) >= mincount) sketch.addh(kmer)`,
/root/reference/src/sketch_and_cmp.h:347; defaults 2^20 counters / 1 hash
src/dashing.cpp:73-75). Error bound: point query ≤ εN with prob ≥ 1−δ at
width=⌈e/ε⌉, depth=⌈ln(1/δ)⌉ (Cormode & Muthukrishnan 2005).

State: int64[depth, width] counter matrix; row hashes via seeded
splitmix64. Merge = elementwise add — an exact commutative monoid, so
merged state is bit-identical under any partitioning.
"""

from __future__ import annotations

import struct

import numpy as np

from dashing_spark.functions.hashing import hash_int_array

_MAGIC = b"DSH1"
TYPE_ID = 3


class CountMinSketch:
    __slots__ = ("lg_width", "depth", "counts")

    def __init__(self, lg_width: int = 16, depth: int = 4, counts: np.ndarray | None = None):
        if not 4 <= lg_width <= 28:
            raise ValueError(f"lg_width out of range: {lg_width}")
        self.lg_width = lg_width
        self.depth = depth
        shape = (depth, 1 << lg_width)
        if counts is None:
            counts = np.zeros(shape, dtype=np.int64)
        else:
            counts = np.asarray(counts, dtype=np.int64)
            if counts.shape != shape:
                raise ValueError("counter matrix shape mismatch")
        self.counts = counts

    @classmethod
    def empty(cls, lg_width: int = 16, depth: int = 4) -> "CountMinSketch":
        return cls(lg_width, depth)

    def _row_indices(self, h: np.ndarray) -> np.ndarray:
        mask = np.uint64((1 << self.lg_width) - 1)
        h = np.asarray(h, dtype=np.uint64)
        return np.stack(
            [
                (hash_int_array(h, seed=0xC0FFEE + 0x9E37 * i) & mask).astype(np.int64)
                for i in range(self.depth)
            ]
        )

    def update_hashes(self, hashes: np.ndarray, weights: np.ndarray | None = None) -> "CountMinSketch":
        if len(hashes) == 0:
            return self
        idx = self._row_indices(hashes)
        if weights is None:
            w = np.ones(len(hashes), dtype=np.int64)
        else:
            w = np.asarray(weights, dtype=np.int64)
        for r in range(self.depth):
            np.add.at(self.counts[r], idx[r], w)
        return self

    def query_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized point queries -> int64[n] (never underestimates)."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=np.int64)
        idx = self._row_indices(hashes)
        ests = np.stack([self.counts[r][idx[r]] for r in range(self.depth)])
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.lg_width, other.depth) != (self.lg_width, self.depth):
            raise ValueError("cannot merge CM sketches with different params")
        self.counts += other.counts
        return self

    def total(self) -> int:
        """N = total added weight (exact; any single row sums to it)."""
        return int(self.counts[0].sum())

    def error_bound(self, delta_rows: int | None = None) -> float:
        """ε·N guarantee: ε = e / width."""
        return float(np.e) / float(1 << self.lg_width) * self.total()

    def estimate(self, estimator: str = "default") -> float:
        return float(self.total())

    def to_bytes(self) -> bytes:
        return (
            _MAGIC
            + struct.pack("<BBB", TYPE_ID, self.lg_width, self.depth)
            + self.counts.tobytes()
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountMinSketch":
        if b[:4] != _MAGIC or b[4] != TYPE_ID:
            raise ValueError("not a CM sketch blob")
        lg_width, depth = b[5], b[6]
        n = depth * (1 << lg_width)
        counts = (
            np.frombuffer(b[7 : 7 + 8 * n], dtype=np.int64)
            .reshape(depth, 1 << lg_width)
            .copy()
        )
        return cls(lg_width, depth, counts)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, CountMinSketch)
            and (self.lg_width, self.depth) == (other.lg_width, other.depth)
            and bool(np.array_equal(self.counts, other.counts))
        )
