"""Bloom filter — packed-bitset membership sketch.

Reference: `--use-bf` sketch type (/root/reference/src/dashing.h:223-235);
`-S` is log2 *bits* there (src/sketch_and_cmp.h:43). Estimation formulas
are the standard ones (Bloom 1970; cardinality per Swamidass & Baldi;
Jaccard-from-BF per the README's citation, /root/reference/README.md:132).

State: uint64[m/64] bit words + k hash functions via double hashing
(h_i = h + i·h2, h2 odd — Kirsch & Mitzenmacher). Merge = bitwise OR:
commutative, idempotent, bit-identical under any merge tree.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from dashing_spark.functions.hashing import splitmix64

_MAGIC = b"DSH1"
TYPE_ID = 2

_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint64)


class BloomFilter:
    __slots__ = ("lg_bits", "k", "words")

    def __init__(self, lg_bits: int, k: int = 4, words: np.ndarray | None = None):
        if not 6 <= lg_bits <= 36:
            raise ValueError(f"lg_bits out of range: {lg_bits}")
        self.lg_bits = lg_bits
        self.k = k
        nwords = (1 << lg_bits) >> 6
        if words is None:
            words = np.zeros(nwords, dtype=np.uint64)
        else:
            words = np.asarray(words, dtype=np.uint64)
            if words.shape != (nwords,):
                raise ValueError("bitset shape mismatch")
        self.words = words

    @classmethod
    def empty(cls, lg_bits: int, k: int = 4) -> "BloomFilter":
        return cls(lg_bits, k)

    def _indices(self, h: np.ndarray) -> np.ndarray:
        """(k, n) bit indices via double hashing."""
        mask = np.uint64((1 << self.lg_bits) - 1)
        h = np.asarray(h, dtype=np.uint64)
        h2 = splitmix64(h) | np.uint64(1)
        with np.errstate(over="ignore"):
            return np.stack(
                [(h + np.uint64(i) * h2) & mask for i in range(self.k)]
            )

    def update_hashes(self, hashes: np.ndarray) -> "BloomFilter":
        if len(hashes) == 0:
            return self
        idx = self._indices(hashes).ravel()
        word = (idx >> np.uint64(6)).astype(np.int64)
        bit = np.left_shift(np.uint64(1), idx & np.uint64(63))
        np.bitwise_or.at(self.words, word, bit)
        return self

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership probe -> bool[n] (no false negatives)."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indices(hashes)
        word = (idx >> np.uint64(6)).astype(np.int64)
        bit = np.left_shift(np.uint64(1), idx & np.uint64(63))
        return ((self.words[word] & bit) != 0).all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (other.lg_bits, other.k) != (self.lg_bits, self.k):
            raise ValueError("cannot merge Bloom filters with different params")
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    def popcount(self) -> int:
        return int(_POPCNT8[self.words.view(np.uint8)].sum())

    def estimate(self, estimator: str = "default") -> float:
        """Cardinality: n ≈ -(m/k)·ln(1 - X/m), X = set bits."""
        m = float(1 << self.lg_bits)
        x = self.popcount()
        if x >= m:
            return math.inf
        return -(m / self.k) * math.log(1.0 - x / m)

    def to_bytes(self) -> bytes:
        return (
            _MAGIC
            + struct.pack("<BBB", TYPE_ID, self.lg_bits, self.k)
            + self.words.tobytes()
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "BloomFilter":
        if b[:4] != _MAGIC or b[4] != TYPE_ID:
            raise ValueError("not a Bloom sketch blob")
        lg_bits, k = b[5], b[6]
        nwords = (1 << lg_bits) >> 6
        words = np.frombuffer(b[7 : 7 + 8 * nwords], dtype=np.uint64).copy()
        return cls(lg_bits, k, words)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, BloomFilter)
            and (self.lg_bits, self.k) == (other.lg_bits, other.k)
            and bool(np.array_equal(self.words, other.words))
        )


def bloom_jaccard(a: BloomFilter, b: BloomFilter) -> float:
    """JI estimate from Bloom cardinalities via inclusion–exclusion on the
    OR-union filter (mirrors the HLL JI path, README.md:132)."""
    u = BloomFilter(a.lg_bits, a.k, np.bitwise_or(a.words, b.words))
    ca, cb, cu = a.estimate(), b.estimate(), u.estimate()
    inter = max(0.0, ca + cb - cu)
    return inter / cu if cu > 0 else 0.0
