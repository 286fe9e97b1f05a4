"""KMV / bottom-k MinHash — the reference's RANGE_MINHASH.

Reference: `--use-range-minhash` keeps the k smallest 64-bit hashes
(/root/reference/src/dashing.h:42, src/sketch_and_cmp.h:44). Cardinality
via the k-th minimum value estimator (Bar-Yossef et al. 2002 / Beyer et
al. 2007): n ≈ (k-1) / U_(k) with hashes mapped to (0,1). Jaccard via the
union's bottom-k (Broder 1997).

State: sorted ascending uint64 array of ≤ k distinct smallest hashes.
Merge = sorted-unique of the concatenation, truncated to k — a
deterministic commutative monoid, bit-identical under any merge tree.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"DSH1"
TYPE_ID = 4
_U64_MAX = float(2**64)


class KMV:
    __slots__ = ("k", "mins")

    def __init__(self, k: int = 1024, mins: np.ndarray | None = None):
        if k < 2:
            raise ValueError("k must be >= 2")
        self.k = k
        if mins is None:
            mins = np.empty(0, dtype=np.uint64)
        self.mins = np.asarray(mins, dtype=np.uint64)

    @classmethod
    def empty(cls, k: int = 1024) -> "KMV":
        return cls(k)

    def update_hashes(self, hashes: np.ndarray) -> "KMV":
        if len(hashes) == 0:
            return self
        h = np.asarray(hashes, dtype=np.uint64)
        self.mins = np.unique(np.concatenate([self.mins, h]))[: self.k]
        return self

    def merge(self, other: "KMV") -> "KMV":
        if other.k != self.k:
            raise ValueError("cannot merge KMV sketches with different k")
        self.mins = np.unique(np.concatenate([self.mins, other.mins]))[: self.k]
        return self

    def estimate(self, estimator: str = "default") -> float:
        n = len(self.mins)
        if n < self.k:
            return float(n)  # saw fewer than k distinct hashes: exact
        kth = float(self.mins[self.k - 1]) + 1.0
        return (self.k - 1) * _U64_MAX / kth

    def to_bytes(self) -> bytes:
        return (
            _MAGIC
            + struct.pack("<BII", TYPE_ID, self.k, len(self.mins))
            + self.mins.tobytes()
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "KMV":
        if b[:4] != _MAGIC or b[4] != TYPE_ID:
            raise ValueError("not a KMV sketch blob")
        k, n = struct.unpack_from("<II", b, 5)
        mins = np.frombuffer(b[13 : 13 + 8 * n], dtype=np.uint64).copy()
        return cls(k, mins)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, KMV)
            and self.k == other.k
            and bool(np.array_equal(self.mins, other.mins))
        )


def kmv_jaccard(a: KMV, b: KMV) -> float:
    """JI from the union's bottom-k: |X ∩ A ∩ B| / |X|, X = bottom-k(A∪B)."""
    if len(a.mins) == 0 or len(b.mins) == 0:
        return 0.0
    k = min(a.k, b.k)
    union = np.unique(np.concatenate([a.mins, b.mins]))[:k]
    in_both = np.isin(union, a.mins) & np.isin(union, b.mins)
    return float(in_both.sum()) / float(len(union))


def kmv_set_triple(a: KMV, b: KMV) -> tuple[float, float, float]:
    """(|A\\B|, |B\\A|, |A∩B|) estimates: JI from the union sample scaled
    by the union-cardinality estimate (mirrors the exact-set path,
    /root/reference/src/khset64.h:129-141, at sketch precision)."""
    u = KMV(min(a.k, b.k), np.unique(np.concatenate([a.mins, b.mins]))[: min(a.k, b.k)])
    cu = u.estimate()
    ji = kmv_jaccard(a, b)
    inter = ji * cu
    ca, cb = a.estimate(), b.estimate()
    return max(0.0, ca - inter), max(0.0, cb - inter), inter
