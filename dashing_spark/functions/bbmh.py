"""b-bit one-permutation MinHash — the reference's BB_MINHASH.

Reference: `--use-bb-minhash`, b = `--bbits` default 16
(/root/reference/src/dashing.h:254, :466-470). Semantics per Li & König
2010 (b-bit minwise hashing) with one-permutation bucketing: the hash
space is split into r buckets by the top bits; each bucket keeps the min
hash seen. JI from the fraction of matching b-bit register truncations,
collision-corrected: J = (match − 2^-b) / (1 − 2^-b).

State: uint64[r] of per-bucket minima (UINT64_MAX = empty). Merge =
elementwise min — commutative, idempotent, bit-identical.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"DSH1"
TYPE_ID = 5
_EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)


class BBitMinHash:
    __slots__ = ("lg_r", "b", "mins")

    def __init__(self, lg_r: int = 10, b: int = 16, mins: np.ndarray | None = None):
        if not 2 <= lg_r <= 20:
            raise ValueError(f"lg_r out of range: {lg_r}")
        self.lg_r = lg_r
        self.b = b
        r = 1 << lg_r
        if mins is None:
            mins = np.full(r, _EMPTY, dtype=np.uint64)
        else:
            mins = np.asarray(mins, dtype=np.uint64)
            if mins.shape != (r,):
                raise ValueError("register shape mismatch")
        self.mins = mins

    @classmethod
    def empty(cls, lg_r: int = 10, b: int = 16) -> "BBitMinHash":
        return cls(lg_r, b)

    def update_hashes(self, hashes: np.ndarray) -> "BBitMinHash":
        if len(hashes) == 0:
            return self
        h = np.asarray(hashes, dtype=np.uint64)
        bucket = (h >> np.uint64(64 - self.lg_r)).astype(np.int64)
        np.minimum.at(self.mins, bucket, h)
        return self

    def merge(self, other: "BBitMinHash") -> "BBitMinHash":
        if (other.lg_r, other.b) != (self.lg_r, self.b):
            raise ValueError("cannot merge BBitMinHash with different params")
        np.minimum(self.mins, other.mins, out=self.mins)
        return self

    def estimate(self, estimator: str = "default") -> float:
        """Cardinality from per-bucket minima: within a bucket of rate
        n/r, E[min/U64] = 1/(n/r + 1); average over non-empty buckets and
        correct by the empty-bucket fraction (linear-counting regime)."""
        r = 1 << self.lg_r
        filled = self.mins != _EMPTY
        nf = int(filled.sum())
        if nf == 0:
            return 0.0
        if nf < r:
            # linear counting on empty buckets dominates at low load
            import math

            return r * math.log(r / (r - nf))
        # bucket i holds hashes uniform in [i/r, (i+1)/r): rescale each min
        # to its bucket-local (0,1) range, then min-of-m-uniforms ⇒
        # E[local_min] = 1/(m+1) with m = n/r.
        base = np.arange(r, dtype=np.uint64) << np.uint64(64 - self.lg_r)
        local = (self.mins - base).astype(np.float64) * (r / float(2**64))
        mean_min = float(local.mean())
        if mean_min <= 0.0:
            return float("inf")
        return r * max(0.0, 1.0 / mean_min - 1.0)

    def b_registers(self) -> np.ndarray:
        """Lowest b bits of each register (the compared signature)."""
        mask = np.uint64((1 << self.b) - 1)
        return self.mins & mask

    def to_bytes(self) -> bytes:
        return (
            _MAGIC
            + struct.pack("<BBB", TYPE_ID, self.lg_r, self.b)
            + self.mins.tobytes()
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "BBitMinHash":
        if b[:4] != _MAGIC or b[4] != TYPE_ID:
            raise ValueError("not a BBitMinHash blob")
        lg_r, bb = b[5], b[6]
        r = 1 << lg_r
        mins = np.frombuffer(b[7 : 7 + 8 * r], dtype=np.uint64).copy()
        return cls(lg_r, bb, mins)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, BBitMinHash)
            and (self.lg_r, self.b) == (other.lg_r, other.b)
            and bool(np.array_equal(self.mins, other.mins))
        )


def bbmh_jaccard(a: BBitMinHash, b: BBitMinHash) -> float:
    """Collision-corrected matching-register JI (Li & König 2010;
    mirrors FinalBBitMinHash::jaccard_index, /root/reference/src/dashing.h:493-494)."""
    if (a.lg_r, a.b) != (b.lg_r, b.b):
        raise ValueError("param mismatch")
    both = (a.mins != _EMPTY) & (b.mins != _EMPTY)
    either = (a.mins != _EMPTY) | (b.mins != _EMPTY)
    n_either = int(either.sum())
    if n_either == 0:
        return 0.0
    match = (a.b_registers() == b.b_registers()) & both
    frac = float(match.sum()) / float(n_either)
    c = 2.0 ** (-a.b)
    return max(0.0, (frac - c) / (1.0 - c))
