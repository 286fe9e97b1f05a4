"""SuperMinHash — the reference's BB_SUPERMINHASH sketch family.

Reference: `--use-super-minhash` (/root/reference/src/dashing.h:218,231);
algorithm from Ertl 2017, "SuperMinHash — A New Minwise Hashing
Algorithm for Jaccard Similarity Estimation" (arXiv:1706.05698).

Per element d, a d-seeded partial Fisher–Yates shuffle assigns the
stratified values (j + u_j), j = 0..m−1, u_j ~ U(0,1), to the m
registers in a random order; each register keeps the minimum over all
elements. Because one element's m values are a permutation of
{0+u_0, …, m−1+u_{m−1}} (negatively correlated across registers), the
matched-register Jaccard estimator has strictly lower variance than
classic m-permutation MinHash — a factor approaching 2 for n ≲ m.

Vectorization: the per-element shuffle is sequential in j, so the
kernel runs LOCKSTEP over a chunk of elements — step j processes column
j of a (chunk × m) permutation matrix with counter-based randomness
splitmix64(element_hash, j) (deterministic per element ⇒ the sketch is
a true monoid: same element always produces identical updates, any
merge tree is bit-identical). A global early exit stops at step j once
every register is < j (no later value j + u can win), so after the
registers warm up each chunk costs O(chunk · ĵ) with ĵ ≈ max register
value, not O(chunk · m).

State: float64[m] of register minima (+inf = empty). Merge =
elementwise min. Cardinality: each register is marginally the min of n
i.i.d. U(0, m) draws, so the (independence-approximate) MLE is
n̂ = −m / Σ_i ln(1 − v_i/m).
"""

from __future__ import annotations

import struct

import numpy as np

from dashing_spark.functions.hashing import splitmix64

_MAGIC = b"DSH1"
TYPE_ID = 10
_CHUNK = 4096


class SuperMinHash:
    __slots__ = ("m", "vals")

    def __init__(self, m: int = 1024, vals: np.ndarray | None = None):
        if m < 2:
            raise ValueError("m must be >= 2")
        self.m = m
        if vals is None:
            vals = np.full(m, np.inf, dtype=np.float64)
        else:
            vals = np.asarray(vals, dtype=np.float64)
            if vals.shape != (m,):
                raise ValueError("register shape mismatch")
        self.vals = vals

    @classmethod
    def empty(cls, m: int = 1024) -> "SuperMinHash":
        return cls(m)

    def update_hashes(self, hashes: np.ndarray) -> "SuperMinHash":
        if len(hashes) == 0:
            return self
        h = np.unique(np.asarray(hashes, dtype=np.uint64))
        for lo in range(0, len(h), _CHUNK):
            self._update_chunk(h[lo : lo + _CHUNK])
        return self

    def _update_chunk(self, h: np.ndarray) -> None:
        m = self.m
        n = len(h)
        p = np.tile(np.arange(m, dtype=np.int32), (n, 1))
        rows = np.arange(n)
        with np.errstate(over="ignore"):
            for j in range(m):
                # counter-based per-element randomness for step j
                s1 = splitmix64(h ^ splitmix64(np.full(n, 2 * j, dtype=np.uint64)))
                s2 = splitmix64(h ^ splitmix64(np.full(n, 2 * j + 1, dtype=np.uint64)))
                u = s1.astype(np.float64) / 2.0**64
                k = j + (s2 % np.uint64(m - j)).astype(np.int64)
                # rowwise swap p[:, j] <-> p[:, k]
                pj = p[:, j].copy()
                p[:, j] = p[rows, k]
                p[rows, k] = pj
                np.minimum.at(self.vals, p[:, j], j + u)
                # no later step can beat a register already below j+1
                if self.vals.max() < j + 1:
                    break

    def merge(self, other: "SuperMinHash") -> "SuperMinHash":
        if other.m != self.m:
            raise ValueError("cannot merge SuperMinHash with different m")
        np.minimum(self.vals, other.vals, out=self.vals)
        return self

    def estimate(self, estimator: str = "default") -> float:
        filled = np.isfinite(self.vals)
        if not filled.any():
            return 0.0
        # registers are marginally min of n U(0, m) draws
        s = float(np.log1p(-self.vals[filled] / self.m).sum())
        if s >= 0.0:
            return 0.0
        return -float(filled.sum()) / s

    def to_bytes(self) -> bytes:
        return _MAGIC + struct.pack("<BI", TYPE_ID, self.m) + self.vals.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "SuperMinHash":
        if b[:4] != _MAGIC or b[4] != TYPE_ID:
            raise ValueError("not a SuperMinHash blob")
        (m,) = struct.unpack_from("<I", b, 5)
        vals = np.frombuffer(b[9 : 9 + 8 * m], dtype=np.float64).copy()
        return cls(m, vals)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, SuperMinHash)
            and self.m == other.m
            and bool(np.array_equal(self.vals, other.vals))
        )


def smh_jaccard(a: SuperMinHash, b: SuperMinHash) -> float:
    """Matched-register Jaccard (values are continuous, so cross-set
    ties have probability 0: a match means the same element set it)."""
    if a.m != b.m:
        raise ValueError("size mismatch")
    both = np.isfinite(a.vals) & np.isfinite(b.vals)
    either = np.isfinite(a.vals) | np.isfinite(b.vals)
    ne = int(either.sum())
    if ne == 0:
        return 0.0
    match = (a.vals == b.vals) & both
    return float(match.sum()) / float(ne)
