"""HeavyKeeper — top-k heavy-hitter sketch, the reference's CM alternative.

Reference: `dashing` carries HeavyKeeper alongside Count-Min as the
frequency filter backend (/root/reference/src/dashing.h:131-136).
Algorithm per Gong et al., "HeavyKeeper: An Accurate Algorithm for
Finding Top-k Elephant Flows" (USENIX ATC 2018): depth × width buckets
of (fingerprint, count); a colliding insert decays the occupant's count
with probability b^-count (b = 1.08) and claims the bucket when the
count reaches zero. Small flows die by exponential decay; elephants are
kept with near-exact counts (no CM-style over-estimation for the heavy
tail's benefit).

Spark adaptation (documented deviations from the per-packet original):

- **Batch-granularity updates.** Within an Arrow batch, per-item counts
  are aggregated first; each bucket then resolves ONE conflict per
  batch against the bucket's batch winner (the item with the largest
  batch count; the original would interleave per-insert). Decay for a
  batch of m colliding inserts against occupant count C applies
  floor(m·b^-C) decrements plus a probabilistically-rounded fractional
  one — same expectation as m sequential trials at the initial C,
  slightly conservative (under-decays as C shrinks), which only makes
  eviction harder, never inflates a kept count.
- **Counter-based randomness** (splitmix64 of the colliding
  fingerprints) — deterministic for a given stream split, so tests and
  retried tasks reproduce bit-identically.
- **Merge** is bucket-wise SpaceSaving-style: equal fingerprints sum;
  otherwise the larger count survives with the difference (ties keep
  the smaller fingerprint at count 0). Commutative; associative only
  approximately, like every compact top-k summary's merge.

Query returns the MAX count over depth rows whose fingerprint matches —
0 for never-kept items (one-sided: a returned count never exceeds the
true count by more than the decay noise bound of the paper's Thm 2).
"""

from __future__ import annotations

import struct

import numpy as np

from dashing_spark.functions.hashing import splitmix64

_MAGIC = b"DSH1"
TYPE_ID = 12
_B = 1.08  # decay base (paper's recommended default)


class HeavyKeeper:
    __slots__ = ("lg_width", "depth", "fps", "counts", "_draws")

    def __init__(
        self,
        lg_width: int = 12,
        depth: int = 2,
        fps: np.ndarray | None = None,
        counts: np.ndarray | None = None,
    ):
        if not 4 <= lg_width <= 28:
            raise ValueError(f"lg_width out of range: {lg_width}")
        if not 1 <= depth <= 8:
            raise ValueError(f"depth out of range: {depth}")
        self.lg_width = lg_width
        self.depth = depth
        w = 1 << lg_width
        self.fps = (
            np.zeros((depth, w), dtype=np.uint64) if fps is None else fps
        )
        self.counts = (
            np.zeros((depth, w), dtype=np.int64) if counts is None else counts
        )
        self._draws = 0  # per-call decay-draw counter (not serialized)

    @classmethod
    def empty(cls, lg_width: int = 12, depth: int = 2) -> "HeavyKeeper":
        return cls(lg_width, depth)

    def _buckets(self, h: np.ndarray, r: int) -> np.ndarray:
        mixed = splitmix64(h ^ np.uint64(0x9E3779B97F4A7C15 * (r + 1) & 0xFFFFFFFFFFFFFFFF))
        return (mixed >> np.uint64(64 - self.lg_width)).astype(np.int64)

    def update_hashes(self, hashes: np.ndarray, weights: np.ndarray | None = None) -> "HeavyKeeper":
        if len(hashes) == 0:
            return self
        h = np.asarray(hashes, dtype=np.uint64)
        if weights is None:
            u, m = np.unique(h, return_counts=True)
        else:
            # integer-count semantics (same as CMS): fractional weight
            # sums truncate toward zero — pass integer weights
            u, inv = np.unique(h, return_inverse=True)
            m = np.bincount(inv, weights=np.asarray(weights, dtype=np.float64))
        m = m.astype(np.int64)
        # per-call draw counter: the decay Bernoulli must not be a pure
        # function of the (challenger, occupant) fingerprints — for a
        # recurring collision pair with a steady rate, count and frac are
        # constant across batches, so a fp-only draw that lands dec=0
        # once lands dec=0 FOREVER and the challenger can never evict
        # (the "same expectation as sequential trials" claim breaks).
        # Mixing a counter re-rolls each batch; runs stay reproducible
        # (same update sequence -> same draws).
        self._draws += 1
        for r in range(self.depth):
            idx = self._buckets(u, r)
            # one winner per bucket this batch: largest m, ties by fp
            order = np.lexsort((u, -m, idx))
            bi = idx[order]
            first = np.ones(len(bi), dtype=bool)
            first[1:] = bi[1:] != bi[:-1]
            wsel = order[first]
            bw, fw, mw = idx[wsel], u[wsel], m[wsel]
            occ_f = self.fps[r, bw]
            occ_c = self.counts[r, bw]
            same = occ_f == fw
            occ_c[same] += mw[same]
            empty = (~same) & (occ_c <= 0)
            occ_f[empty] = fw[empty]
            occ_c[empty] = mw[empty]
            conflict = (~same) & (~empty)
            if conflict.any():
                c = occ_c[conflict].astype(np.float64)
                mc = mw[conflict].astype(np.float64)
                exp_dec = mc * np.power(_B, -c)
                base = np.floor(exp_dec)
                frac = exp_dec - base
                with np.errstate(over="ignore"):
                    salt = splitmix64(
                        np.uint64(((self._draws << 8) | r) & 0xFFFFFFFFFFFFFFFF)
                    )
                    draw = splitmix64(fw[conflict] ^ occ_f[conflict] ^ salt)
                dec = (base + (draw < frac * float(2**64))).astype(np.int64)
                new_c = occ_c[conflict] - dec
                evict = new_c <= 0
                # on eviction the claimant keeps m - C: each of the >= C
                # decrements consumed at least one insert, so this never
                # exceeds the sequential outcome's true batch count m
                kept = np.where(evict, np.maximum(mw[conflict] - occ_c[conflict], 1), new_c)
                f_sel = occ_f[conflict]
                f_sel = np.where(evict, fw[conflict], f_sel)
                occ_f[conflict] = f_sel
                occ_c[conflict] = kept
            self.fps[r, bw] = occ_f
            self.counts[r, bw] = occ_c
        return self

    def query_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Point estimates: max matching-fingerprint count over rows."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=np.int64)
        h = np.asarray(hashes, dtype=np.uint64)
        out = np.zeros(len(h), dtype=np.int64)
        for r in range(self.depth):
            idx = self._buckets(h, r)
            hit = self.fps[r, idx] == h
            np.maximum(out, np.where(hit, self.counts[r, idx], 0), out=out)
        return out

    def merge(self, other: "HeavyKeeper") -> "HeavyKeeper":
        if (other.lg_width, other.depth) != (self.lg_width, self.depth):
            raise ValueError("cannot merge HeavyKeeper with different params")
        same = self.fps == other.fps
        self.counts[same] += other.counts[same]
        diff = ~same
        a_c, b_c = self.counts, other.counts
        a_wins = diff & (a_c > b_c)
        b_wins = diff & (b_c > a_c)
        tie = diff & (a_c == b_c)
        self.counts[a_wins] = a_c[a_wins] - b_c[a_wins]
        self.fps[b_wins] = other.fps[b_wins]
        self.counts[b_wins] = b_c[b_wins] - a_c[b_wins]
        self.fps[tie] = np.minimum(self.fps[tie], other.fps[tie])
        self.counts[tie] = 0
        return self

    def estimate(self, estimator: str = "default") -> float:
        """Total retained mass (diagnostic; HK is a top-k structure)."""
        return float(self.counts[0].sum())

    def to_bytes(self) -> bytes:
        return (
            _MAGIC
            + struct.pack("<BBB", TYPE_ID, self.lg_width, self.depth)
            + self.fps.tobytes()
            + self.counts.tobytes()
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "HeavyKeeper":
        if b[:4] != _MAGIC or b[4] != TYPE_ID:
            raise ValueError("not a HeavyKeeper blob")
        lg_width, depth = b[5], b[6]
        w = 1 << lg_width
        off = 7
        fps = np.frombuffer(b[off : off + 8 * depth * w], dtype=np.uint64).reshape(
            depth, w
        ).copy()
        off += 8 * depth * w
        counts = np.frombuffer(b[off : off + 8 * depth * w], dtype=np.int64).reshape(
            depth, w
        ).copy()
        return cls(lg_width, depth, fps, counts)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, HeavyKeeper)
            and (self.lg_width, self.depth) == (other.lg_width, other.depth)
            and bool(np.array_equal(self.fps, other.fps))
            and bool(np.array_equal(self.counts, other.counts))
        )
