"""KLL quantile sketch (Karnin, Lang & Liberty 2016).

A north-rule addition with no dashing counterpart (BASELINE.md §b): rank
error ≤ ε·n with prob 1−δ at space O((1/ε)·√log(1/δ)). This
implementation uses the standard compactor-stack layout with capacity
schedule c^(H−1−i)·k (c = 2/3) and a *derandomized* compaction coin
(counter-fed splitmix64), making the sketch a deterministic function of
the input sequence — required for reproducible pipelines; the ε bound is
preserved in practice and verified against exact ranks in tests.

Merge = concatenate compactor levels then recompress. Estimates are
order-dependent only within the ε band (tests assert the band, not
bit-identity — see FIXTURES.md §5).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from dashing_spark.functions.hashing import splitmix64

_MAGIC = b"DSH1"
TYPE_ID = 6
_C = 2.0 / 3.0


class KLL:
    __slots__ = ("k", "levels", "n", "coin_ctr")

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self.coin_ctr = 0

    @classmethod
    def empty(cls, k: int = 200) -> "KLL":
        return cls(k)

    # -- internals ---------------------------------------------------------
    def _cap(self, level: int) -> int:
        h = len(self.levels)
        return max(2, int(math.ceil(self.k * (_C ** (h - level - 1)))))

    def _coin(self) -> int:
        bit = int(splitmix64(np.array([self.coin_ctr], dtype=np.uint64))[0]) & 1
        self.coin_ctr += 1
        return bit

    def _compress(self) -> None:
        while True:
            total_cap = sum(self._cap(i) for i in range(len(self.levels)))
            if sum(len(lv) for lv in self.levels) <= total_cap:
                return
            for i, lv in enumerate(self.levels):
                if len(lv) > self._cap(i):
                    if i + 1 == len(self.levels):
                        self.levels.append(np.empty(0, dtype=np.float64))
                    srt = np.sort(lv)
                    off = self._coin()
                    keep = srt[off::2]
                    self.levels[i] = np.empty(0, dtype=np.float64)
                    self.levels[i + 1] = np.concatenate([self.levels[i + 1], keep])
                    break
            else:
                return

    # -- API ----------------------------------------------------------------
    def update_batch(self, values: np.ndarray) -> "KLL":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += len(v)
        self._compress()
        return self

    def merge(self, other: "KLL") -> "KLL":
        if other.k != self.k:
            raise ValueError("cannot merge KLL sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, lv in enumerate(other.levels):
            if len(lv):
                self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self.coin_ctr = max(self.coin_ctr, other.coin_ctr)
        self._compress()
        return self

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for i, lv in enumerate(self.levels):
            if len(lv):
                items.append(lv)
                weights.append(np.full(len(lv), 1 << i, dtype=np.float64))
        if not items:
            return np.empty(0), np.empty(0)
        it = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], w[order]

    def quantile(self, q) -> np.ndarray | float:
        """Value(s) at normalized rank(s) q ∈ [0,1]."""
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        it, w = self._weighted_items()
        if len(it) == 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        cw = np.cumsum(w)
        targets = np.clip(qs, 0.0, 1.0) * cw[-1]
        pos = np.searchsorted(cw, targets, side="left")
        pos = np.clip(pos, 0, len(it) - 1)
        out = it[pos]
        return float(out[0]) if scalar else out

    def rank(self, value: float) -> float:
        """Estimated normalized rank of `value` (fraction ≤ value)."""
        it, w = self._weighted_items()
        if len(it) == 0:
            return 0.0
        pos = np.searchsorted(it, value, side="right")
        return float(w[:pos].sum() / w.sum())

    def estimate(self, estimator: str = "default") -> float:
        return float(self.n)

    # -- serde ----------------------------------------------------------------
    def to_bytes(self) -> bytes:
        head = struct.pack("<BIQI", TYPE_ID, self.k, self.n, len(self.levels))
        parts = [_MAGIC, head, struct.pack("<Q", self.coin_ctr)]
        for lv in self.levels:
            parts.append(struct.pack("<I", len(lv)))
            parts.append(lv.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, b: bytes) -> "KLL":
        if b[:4] != _MAGIC or b[4] != TYPE_ID:
            raise ValueError("not a KLL sketch blob")
        k, n, nlev = struct.unpack_from("<IQI", b, 5)
        (coin,) = struct.unpack_from("<Q", b, 21)
        s = cls(k)
        s.n = n
        s.coin_ctr = coin
        off = 29
        s.levels = []
        for _ in range(nlev):
            (m,) = struct.unpack_from("<I", b, off)
            off += 4
            if off + 8 * m > len(b):
                # a silently-short frombuffer slice would deserialize
                # fewer items than the recorded level length while n
                # still claims the full count — wrong quantiles, no error
                raise ValueError("truncated KLL blob")
            s.levels.append(np.frombuffer(b[off : off + 8 * m], dtype=np.float64).copy())
            off += 8 * m
        if not s.levels:
            s.levels = [np.empty(0, dtype=np.float64)]
        return s
