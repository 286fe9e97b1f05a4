"""t-digest (Dunning & Ertl) — merging variant with the k1 scale function.

North-rule addition (BASELINE.md §b); no dashing counterpart. Centroids
(mean, weight) sorted by mean; the merge pass bounds each centroid's
k-size to 1 under k(q) = (δ/2π)·asin(2q−1), giving relative accuracy at
the tails. Incoming values buffer and are folded in by the same merge
pass, so update and merge share one code path. Deterministic given input
order.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_MAGIC = b"DSH1"
TYPE_ID = 7


class TDigest:
    __slots__ = ("delta", "means", "weights", "n", "buf")

    def __init__(self, delta: float = 100.0):
        if delta < 10:
            raise ValueError("delta must be >= 10")
        self.delta = float(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.n = 0.0
        self.buf: list[tuple[np.ndarray, np.ndarray]] = []

    @classmethod
    def empty(cls, delta: float = 100.0) -> "TDigest":
        return cls(delta)

    # -- scale function k1 and inverse -------------------------------------
    def _k(self, q: float) -> float:
        return self.delta / (2.0 * math.pi) * math.asin(2.0 * min(max(q, 0.0), 1.0) - 1.0)

    def _q(self, k: float) -> float:
        return 0.5 * (math.sin(2.0 * math.pi * k / self.delta) + 1.0)

    # -- core merge pass -----------------------------------------------------
    def _compress(self) -> None:
        if not self.buf:
            # the merge pass is idempotent on already-compressed
            # centroids (re-merging emitted centroids reproduces the
            # same boundaries), so re-running it per quantile()/rank()
            # call is pure wasted O(centroids) Python looping
            return
        parts_m = [self.means] + [m for m, _ in self.buf]
        parts_w = [self.weights] + [w for _, w in self.buf]
        self.buf = []
        m = np.concatenate(parts_m)
        w = np.concatenate(parts_w)
        if len(m) == 0:
            return
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        total = w.sum()
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w = float(m[0]), float(w[0])
        acc = 0.0
        limit = self._q(self._k(0.0) + 1.0) * total
        for i in range(1, len(m)):
            wi = float(w[i])
            if acc + cur_w + wi <= limit:
                cur_m += (float(m[i]) - cur_m) * wi / (cur_w + wi)
                cur_w += wi
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                acc += cur_w
                limit = self._q(self._k(acc / total) + 1.0) * total
                cur_m, cur_w = float(m[i]), wi
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m, dtype=np.float64)
        self.weights = np.asarray(out_w, dtype=np.float64)

    # -- API --------------------------------------------------------------------
    def update_batch(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        self.buf.append((v, np.ones(len(v), dtype=np.float64)))
        self.n += len(v)
        if sum(len(b[0]) for b in self.buf) >= 20 * self.delta:
            self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if other.delta != self.delta:
            raise ValueError("cannot merge t-digests with different delta")
        other._compress()
        if len(other.means):
            self.buf.append((other.means.copy(), other.weights.copy()))
        self.n += other.n
        self._compress()
        return self

    def quantile(self, q) -> np.ndarray | float:
        self._compress()
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if len(self.means) == 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        w = self.weights
        total = w.sum()
        # centroid centers in cumulative-weight space
        cum = np.cumsum(w) - w / 2.0
        targets = np.clip(qs, 0.0, 1.0) * total
        out = np.interp(targets, cum, self.means, left=self.means[0], right=self.means[-1])
        return float(out[0]) if scalar else out

    def rank(self, value: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return 0.0
        w = self.weights
        cum = np.cumsum(w) - w / 2.0
        r = np.interp(value, self.means, cum, left=0.0, right=w.sum())
        return float(r / w.sum())

    def estimate(self, estimator: str = "default") -> float:
        return float(self.n)

    # -- serde ---------------------------------------------------------------------
    def to_bytes(self) -> bytes:
        self._compress()
        head = struct.pack("<BdQI", TYPE_ID, self.delta, int(self.n), len(self.means))
        return b"".join([_MAGIC, head, self.means.tobytes(), self.weights.tobytes()])

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        if b[:4] != _MAGIC or b[4] != TYPE_ID:
            raise ValueError("not a t-digest blob")
        delta, n, nc = struct.unpack_from("<dQI", b, 5)
        off = 25
        if off + 16 * nc > len(b):
            # a truncated blob would yield len(weights) < len(means) and
            # crash later inside np.interp, far from the corruption site
            raise ValueError("truncated t-digest blob")
        s = cls(delta)
        s.n = float(n)
        s.means = np.frombuffer(b[off : off + 8 * nc], dtype=np.float64).copy()
        off += 8 * nc
        s.weights = np.frombuffer(b[off : off + 8 * nc], dtype=np.float64).copy()
        return s
