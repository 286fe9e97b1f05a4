"""HyperLogLog with Ertl estimators — the reference's default sketch.

Semantics pinned by the reference's call sites (sketch construction
/root/reference/src/dashing.h:453-465, estimator flags
src/distmain.cpp:59-62, default Ertl-MLE src/distmain.cpp:37-38, register
fold `dashing fold` src/dashing.cpp:570-590) and by the published papers:
Flajolet et al. 2007 (original estimator) and Ertl 2017, arXiv:1702.01284
(improved raw estimator §2, Poisson MLE §3). The implementation is
whole-array numpy — a brand-new kernel, not a translation.

State: ``uint8[m]`` register array, m = 2**p. An item hash h is split as
  index = h >> (64 - p)            (top p bits)
  rank  = #leading zeros of the remaining 64-p bits, + 1, capped at 64-p+1
Registers keep the max rank seen — a commutative idempotent monoid, so
merge = elementwise max and any merge tree yields bit-identical state.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_MAGIC = b"DSH1"
TYPE_ID = 1


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 -> 0)."""
    x = x.copy()
    out = np.zeros(x.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        t = x >> np.uint64(shift)
        gt = t > 0
        out[gt] += shift
        x[gt] = t[gt]
    out += (x > 0).astype(np.int64)
    return out


def hash_idx_rank(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hashes -> (register index, rank) under THE hash-to-register
    convention: idx = top p bits; rank = leading zeros of the remaining
    64-p bits + 1, capped at 64-p+1. The single source of truth — both
    HLL.update_hashes and the readfilt per-row register build
    (operators/filter.py) call this, so the two can never leave the
    same hash family."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # bit_length(rest)=64-lz; rest==0 -> rank = 64-p+1 (the cap).
    rank = np.minimum(
        np.uint8(64 - p + 1),
        (65 - _bit_length_u64(rest)).astype(np.uint8),
    )
    return idx, rank


class HLL:
    """Mergeable HyperLogLog register array."""

    __slots__ = ("p", "regs")

    def __init__(self, p: int, regs: np.ndarray | None = None):
        if not 4 <= p <= 24:
            raise ValueError(f"p out of range: {p}")
        self.p = p
        m = 1 << p
        if regs is None:
            regs = np.zeros(m, dtype=np.uint8)
        else:
            regs = np.asarray(regs, dtype=np.uint8)
            if regs.shape != (m,):
                raise ValueError("register array shape mismatch")
        self.regs = regs

    # -- construction ---------------------------------------------------
    @classmethod
    def empty(cls, p: int) -> "HLL":
        return cls(p)

    def update_hashes(self, hashes: np.ndarray) -> "HLL":
        """Add a batch of uint64 item hashes (vectorized)."""
        if len(hashes) == 0:
            return self
        idx, rank = hash_idx_rank(np.asarray(hashes, dtype=np.uint64), self.p)
        np.maximum.at(self.regs, idx, rank)
        return self

    # -- monoid ----------------------------------------------------------
    def merge(self, other: "HLL") -> "HLL":
        if other.p != self.p:
            raise ValueError(
                f"cannot merge HLL(p={self.p}) with HLL(p={other.p}); "
                "fold first (reference requires same-size merges, README.md:71-73)"
            )
        np.maximum(self.regs, other.regs, out=self.regs)
        return self

    def fold(self, p_new: int) -> "HLL":
        """Compress to a smaller precision (mirrors `dashing fold`,
        /root/reference/src/dashing.cpp:570-590: new register = max over
        the 2**(p-p') old registers that share the new index bits)."""
        if p_new > self.p:
            raise ValueError("fold can only reduce precision")
        if p_new == self.p:
            return HLL(self.p, self.regs.copy())
        m_new = 1 << p_new
        folded = self.regs.reshape(m_new, -1).max(axis=1)
        return HLL(p_new, folded)

    # -- estimators -------------------------------------------------------
    def register_histogram(self) -> np.ndarray:
        """C[k] = #registers with value k, k in 0..(64-p+1)."""
        q = 64 - self.p
        return np.bincount(self.regs, minlength=q + 2).astype(np.float64)

    def estimate(self, estimator: str = "ertl_mle") -> float:
        if estimator == "default":
            estimator = "ertl_mle"
        c = self.register_histogram()
        m = float(1 << self.p)
        q = 64 - self.p
        if estimator == "ertl_improved":
            return _ertl_improved(c, m, q)
        if estimator == "ertl_mle":
            return _ertl_mle(c, m, q)
        if estimator == "original":
            return _flajolet_original(self.regs, c, m)
        raise ValueError(f"unknown estimator: {estimator}")

    # -- serde -------------------------------------------------------------
    def to_bytes(self) -> bytes:
        return _MAGIC + struct.pack("<BB", TYPE_ID, self.p) + self.regs.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HLL":
        if b[:4] != _MAGIC or b[4] != TYPE_ID:
            raise ValueError("not an HLL sketch blob")
        p = b[5]
        regs = np.frombuffer(b[6 : 6 + (1 << p)], dtype=np.uint8).copy()
        return cls(p, regs)

    def __eq__(self, other) -> bool:  # bit-identity, used by tests
        return (
            isinstance(other, HLL)
            and self.p == other.p
            and bool(np.array_equal(self.regs, other.regs))
        )


# ---------------------------------------------------------------------------
# Estimators (Ertl 2017, arXiv:1702.01284; Flajolet et al. 2007)
# ---------------------------------------------------------------------------


def _sigma(x: float) -> float:
    """Ertl 2017 eq. for the C0 (zero-register) correction series."""
    if x == 1.0:
        return math.inf
    y = 1.0
    z = x
    while True:
        x = x * x
        z_prev = z
        z += x * y
        y += y
        if z == z_prev or not math.isfinite(z):
            return z


def _tau(x: float) -> float:
    """Ertl 2017 series for the saturated-register correction."""
    if x == 0.0 or x == 1.0:
        return 0.0
    y = 1.0
    z = 1.0 - x
    while True:
        x = math.sqrt(x)
        z_prev = z
        y *= 0.5
        z -= ((1.0 - x) ** 2) * y
        if z == z_prev:
            return z / 3.0


def _ertl_improved(c: np.ndarray, m: float, q: int) -> float:
    """Ertl's improved raw estimator (2017 §2): unbiased over the whole
    cardinality range, no hard-coded small/large-range switches."""
    denom = m * _tau(1.0 - c[q + 1] / m)
    # registers k = q..1 (Horner over powers of two)
    for k in range(q, 0, -1):
        denom += c[k]
        denom *= 0.5
    denom += m * _sigma(c[0] / m)
    alpha_inf = 1.0 / (2.0 * math.log(2.0))
    return alpha_inf * m * m / denom


def _mle_dll(lam: float, c: np.ndarray, m: float, q: int) -> float:
    """d/dλ of the Poisson-model log-likelihood (Ertl 2017 §3).

    L(λ) = -C0·λ/m + Σ_{k=1..q} Ck·ln(e^{-λ/(m·2^k)} - e^{-λ/(m·2^{k-1})})
           + C_{q+1}·ln(1 - e^{-λ/(m·2^q)})
    """
    dll = -c[0] / m
    for k in range(1, q + 1):
        if c[k] == 0.0:
            continue
        a = 1.0 / (m * (1 << k))       # rate for 2^-k term
        b = 2.0 * a                     # rate for 2^-(k-1) term
        ea = math.exp(-lam * a)
        eb = math.exp(-lam * b)
        num = -a * ea + b * eb
        den = ea - eb
        if den <= 0.0:
            return -math.inf
        dll += c[k] * num / den
    if c[q + 1] > 0.0:
        g = 1.0 / (m * (1 << q))
        eg = math.exp(-lam * g)
        den = 1.0 - eg
        if den <= 0.0:
            return math.inf
        dll += c[q + 1] * g * eg / den
    return dll


def _ertl_mle(c: np.ndarray, m: float, q: int) -> float:
    """Poisson maximum-likelihood estimator (the reference default,
    /root/reference/src/distmain.cpp:37-38). Solved by bracketed
    bisection on dL/dλ = 0, seeded by the improved raw estimate."""
    if c[0] == m:  # empty sketch
        return 0.0
    if c[q + 1] == m:  # fully saturated — fall back to improved raw
        return _ertl_improved(c, m, q)
    x0 = max(_ertl_improved(c, m, q), 1e-12)
    lo, hi = x0, x0
    # bracket the root of the (monotonically decreasing) derivative
    for _ in range(200):
        if _mle_dll(lo, c, m, q) > 0.0:
            break
        lo *= 0.5
    for _ in range(200):
        if _mle_dll(hi, c, m, q) < 0.0:
            break
        hi *= 2.0
    for _ in range(100):
        mid = 0.5 * (lo + hi)
        if _mle_dll(mid, c, m, q) > 0.0:
            lo = mid
        else:
            hi = mid
        if hi - lo <= 1e-9 * hi:
            break
    return 0.5 * (lo + hi)


def _flajolet_original(regs: np.ndarray, c: np.ndarray, m: float) -> float:
    """Flajolet et al. 2007 estimator with linear-counting small-range
    correction (exposed as `-E ORIGINAL` in the reference,
    /root/reference/src/distmain.cpp:59-62)."""
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    if est <= 2.5 * m and c[0] > 0:
        return m * math.log(m / c[0])
    return est


# ---------------------------------------------------------------------------
# Joint / pairwise estimation
# ---------------------------------------------------------------------------


def set_triple(a: HLL, b: HLL, estimator: str = "ertl_mle") -> tuple[float, float, float]:
    """(|A\\B|, |B\\A|, |A∩B|) via inclusion–exclusion on HLL unions —
    the reference's default JI path (/root/reference/src/dashing.h:550-552):
    intersection = max(0, |A| + |B| - |A∪B|), union sketch = register max."""
    u = HLL(a.p, np.maximum(a.regs, b.regs))
    ca = a.estimate(estimator)
    cb = b.estimate(estimator)
    cu = u.estimate(estimator)
    inter = max(0.0, ca + cb - cu)
    return max(0.0, cu - cb), max(0.0, cu - ca), inter


def ertl_joint(a: HLL, b: HLL) -> tuple[float, float, float]:
    """(|A\\B|, |B\\A|, |A∩B|) via Ertl's joint MLE (2017 §4) — the
    reference's ERTL_JOINT_MLE / readfilt default
    (/root/reference/src/readfilt.cpp:118, src/distmain.cpp:59-62).
    Much lower variance than inclusion–exclusion at low overlap.
    Thin wrapper over the vectorized batch kernel in functions.compare."""
    from dashing_spark.functions.compare import hll_joint_triple_batch

    if a.p != b.p:
        raise ValueError("joint estimation requires equal precision")
    t0, t1, t2 = hll_joint_triple_batch(a.regs[None, :], b.regs[None, :], a.p)
    return float(t0[0]), float(t1[0]), float(t2[0])


def jaccard_index(a: HLL, b: HLL, estimator: str = "ertl_mle") -> float:
    t0, t1, t2 = set_triple(a, b, estimator)
    denom = t0 + t1 + t2
    return t2 / denom if denom > 0 else 0.0
