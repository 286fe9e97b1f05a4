"""FIXTURES.md §2 `sets` oracle: constructed-overlap set pairs with
closed-form truth for every SURVEY §2.4 measure, evaluated against all
JI-capable sketch types (HLL / KMV / BBMH / HMH) — the exact-set
ground-truth strategy dashing itself uses (--use-full-khash-sets,
/root/reference/README.md:116)."""

import math

import numpy as np
import pytest

from dashing_spark.functions import HLL, KMV, BBitMinHash, HyperMinHash, hashing
from dashing_spark.functions.compare import (
    MEASURES,
    compare,
    measure_from_triple,
)

# (|A|, |B|, |A∩B|) spanning HLL regimes (linear counting → raw)
CASES = [
    (100, 100, 50),
    (1_000, 800, 200),
    (20_000, 20_000, 10_000),
    (100_000, 50_000, 25_000),
    (500_000, 500_000, 400_000),
    (50_000, 50_000, 0),
]

KSINV = 1.0 / 3.0


def _build(card_a, card_b, overlap, stride=10_000_000):
    a = np.arange(card_a)
    b = np.concatenate(
        [np.arange(card_a - overlap, card_a), stride + np.arange(card_b - overlap)]
    )
    return hashing.hash_int_array(a), hashing.hash_int_array(b)


def _truth(card_a, card_b, overlap):
    t0 = float(card_a - overlap)
    t1 = float(card_b - overlap)
    t2 = float(overlap)
    return {m: measure_from_triple(t0, t1, t2, m, KSINV) for m in MEASURES}


SKETCHES = {
    "hll_p14": (lambda: HLL.empty(14), 0.04),
    "kmv_2048": (lambda: KMV.empty(2048), 0.07),
    "bbmh": (lambda: BBitMinHash.empty(12, 16), 0.07),
    "hmh": (lambda: HyperMinHash.empty(12, 8), 0.07),
}


class TestMeasuresOracle:
    @pytest.mark.parametrize("sketch_name", list(SKETCHES))
    @pytest.mark.parametrize("case", CASES, ids=lambda c: f"{c[0]}x{c[1]}o{c[2]}")
    def test_all_measures_within_tolerance(self, sketch_name, case):
        make, tol = SKETCHES[sketch_name]
        card_a, card_b, overlap = case
        ha, hb = _build(*case)
        sa = make().update_hashes(ha)
        sb = make().update_hashes(hb)
        truth = _truth(*case)
        for m in ("ji", "containment", "symmetric_containment"):
            est = compare(sa, sb, m, KSINV)
            assert abs(est - truth[m]) <= tol, (m, est, truth[m])
        # sizes: relative tolerance vs the union size
        union = card_a + card_b - overlap
        est_sizes = compare(sa, sb, "sizes", KSINV)
        assert abs(est_sizes - overlap) <= 3 * tol * union
        # distance transforms: compare through the transform of the
        # estimated vs true JI (bounded input ⇒ bounded output here)
        for m in ("mash_dist", "full_mash_dist"):
            est = compare(sa, sb, m, KSINV)
            assert abs(est - truth[m]) <= 0.25 or (
                truth[m] == 1.0 and est >= 0.5
            ), (m, est, truth[m])

    def test_zero_overlap_detected(self):
        ha, hb = _build(50_000, 50_000, 0)
        sa = HLL.empty(14).update_hashes(ha)
        sb = HLL.empty(14).update_hashes(hb)
        assert compare(sa, sb, "ji") <= 0.02
        assert compare(sa, sb, "mash_dist") >= 0.5  # "far" convention

    def test_self_comparison_is_identity(self):
        h, _ = _build(10_000, 10, 10)
        for make, _tol in SKETCHES.values():
            s = make().update_hashes(h)
            assert compare(s, s, "ji") >= 0.98
            assert compare(s, s, "containment") >= 0.98
            assert compare(s, s, "mash_dist", KSINV) <= 0.02
