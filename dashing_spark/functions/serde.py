"""Sketch blob dispatch — one deterministic binary format for all sketches.

Every sketch serializes as ``b"DSH1" + uint8 type_id + header + payload``
(the Spark layer carries this as a BinaryType column — the analogue of
the reference's per-sketch files named by make_fname,
/root/reference/src/dashing.h:497-526). Deserialization dispatches on the
type byte so a persisted sketch table is self-describing.
"""

from __future__ import annotations

from dashing_spark.functions.hll import HLL
from dashing_spark.functions.bloom import BloomFilter
from dashing_spark.functions.cms import CountMinSketch
from dashing_spark.functions.kmv import KMV
from dashing_spark.functions.bbmh import BBitMinHash
from dashing_spark.functions.kll import KLL
from dashing_spark.functions.tdigest import TDigest
from dashing_spark.functions.crmh import CountingKMV
from dashing_spark.functions.hmh import HyperMinHash
from dashing_spark.functions.smh import SuperMinHash
from dashing_spark.functions.cbbmh import CountingBBitMinHash
from dashing_spark.functions.heavykeeper import HeavyKeeper

_MAGIC = b"DSH1"

_REGISTRY = {
    1: HLL,
    2: BloomFilter,
    3: CountMinSketch,
    4: KMV,
    5: BBitMinHash,
    6: KLL,
    7: TDigest,
    8: CountingKMV,
    9: HyperMinHash,
    10: SuperMinHash,
    11: CountingBBitMinHash,
    12: HeavyKeeper,
}


def sketch_from_bytes(b: bytes):
    """Deserialize any dashing_spark sketch blob."""
    if len(b) < 5 or b[:4] != _MAGIC:
        raise ValueError("not a dashing_spark sketch blob")
    cls = _REGISTRY.get(b[4])
    if cls is None:
        raise ValueError(f"unknown sketch type id {b[4]}")
    return cls.from_bytes(b)
