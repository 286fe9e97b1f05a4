"""Sketch parameter bundle.

The reference fixes its schema with CLI flags (k, window, log2 sketch
size ``-S``: /root/reference/src/dashing.cpp:57-61, src/distmain.cpp:29).
We carry the same information as a frozen dataclass that is embedded in
sketch-table metadata and in the serialized sketch header, so a persisted
sketch can never be merged with an incompatible one (the reference
enforces same-size merges too: /root/reference/README.md:71-73).
"""

from __future__ import annotations

from dataclasses import asdict, dataclass


@dataclass(frozen=True)
class SketchParams:
    """Parameters shared by every sketch build.

    p          : log2 number of HLL registers (reference default -S 10,
                 src/dashing.cpp:61; `dashing hll` uses 24, src/hllmain.cpp:5)
    shingle_w  : tokens per shingle — the k-mer length analogue
                 (reference k=31 on DNA; on words small w, default 1)
    seed       : seed folded into the 64-bit hash
    estimator  : HLL estimator name: 'ertl_mle' (reference default,
                 src/distmain.cpp:37-38) | 'ertl_improved' | 'original'
    """

    p: int = 14
    shingle_w: int = 1
    seed: int = 0
    estimator: str = "ertl_mle"

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "SketchParams":
        return cls(**d)
