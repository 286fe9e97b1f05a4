"""SimHash — 64-bit similarity fingerprints (Charikar 2002).

A training-data-pipeline addition with no direct dashing counterpart
(dashing's closest analogue is b-bit minhash register matching). Used by
the near-duplicate detector in ``operators/dedup.py``: documents whose
fingerprints differ in ≤ t bits are near-duplicate candidates.

Whole-batch numpy: token hashes are unpacked to a (n_tokens, 64) ±1
matrix, weighted, and summed per document with np.add.at.
"""

from __future__ import annotations

import numpy as np


def simhash_batch(
    token_hashes: np.ndarray,
    doc_idx: np.ndarray,
    ndocs: int,
    weights: np.ndarray | None = None,
) -> np.ndarray:
    """Compute one uint64 SimHash per document.

    token_hashes : uint64[n] flat token hashes for the whole batch
    doc_idx      : int64[n] document index per token (0..ndocs-1)
    weights      : optional float per token (default 1)
    Returns uint64[ndocs]. Deterministic; independent of token order.
    """
    acc = np.zeros((ndocs, 64), dtype=np.float64)
    if len(token_hashes):
        h = np.asarray(token_hashes, dtype=np.uint64)
        # bits: (n, 64), little-endian bit order within the uint64
        bytes_ = h.view(np.uint8).reshape(-1, 8)
        bits = np.unpackbits(bytes_, axis=1, bitorder="little").astype(np.float64)
        signed = bits * 2.0 - 1.0  # {0,1} -> {-1,+1}
        if weights is not None:
            signed *= np.asarray(weights, dtype=np.float64)[:, None]
        np.add.at(acc, np.asarray(doc_idx, dtype=np.int64), signed)
    out_bits = (acc > 0).astype(np.uint8)
    return np.packbits(out_bits, axis=1, bitorder="little").copy().view(np.uint64).ravel()


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64))
    return _POPCNT8[x.view(np.uint8).reshape(-1, 8)].sum(axis=1)
