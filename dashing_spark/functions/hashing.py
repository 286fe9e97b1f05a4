"""Vectorized 64-bit hashing + w-shingling.

The reference streams k-mers as uint64 hashes (Encoder/RollingHasher
loops, /root/reference/src/sketch_and_cmp.h:180-206). Our domain analogue
is: text -> whitespace tokens -> w-token shingles -> one uint64 per
shingle. All kernels here are whole-batch numpy; strings are hashed with
pandas' C siphash (`pd.util.hash_array` with a pinned hash key), which is
deterministic across processes, platforms, and runs — the byte-identical
invariant required by BASELINE.json's input_hint.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Pinned so hashes never drift between runs / executors.
_HASH_KEY = "dashing_spark_01"  # must be 16 bytes
assert len(_HASH_KEY) == 16

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (Steele et al.), vectorized over uint64."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += _GOLDEN
        x ^= x >> np.uint64(30)
        x *= _MIX1
        x ^= x >> np.uint64(27)
        x *= _MIX2
        x ^= x >> np.uint64(31)
    return x


def hash_str_array(values, seed: int = 0) -> np.ndarray:
    """Hash an array-like of strings to uint64, vectorized (C siphash).

    Deterministic for a fixed seed; different seeds give independent
    hash families (seed is mixed in via splitmix64).
    """
    arr = pd.util.hash_array(
        np.asarray(values, dtype=object), encoding="utf8", hash_key=_HASH_KEY
    )
    if seed:
        with np.errstate(over="ignore"):
            arr = splitmix64(arr ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
    return arr.astype(np.uint64, copy=False)


def hash_int_array(values, seed: int = 0) -> np.ndarray:
    """Hash an int64/uint64 array to uint64 via splitmix64."""
    x = np.asarray(values).astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        return splitmix64(x ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF))


def combine64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-sensitive combination of two hash streams (for shingles)."""
    with np.errstate(over="ignore"):
        return splitmix64(a * np.uint64(0xC2B2AE3D27D4EB4F) ^ (b + _GOLDEN))


def tokenize_flat(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-split a batch of texts into one flat token array.

    Returns (flat_tokens: object ndarray, doc_lengths: int64 ndarray).
    Splitting matches ANSI-SQL string_split(text, ' ') semantics (single
    space, empty strings preserved) so oracle comparisons line up.
    """
    lists = texts.fillna("").str.split(" ")
    lengths = np.fromiter((len(t) for t in lists), dtype=np.int64, count=len(lists))
    if lengths.sum() == 0:
        return np.empty(0, dtype=object), lengths
    flat = np.concatenate([np.asarray(t, dtype=object) for t in lists])
    return flat, lengths


def shingle_hashes(
    token_hashes: np.ndarray,
    doc_lengths: np.ndarray,
    w: int = 1,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """w-token shingle hashes over a flat token-hash array.

    token_hashes : uint64 hashes of the flattened tokens of a batch
    doc_lengths  : tokens per document (defines shingle boundaries)
    Returns (shingle_hash: uint64, doc_index: int64) flat arrays —
    shingles never cross a document boundary (mirrors per-sequence k-mer
    iteration, /root/reference/src/sketch_and_cmp.h:340-351).
    """
    n = len(token_hashes)
    ndocs = len(doc_lengths)
    if n == 0 or n < w:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), doc_lengths)
    if w == 1:
        h = token_hashes
        if seed:
            h = hash_int_array(h, seed=seed)
        return h.astype(np.uint64, copy=False), doc_idx
    m = n - w + 1
    x = token_hashes[:m].astype(np.uint64, copy=True)
    if seed:
        x = hash_int_array(x, seed=seed)
    for j in range(1, w):
        x = combine64(x, token_hashes[j : j + m])
    valid = doc_idx[:m] == doc_idx[w - 1 :]
    return x[valid], doc_idx[:m][valid]
