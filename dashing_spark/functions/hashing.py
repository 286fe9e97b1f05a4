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


# precomputed powers of an odd 64-bit multiplier for the byte-polynomial
_POLY_P = np.uint64(0x100000001B3)  # FNV-ish odd multiplier
_POW_TABLE = np.empty(256, dtype=np.uint64)
_POW_TABLE[0] = np.uint64(1)
with np.errstate(over="ignore"):
    for _i in range(1, 256):
        _POW_TABLE[_i] = _POW_TABLE[_i - 1] * _POLY_P


def hash_tokens_arrow(arr, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize + hash a pyarrow StringArray directly from its buffers.

    Returns (token_hashes uint64, tokens_per_doc int64). Tokens are the
    single-space-separated segments of each string (split(' ')
    semantics). The entire kernel is numpy over the Arrow data buffer —
    NO Python string objects and NO JVM string garbage, which is what
    keeps the hot path memory-bandwidth-flat at high core counts.

    Token hash = splitmix64(polyhash(bytes) ^ splitmix64(len)), where
    polyhash = Σ (byte+1)·P^pos (wrapping uint64). Deterministic across
    runs/platforms. Matches split(' ') exactly, including the empty
    token after a trailing space and the single empty token of an empty
    string — so sketches built via tokenize_flat and via this kernel see
    the same item multiset.
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        parts = [hash_tokens_arrow(c, seed) for c in arr.chunks]
        if not parts:
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
        )
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + n + 1]
    offs = offs.astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    lo, hi = int(offs[0]), int(offs[-1])
    b = data[lo:hi]
    total = hi - lo
    doc_lens_bytes = np.diff(offs)
    if total == 0:
        # every doc is the empty string: split(' ') gives one '' token each
        with np.errstate(over="ignore"):
            empty_h = splitmix64(np.uint64(0) ^ splitmix64(np.zeros(1, dtype=np.uint64)))[0]
            if seed:
                empty_h = splitmix64(
                    np.array([empty_h], dtype=np.uint64) ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
                )[0]
        return np.full(n, empty_h, dtype=np.uint64), np.ones(n, dtype=np.int64)
    is_space = b == 32
    # token starts: doc starts + byte-after-space. Avoid materializing a
    # per-byte doc_id (8 B/byte of traffic): doc starts are just the
    # offsets, and per-byte ops stay int8/bool.
    starts = np.zeros(total, dtype=bool)
    starts[1:] = is_space[:-1]
    doc_start = offs[:-1] - lo
    starts[doc_start[doc_start < total]] = True  # idempotent for empty docs
    start_pos = np.flatnonzero(starts)
    n_tok = len(start_pos)
    end_idx = np.empty(n_tok, dtype=np.int64)
    end_idx[:-1] = start_pos[1:] - 1
    end_idx[-1] = total - 1
    # a token's segment ends either at its delimiter space or at a doc end
    tok_lens = end_idx - start_pos + (~is_space[end_idx]).astype(np.int64)
    # polyhash via a length-sorted positional sweep: iteration j touches
    # only the (contiguous, because sorted) tokens with len > j — total
    # work is one gather+mul+add per BYTE in per-token vectors, with no
    # per-byte int64 cumsum traffic (measured 2.3× the cumsum variant)
    order = np.argsort(-tok_lens, kind="stable")
    s_starts = start_pos[order]
    s_lens = tok_lens[order]
    sums = np.zeros(n_tok, dtype=np.uint64)
    hist = np.bincount(s_lens) if n_tok else np.zeros(1, dtype=np.int64)
    cnt_ge = np.cumsum(hist[::-1])[::-1]  # cnt_ge[L] = #tokens with len ≥ L
    with np.errstate(over="ignore"):
        maxlen = int(s_lens[0]) if n_tok else 0
        for j in range(maxlen):
            k = int(cnt_ge[j + 1]) if j + 1 < len(cnt_ge) else 0
            if k == 0:
                break
            idx = s_starts[:k] + j
            # positions ≥ 255 share the last table entry (as the
            # cumsum-based kernel's clip did)
            sums[:k] += (b[idx].astype(np.uint64) + np.uint64(1)) * _POW_TABLE[
                min(j, 255)
            ]
        h_sorted = splitmix64(sums ^ splitmix64(s_lens.astype(np.uint64)))
        if seed:
            h_sorted = splitmix64(h_sorted ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
    h = np.empty(n_tok, dtype=np.uint64)
    h[order] = h_sorted
    # tokens per doc = token starts within [offs[i], offs[i+1])
    counts = np.diff(np.searchsorted(start_pos, offs - lo)).astype(np.int64)
    # split(' ') emits (#spaces + 1) tokens per doc; the byte scan misses
    # exactly the empty token at a doc's end (trailing space / empty doc).
    # Insert its hash so every tokenizer path sees the same multiset.
    spc = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(is_space, out=spc[1:])
    expected = spc[offs[1:] - lo] - spc[offs[:-1] - lo] + 1
    missing = expected - counts
    if missing.any():
        with np.errstate(over="ignore"):
            empty_h = splitmix64(
                np.uint64(0) ^ splitmix64(np.zeros(1, dtype=np.uint64))
            )[0]
            if seed:
                empty_h = splitmix64(
                    np.array([empty_h], dtype=np.uint64)
                    ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
                )[0]
        ends = np.cumsum(counts)[missing > 0]
        h = np.insert(h, ends, np.uint64(empty_h))
        counts = expected
    return h, counts


def char_gram_hashes_arrow(arr, n: int = 3, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Character (codepoint) n-gram hashes of a pyarrow StringArray,
    straight from its buffers: (gram_hashes uint64 flat, grams_per_doc
    int64). A string of L characters yields max(L−n+1, 0) grams; grams
    never cross a string boundary.

    Grams are over CODEPOINTS, matching the exact-verify substring()
    semantics (so the LSH miss bound at JI = threshold holds on
    non-ASCII text too). All-ASCII buffers take the raw-byte fast path
    (bytes == codepoints, bit-identical hashes); otherwise the batch is
    decoded once to UTF-32 (one C-speed pass) and the same rolling
    polynomial runs over uint32 codepoints."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        parts = [char_gram_hashes_arrow(c, n, seed) for c in arr.chunks]
        if not parts:
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
        )
    ndocs = len(arr)
    if ndocs == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + ndocs + 1]
    offs = offs.astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    lo, hi = int(offs[0]), int(offs[-1])
    b = data[lo:hi]
    is_start = (b & 0xC0) != 0x80  # UTF-8 non-continuation bytes
    if is_start.all():  # pure ASCII: bytes ARE codepoints
        cp = b
        offs_cp = offs - lo
    else:
        cp = np.frombuffer(
            b.tobytes().decode("utf-8").encode("utf-32-le"), dtype=np.uint32
        )
        # byte offset -> codepoint offset: #codepoint-starts before it
        cumz = np.concatenate([[0], np.cumsum(is_start, dtype=np.int64)])
        offs_cp = cumz[offs - lo]
    total = len(cp)
    if total < n:
        return np.empty(0, dtype=np.uint64), np.zeros(ndocs, dtype=np.int64)
    m = total - n + 1
    with np.errstate(over="ignore"):
        h = (cp[:m].astype(np.uint64) + np.uint64(1)) * _POW_TABLE[0]
        for j in range(1, n):
            h += (cp[j : j + m].astype(np.uint64) + np.uint64(1)) * _POW_TABLE[j]
        h = splitmix64(h ^ splitmix64(np.full(m, n, dtype=np.uint64)))
        if seed:
            h = splitmix64(h ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
    # keep only grams fully inside one string
    pos = np.arange(m, dtype=np.int64)
    doc_of = np.searchsorted(offs_cp, pos, side="right") - 1
    valid = pos + n <= offs_cp[doc_of + 1]
    counts = np.bincount(doc_of[valid], minlength=ndocs).astype(np.int64)
    return h[valid], counts


def flatten_hash_arrays(arrays) -> tuple[np.ndarray, np.ndarray]:
    """Flatten a pandas Series of int64 hash arrays (Arrow list<long>)
    into (flat uint64, doc_lengths). The fast path used when token
    hashing ran JVM-side (xxhash64 in codegen) — no Python string
    objects are ever created."""
    lengths = np.fromiter((len(a) for a in arrays), dtype=np.int64, count=len(arrays))
    if lengths.sum() == 0:
        return np.empty(0, dtype=np.uint64), lengths
    flat = np.concatenate([np.asarray(a, dtype=np.int64) for a in arrays])
    return flat.view(np.uint64), lengths


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
