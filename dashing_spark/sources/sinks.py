"""Emission formats — the reference's distance-matrix sinks (§2.1).

dashing emits UT-TSV (default), PHYLIP upper-triangular, full TSV,
and a packed binary matrix (`EmissionFormat`,
/root/reference/src/enums.h:25-34; emitters src/sketch_and_cmp.h:798-879;
binary header = 1 magic byte + u64 nelem, documented at
src/dashing.cpp:95-99; `printmat` reader src/dashing.cpp:425-452).

In the Spark engine the *native* output is the long-format pair
DataFrame (write it with `df.write.parquet` at scale); these emitters
exist for parity/interop and are small-n by construction (a dense n×n
matrix only makes sense when it fits somewhere), so they collect to the
driver deliberately.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# leading byte is the arithmetic-type enum (0 = float32), per the
# reference's 9-byte header: type byte + u64 number-of-sets
# (/root/reference/distmat/distmat.h:199-201, src/dashing.cpp:95-99)
_BINARY_MAGIC = b"\x00"


def pairs_to_squareform(
    pairs: DataFrame, measure: str, keys: list[str] | None = None, diag: float = 1.0
) -> pd.DataFrame:
    """Long-format (a_key, b_key, measure) -> dense symmetric matrix
    (pandas). Small-n utility; mirrors the in-memory DistanceMatrix."""
    pdf = pairs.select("a_key", "b_key", measure).toPandas()
    seen = set(pdf["a_key"]) | set(pdf["b_key"])
    if keys is None:
        # NOTE: derived keys come from the PAIRS, so a set that appears
        # in no pair (n=1 input, or an isolated key after filtering) is
        # absent — pass `keys` explicitly to control the matrix axes
        keys = sorted(seen)
    else:
        missing = seen - set(keys)
        if missing:
            raise ValueError(
                f"pairs reference keys not in the supplied key list: "
                f"{sorted(missing)[:5]}{'...' if len(missing) > 5 else ''}"
            )
    idx = {k: i for i, k in enumerate(keys)}
    n = len(keys)
    m = np.full((n, n), diag, dtype=np.float32)
    for a, b, v in pdf.itertuples(index=False):
        m[idx[a], idx[b]] = v
        m[idx[b], idx[a]] = v
    return pd.DataFrame(m, index=keys, columns=keys)


def write_ut_tsv(
    pairs: DataFrame,
    measure: str,
    path: str,
    diag_token: str = "-",
    keys: list[str] | None = None,
) -> None:
    """Upper-triangular TSV, dashing's default emission: header row of
    labels, each row = label + '-' padding + UT values. ``keys`` pins
    the axes (required to represent sets that appear in no pair)."""
    mat = pairs_to_squareform(pairs, measure, keys=keys)
    keys = list(mat.index)
    with open(path, "w") as f:
        f.write("##Names\t" + "\t".join(keys) + "\n")
        for i, k in enumerate(keys):
            cells = [diag_token] * (i + 1) + [
                f"{mat.iloc[i, j]:.6f}" for j in range(i + 1, len(keys))
            ]
            f.write(k + "\t" + "\t".join(cells) + "\n")


def write_phylip(
    pairs: DataFrame, measure: str, path: str, keys: list[str] | None = None
) -> None:
    """PHYLIP upper-triangular distance matrix (`-U` in the reference)."""
    mat = pairs_to_squareform(pairs, measure, keys=keys, diag=0.0)
    keys = list(mat.index)
    with open(path, "w") as f:
        f.write(f"{len(keys)}\n")
        for i, k in enumerate(keys):
            vals = [f"{mat.iloc[i, j]:.6f}" for j in range(i + 1, len(keys))]
            f.write("\t".join([k] + vals) + "\n")


def write_packed_binary(
    pairs: DataFrame, measure: str, path: str, keys: list[str] | None = None
) -> list[str]:
    """Packed UT float32 matrix — the reference's `-b` format: type byte
    (0 = float32) + u64 number of sets n + n(n-1)/2 float32 (row-major
    upper triangle). Returns the key order (labels ship separately,
    like .labels.gz)."""
    mat = pairs_to_squareform(pairs, measure, keys=keys)
    keys = list(mat.index)
    n = len(keys)
    tri = np.concatenate(
        [mat.values[i, i + 1 :] for i in range(n)]
        or [np.empty(0, dtype=np.float32)]
    ).astype("<f4")
    with open(path, "wb") as f:
        f.write(_BINARY_MAGIC)
        f.write(struct.pack("<Q", n))
        f.write(tri.tobytes())
    return keys


def read_packed_binary(path: str, keys: list[str] | None = None) -> pd.DataFrame:
    """`printmat`: packed binary -> human-readable square DataFrame."""
    with open(path, "rb") as f:
        magic = f.read(1)
        if magic != _BINARY_MAGIC:
            raise ValueError("bad type byte in packed matrix (expect 0=float32)")
        (n,) = struct.unpack("<Q", f.read(8))
        nelem = n * (n - 1) // 2
        tri = np.frombuffer(f.read(4 * nelem), dtype="<f4")
    if keys is None:
        keys = [str(i) for i in range(n)]
    if n != len(keys):
        raise ValueError(f"header says {n} sets, got {len(keys)} keys")
    if len(tri) != nelem:
        raise ValueError("truncated packed matrix payload")
    m = np.ones((n, n), dtype=np.float32)
    iu = np.triu_indices(n, 1)  # row-major upper triangle = pack order
    m[iu] = tri
    m[iu[1], iu[0]] = tri
    return pd.DataFrame(m, index=keys, columns=keys)


def view_registers(sketch_blob: bytes) -> np.ndarray:
    """`dashing view` (/root/reference/src/dashing.cpp:559-563): dump a
    sketch blob's register array for debugging."""
    from dashing_spark.functions.serde import sketch_from_bytes

    sk = sketch_from_bytes(bytes(sketch_blob))
    for attr in ("regs", "mins", "words", "counts"):
        if hasattr(sk, attr):
            return getattr(sk, attr)
    raise TypeError(f"{type(sk).__name__} has no register array to view")
