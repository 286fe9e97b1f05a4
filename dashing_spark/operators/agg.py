"""Two-stage distributed sketch aggregation — the engine's core operator.

This is the Spark re-expression of the reference's build/union phases:
per-thread partial sketches merged by a parallel tree
(`fill_sketch` /root/reference/src/dashing.h:627-641, `union_core` +
`par_reduce` /root/reference/src/union.cpp:10-58). Spark's native aggs
get partial aggregation from Catalyst for free, but pandas grouped-agg
UDFs do NOT (each group's rows all reach one task), so we implement the
partial/final split explicitly:

  stage 1 (map-side combine): ``mapInPandas`` — every input partition
      emits AT MOST ONE ROW PER KEY, holding a serialized partial sketch.
      All hashing/updating is whole-batch numpy on Arrow batches.
  stage 2 (optional salt level): ``groupBy(key, part_id % salt)`` merge —
      the explicit tree level that bounds fan-in per task under skew
      (north rule; analogous to par_reduce's log2 tree).
  stage 3: ``groupBy(key)`` merge -> final sketch row per key.

Only sketch blobs cross the shuffle (p=14 HLL = 16 KiB), so at 10^12
input rows the shuffle volume is O(#keys × #partitions), not O(rows).
Monoid sketches (HLL/Bloom/CMS/KMV/BBMH) give bit-identical results for
ANY partitioning / merge order, which the tests assert.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, functions as F, types as T

from dashing_spark.functions import hashing
from dashing_spark.functions.serde import sketch_from_bytes
from dashing_spark.operators.ship import ensure_shipped

SKETCH_COL = "sketch"
_PART_COL = "__src_part"


def token_hashes_col(text_col: str, seed: int = 0):
    """array<long> of 64-bit token hashes, computed ENTIRELY JVM-side
    (split + xxhash64 inside whole-stage codegen). Python/Arrow only
    ever sees int64 arrays — no per-token Python string objects, which
    is the difference between allocator-bound and memory-bandwidth-bound
    scaling at high core counts."""
    col = f"`{text_col}`"  # backticks: names with '-'/' ' must still parse
    if seed:
        return F.expr(
            f"transform(split({col}, ' ', -1), t -> xxhash64(t, {int(seed)}L))"
        )
    return F.expr(f"transform(split({col}, ' ', -1), t -> xxhash64(t))")


def _key_schema(df: DataFrame, key_cols: Sequence[str]) -> list[T.StructField]:
    by_name = {f.name: f for f in df.schema.fields}
    return [by_name[k] for k in key_cols]


def _partial_schema(df: DataFrame, key_cols: Sequence[str]) -> T.StructType:
    return T.StructType(
        _key_schema(df, key_cols)
        + [
            T.StructField(_PART_COL, T.IntegerType(), False),
            T.StructField(SKETCH_COL, T.BinaryType(), False),
        ]
    )


def _result_schema(df: DataFrame, key_cols: Sequence[str]) -> T.StructType:
    return T.StructType(
        _key_schema(df, key_cols)
        + [T.StructField(SKETCH_COL, T.BinaryType(), False)]
    )


def _emit_partials(acc: dict, key_cols: Sequence[str]) -> pd.DataFrame:
    part_id = TaskContext.get().partitionId() if TaskContext.get() else -1
    rows = {k: [] for k in key_cols}
    blobs = []
    for key, sk in acc.items():
        for c, v in zip(key_cols, key):
            rows[c].append(v)
        blobs.append(sk.to_bytes())
    out = pd.DataFrame(rows)
    out[_PART_COL] = np.int32(part_id)
    out[SKETCH_COL] = blobs
    return out


def _shingle_hash_df(
    df: DataFrame, key_cols: Sequence[str], text_col: str, shingle_w: int, seed: int
) -> DataFrame:
    """Explode each row into its w-shingle hashes (one int64 `__ih` per
    shingle occurrence) — pandas-side hashing, used by the weighted path."""
    src = df.select(*list(key_cols), text_col)
    schema = T.StructType(
        _key_schema(src, key_cols) + [T.StructField("__ih", T.LongType(), False)]
    )

    def fn(batches):
        for pdf in batches:
            toks, lens = hashing.tokenize_flat(pdf[text_col])
            th = hashing.hash_str_array(toks)
            sh, doc_idx = hashing.shingle_hashes(th, lens, w=shingle_w, seed=seed)
            out = pdf.iloc[doc_idx][list(key_cols)].reset_index(drop=True)
            out["__ih"] = sh.view(np.int64)
            yield out

    return src.mapInPandas(fn, schema=schema)


def _batch_key_codes(rb, n_keys: int):
    """Per-row group codes + unique key tuples for one Arrow batch.

    Single key column: Arrow dictionary-encode yields the codes without
    materializing a Python object per row — only the len(uniq)
    dictionary values cross into Python (as acc keys). Multi-key (or
    null-bearing) batches fall back to pandas factorize. Shared by the
    plain and weighted-CM partial stages so the fast path cannot drift
    between them.
    """
    enc = rb.column(0).dictionary_encode() if n_keys == 1 else None
    if enc is not None and enc.indices.null_count == 0:
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = [(v,) for v in enc.dictionary.to_pylist()]
    else:
        keys = list(zip(*(rb.column(i).to_pylist() for i in range(n_keys))))
        codes, uniq = pd.factorize(pd.Series(keys, dtype=object))
    return codes, uniq


def sketch_tokens_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    make_sketch: Callable[[], object],
    text_col: str = "text",
    shingle_w: int = 1,
    seed: int = 0,
    salt: int | None = None,
    weighted: bool = False,
    hasher: str = "arrow",
    counters: dict | None = None,
    cm_lg_width: int = 16,
    cm_depth: int = 4,
) -> DataFrame:
    """One sketch per key over the w-shingle hashes of ``text_col``.

    ``counters`` optionally carries Spark accumulators under keys
    "rows" / "partials" / "merges" — the pipeline's metrics hooks
    (plans/pipeline.py) ride the same kernels instead of duplicating
    them. Ignored on the weighted path.

    ``hasher="arrow"`` (default): tokens are hashed by the numpy
    byte-polynomial kernel directly over Arrow string buffers — zero
    allocation churn on both sides, best parallel scaling.
    ``hasher="jvm"``: split+xxhash64 in whole-stage codegen, int64
    arrays through Arrow — faster single-core on string-heavy rows at
    the cost of JVM allocation/GC pressure at high core counts.
    Both are deterministic; sketches from different hashers are not
    comparable with each other.

    ``weighted=True`` feeds hash64(shingle, occurrence_index) instead —
    the reference's multiset/weighted-Jaccard adapter (WeightedSketcher,
    /root/reference/src/dashing.h:471-485): the i-th duplicate of a
    shingle within its key group becomes a distinct item, so sketch
    cardinalities estimate multiset sizes and JI becomes weighted
    Jaccard. The reference numbers occurrences with a streaming CM
    sketch per file (single-threaded); the distributed-exact equivalent
    is a row_number window over (key, shingle) — one shuffle, then the
    (shingle, occurrence) pair is hashed JVM-side and the normal
    hash-column sketch path takes over.
    """
    ensure_shipped(df.sparkSession)
    key_cols = list(key_cols)
    if weighted == "cm":
        return _sketch_tokens_weighted_cm(
            df, key_cols, make_sketch, text_col, shingle_w, seed, salt,
            cm_lg_width=cm_lg_width, cm_depth=cm_depth,
        )
    if weighted:
        from pyspark.sql import Window

        if shingle_w == 1:
            items = df.select(
                *key_cols, F.explode(F.split(F.col(text_col), " ", -1)).alias("__item")
            ).withColumn("__ih", F.xxhash64("__item"))
        else:
            items = _shingle_hash_df(df, key_cols, text_col, shingle_w, seed)
        w = Window.partitionBy(*key_cols, "__ih").orderBy(
            F.monotonically_increasing_id()
        )
        items = items.withColumn("__occ", F.row_number().over(w) - 1)
        items = items.withColumn("__h", F.xxhash64("__ih", "__occ"))
        return sketch_hash_col_by_key(items, key_cols, make_sketch, "__h", salt=salt)
    # the hot path: raw text ships as Arrow string buffers; tokenizing,
    # hashing, shingling and sketch updates are whole-batch numpy over
    # those buffers (hash_tokens_arrow) — no JVM string garbage and no
    # Python string objects, so throughput scales with cores instead of
    # being capped by allocator/GC contention
    if hasher == "jvm":
        src = df.select(*key_cols, token_hashes_col(text_col).alias("__th"))
    else:
        src = df.select(*key_cols, text_col)
    partial_schema = _partial_schema(src.select(*key_cols), key_cols)
    n_keys = len(key_cols)

    def partial_fn(batches):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(partial_schema)
        acc: dict[tuple, object] = {}
        n_rows = 0
        for rb in batches:
            n_rows += rb.num_rows
            if hasher == "jvm":
                col = rb.column(n_keys)
                th = col.flatten().to_numpy(zero_copy_only=False).view(np.uint64)
                lens = np.diff(col.offsets.to_numpy()).astype(np.int64)
            else:
                th, lens = hashing.hash_tokens_arrow(rb.column(n_keys))
            sh, doc_idx = hashing.shingle_hashes(th, lens, w=shingle_w, seed=seed)
            codes, uniq = _batch_key_codes(rb, n_keys)
            if len(sh):
                shingle_codes = codes[doc_idx]
                order = np.argsort(shingle_codes, kind="stable")
                bounds = np.searchsorted(
                    shingle_codes[order], np.arange(len(uniq) + 1)
                )
            for ci, key in enumerate(uniq):
                sk = acc.get(key)
                if sk is None:
                    sk = acc[key] = make_sketch()
                if len(sh):
                    seg = order[bounds[ci] : bounds[ci + 1]]
                    if len(seg):
                        sk.update_hashes(sh[seg])
        if counters:
            if "rows" in counters:
                counters["rows"].add(n_rows)
            if "partials" in counters:
                counters["partials"].add(len(acc))
        yield pa.RecordBatch.from_pandas(
            _emit_partials(acc, key_cols),
            schema=arrow_schema,
            preserve_index=False,
        )

    partials = src.mapInArrow(partial_fn, schema=partial_schema)
    return _merge_partials(partials, key_cols, salt, counters)


def _sketch_tokens_multi(
    df: DataFrame,
    key_cols: Sequence[str],
    tag_field: "T.StructField",
    variants: "list[tuple[object, int, Callable[[], object]]]",
    text_col: str,
    seed: int,
    salt: int | None,
    counters: dict | None = None,
) -> DataFrame:
    """Shared engine for the one-scan sweep kernels: tokens are hashed
    once per Arrow batch; each distinct shingle width among ``variants``
    is rolled once; every variant's sketch consumes its width's hash
    segment. ``variants`` is [(tag_value, shingle_w, factory)]; the tag
    becomes the leading output column named by ``tag_field``. Output:
    (tag, *key_cols, sketch); each variant's blobs are bit-identical to
    ``sketch_tokens_by_key`` with that (factory, shingle_w) — pinned by
    tests."""
    ensure_shipped(df.sparkSession)
    key_cols = list(key_cols)
    if not variants:
        raise ValueError("variants must be non-empty")
    tags = [t for t, _, _ in variants]
    if len(set(tags)) != len(tags):
        raise ValueError(f"variant tags must be distinct, got {tags}")
    if any(w < 1 for _, w, _ in variants):
        raise ValueError("shingle widths must be >= 1")
    src = df.select(*key_cols, text_col)
    out_keys = [tag_field.name] + key_cols
    partial_schema = T.StructType(
        [tag_field]
        + _key_schema(src, key_cols)
        + [
            T.StructField(_PART_COL, T.IntegerType(), False),
            T.StructField(SKETCH_COL, T.BinaryType(), False),
        ]
    )
    n_keys = len(key_cols)
    widths = sorted({w for _, w, _ in variants})

    def partial_fn(batches):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(partial_schema)
        acc: dict[tuple, object] = {}
        n_rows = 0
        for rb in batches:
            n_rows += rb.num_rows
            th, lens = hashing.hash_tokens_arrow(rb.column(n_keys))
            codes, uniq = _batch_key_codes(rb, n_keys)
            for w in widths:
                sh, doc_idx = hashing.shingle_hashes(th, lens, w=w, seed=seed)
                if len(sh):
                    shingle_codes = codes[doc_idx]
                    order = np.argsort(shingle_codes, kind="stable")
                    bounds = np.searchsorted(
                        shingle_codes[order], np.arange(len(uniq) + 1)
                    )
                w_variants = [(t, mk) for t, vw, mk in variants if vw == w]
                for ci, key in enumerate(uniq):
                    vals = None
                    if len(sh):
                        seg = order[bounds[ci] : bounds[ci + 1]]
                        if len(seg):
                            # one fancy-index copy per key, shared by
                            # every sketch type (update_hashes never
                            # mutates its input)
                            vals = sh[seg]
                    for tag, make_sketch in w_variants:
                        tk = (tag, *key)
                        sk = acc.get(tk)
                        if sk is None:
                            sk = acc[tk] = make_sketch()
                        if vals is not None:
                            sk.update_hashes(vals)
        if counters:
            if "rows" in counters:
                counters["rows"].add(n_rows)
            if "partials" in counters:
                counters["partials"].add(len(acc))
        yield pa.RecordBatch.from_pandas(
            _emit_partials(acc, out_keys),
            schema=arrow_schema,
            preserve_index=False,
        )

    partials = src.mapInArrow(partial_fn, schema=partial_schema)
    return _merge_partials(partials, out_keys, salt, counters)


def sketch_tokens_multi_w(
    df: DataFrame,
    key_cols: Sequence[str],
    make_sketch: Callable[[], object],
    ws: Sequence[int],
    text_col: str = "text",
    seed: int = 0,
    salt: int | None = None,
    counters: dict | None = None,
) -> DataFrame:
    """One sketch per (w, key) for EVERY shingle width in ``ws`` from a
    single scan. The multi-width sweep analogue of the reference's
    mkdist regime (/root/reference/src/mkdistmain.cpp:12-142, one
    subprocess — i.e. one full input pass — per k); at 100 TB the
    input scan dominates, so an n-width sweep must not cost n scans.
    Output columns: (w:int, *key_cols, sketch)."""
    ws = [int(w) for w in ws]
    if len(set(ws)) != len(ws) or not ws:
        raise ValueError(f"ws must be non-empty and distinct, got {ws}")
    return _sketch_tokens_multi(
        df,
        key_cols,
        T.StructField("w", T.IntegerType(), False),
        [(w, w, make_sketch) for w in ws],
        text_col,
        seed,
        salt,
        counters,
    )


def sketch_tokens_multi_type(
    df: DataFrame,
    key_cols: Sequence[str],
    factories: "dict[str, Callable[[], object]]",
    text_col: str = "text",
    shingle_w: int = 1,
    seed: int = 0,
    salt: int | None = None,
    counters: dict | None = None,
) -> DataFrame:
    """One sketch of EVERY type in ``factories`` per key from a single
    scan. The reference runs one process per sketch type (one full
    input pass each, /root/reference/src/dashing.cpp sketch_core); at
    100 TB an n-type comparison study must not cost n scans. Output
    columns: (sketch_type:string, *key_cols, sketch)."""
    factories = dict(factories)
    if not factories:
        raise ValueError("factories must be non-empty")
    return _sketch_tokens_multi(
        df,
        key_cols,
        T.StructField("sketch_type", T.StringType(), False),
        [(name, shingle_w, mk) for name, mk in factories.items()],
        text_col,
        seed,
        salt,
        counters,
    )


def sketch_hash_col_multi_type(
    df: DataFrame,
    key_cols: Sequence[str],
    factories: "dict[str, Callable[[], object]]",
    hash_col: str,
    salt: int | None = None,
) -> DataFrame:
    """Multi-type variant of :func:`sketch_hash_col_by_key`: one scan of
    a precomputed int64 hash column updates EVERY factory's sketch per
    key. Same output shape as :func:`sketch_tokens_multi_type`."""
    ensure_shipped(df.sparkSession)
    key_cols = list(key_cols)
    factories = dict(factories)
    if not factories:
        raise ValueError("factories must be non-empty")
    src = df.select(*key_cols, hash_col)
    out_keys = ["sketch_type"] + key_cols
    partial_schema = T.StructType(
        [T.StructField("sketch_type", T.StringType(), False)]
        + _key_schema(src, key_cols)
        + [
            T.StructField(_PART_COL, T.IntegerType(), False),
            T.StructField(SKETCH_COL, T.BinaryType(), False),
        ]
    )

    def partial_fn(batches):
        acc: dict[tuple, object] = {}
        for pdf in batches:
            h = pdf[hash_col].to_numpy(dtype=np.int64).view(np.uint64)
            keys = list(zip(*(pdf[k] for k in key_cols)))
            codes, uniq = pd.factorize(pd.Series(keys, dtype=object))
            order = np.argsort(codes, kind="stable")
            bounds = np.searchsorted(codes[order], np.arange(len(uniq) + 1))
            for ci, key in enumerate(uniq):
                seg = order[bounds[ci] : bounds[ci + 1]]
                vals = h[seg] if len(seg) else None  # one copy per key
                for name, make_sketch in factories.items():
                    tk = (name, *key)
                    sk = acc.get(tk)
                    if sk is None:
                        sk = acc[tk] = make_sketch()
                    if vals is not None:
                        sk.update_hashes(vals)
        yield _emit_partials(acc, out_keys)

    partials = src.mapInPandas(partial_fn, schema=partial_schema)
    return _merge_partials(partials, out_keys, salt)


def _sketch_tokens_weighted_cm(
    df: DataFrame,
    key_cols: list,
    make_sketch: Callable[[], object],
    text_col: str,
    shingle_w: int,
    seed: int,
    salt: int | None,
    cm_lg_width: int = 16,
    cm_depth: int = 4,
) -> DataFrame:
    """Weighted adapter, CM-approximate occurrence indexing — the
    reference's ACTUAL WeightedSketcher mechanism (wjcm defaults,
    /root/reference/src/dashing.h:252-253,471-485): a Count-Min sketch
    streams occurrence counts and the i-th duplicate of a shingle
    becomes item hash64(shingle, cm_count_so_far).

    Cost shape vs the exact mode: the exact row_number() window
    shuffles EVERY token occurrence once (no map-side combine is
    possible under a window); here the only shuffle is a repartition of
    the raw doc rows by key — so each key is one stream, the per-file
    granularity the reference runs at — and the CM lives in executor
    memory. Error: CM only OVERcounts (by ≤ εN with ε = e/2^lg_width
    per row, Pr ≥ 1-δ), so colliding shingles skip occurrence slots;
    the multiset estimate inherits that one-sided inflation on top of
    the sketch's own JI error (property-tested bound in
    tests/test_spark_agg.py).

    Vectorization: occurrences of a shingle within one Arrow batch get
    consecutive indices base..base+c-1 with base = the CM estimate
    carried across batches, then one batched CM update per batch —
    batch-granularity CM streaming, same ε bound as element-at-a-time.

    Memory: each live key holds a depth x 2^lg_width int64 counter
    matrix in the executor (2 MiB at the 16/4 defaults). With the
    repartition by key, a partition carries ~(#keys / #partitions)
    counters — for high-cardinality keys (url/site rather than lang)
    size ``cm_lg_width`` down (the eps = e/2^lg_width overcount bound
    trades directly against it) or prefer the exact mode, whose window
    shuffle holds no per-key executor state.

    Skew: one key = one stream = one task, so a giant key serializes
    through a single executor — inherent to streaming occurrence
    indexing (the reference's per-file counter has the same property),
    and bounded by that key's own data, not the table. Keys needing
    parallel exactness should use the exact mode (whose window shuffle
    parallelizes by (key, shingle))."""
    ensure_shipped(df.sparkSession)
    src = df.repartition(*key_cols).select(*key_cols, text_col)
    partial_schema = _partial_schema(src.select(*key_cols), key_cols)
    n_keys = len(key_cols)

    def partial_fn(batches):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        from dashing_spark.functions.cms import CountMinSketch

        arrow_schema = to_arrow_schema(partial_schema)
        acc: dict[tuple, object] = {}
        cms: dict[tuple, CountMinSketch] = {}
        for rb in batches:
            th, lens = hashing.hash_tokens_arrow(rb.column(n_keys))
            sh, doc_idx = hashing.shingle_hashes(th, lens, w=shingle_w, seed=seed)
            codes, uniq = _batch_key_codes(rb, n_keys)
            if len(sh):
                shingle_codes = codes[doc_idx]
                order = np.argsort(shingle_codes, kind="stable")
                bounds = np.searchsorted(
                    shingle_codes[order], np.arange(len(uniq) + 1)
                )
            for ci, key in enumerate(uniq):
                sk = acc.get(key)
                if sk is None:
                    sk = acc[key] = make_sketch()
                    cms[key] = CountMinSketch(cm_lg_width, cm_depth)
                if not len(sh):
                    continue
                seg = order[bounds[ci] : bounds[ci + 1]]
                if not len(seg):
                    continue
                vals = sh[seg]
                cm = cms[key]
                u, inv, cnt = np.unique(vals, return_inverse=True, return_counts=True)
                base = cm.query_hashes(u).astype(np.int64)
                # within-batch cumcount per shingle: group-sort inv, then
                # position minus group start
                g_order = np.argsort(inv, kind="stable")
                starts = np.concatenate(([0], np.cumsum(cnt[:-1])))
                local = np.arange(len(vals), dtype=np.int64) - np.repeat(starts, cnt)
                occ = np.empty(len(vals), dtype=np.int64)
                occ[g_order] = base[inv[g_order]] + local
                cm.update_hashes(u, cnt.astype(np.int64))
                with np.errstate(over="ignore"):
                    items = hashing.splitmix64(
                        vals ^ hashing.splitmix64(occ.view(np.uint64))
                    )
                sk.update_hashes(items)
        yield pa.RecordBatch.from_pandas(
            _emit_partials(acc, key_cols),
            schema=arrow_schema,
            preserve_index=False,
        )

    partials = src.mapInArrow(partial_fn, schema=partial_schema)
    return _merge_partials(partials, key_cols, salt)


def sketch_numeric_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    make_sketch: Callable[[], object],
    value_col: str,
    salt: int | None = None,
) -> DataFrame:
    """One sketch per key over a numeric column (KLL / t-digest path).

    Null / NaN values are dropped JVM-side before sketching — a NaN fed
    into a quantile sketch poisons its compactions (comparisons against
    NaN are false), while exact rank oracles skip nulls; both sides
    must agree on the population."""
    ensure_shipped(df.sparkSession)
    key_cols = list(key_cols)
    keep = F.col(value_col).isNotNull()
    if dict(df.dtypes).get(value_col) in ("float", "double"):
        keep = keep & ~F.isnan(value_col)
    src = df.filter(keep).select(*key_cols, value_col)
    partial_schema = _partial_schema(src, key_cols)

    def partial_fn(batches):
        acc: dict[tuple, object] = {}
        for pdf in batches:
            vals = pdf[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
            keys = list(zip(*(pdf[k] for k in key_cols)))
            codes, uniq = pd.factorize(pd.Series(keys, dtype=object))
            order = np.argsort(codes, kind="stable")
            bounds = np.searchsorted(codes[order], np.arange(len(uniq) + 1))
            for ci, key in enumerate(uniq):
                sk = acc.get(key)
                if sk is None:
                    sk = acc[key] = make_sketch()
                seg = order[bounds[ci] : bounds[ci + 1]]
                if len(seg):
                    sk.update_batch(vals[seg])
        yield _emit_partials(acc, key_cols)

    partials = src.mapInPandas(partial_fn, schema=partial_schema)
    return _merge_partials(partials, key_cols, salt)


def sketch_hash_col_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    make_sketch: Callable[[], object],
    hash_col: str,
    weight_col: str | None = None,
    salt: int | None = None,
) -> DataFrame:
    """One sketch per key over a precomputed int64 hash column (e.g.
    ``F.xxhash64(...)`` kept JVM-side) with optional weights (CMS path)."""
    ensure_shipped(df.sparkSession)
    key_cols = list(key_cols)
    cols = [*key_cols, hash_col] + ([weight_col] if weight_col else [])
    src = df.select(*cols)
    partial_schema = _partial_schema(src, key_cols)

    def partial_fn(batches):
        acc: dict[tuple, object] = {}
        for pdf in batches:
            h = pdf[hash_col].to_numpy(dtype=np.int64).view(np.uint64)
            w = (
                pdf[weight_col].to_numpy(dtype=np.int64)
                if weight_col
                else None
            )
            keys = list(zip(*(pdf[k] for k in key_cols)))
            codes, uniq = pd.factorize(pd.Series(keys, dtype=object))
            order = np.argsort(codes, kind="stable")
            bounds = np.searchsorted(codes[order], np.arange(len(uniq) + 1))
            for ci, key in enumerate(uniq):
                sk = acc.get(key)
                if sk is None:
                    sk = acc[key] = make_sketch()
                seg = order[bounds[ci] : bounds[ci + 1]]
                if len(seg):
                    if w is not None:
                        sk.update_hashes(h[seg], weights=w[seg])
                    else:
                        sk.update_hashes(h[seg])
        yield _emit_partials(acc, key_cols)

    partials = src.mapInPandas(partial_fn, schema=partial_schema)
    return _merge_partials(partials, key_cols, salt)


def _merge_rows(
    pdf: pd.DataFrame, key_cols: Sequence[str], acc_merges=None
) -> pd.DataFrame:
    blobs = pdf[SKETCH_COL]
    sk = sketch_from_bytes(blobs.iloc[0])
    for b in blobs.iloc[1:]:
        sk.merge(sketch_from_bytes(b))
    if acc_merges is not None:
        acc_merges.add(max(0, len(blobs) - 1))
    out = pdf.iloc[[0]][list(key_cols)].copy()
    out[SKETCH_COL] = [sk.to_bytes()]
    return out


def _merge_partials(
    partials: DataFrame,
    key_cols: Sequence[str],
    salt: int | None,
    counters: dict | None = None,
) -> DataFrame:
    result_schema = _result_schema(partials, key_cols)
    acc_merges = (counters or {}).get("merges")

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _merge_rows(pdf, key_cols, acc_merges)

    if salt and salt > 1:
        # explicit tree level: cap fan-in per merge task (par_reduce
        # analogue, /root/reference/src/union.cpp:10-24)
        salted = partials.withColumn(
            "__salt", F.pmod(F.col(_PART_COL), F.lit(salt)).cast("int")
        )
        salted_schema = T.StructType(
            _key_schema(partials, key_cols)
            + [
                T.StructField("__salt", T.IntegerType(), False),
                T.StructField(SKETCH_COL, T.BinaryType(), False),
            ]
        )

        def merge_salted(pdf: pd.DataFrame) -> pd.DataFrame:
            out = _merge_rows(pdf, key_cols, acc_merges)
            out["__salt"] = pdf["__salt"].iloc[0]
            return out[[*key_cols, "__salt", SKETCH_COL]]

        partials = (
            salted.groupBy(*key_cols, "__salt")
            .applyInPandas(merge_salted, schema=salted_schema)
        )
    else:
        partials = partials.drop(_PART_COL)

    return partials.groupBy(*key_cols).applyInPandas(merge_fn, schema=result_schema)


def merge_sketches_by_key(
    sketches: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """Merge a (key..., sketch) table down to one sketch per key — the
    cross-table union path (`dashing union` over sketch files built in
    separate runs, /root/reference/src/union.cpp:32-58). Input rows may
    come from different builds (e.g. different precisions after
    `fold_expr`); blobs under one key must be merge-compatible."""
    ensure_shipped(sketches.sparkSession)
    # the no-salt _merge_partials branch IS this operation (its
    # drop(_PART_COL) is a no-op here) — one merge implementation
    return _merge_partials(
        sketches.select(*key_cols, SKETCH_COL), key_cols, salt=None
    )


def union_all_sketches(sketches: DataFrame, sketch_col: str = SKETCH_COL) -> DataFrame:
    """Merge every sketch in a table into ONE — `dashing union`
    (/root/reference/src/union.cpp:32-58). Partition-level partial merge
    (mapInPandas) then a single final merge, i.e. a two-level tree."""
    ensure_shipped(sketches.sparkSession)
    schema = T.StructType([T.StructField(sketch_col, T.BinaryType(), False)])

    def partial(batches):
        acc = None
        for pdf in batches:
            for b in pdf[sketch_col]:
                if acc is None:
                    acc = sketch_from_bytes(b)
                else:
                    acc.merge(sketch_from_bytes(b))
        if acc is not None:
            yield pd.DataFrame({sketch_col: [acc.to_bytes()]})

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = sketch_from_bytes(pdf[sketch_col].iloc[0])
        for b in pdf[sketch_col].iloc[1:]:
            acc.merge(sketch_from_bytes(b))
        return pd.DataFrame({sketch_col: [acc.to_bytes()]})

    partials = sketches.select(sketch_col).mapInPandas(partial, schema=schema)
    return (
        partials.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(lambda pdf: final(pdf), schema=schema)
    )


def estimate_expr(estimator: str = "default"):
    """pandas UDF: sketch blob -> cardinality/count estimate (double).
    The reference's cardinality projection (src/dashing.h:488-495)."""

    @F.pandas_udf(T.DoubleType())
    def _est(blobs: pd.Series) -> pd.Series:
        return blobs.map(lambda b: float(sketch_from_bytes(b).estimate(estimator)))

    return _est


def quantile_expr(qs: Sequence[float]):
    """pandas UDF: quantile-sketch blob -> array<double> of quantiles."""
    qarr = list(qs)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _q(blobs: pd.Series) -> pd.Series:
        return blobs.map(
            lambda b: np.asarray(sketch_from_bytes(b).quantile(qarr), dtype=float).tolist()
        )

    return _q


def fold_expr(p_new: int):
    """pandas UDF: HLL blob -> HLL blob folded to precision p_new
    (`dashing fold`, /root/reference/src/dashing.cpp:570-590)."""

    @F.pandas_udf(T.BinaryType())
    def _fold(blobs: pd.Series) -> pd.Series:
        return blobs.map(lambda b: sketch_from_bytes(b).fold(p_new).to_bytes())

    return _fold


