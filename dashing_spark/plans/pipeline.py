"""Checkpointed sketch-build pipeline with lineage + metrics.

Reference behavior being re-expressed: dashing caches each sketch in a
deterministically-named file and reuses it when present (`-W`/cache
branch, /root/reference/src/sketch_and_cmp.h:326-357). Our checkpoint
unit is the *sketch table*: a parquet (Iceberg at production — jars not
in this image, parquet has the same downstream shape) directory keyed by
a params fingerprint. A rerun with identical (input, key, sketch params)
resumes from the snapshot instead of recomputing; anything else builds
fresh under a different fingerprint.

Per the north rule, each run emits:
- per-partition lineage (partition id, rows consumed, order-insensitive
  row fingerprint) — proves which input slices fed the snapshot;
- update/merge counters + wall time as a metrics dict / JSON file.

Counters come from Spark accumulators updated inside the Arrow batch
kernels — they cross the executor boundary for free.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from dashing_spark.operators import agg
from dashing_spark.params import SketchParams


@dataclass
class RunMetrics:
    rows_in: int
    keys_out: int
    partial_sketches: int
    merges: int
    resumed: bool
    wall_sec: float
    checkpoint: str
    params: dict

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)


def params_fingerprint(
    params: SketchParams,
    key_cols: Sequence[str],
    input_token: str = "",
    sketch_tag: str = "",
) -> str:
    """Checkpoint key. ``input_token`` identifies the input dataset
    (semantic plan hash / source file list) and ``sketch_tag`` the
    sketch constructor (serialized header bytes) — without them a rerun
    against different data or a different sketch type would silently
    resume from a stale snapshot."""
    import hashlib

    blob = json.dumps(
        {
            "params": params.to_dict(),
            "keys": list(key_cols),
            "input": input_token,
            "sketch": sketch_tag,
        },
        sort_keys=True,
    )
    return hashlib.md5(blob.encode()).hexdigest()[:16]


def input_token_for(df: DataFrame) -> str:
    """Stable identifier of a DataFrame's input: the analyzed-plan
    semantic hash when available, else the sorted source-file list."""
    try:
        return f"plan:{df._jdf.semanticHash()}"
    except Exception:
        try:
            return "files:" + ",".join(sorted(df.inputFiles()))
        except Exception:
            return ""


def sketch_tag_for(make_sketch: Callable[[], object]) -> str:
    """Identify the sketch constructor by its serialized header bytes
    (magic + type id + leading params)."""
    try:
        return bytes(make_sketch().to_bytes()[:8]).hex()
    except Exception:
        return type(make_sketch()).__name__


def partition_lineage(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(partition_id, n_rows, fingerprint): order-insensitive xor-style
    fingerprint of the rows each input partition contributed — the
    resume audit trail. Pure JVM: xxhash64 per row, bit-agnostic sum."""
    h = F.xxhash64(*cols)
    return (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__h", h)
        .groupBy("__pid")
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(__h)").alias("fingerprint"),
        )
        .withColumnRenamed("__pid", "partition_id")
    )


def build_or_resume_sketch_table(
    df: DataFrame,
    key_cols: Sequence[str],
    make_sketch: Callable[[], object],
    checkpoint_dir: str,
    params: SketchParams | None = None,
    text_col: str = "text",
    salt: int | None = None,
    force: bool = False,
) -> tuple[DataFrame, RunMetrics]:
    """Build the sketch table, or read it back if this exact
    (params, keys) snapshot already exists. Returns (sketches, metrics).
    """
    spark = df.sparkSession
    params = params or SketchParams()
    fp = params_fingerprint(
        params, key_cols, input_token_for(df), sketch_tag_for(make_sketch)
    )
    snap = os.path.join(checkpoint_dir, f"sketches_{fp}")
    lineage_path = os.path.join(checkpoint_dir, f"lineage_{fp}")
    metrics_path = os.path.join(checkpoint_dir, f"metrics_{fp}.json")
    t0 = time.time()

    success = os.path.join(snap, "_SUCCESS")
    if not force and os.path.exists(success):
        sketches = spark.read.parquet(snap)
        m = RunMetrics(
            rows_in=0,
            keys_out=sketches.count(),
            partial_sketches=0,
            merges=0,
            resumed=True,
            wall_sec=time.time() - t0,
            checkpoint=snap,
            params=params.to_dict(),
        )
        return sketches, m

    sc = spark.sparkContext
    acc_rows = sc.accumulator(0)
    acc_partials = sc.accumulator(0)
    acc_merges = sc.accumulator(0)

    src = df.select(*key_cols, text_col)
    partials = _counted_partials(
        src, list(key_cols), make_sketch, text_col, params, acc_rows, acc_partials
    )
    sketches = _counted_merge(partials, list(key_cols), salt, acc_merges)

    sketches.write.mode("overwrite").parquet(snap)
    partition_lineage(src, [text_col]).write.mode("overwrite").parquet(lineage_path)
    out = spark.read.parquet(snap)
    m = RunMetrics(
        rows_in=acc_rows.value,
        keys_out=out.count(),
        partial_sketches=acc_partials.value,
        merges=acc_merges.value,
        resumed=False,
        wall_sec=time.time() - t0,
        checkpoint=snap,
        params=params.to_dict(),
    )
    with open(metrics_path, "w") as f:
        f.write(m.to_json())
    return out, m


def _counted_partials(src, key_cols, make_sketch, text_col, params, acc_rows, acc_partials):
    import numpy as np
    import pandas as pd

    from dashing_spark.functions import hashing
    from dashing_spark.operators.agg import _emit_partials, _partial_schema
    from dashing_spark.operators.ship import ensure_shipped

    ensure_shipped(src.sparkSession)
    partial_schema = _partial_schema(src.select(*key_cols), key_cols)
    shingle_w, seed = params.shingle_w, params.seed
    n_keys = len(key_cols)

    def partial_fn(batches):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(partial_schema)
        acc: dict[tuple, object] = {}
        n = 0
        for rb in batches:
            n += rb.num_rows
            th, lens = hashing.hash_tokens_arrow(rb.column(n_keys))
            sh, doc_idx = hashing.shingle_hashes(th, lens, w=shingle_w, seed=seed)
            keys = list(zip(*(rb.column(i).to_pylist() for i in range(n_keys))))
            codes, uniq = pd.factorize(pd.Series(keys, dtype=object))
            if len(sh):
                shingle_codes = codes[doc_idx]
                order = np.argsort(shingle_codes, kind="stable")
                bounds = np.searchsorted(shingle_codes[order], np.arange(len(uniq) + 1))
            for ci, key in enumerate(uniq):
                sk = acc.get(key)
                if sk is None:
                    sk = acc[key] = make_sketch()
                if len(sh):
                    seg = order[bounds[ci] : bounds[ci + 1]]
                    if len(seg):
                        sk.update_hashes(sh[seg])
        acc_rows.add(n)
        acc_partials.add(len(acc))
        yield pa.RecordBatch.from_pandas(
            _emit_partials(acc, key_cols), schema=arrow_schema, preserve_index=False
        )

    return src.mapInArrow(partial_fn, schema=partial_schema)


def _counted_merge(partials, key_cols, salt, acc_merges):
    import pandas as pd

    from dashing_spark.functions.serde import sketch_from_bytes
    from dashing_spark.operators.agg import (
        SKETCH_COL,
        _PART_COL,
        _result_schema,
    )

    result_schema = _result_schema(partials, key_cols)

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        blobs = pdf[SKETCH_COL]
        sk = sketch_from_bytes(blobs.iloc[0])
        for b in blobs.iloc[1:]:
            sk.merge(sketch_from_bytes(b))
        acc_merges.add(max(0, len(blobs) - 1))
        out = pdf.iloc[[0]][list(key_cols)].copy()
        out[SKETCH_COL] = [sk.to_bytes()]
        return out

    if salt and salt > 1:
        from pyspark.sql import types as T

        salted_schema = T.StructType(
            [f for f in partials.schema.fields if f.name != _PART_COL][:-1]
            + [
                T.StructField("__salt", T.IntegerType(), False),
                T.StructField(SKETCH_COL, T.BinaryType(), False),
            ]
        )

        def merge_salted(pdf: pd.DataFrame) -> pd.DataFrame:
            out = merge_fn(pdf)
            out["__salt"] = pdf["__salt"].iloc[0]
            return out[[*key_cols, "__salt", SKETCH_COL]]

        salted = partials.withColumn(
            "__salt", F.pmod(F.col(_PART_COL), F.lit(salt)).cast("int")
        )
        partials = salted.groupBy(*key_cols, "__salt").applyInPandas(
            merge_salted, schema=salted_schema
        )
    else:
        partials = partials.drop(_PART_COL)
    return partials.groupBy(*key_cols).applyInPandas(merge_fn, schema=result_schema)
