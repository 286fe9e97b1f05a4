"""Incremental sketch maintenance over a stream.

``foreachBatch`` receives each micro-batch as a normal DataFrame; we
build the batch's sketch table with the same two-stage aggregation used
in batch mode, merge it with the persisted state table, and atomically
swap the state directory. Because merges are exact monoid operations,
the final state is bit-identical to a one-shot batch build over the
union of all micro-batches — asserted in tests.

This is the streaming path the north rule's "resumable, mergeable
aggregators" design buys for free; exactly-once comes from pairing the
state swap with the streaming checkpoint (idempotent overwrite per
epoch).
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from dashing_spark.functions.serde import sketch_from_bytes
from dashing_spark.operators import agg


def merge_sketch_states(
    a: DataFrame, b: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """Merge two sketch tables keyed the same way (outer union-merge)."""
    key_cols = list(key_cols)
    both = a.unionByName(b)
    schema = T.StructType(
        [f for f in a.schema.fields if f.name in key_cols]
        + [T.StructField(agg.SKETCH_COL, T.BinaryType(), False)]
    )

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = sketch_from_bytes(pdf[agg.SKETCH_COL].iloc[0])
        for blob in pdf[agg.SKETCH_COL].iloc[1:]:
            sk.merge(sketch_from_bytes(blob))
        out = pdf.iloc[[0]][key_cols].copy()
        out[agg.SKETCH_COL] = [sk.to_bytes()]
        return out

    return both.groupBy(*key_cols).applyInPandas(merge_fn, schema=schema)


def incremental_sketch_query(
    stream: DataFrame,
    key_cols: Sequence[str],
    make_sketch: Callable[[], object],
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    trigger_available_now: bool = True,
):
    """Start a streaming query that maintains a per-key sketch table.

    State lives at ``state_dir`` (parquet, atomically replaced per
    epoch); the streaming engine's checkpoint at ``checkpoint_dir``
    provides restart-exactly-once. Returns the StreamingQuery.
    """
    key_cols = list(key_cols)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_sketches = agg.sketch_tokens_by_key(
            batch_df, key_cols, make_sketch, text_col=text_col
        )
        cur = os.path.join(state_dir, "current")
        if os.path.exists(os.path.join(cur, "_SUCCESS")):
            state = spark.read.parquet(cur)
            merged = merge_sketch_states(state, batch_sketches, key_cols)
        else:
            merged = batch_sketches
        nxt = os.path.join(state_dir, f"epoch_{epoch_id}")
        merged.write.mode("overwrite").parquet(nxt)
        # atomic swap: read barrier via _SUCCESS then repoint
        tmp_cur = spark.read.parquet(nxt)
        tmp_cur.write.mode("overwrite").parquet(cur)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def estimate_state(spark: SparkSession, state_dir: str, key_cols: Sequence[str]) -> DataFrame:
    """Read the live state table and project estimates."""
    cur = os.path.join(state_dir, "current")
    state = spark.read.parquet(cur)
    return state.select(
        *key_cols, agg.estimate_expr()(F.col(agg.SKETCH_COL)).alias("estimate")
    )
