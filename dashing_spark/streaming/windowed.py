"""Event-time windowed aggregation with watermark-based late-data
handling — the BUILT-IN Structured Streaming state mechanism, alongside
the repo's two custom ones (foreachBatch epoch state in incremental.py,
applyInPandasWithState in stateful.py).

The sketch state tables deliberately need no watermark (sketches are
order-independent monoids — a late row merges whenever it arrives; see
incremental.incremental_sketch_query). But a pipeline also needs
FINALIZED per-window outputs — "day X is closed, emit it exactly once,
drop anything later" — and that is exactly what
``withWatermark`` + ``F.window`` + append mode provide: bounded state
(closed windows are evicted) and bounded output (each window emitted
once), which is what survives at 10^12-event scale where unbounded
window state would not.

``late_data_scenario`` is the deterministic two-phase harness the gate
and tests share: phase 1 processes on-time data and advances the
watermark past the first window's end; phase 2 restarts FROM THE SAME
CHECKPOINT (watermark is recovered from the commit log) and replays
rows older than the watermark, which the engine must drop before they
reach the aggregation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window: str = "1 day",
    delay: str = "1 hour",
) -> DataFrame:
    """Tumbling-window event/user counts over an event-time stream with
    a ``delay`` watermark. In append mode each window is emitted once,
    when the watermark passes its end; rows arriving with event time
    older than the watermark are dropped by the engine (bounded state +
    at-most-once per window — the late-data contract)."""
    return (
        stream.withWatermark(ts_col, delay)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(user_col).alias("n_events"),
            F.approx_count_distinct(user_col).alias("n_users_approx"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
            "n_users_approx",
        )
    )


def _run_once(spark: SparkSession, src: str, out: str, ck: str, schema) -> None:
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("windowed stream did not finish within 300s")


def late_data_scenario(spark: SparkSession, workdir: str) -> dict:
    """Deterministic watermark/late-drop scenario. Returns bound
    booleans (all must be True):

    - ``window_emitted_once``: day-1's window appears exactly once in
      the append sink across both phases;
    - ``late_rows_dropped``: its count equals the ON-TIME rows only —
      the phase-2 replay of older-than-watermark rows did not mutate a
      finalized window (nor re-emit it);
    - ``open_window_held``: day-2's window (watermark never passed its
      end) is NOT emitted — append mode holds open windows back.

    Phase 1: 10 on-time day-1 events plus one day-2 01:30 event, so
    the post-batch watermark is day-2 00:30 (delay 1 h) > day-1's
    window end. Phase 2: 5 late day-1 12:00 events, older than the
    recovered watermark."""
    src = os.path.join(workdir, "src")
    out = os.path.join(workdir, "out")
    ck = os.path.join(workdir, "ck")
    schema = "ts timestamp, user_id string"

    def _rows(ts_users):
        return spark.createDataFrame(
            [(ts, u) for ts, u in ts_users], "ts string, user_id string"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "user_id")

    on_time = _rows(
        [(f"2026-01-01 00:{m:02d}:00", f"u{m}") for m in range(10)]
        + [("2026-01-02 01:30:00", "u_next")]
    )
    on_time.coalesce(1).write.mode("overwrite").parquet(src)
    _run_once(spark, src, out, ck, on_time.schema)

    late = _rows([("2026-01-01 12:00:00", f"late{i}") for i in range(5)])
    late.coalesce(1).write.mode("append").parquet(src)
    _run_once(spark, src, out, ck, on_time.schema)

    emitted = spark.read.parquet(out).collect()
    day1 = [r for r in emitted if r["w_start"].day == 1]
    day2 = [r for r in emitted if r["w_start"].day == 2]
    return {
        "window_emitted_once": len(day1) == 1,
        "late_rows_dropped": len(day1) == 1 and day1[0]["n_events"] == 10,
        "open_window_held": len(day2) == 0,
    }
