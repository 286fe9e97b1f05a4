"""Structured Streaming integration (foreachBatch incremental sketches).

The reference is a batch CLI; its single-pass bounded-memory consumption
maps naturally onto streaming because every sketch is a commutative
monoid — `merge(state, sketch(batch))` is exact regardless of batch
boundaries (SURVEY.md §2, streaming note)."""

from dashing_spark.streaming.incremental import (
    incremental_sketch_query,
    merge_sketch_states,
)

__all__ = ["incremental_sketch_query", "merge_sketch_states"]
