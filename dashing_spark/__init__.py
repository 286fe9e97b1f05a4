"""dashing_spark — a PySpark-native distributed sketch / approximate-
aggregation engine with the query capabilities of dnbaker/dashing.

Built from scratch on DataFrames + vectorized pandas/Arrow UDFs; NOT a
port of the reference C++ engine (see SURVEY.md). Layout:

- ``functions/``  pure-numpy sketch kernels (HLL, Bloom, count-min, KMV,
  b-bit MinHash, SimHash, KLL, t-digest) + vectorized 64-bit hashing.
- ``operators/``  Spark-side operators: two-stage sketch aggregation,
  pairwise distance joins, dedup, similarity search, text analysis.
- ``sources/``    table loaders and sketch-table / matrix sinks.
- ``plans/``      checkpointed pipelines, lineage + metrics.
- ``streaming/``  Structured Streaming (foreachBatch) integration.
"""

from dashing_spark.params import SketchParams

__version__ = "0.1.0"

__all__ = ["SketchParams", "__version__"]
