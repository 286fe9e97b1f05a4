"""Spark-side operators: sketch aggregation, pairwise distances, dedup,
similarity search, and text analysis — all DataFrame-native."""
