"""Checkpointed pipelines: sketch-table persistence (the reference's
sketch-file cache, make_fname /root/reference/src/dashing.h:497-526),
resume-from-snapshot, per-partition lineage, and run metrics."""
