"""Sources & sinks: testdata table loaders, the persisted sketch table
(the reference's sketch-file cache, make_fname
/root/reference/src/dashing.h:497-526), and matrix emitters."""

from dashing_spark.sources.tables import TABLES, load_table, load_tables, synth_pages

__all__ = ["TABLES", "load_table", "load_tables", "synth_pages"]
