"""Oracle parity for legacy_queries() — the five queries retired from
the driver's 50-slot gate by round-4 consolidation. Their code paths
are distinct enough to keep gated locally (events-table numeric KLL,
streaming KLL state, source-keyed HLL, builtin cross-check), just not
worth five of the driver's fifty rows."""

import importlib.util
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")


def _load_checker():
    spec = importlib.util.spec_from_file_location(
        "check_oracle", os.path.join(_TOOLS, "check_oracle.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def duck():
    from dashing_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def _legacy_items():
    import __spark_entry__ as entry

    return sorted(entry.legacy_queries().items())


@pytest.mark.parametrize("name,fn", _legacy_items(), ids=lambda x: x if isinstance(x, str) else "")
def test_legacy_query_matches_oracle(spark, duck, name, fn):
    import __spark_entry__ as entry

    checker = _load_checker()
    spark_pdf = fn(spark, SF_DIR).toPandas()
    oracle_pdf = duck.execute(entry.legacy_oracle_sql()[name]).df()
    problems = checker.compare(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: {problems}"
