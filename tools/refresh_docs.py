"""Regenerate the query/test counts embedded in README.md.

VERDICT r2 #4: hand-edited counts drift every round (r1: 147 vs 142,
r2: 48/173 vs 49/182). This script derives them from the single
sources of truth — ``len(__spark_entry__.queries())`` and
``pytest --collect-only`` — and rewrites the README lines in place.
Run it in the round checklist whenever queries or tests change.

Usage: python tools/refresh_docs.py [--check]
  --check: exit 1 if README is stale instead of rewriting it.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def counts() -> tuple[int, int, int]:
    import __spark_entry__ as entry

    n_queries = len(entry.queries())
    n_oracles = len(entry.oracle_sql())
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests/"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    )
    m = re.search(r"(\d+) tests collected", out.stdout)
    if not m:
        raise RuntimeError(f"could not parse pytest collect output:\n{out.stdout[-500:]}")
    return n_queries, n_oracles, int(m.group(1))


def rewrite(text: str, n_queries: int, n_oracles: int, n_tests: int) -> str:
    text = re.sub(
        r"`__spark_entry__\.py` — \d+ queries",
        f"`__spark_entry__.py` — {n_queries} queries",
        text,
    )
    text = re.sub(r"\(\d+ tests;", f"({n_tests} tests;", text)
    text = re.sub(
        r"\(\d+ DuckDB-oracle query checks\)",
        f"({n_oracles} DuckDB-oracle query checks)",
        text,
    )
    return text


def main() -> None:
    check = "--check" in sys.argv
    n_queries, n_oracles, n_tests = counts()
    path = os.path.join(REPO, "README.md")
    old = open(path).read()
    new = rewrite(old, n_queries, n_oracles, n_tests)
    if new == old:
        print(f"README.md up to date ({n_queries} queries, {n_tests} tests)")
        return
    if check:
        print("README.md counts are STALE — run python tools/refresh_docs.py")
        sys.exit(1)
    open(path, "w").write(new)
    print(
        f"README.md refreshed: {n_queries} queries, {n_oracles} oracle checks, "
        f"{n_tests} tests"
    )


if __name__ == "__main__":
    main()
