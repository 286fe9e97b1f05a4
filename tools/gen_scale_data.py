"""Generate a driver-shaped synthetic scale directory for PERF work.

The driver's round-end measurement may run at sf1.0 (50k docs — see
BENCH_r06.json "sf"), but /root/testdata only ships up to sf0.1, so
superlinear effects (the dense near-dup graph) are invisible locally
without a regenerated large tier. This mimics the observed generation
scheme of the driver's documents table (inferred from sf0.001/0.01/0.1):

- text: 10..100 words uniform from a 30-word vocab; with p=0.05 a doc
  is instead an earlier doc's text + " dup" (the seeded near-dup);
- lang ~ {en: 0.4, zh/es/fr/de: 0.15 each}; source ~ src0..src19;
- lineitem/events/embeddings: sf0.1 contents replicated with shifted
  keys (only documents drives the heavy queries).

NOT used by bench.py or any query — measurement fixture only.

Usage: python tools/gen_scale_data.py OUT_DIR N_DOCS [REPL]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "big", "join", "sort", "order", "line",
    "filter", "group", "hash", "slow", "fast", "the", "row", "agg",
    "key", "query", "a", "scan", "batch", "part", "customer",
]
LANGS = ["en", "zh", "es", "fr", "de"]


def gen_documents(n: int, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    texts: list[str] = []
    for i in range(n):
        if i > 0 and rng.random() < 0.05:
            j = int(rng.integers(0, i))
            texts.append(texts[j] + " dup")
        else:
            k = int(rng.integers(10, 101))
            texts.append(" ".join(VOCAB[w] for w in rng.integers(0, len(VOCAB), k)))
    lang = rng.choice(LANGS, size=n, p=[0.4, 0.15, 0.15, 0.15, 0.15])
    source = np.array([f"src{int(s)}" for s in rng.integers(0, 20, n)])
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": lang,
            "source": source,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def main() -> None:
    out = sys.argv[1]
    n_docs = int(sys.argv[2])
    repl = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    src = "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    docs = gen_documents(n_docs)
    con.register("docs", docs)
    con.sql(f"copy docs to '{out}/documents.parquet' (format parquet)")
    print("documents:", n_docs)
    reps = ",".join(str(i) for i in range(repl))
    for tbl, key_shift in [
        ("lineitem", "l_orderkey + r * 6000000"),
        ("orders", "o_orderkey + r * 6000000"),
        ("events", "user_id"),
        ("embeddings", "vec_id + r * 1000000"),
    ]:
        cols = [r[0] for r in con.sql(
            f"describe select * from '{src}/{tbl}.parquet'").fetchall()]
        key = key_shift.split(" ")[0]
        if key not in cols:
            sel = "*"
        else:
            sel = ", ".join(
                f"({key_shift}) as {c}" if c == key else c for c in cols
            )
        con.sql(
            f"copy (select {sel} from '{src}/{tbl}.parquet', "
            f"(select unnest([{reps}]) as r)) to '{out}/{tbl}.parquet' "
            f"(format parquet)"
        )
        print(tbl, "replicated", repl, "x")
    for tbl in ["region", "nation", "customer", "supplier", "part"]:
        con.sql(
            f"copy (select * from '{src}/{tbl}.parquet') to "
            f"'{out}/{tbl}.parquet' (format parquet)"
        )
    print("done:", out)


if __name__ == "__main__":
    main()
