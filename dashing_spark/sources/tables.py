"""Table loaders — parquet scans (Catalyst handles pushdown/pruning) and
the deterministic synthetic `pages` generator from FIXTURES.md §1.

At production scale these scans are Iceberg table reads; Iceberg jars are
not in this image, so the reader falls back to plain parquet paths with
the same DataFrame downstream (gate: `iceberg_available()`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


def load_table(
    spark: SparkSession, sf_dir: str, name: str, catalog: str | None = None
) -> DataFrame:
    """Read a fixture table. With ``catalog`` set (e.g. "warehouse") and
    Iceberg on the classpath, reads `catalog.name` as an Iceberg table —
    the production path (snapshot isolation, partition evolution);
    otherwise the plain parquet directory, same DataFrame downstream."""
    if catalog is not None and iceberg_available(spark):
        return spark.table(f"{catalog}.{name}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    out = {}
    for n in names:
        df = load_table(spark, sf_dir, n)
        df.createOrReplaceTempView(n)
        out[n] = df
    return out


def synth_pages(spark: SparkSession, n: int = 1000, n_sites: int = 50) -> DataFrame:
    """Deterministic Common-Crawl-style `pages` table (FIXTURES.md §1,
    BASELINE.json input_hint shape: url, warc_ts, html, text, lang).

    Built from the `documents` analogue pattern entirely with JVM-side
    expressions over `spark.range` — no Python in the generator, so it
    scales to bench sizes and is byte-identical across runs/parallelism.
    """
    vocab = [
        "the", "data", "web", "page", "crawl", "index", "search", "link",
        "site", "query", "text", "word", "count", "hash", "merge", "spark",
        "table", "row", "batch", "scan", "join", "sort", "key", "value",
        "filter", "agg", "window", "stream", "cache", "shard", "node", "net",
    ]
    # skewed lang assignment: 60/20/10/7/3 (exercises salting)
    df = spark.range(n).withColumn(
        "lang",
        F.when(F.pmod("id", F.lit(100)) < 60, "en")
        .when(F.pmod("id", F.lit(100)) < 80, "de")
        .when(F.pmod("id", F.lit(100)) < 90, "fr")
        .when(F.pmod("id", F.lit(100)) < 97, "es")
        .otherwise("zh"),
    )
    df = df.withColumn(
        "url",
        F.concat(
            F.lit("https://site"),
            F.pmod("id", F.lit(n_sites)).cast("string"),
            F.lit(".example/"),
            F.col("id").cast("string"),
        ),
    )
    df = df.withColumn(
        "warc_ts", F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id"))
    )
    # deterministic pseudo-text: len in [10, 90), token picked by a hash
    # of (url, position) — pure column expressions, fully JVM-side
    words = F.array(*[F.lit(w) for w in vocab])
    doclen = (F.pmod(F.abs(F.xxhash64("url")), F.lit(80)) + F.lit(10)).cast("int")
    df = df.withColumn(
        "_toks",
        F.transform(
            F.sequence(F.lit(0), doclen - 1),
            lambda i: F.element_at(
                words,
                (F.pmod(F.abs(F.xxhash64(F.col("url"), i)), F.lit(len(vocab))) + 1).cast("int"),
            ),
        ),
    )
    df = df.withColumn("text", F.array_join("_toks", " "))
    # messy-but-realistic page markup around the SAME tokens, built so
    # extract_text(html, layout="flat") == text BYTE-IDENTICALLY: the
    # title holds token 1, a <p> the first half, a <div> the rest with
    # an inline <b> around the last token and one '&nbsp;' inter-token
    # separator; comment/style/script blocks (the script containing
    # '<', '&' and a fake '<p>' that must NOT survive) are noise the
    # extractor has to remove. doclen >= 10 keeps every slice non-empty.
    half = F.floor(doclen / F.lit(2)).cast("int")
    n_id = F.col("id").cast("string")
    df = df.withColumn(
        "html",
        F.encode(
            F.concat(
                F.lit("<html>\n<!-- page "), n_id,
                F.lit(" : comment text must vanish -->\n<head><title>"),
                F.element_at("_toks", 1),
                F.lit("</title>\n<style type=\"text/css\">body { color: #fff; }</style>\n"
                      "<script type=\"text/javascript\">var n = "),
                n_id,
                F.lit("; if (n < 2) { alert(\"a&b <p>unclosed\"); }</script>\n"
                      "</head>\n<body class=\"site\">\n<p id=\"p-"),
                n_id,
                F.lit("\">"),
                F.array_join(F.slice("_toks", 2, half - F.lit(1)), " "),
                F.lit("</p>\n<div data-x=\"1\">"),
                F.array_join(
                    F.slice("_toks", half + F.lit(1), doclen - half - F.lit(1)), " "
                ),
                F.lit("&nbsp;<b>"),
                F.element_at("_toks", doclen),
                F.lit("</b></div>\n</body>\n</html>"),
            ),
            "UTF-8",
        ),
    )
    return df.select("url", "warc_ts", "html", "text", "lang")


def extract_text(pages: DataFrame, layout: str = "flat") -> DataFrame:
    """html(binary) -> `text_extracted` via the deterministic JVM
    extraction chain (strip script/style/comments/tags, decode
    entities, normalize whitespace — operators.text.extract_text_col).
    Byte-identical per url across runs/parallelism (input_hint
    invariant): pinned by tests against the generator's `text`."""
    from dashing_spark.operators import text as text_ops

    return pages.withColumn(
        "text_extracted",
        text_ops.extract_text_col(F.decode(F.col("html"), "UTF-8"), layout=layout),
    )


#: document interchange formats — parquet is the native store; jsonl is
#: the web-pipeline exchange format (lossless for arbitrary strings);
#: csv is the lowest common denominator (quoted/escaped + multiLine so
#: embedded newlines and quotes survive)
DOC_FORMATS = ("parquet", "jsonl", "csv")


def write_documents(df: DataFrame, path: str, fmt: str = "jsonl") -> None:
    """Write a documents-shaped frame in an interchange format. Spark
    native writers throughout — one file per partition, no driver
    funnel; `mode=overwrite` so retried jobs are idempotent."""
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
    elif fmt == "jsonl":
        df.write.mode("overwrite").json(path)
    elif fmt == "csv":
        # quoteAll + a sentinel nullValue: otherwise NULL and '' both
        # serialize to nothing and the distinction is lost on read;
        # quoting also preserves leading/trailing whitespace
        (
            df.write.mode("overwrite")
            .option("header", True)
            .option("escape", '"')
            .option("quoteAll", True)
            # Spark's reader matches nullValue AFTER unquoting, so ANY
            # sentinel collides with identical literal text; a single
            # NUL char is the least-collidable choice (web text never
            # legitimately contains it — unlike '\\N', which appears
            # verbatim in MySQL/TSV dumps and was silently nulled)
            .option("nullValue", "\x00")
            # the WRITER trims by default — lossless means off
            .option("ignoreLeadingWhiteSpace", False)
            .option("ignoreTrailingWhiteSpace", False)
            .csv(path)
        )
    else:
        raise ValueError(f"fmt must be one of {DOC_FORMATS}, got {fmt!r}")


def read_documents(
    spark: SparkSession, path: str, fmt: str = "jsonl", schema=None
) -> DataFrame:
    """Read documents written by :func:`write_documents`. ``schema``
    (DDL string or StructType) pins column types — JSON/CSV inference
    would otherwise widen/narrow types run-to-run, which breaks
    bit-stable downstream hashing. ``multiLine`` on CSV so quoted
    embedded newlines round-trip."""
    if fmt == "parquet":
        r = spark.read
        if schema is not None:
            r = r.schema(schema)  # pins types for foreign-written files
        return r.parquet(path)
    if fmt == "jsonl":
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.json(path)
    if fmt == "csv":
        r = (
            spark.read.option("header", True)
            .option("escape", '"')
            .option("multiLine", True)
            .option("nullValue", "\x00")
            .option("ignoreLeadingWhiteSpace", False)
            .option("ignoreTrailingWhiteSpace", False)
        )
        if schema is not None:
            r = r.schema(schema)
        return r.csv(path)
    raise ValueError(f"fmt must be one of {DOC_FORMATS}, got {fmt!r}")
