"""Seeded randomized cross-engine parity + invariants for the r5
regex-chain operators (PII detect/redact, URL canonicalization).

These ops promise their DuckDB oracles replicate them VERBATIM — that
rests on staying inside the Java∩RE2 syntax subset, which hand-picked
fixtures can't fully exercise. A deterministic random composer (seeded,
so failures reproduce) builds adversarial corpora: PII fragments glued
with digit/empty/unicode separators (the adjacency class that produced
the round-5 unmasking bug), URL pieces in every case/port/param/frag
combination. One Spark job per test; DuckDB replays per row.
"""

import random

import duckdb
from pyspark.sql import functions as F

from dashing_spark.operators import text


PII_SNIPPETS = [
    "jo.doe+x@sub.example.co.uk",
    "a@b.io",
    "admin@192.168.0.1",
    "123-45-6789",
    "999-99-9999",
    "+1 555-123-4567",
    "+44 207-946-0958",
    "10.0.0.1",
    "192.168.255.3",
    "8.8.8.8",
    "(555) 123-4567",
    "(555)123-4567",
    "555-123-4567",
    "555.123.4567",
    "4111111111111111",
    "4111 1111 1111 1111",
    "4111-1111-1111-1111",
    "30569309025904",
    "12345678901234567890123456789012",  # 32 digits: greedy 19+13 split
    "2001:0db8:85a3:0000:0000:8a2e:0370:7334",
    "2001:db8:85a3:0:0:8a2e:370:7334",
    "fe80::1",  # compressed form — documented non-match
]
JUNK = ["hello", "worldé", "42", "x9y", "...", "-", "(call)", "foo_bar", ""]
SEPS = ["", " ", ",", "x", "9", "-", " ", "@"]


def _pii_corpus(n=400, seed=7):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        parts = [rng.choice(PII_SNIPPETS + JUNK) for _ in range(rng.randint(1, 6))]
        s = parts[0]
        for p in parts[1:]:
            s += rng.choice(SEPS) + p
        out.append(s)
    return out


def _url_corpus(n=400, seed=11):
    rng = random.Random(seed)
    schemes = ["https://", "HTTP://", "ftp://", "HTTPS://", ""]
    wwws = ["www.", "WWW.", ""]
    hosts = ["Example.COM", "sub.ex.org", "ex-a.net", "XN--test.de"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b", "/x&y", "/p/7/", "/a%20b"]
    queries = [
        "",
        "?id=3",
        "?utm_source=f",
        "?utm_a=1&id=2",
        "?id=1&utm_b=2&gclid=z",
        "?a=1&b=2",
        "?b=2&a=1",
        "?z=1&a=2&m=3",
        "?fbclid=q",
        "?utm_x=1&utm_y=2",
        "?gclid=z&id=9",
        "?id=9&gclid=z&utm_k=1",
    ]
    # newline tails pin the \z (NOT $) anchor rule: Java's $ matches
    # before a final \n, RE2's does not — \z agrees in both engines
    frags = ["", "#sec", "#a?b", "#", "\n", "x\n"]
    out = []
    for _ in range(n):
        out.append(
            rng.choice(schemes)
            + rng.choice(wwws)
            + rng.choice(hosts)
            + rng.choice(ports)
            + rng.choice(paths)
            + rng.choice(queries)
            + rng.choice(frags)
        )
    return out


#: the oracle replica of canonicalize_url_col / url_host_col — keep in
#: lockstep with the dedup_exact_by_lang oracle in __spark_entry__.py
DUCK_CANON = """
WITH s1 AS (SELECT regexp_replace(?, '#.*', '') AS u),
s2 AS (SELECT regexp_replace(u, '[?&]utm_[A-Za-z_]+=[^&]*', '', 'g') AS u FROM s1),
s3 AS (SELECT regexp_replace(u, '[?&]fbclid=[^&]*', '', 'g') AS u FROM s2),
s4 AS (SELECT regexp_replace(u, '[?&]gclid=[^&]*', '', 'g') AS u FROM s3),
s5 AS (SELECT regexp_replace(u, '^([^?&]*)&([^?&#=]+=)', '\\1?\\2') AS u FROM s4),
s6a AS (SELECT regexp_replace(u, '[?]\\z', '') AS u FROM s5),
s6 AS (SELECT CASE WHEN regexp_extract(u, '[?](.*)\\z', 1) = '' THEN u
              ELSE regexp_replace(u, '[?].*\\z', '') || '?' ||
                   array_to_string(list_sort(string_split(
                       regexp_extract(u, '[?](.*)\\z', 1), '&')), '&')
              END AS u FROM s6a),
s7 AS (SELECT u, regexp_replace(regexp_replace(regexp_replace(
           lower(regexp_extract(u, '^[A-Za-z]+://[^/?#]*', 0)),
           ':80\\z', ''), ':443\\z', ''), '://www[.]', '://') AS head,
       regexp_replace(u, '^[A-Za-z]+://[^/?#]*', '') AS rest FROM s6)
SELECT regexp_replace(head || rest, '/\\z', ''),
       regexp_replace(lower(regexp_extract(?,
           '^[A-Za-z]+://([^/?#:]*)', 1)), '^www[.]', '')
FROM s7
"""


class TestPIIRandomized:
    def test_counts_match_duckdb(self, spark):
        corpus = _pii_corpus()
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(corpus)], "i int, t string"
        )
        rows = {
            r["i"]: r
            for r in df.withColumns(text.pii_counts_cols("t")).collect()
        }
        con = duckdb.connect()
        for i, s in enumerate(corpus):
            for kind, pat in text.PII_PATTERNS.items():
                d = con.execute(
                    "select len(regexp_extract_all(?, ?))", [s, pat]
                ).fetchone()[0]
                assert rows[i][f"pii_{kind}_count"] == d, (i, kind, s)

    def test_redaction_complete_and_idempotent(self, spark):
        corpus = _pii_corpus()
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(corpus)], "i int, t string"
        )
        red = df.withColumn("r1", text.redact_pii_col("t")).withColumn(
            "r2", text.redact_pii_col(F.col("r1"))
        )
        out = red.withColumns(text.pii_counts_cols("r1")).collect()
        for r in out:
            for kind in text.PII_PATTERNS:
                assert r[f"pii_{kind}_count"] == 0, (
                    f"residual {kind} after redaction in {r['r1']!r}"
                )
            assert r["r1"] == r["r2"], f"not idempotent: {r['t']!r}"


class TestURLRandomized:
    def test_canonicalize_matches_duckdb_and_idempotent(self, spark):
        corpus = _url_corpus()
        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(corpus)], "i int, u string"
        )
        got = {
            r["i"]: r
            for r in df.select(
                "i",
                text.canonicalize_url_col("u").alias("c1"),
                text.url_host_col("u").alias("h"),
            )
            .withColumn("c2", text.canonicalize_url_col(F.col("c1")))
            .collect()
        }
        con = duckdb.connect()
        for i, u in enumerate(corpus):
            dc, dh = con.execute(DUCK_CANON, [u, u]).fetchone()
            assert got[i]["c1"] == dc, (i, u, got[i]["c1"], dc)
            assert got[i]["h"] == dh, (i, u)
            assert got[i]["c2"] == got[i]["c1"], (
                f"not idempotent: {u!r} -> {got[i]['c1']!r} -> {got[i]['c2']!r}"
            )


def _html_corpus(n=500, seed=13):
    """Adversarial HTML fragments glued at random: unclosed scripts,
    bare '<'/'>' in text, case-variant tags, multiline comments,
    entity sequences incl. double-encoding, every block-tag family."""
    frags = [
        '<script>var x = 1 < 2; </script>', '<SCRIPT src="a.js">junk</script >',
        '<style>p { }</style>', '<!-- c -->', '<!--\nmultiline\n-->',
        '<p>', '</p>', '<P CLASS="x">', '<br/>', '<br />', '<hr>',
        '<b>', '</b>', '<a href="u?a=1&b=2">', '</a>', '<span data-x="<">',
        '&amp;', '&lt;tag&gt;', '&amp;lt;', '&nbsp;', '&quot;q&quot;',
        '&#39;s&#39;', '&apos;a&apos;', '&#34;d&#34;',
        'plain words', 'a < b', 'x > y', 'tab\there', 'nl\nthere',
        '  spaces  ', '<pre>code</pre>', '<title>t</title>', '<td>c</td>',
        '<header>h</header>', '<script>no close', '</script>',
        'unicodé ✓', '<div', '>', '<>', '< 2 >', '\r\n',
        '<h3>H</h3>', '<li>item</li>',
        '<table><tr><td>1</td></tr></table>',
    ]
    rng = random.Random(seed)
    return [
        "".join(rng.choice(frags) for _ in range(rng.randint(1, 10)))
        for _ in range(n)
    ]


class TestHTMLExtractRandomized:
    def test_extract_matches_duckdb_both_layouts(self, spark):
        corpus = _html_corpus()
        df = spark.createDataFrame(
            [(i, h) for i, h in enumerate(corpus)], "i int, h string"
        )
        got = {
            r["i"]: r
            for r in df.select(
                "i",
                text.extract_text_col("h", layout="flat").alias("flat"),
                text.extract_text_col("h", layout="lines").alias("lines"),
            ).collect()
        }
        con = duckdb.connect()
        q = (
            f"SELECT {text.extract_text_duckdb('?', layout='flat')},"
            f" {text.extract_text_duckdb('?', layout='lines')}"
        )
        for i, h in enumerate(corpus):
            dflat, dlines = con.execute(q, [h, h]).fetchone()
            assert got[i]["flat"] == dflat, (i, h, got[i]["flat"], dflat)
            assert got[i]["lines"] == dlines, (i, h)

    def test_extract_fixtures(self, spark):
        cases = [
            # (html, expected flat, expected lines)
            ("<p>a</p><p>b</p>", "a b", "a\nb"),
            ("<script>ignore<p>this</script>kept", "kept", "kept"),
            ("<style a=b>x{}</style>t", "t", "t"),
            ("<!-- no -->yes<!--\n-->", "yes", "yes"),
            ("a<b>b</b>c", "abc", "abc"),
            ("one&nbsp;two", "one two", "one two"),
            ("&amp;lt; &lt;i&gt; &quot;&#39;&apos;&#34;", "&lt; <i> \"''\"", "&lt; <i> \"''\""),
            ("<TD>c</td><BR/>d", "c d", "c\nd"),
            ("  lead\t\tmid \n trail  ", "lead mid trail", "lead mid\ntrail"),
            ("<script>unclosed <b>bold</b> leak", "unclosed bold leak", "unclosed bold leak"),
            ("", "", ""),
            ("<p></p>", "", ""),
        ]
        df = spark.createDataFrame(
            [(i, c[0]) for i, c in enumerate(cases)], "i int, h string"
        )
        got = {
            r["i"]: r
            for r in df.select(
                "i",
                text.extract_text_col("h", layout="flat").alias("f"),
                text.extract_text_col("h", layout="lines").alias("l"),
            ).collect()
        }
        for i, (h, f_want, l_want) in enumerate(cases):
            assert got[i]["f"] == f_want, (h, got[i]["f"], f_want)
            assert got[i]["l"] == l_want, (h, got[i]["l"], l_want)

    def test_escape_extract_roundtrip_on_documents(self, spark):
        """The q_fingerprint_stats gate tier invariant: escape ->
        wrap -> extract == whitespace-canonical original, on raw
        fixture text (newlines, punctuation, unicode)."""
        import __spark_entry__ as entry

        docs = spark.createDataFrame(
            [
                ("a", "plain text"),
                ("b", "has <tags> & &amp; entities"),
                ("c", "multi\nline\n\ttext"),
                ("d", ""),
                ("e", None),
                ("f", "a < b > c & d"),
                ("g", "unicodé ✓ 中文"),
            ],
            "doc_id string, text string",
        )
        wrapped = F.concat(
            F.lit(entry._HTML_WRAP_PRE),
            text.html_escape_col(F.coalesce(F.col("text"), F.lit(""))),
            F.lit(entry._HTML_WRAP_POST),
        )
        out = docs.select(
            text.extract_text_col(wrapped, layout="flat").alias("ex"),
            text.flat_ws_col(
                F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit("\ntail ok"))
            ).alias("want"),
        ).collect()
        for r in out:
            assert r["ex"] == r["want"], (r["ex"], r["want"])
