"""Tests for emission-format sinks (§2.1) and the readfilt containment
filter."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dashing_spark.functions import HLL
from dashing_spark.operators import agg, dist
from dashing_spark.operators.filter import containment_scores, filter_by_containment
from dashing_spark.sources import sinks
from dashing_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").cache()


@pytest.fixture(scope="module")
def pairs(spark, docs):
    lt = docs.select("lang", F.explode(F.split("text", " ", -1)).alias("token"))
    return dist.exact_pair_measures(lt, "lang", "token", ("ji",)).cache()


class TestSinks:
    def test_squareform_symmetric(self, spark, pairs):
        m = sinks.pairs_to_squareform(pairs, "ji")
        assert m.shape == (5, 5)
        assert np.allclose(m.values, m.values.T)
        assert np.allclose(np.diag(m.values), 1.0)

    def test_ut_tsv(self, spark, pairs, tmp_path):
        path = str(tmp_path / "m.tsv")
        sinks.write_ut_tsv(pairs, "ji", path)
        lines = open(path).read().splitlines()
        assert lines[0].startswith("##Names\t")
        assert len(lines) == 6  # header + 5 rows
        assert lines[1].split("\t")[1] == "-"  # diagonal token

    def test_phylip(self, spark, pairs, tmp_path):
        path = str(tmp_path / "m.phy")
        sinks.write_phylip(pairs, "ji", path)
        lines = open(path).read().splitlines()
        assert lines[0] == "5"
        assert len(lines) == 6

    def test_packed_binary_roundtrip(self, spark, pairs, tmp_path):
        path = str(tmp_path / "m.bin")
        keys = sinks.write_packed_binary(pairs, "ji", path)
        back = sinks.read_packed_binary(path, keys)
        orig = sinks.pairs_to_squareform(pairs, "ji", keys=keys)
        assert np.allclose(back.values, orig.values, atol=1e-6)

    def test_printmat_rejects_bad_magic(self, tmp_path):
        path = str(tmp_path / "bad.bin")
        # type byte 0xde is not the float32 enum (0)
        open(path, "wb").write(b"\xde" + b"\x00" * 16)
        with pytest.raises(ValueError, match="type byte"):
            sinks.read_packed_binary(path, ["a", "b"])

    def test_packed_binary_reference_header(self, tmp_path, spark, docs):
        """Header parity with the reference's -b format: byte 0 = type
        enum 0 (float32), bytes 1-8 = u64 number of SETS (not triangle
        entries) — /root/reference/distmat/distmat.h:199-201."""
        import struct

        from dashing_spark.operators import dist

        lt = docs.select("lang", F.explode(F.split("text", " ", -1)).alias("token"))
        pairs = dist.exact_pair_measures(lt, "lang", "token", ("ji",))
        path = str(tmp_path / "mat.bin")
        keys = sinks.write_packed_binary(pairs, "ji", path)
        raw = open(path, "rb").read()
        assert raw[0] == 0
        (n,) = struct.unpack("<Q", raw[1:9])
        assert n == len(keys)
        assert len(raw) == 9 + 4 * n * (n - 1) // 2
        back = sinks.read_packed_binary(path, keys)
        assert list(back.columns) == keys

    def test_view_registers(self, spark, docs):
        sk = agg.sketch_tokens_by_key(docs, ["lang"], lambda: HLL.empty(10))
        blob = sk.collect()[0]["sketch"]
        regs = sinks.view_registers(blob)
        assert regs.shape == (1024,)
        assert regs.max() > 0


class TestContainmentFilter:
    def test_scores_match_exact(self, spark, docs):
        ref_sk = agg.sketch_tokens_by_key(
            docs.filter(F.col("lang") == "en"), ["lang"], lambda: HLL.empty(10)
        )
        blob = bytes(ref_sk.collect()[0]["sketch"])
        scored = containment_scores(docs, blob, p=10)
        en_tokens = set(
            r["t"]
            for r in docs.filter(F.col("lang") == "en")
            .select(F.explode(F.split("text", " ", -1)).alias("t"))
            .distinct()
            .collect()
        )
        rows = scored.select("doc_id", "text", "containment").collect()
        errs = []
        for r in rows:
            toks = set(r["text"].split(" "))
            exact = len(toks & en_tokens) / len(toks)
            errs.append(abs(r["containment"] - exact))
        assert np.mean(errs) <= 0.1
        assert np.max(errs) <= 0.3

    def test_filter_keeps_high_containment(self, spark, docs):
        ref_sk = agg.sketch_tokens_by_key(
            docs.filter(F.col("lang") == "en"), ["lang"], lambda: HLL.empty(10)
        )
        blob = bytes(ref_sk.collect()[0]["sketch"])
        kept = filter_by_containment(docs, blob, cutoff=0.5, p=10)
        assert 0 < kept.count() <= docs.count()
        assert kept.filter(F.col("containment") < 0.5).count() == 0

    def test_fold_mismatched_reference(self, spark, docs):
        """Reference at higher precision is folded automatically."""
        ref_sk = agg.sketch_tokens_by_key(
            docs.filter(F.col("lang") == "en"), ["lang"], lambda: HLL.empty(14)
        )
        blob = bytes(ref_sk.collect()[0]["sketch"])
        scored = containment_scores(docs, blob, p=10)
        assert scored.count() == docs.count()

    def test_joint_estimator_at_least_as_accurate(self, spark, docs):
        """readfilt's own estimator (ertl_joint) must be available on the
        row-level filter and match exact containment at least as well as
        inclusion-exclusion on average."""
        ref_sk = agg.sketch_tokens_by_key(
            docs.filter(F.col("lang") == "en"), ["lang"], lambda: HLL.empty(10)
        )
        blob = bytes(ref_sk.collect()[0]["sketch"])
        en_tokens = set(
            r["t"]
            for r in docs.filter(F.col("lang") == "en")
            .select(F.explode(F.split("text", " ", -1)).alias("t"))
            .distinct()
            .collect()
        )

        def errs(estimator):
            scored = containment_scores(docs, blob, p=10, estimator=estimator)
            out = []
            for r in scored.select("text", "containment").collect():
                toks = set(r["text"].split(" "))
                out.append(abs(r["containment"] - len(toks & en_tokens) / len(toks)))
            return np.mean(out)

        e_joint = errs("ertl_joint_mle")
        e_ie = errs("inclusion_exclusion")
        assert e_joint <= e_ie + 0.02, (e_joint, e_ie)
        assert e_joint <= 0.1


class TestMinCountBackends:
    def test_hk_backend_one_sided(self, spark):
        """HK filter estimates never exceed true counts: everything it
        keeps genuinely has cnt >= some kept-threshold fraction; nothing
        below min_count/1 slips through inflated (opposite side of CM)."""
        import pandas as pd

        from dashing_spark.operators import freq

        rows = []
        for lang in ("en", "de"):
            heavy = " ".join(["common"] * 50)
            tail = " ".join(f"rare{i}" for i in range(30))
            rows.append((lang, heavy + " " + tail))
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["lang", "text"]))
        kept = freq.min_count_filter(
            df, ["lang"], min_count=10, backend="hk"
        ).collect()
        toks = {r["token"] for r in kept}
        assert "common" in toks
        assert not any(t.startswith("rare") for t in toks)
        exact = freq.min_count_filter(df, ["lang"], min_count=10).collect()
        # one-sided: hk keeps a subset of the exact >= min_count set here
        assert {(r["lang"], r["token"]) for r in kept} <= {
            (r["lang"], r["token"]) for r in exact
        }


class TestContainmentSchemaFidelity:
    def test_nullable_long_column_with_nulls_passes_through(self, spark, docs):
        # a pandas round-trip would re-infer a null-bearing long column
        # as double and break the declared mapInArrow schema
        from dashing_spark.functions import HLL
        from dashing_spark.operators import agg
        from dashing_spark.operators.filter import containment_scores

        blob = (
            agg.sketch_tokens_by_key(
                docs.limit(50), ["lang"], lambda: HLL.empty(10)
            )
            .select("sketch")
            .first()[0]
        )
        src = docs.limit(20).withColumn(
            "maybe",
            F.when(F.col("doc_id") % 2 == 0, F.col("doc_id")).otherwise(
                F.lit(None).cast("long")
            ),
        )
        out = containment_scores(src, bytes(blob))
        assert dict(out.dtypes)["maybe"] == "bigint"
        rows = out.collect()
        assert len(rows) == 20
        assert any(r["maybe"] is None for r in rows)
        assert all(0.0 <= r["containment"] <= 1.0 for r in rows)

    def test_unknown_estimator_raises(self, spark, docs):
        from dashing_spark.operators.filter import containment_scores

        with pytest.raises(ValueError, match="estimator"):
            containment_scores(docs, b"", estimator="ertl_mle")
