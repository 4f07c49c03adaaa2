"""operators/membership: Bloom build/probe invariants — zero false
negatives always, FP rate near nominal, partition-count invariance —
plus the bloom-backed contamination screen's containment guarantee."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bioie_llm_spark.operators.membership import (
    bloom_build,
    bloom_parameters,
    bloom_probe,
)


def test_parameters_standard_sizing():
    m, k = bloom_parameters(1000, 0.01)
    assert 9000 <= m <= 9800 and k == 7  # ~9.6 bits/key, ln2 * m/n
    assert m % 8 == 0
    # degenerate inputs stay valid
    m0, k0 = bloom_parameters(0, 0.5)
    assert m0 >= 8 and k0 >= 1


class TestBloomBuildProbe:
    def _roundtrip(self, spark, members, probes, fpp=0.01):
        mdf = spark.createDataFrame([(v,) for v in members], ["v"])
        m_bits, k = bloom_parameters(len(members), fpp)
        bloom = bloom_build(mdf, "v", m_bits, k)
        pdf = spark.createDataFrame([(v,) for v in probes], ["v"])
        rows = bloom_probe(pdf, "v", bloom, k).collect()
        return {r["v"]: r["bloom_hit"] for r in rows}

    def test_zero_false_negatives(self, spark):
        members = [f"url://site-{i}/page" for i in range(500)]
        got = self._roundtrip(spark, members, members)
        assert all(got.values())

    def test_fp_rate_near_nominal(self, spark):
        members = [f"member-{i}" for i in range(500)]
        outsiders = [f"outsider-{i}" for i in range(2000)]
        got = self._roundtrip(spark, members, outsiders, fpp=0.01)
        fp = sum(got.values())
        assert fp / len(outsiders) <= 0.03  # 3x nominal headroom

    def test_partition_count_invariance(self, spark):
        members = [f"k{i}" for i in range(300)]
        mdf = spark.createDataFrame([(v,) for v in members], ["v"])
        m_bits, k = bloom_parameters(300, 0.01)
        blooms = {
            p: bloom_build(mdf.repartition(p), "v", m_bits, k) for p in (1, 3, 8)
        }
        assert blooms[1] == blooms[3] == blooms[8]

    def test_null_probes_false_and_excluded_from_build(self, spark):
        mdf = spark.createDataFrame([("a",), (None,)], "v string")
        m_bits, k = bloom_parameters(2, 0.01)
        bloom = bloom_build(mdf, "v", m_bits, k)
        got = {
            r["v"]: r["bloom_hit"]
            for r in bloom_probe(
                spark.createDataFrame([("a",), (None,)], "v string"), "v", bloom, k
            ).collect()
        }
        assert got["a"] is True and got[None] is False

    @settings(max_examples=10, deadline=None)
    @given(
        members=st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=30, unique=True)
    )
    def test_members_always_hit(self, spark, members):
        got = self._roundtrip(spark, members, members)
        assert all(got.values())


class TestBloomContamination:
    def test_screen_contains_exact_screen(self, spark):
        from bioie_llm_spark.operators.curation import (
            contamination_check,
            contamination_check_bloom,
        )

        docs = spark.createDataFrame(
            [
                (0, "the quick brown fox jumps over the lazy dog"),
                (1, "completely unrelated text about spark catalyst plans"),
                (2, "the quick brown fox and more the quick brown fox"),
                (3, ""),
            ],
            ["doc_id", "text"],
        )
        bench = spark.createDataFrame(
            [(0, "the quick brown fox jumps high",)], ["bid", "text"]
        ).select(F.col("text"))
        got = {
            r["doc_id"]: r
            for r in contamination_check_bloom(docs, bench, n=3, fpp=0.01).collect()
        }
        exact = {
            r["doc_id"]: r for r in contamination_check(docs, bench, n=3).collect()
        }
        assert set(got) == set(exact)
        for d, row in got.items():
            assert row["bloom_ge_exact"] is True
            assert row["n_hit_bloom"] >= exact[d]["n_hit"]
            assert row["n_hit"] == exact[d]["n_hit"]  # exact columns unchanged
