"""Bucketed co-located joins: the write-once shuffle pays off as
exchange-free equi-joins."""

import pytest
from pyspark.sql import functions as F

from bioie_llm_spark.operators.bucketing import (
    bucketed_join,
    exchanges_under_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tiny_spec):
    from bioie_llm_spark.datagen.corpus import build_facts
    from bioie_llm_spark.operators.adjacency import symmetric_adjacency

    facts = build_facts(spark, tiny_spec)
    adj = symmetric_adjacency(facts.filter(F.col("pred") == "interacts_with"))
    write_bucketed(facts.withColumnRenamed("subj", "node"), "t_facts_b", ["node"], 8)
    write_bucketed(adj, "t_adj_b", ["node"], 8)
    yield "t_facts_b", "t_adj_b"
    spark.sql("DROP TABLE IF EXISTS t_facts_b")
    spark.sql("DROP TABLE IF EXISTS t_adj_b")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # force SMJ so the exchange-elision (not broadcast) is what's tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, lt, rt, ["node"])
        n_ex = exchanges_under_join(j)
        assert n_ex == 0, f"bucketed join should be exchange-free, saw {n_ex}"
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_has_exchanges(spark, bucketed_tables, tiny_spec):
    """Control: the same join on plain frames shuffles both sides."""
    from bioie_llm_spark.datagen.corpus import build_facts
    from bioie_llm_spark.operators.adjacency import symmetric_adjacency

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        facts = build_facts(spark, tiny_spec).withColumnRenamed("subj", "node")
        adj = symmetric_adjacency(
            build_facts(spark, tiny_spec).filter(F.col("pred") == "interacts_with")
        )
        j = facts.join(adj, "node")
        assert exchanges_under_join(j) >= 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_results_match_plain(spark, bucketed_tables, tiny_spec):
    from bioie_llm_spark.datagen.corpus import build_facts
    from bioie_llm_spark.operators.adjacency import symmetric_adjacency

    lt, rt = bucketed_tables
    j = bucketed_join(spark, lt, rt, ["node"]).select("node", "pred", "obj")
    facts = build_facts(spark, tiny_spec).withColumnRenamed("subj", "node")
    adj = symmetric_adjacency(
        build_facts(spark, tiny_spec).filter(F.col("pred") == "interacts_with")
    )
    plain = facts.join(adj, "node").select("node", "pred", "obj")
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))
