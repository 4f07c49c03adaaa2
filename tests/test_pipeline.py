"""End-to-end KG pipeline: triple P/R >= 0.95 vs gold, per-row sha256
invariant, and all three scored tasks (the BASELINE.json gate)."""

import pytest
from pyspark.sql import functions as F

from bioie_llm_spark.datagen.corpus import build_corpus, build_facts
from bioie_llm_spark.extraction import extract_triples
from bioie_llm_spark.pipeline import (
    build_triples,
    entity_task,
    relation_task,
    relation_type_task,
)


@pytest.fixture(scope="module")
def stages(spark, tiny_spec):
    return build_triples(spark, tiny_spec)


def test_triple_pr(spark, stages):
    from bioie_llm_spark.operators.metrics import triple_pr

    r = triple_pr(stages["triples"], stages["facts"]).first()
    assert r["precision"] >= 0.95, r
    assert r["recall"] >= 0.95, r


def test_sha256_invariant(spark, stages):
    """Every extracted row carries sha256(content) of its source file —
    verified independently against the corpus (per-row invariant)."""
    corpus_sha = stages["corpus"].select(
        "path", F.sha2("content", 256).alias("expect_sha")
    )
    raw = extract_triples(stages["corpus"]).select("path", "source_sha256").distinct()
    joined = raw.join(corpus_sha, "path")
    bad = joined.filter(F.col("source_sha256") != F.col("expect_sha")).count()
    assert bad == 0
    assert joined.count() > 0


def test_alias_surface_forms_canonicalized(spark, stages):
    """The mock LLM emits ~3% SYN_ alias forms; raw extraction shows them,
    the linked triple table must not (gazetteer join maps alias->canonical)."""
    raw = extract_triples(stages["corpus"])
    n_alias_raw = raw.filter(F.col("subj").startswith("SYN_")).count()
    assert n_alias_raw > 0, "expected alias surface forms in raw extraction"
    n_alias_linked = stages["triples"].filter(
        F.col("subj").startswith("SYN_") | F.col("obj").startswith("SYN_")
    ).count()
    assert n_alias_linked == 0


def test_linking_kills_ghosts(spark, stages):
    """Out-of-gazetteer hallucinations never reach the triple table."""
    ghosts = stages["triples"].filter(
        F.col("subj").contains("_GHOST") | F.col("obj").contains("_GHOST")
    )
    assert ghosts.count() == 0


def test_entity_task(spark, stages):
    out = entity_task(stages["triples"], stages["facts"], n_queries=30)
    m = out["metrics"].first()
    assert m["micro_f1"] >= 0.9, m
    fm = out["full_matches"].first()
    assert fm["query_count"] == 30


def test_relation_task(spark, stages):
    out = relation_task(stages["triples"], stages["facts"], n_pairs=60)
    m = out["metrics"].first()
    assert m["n"] == 120
    assert m["micro_f1"] >= 0.9, m


def test_relation_type_task(spark, stages):
    out = relation_type_task(stages["triples"], stages["facts"], n_per_class=20)
    m = out["metrics"].first()
    assert m["micro_f1"] >= 0.9, m
    assert out["confusion"].count() >= 6


def test_kegg_entity_task(spark, stages):
    from bioie_llm_spark.pipeline import kegg_entity_task

    out = kegg_entity_task(stages["triples"], stages["facts"], n_pathways=10)
    m = out["metrics"].first()
    # 1/3 of predicted genes are rendered via their A1 alias in the mock
    # response — a high score proves alias matching + first-alias projection
    assert m["micro_f1"] >= 0.9, m
    fm = out["full_matches"].first()
    assert fm["query_count"] == 10


def test_extraction_deterministic(spark, tiny_spec):
    facts = build_facts(spark, tiny_spec)
    corpus = build_corpus(spark, tiny_spec, facts)
    t = lambda: sorted(
        (r["subj"], r["pred"], r["obj"])
        for r in extract_triples(corpus).select("subj", "pred", "obj").distinct().collect()
    )
    assert t() == t()
