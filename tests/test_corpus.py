"""Deterministic corpus generator invariants."""

from pyspark.sql import functions as F

from bioie_llm_spark.datagen.corpus import (
    TRAP_NAMES,
    build_corpus,
    build_facts,
    build_gazetteer,
)


def test_corpus_deterministic(spark, tiny_spec):
    """Two independent builds produce byte-identical content (sha256 set)."""
    sha = lambda: sorted(
        r["s"]
        for r in build_corpus(spark, tiny_spec)
        .select(F.sha2("content", 256).alias("s"))
        .collect()
    )
    a, b = sha(), sha()
    assert a == b
    assert len(a) == tiny_spec.n_files


def test_corpus_repartition_invariant(spark, tiny_spec):
    """Content is parallelism-independent: repartitioned build == original."""
    base = build_corpus(spark, tiny_spec)
    shas = lambda df: sorted(
        r["s"] for r in df.select(F.sha2("content", 256).alias("s")).collect()
    )
    assert shas(base) == shas(base.repartition(13))


def test_facts_are_a_set(spark, tiny_spec):
    facts = build_facts(spark, tiny_spec)
    n = facts.count()
    assert facts.select("subj", "pred", "obj").distinct().count() == n
    kinds = {r["fact_kind"] for r in facts.select("fact_kind").distinct().collect()}
    assert kinds == {"ppi", "kegg", "indra"}


def test_gazetteer_traps_present(spark, tiny_spec):
    gaz = build_gazetteer(spark, tiny_spec)
    aliases = {r["alias"] for r in gaz.collect()}
    for t in TRAP_NAMES:
        assert t in aliases
    # synonym aliases resolve to canonical names
    syn = gaz.filter(F.col("alias").startswith("SYN_")).first()
    assert syn["alias"] == "SYN_" + syn["canonical"]


def test_gazetteer_aliases_unique_at_scale(spark):
    """Name generators must be collision-free at large entity counts
    (regression: lpad truncation collided names for ids >= 10000 and
    exploded the linking join 100x)."""
    from bioie_llm_spark.datagen.corpus import CorpusSpec

    spec = CorpusSpec(n_files=1, n_prot=25000, n_genes=15000, n_pathways=1500,
                      n_edges=1, n_memberships=1, n_statements=1)
    gaz = build_gazetteer(spark, spec)
    assert gaz.count() == gaz.select("alias").distinct().count()


def test_repo_skew(spark, tiny_spec):
    corpus = build_corpus(spark, tiny_spec)
    hot = corpus.filter(F.col("repo").startswith("org/hot-")).count()
    assert 0.15 * tiny_spec.n_files < hot < 0.5 * tiny_spec.n_files


def test_commit_shape(spark, tiny_spec):
    row = build_corpus(spark, tiny_spec).select("commit").first()
    assert len(row["commit"]) == 40
    int(row["commit"], 16)  # hex
