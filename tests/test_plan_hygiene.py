"""Plan-hygiene gate over the whole registry: no query may introduce an
undocumented cartesian product / nested-loop join, and the flagship
extraction path must keep its zero-exchange-before-UDF + broadcast-only
linking shape. Full per-query feature counts: scripts/audit_plans.py ->
PLANS_AUDIT.md."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from audit_plans import CARTESIAN_OK, plan_stats  # noqa: E402

from bioie_llm_spark.queries import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def test_no_undocumented_cartesian(spark):
    bad = {}
    for name, (fn, _) in REGISTRY.items():
        st = plan_stats(fn(spark, SF_DIR))
        if st["cartesian"] and name not in CARTESIAN_OK:
            bad[name] = st["cartesian"]
    assert not bad, f"undocumented cartesian/nested-loop joins: {bad}"


def test_extraction_plan_shape(spark):
    """MapInPandas directly over the scan (no exchange before the UDF);
    both gazetteer joins broadcast; zero sort-merge joins anywhere."""
    from bioie_llm_spark.datagen.corpus import CorpusSpec, build_corpus, build_gazetteer
    from bioie_llm_spark.extraction import extract_triples, link_entities

    spec = CorpusSpec.for_scale(0.001)
    linked = link_entities(extract_triples(build_corpus(spark, spec)), build_gazetteer(spark, spec))
    st = plan_stats(linked)
    assert st["python"] >= 1          # the inference UDF
    assert st["bhj"] >= 2             # both linking joins broadcast
    assert st["smj"] == 0 and st["cartesian"] == 0


def test_curation_plan_shapes(spark):
    """Round-3 curation operators keep their documented physical shapes
    (PLANS.md): contamination joins the benchmark by BROADCAST only;
    chunking is a pure zero-exchange map; the mixing draw pays exactly one
    (window) exchange; packing repartitions once into its salt groups."""
    from pyspark.sql import functions as F

    from bioie_llm_spark.operators.curation import (
        chunk_documents,
        contamination_check,
        mix_sources,
        pack_sequences,
        source_mix_targets,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 17 == 0).select("text")

    st = plan_stats(contamination_check(docs, bench))
    assert st["bhj"] >= 1 and st["smj"] == 0 and st["cartesian"] == 0

    st = plan_stats(chunk_documents(docs))
    assert st["exchanges"] == 0 and st["python"] == 0

    targets = source_mix_targets(docs, total=100)
    st = plan_stats(mix_sources(docs, targets))
    assert st["exchanges"] == 1 and st["window"] == 1 and st["cartesian"] == 0

    st = plan_stats(pack_sequences(docs, max_tokens=256))
    assert st["exchanges"] == 1 and st["python"] == 1
