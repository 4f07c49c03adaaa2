"""Readers against the REFERENCE'S OWN shipped data files (read-only at
/root/reference/data) — direct evidence that a user of the reference can
point this engine at their existing files. Skipped if the fixtures are
absent."""

import os

import pytest
from pyspark.sql import functions as F

from bioie_llm_spark.sources.readers import (
    read_converted_json,
    read_negatome,
    read_relation_types,
)

REF = "/root/reference/data"
KEGG_JSON = f"{REF}/KEGG/converted/new_radiation_exposure_data/low_dose_pathway_genes.json"
NEGATOME = f"{REF}/Negatome/H_sapien_Negative_Real.csv"
REL_TYPES = f"{REF}/INDRA/converted/relation_types.json"

needs = lambda p: pytest.mark.skipif(not os.path.exists(p), reason=f"missing {p}")


@needs(KEGG_JSON)
def test_real_kegg_pathway_genes(spark):
    """D4: pathway -> nested gene-alias arrays from the reference's real
    converted file (kegg_reader.py:152-158; ~341 pathways)."""
    df = read_converted_json(spark, KEGG_JSON, value_type="array<array<string>>")
    n = df.count()
    assert 300 <= n <= 400
    caff = df.filter(F.col("key") == "Caffeine metabolism").first()
    assert caff is not None
    first_aliases = caff["value"][0]
    assert first_aliases[0] == "NAT2" and "AAC2" in first_aliases
    # P4 first-alias projection over the real nested arrays
    firsts = df.select(
        "key", F.transform("value", lambda a: a[0]).alias("first_aliases")
    ).filter(F.col("key") == "Caffeine metabolism").first()["first_aliases"]
    assert firsts[:2] == ["NAT2", "CYP1A2"]


@needs(NEGATOME)
def test_real_negatome(spark):
    """S3 on the real BOM-prefixed CSV (string_reader.py:82-86)."""
    df = read_negatome(spark, NEGATOME)
    rows = df.collect()
    assert len(rows) > 1000
    assert rows[0]["protein1"] == "Q8N2W9"  # BOM stripped from the first cell
    # uniprot-accession shape
    bad = df.filter(~F.col("protein1").rlike("^[A-Z][0-9A-Z]{5,9}$")).count()
    assert bad == 0


@needs(REL_TYPES)
def test_real_relation_types(spark):
    """D6 vocabulary with id-ordered truncation (indra_reader.py:24-27)."""
    labels = read_relation_types(spark, REL_TYPES, n_classes=6)
    assert labels == [
        "Activation", "Inhibition", "Phosphorylation",
        "Dephosphorylation", "Ubiquitination", "Deubiquitination",
    ]
    assert read_relation_types(spark, REL_TYPES, n_classes=2) == ["Activation", "Inhibition"]
