"""Canonicalization: normalize, Jaccard blocking, connected components."""

from pyspark.sql import functions as F

from bioie_llm_spark.operators.canonical import (
    canonicalize_entities,
    canonicalize_triples,
    char_ngrams,
    connected_components,
    jaccard_pairs,
    normalize_name,
)


def test_normalize(spark):
    df = spark.createDataFrame(
        [("PSD-95",), ("psd 95",), ("Psd_95",), ("TP53",)], "name string"
    )
    got = [r["n"] for r in df.select(normalize_name(F.col("name")).alias("n")).collect()]
    assert got == ["PSD95", "PSD95", "PSD95", "TP53"]


def test_char_ngrams(spark):
    df = spark.createDataFrame([("AKT1",), ("AB",)], "name string")
    got = {r["name"]: r["g"] for r in df.select("name", char_ngrams(F.col("name")).alias("g")).collect()}
    assert sorted(got["AKT1"]) == ["AKT", "KT1"]
    assert got["AB"] == ["AB"]  # shorter than n: one truncated gram


def test_jaccard_pairs(spark):
    names = spark.createDataFrame(
        [("TP53",), ("P53",), ("EB1",), ("RHEB",)], "name string"
    )
    pairs = {(r["name_a"], r["name_b"]): r["jaccard"] for r in jaccard_pairs(names).collect()}
    # TP53 grams {TP5, P53}; P53 grams {P53} -> jaccard 1/2
    assert pairs.get(("P53", "TP53")) == 0.5
    assert not any("EB1" in k for k in pairs)


def test_connected_components_chain(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e")], "src string, dst string"
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}


def test_connected_components_long_chain(spark):
    """Propagation must cross a 9-hop chain (iteration count exercised)."""
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(9)], "src string, dst string"
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert set(comp.values()) == {"n0"}


def test_canonicalize_entities_variants(spark):
    names = spark.createDataFrame(
        [("PSD-95",), ("psd95",), ("PSD 95",), ("AKT",), ("EB1",)], "name string"
    )
    m = {r["name"]: r["canonical_id"] for r in canonicalize_entities(names).collect()}
    assert m["PSD-95"] == m["psd95"] == m["PSD 95"]
    assert m["AKT"] != m["EB1"]


def test_canonicalize_triples(spark):
    triples = spark.createDataFrame(
        [("psd95", "interacts_with", "AKT", "sha1")],
        "subj string, pred string, obj string, source_sha256 string",
    )
    mapping = spark.createDataFrame(
        [("psd95", "PSD-95"), ("AKT", "AKT")], "name string, canonical_id string"
    )
    row = canonicalize_triples(triples, mapping).first()
    assert row["subj"] == "PSD-95" and row["obj"] == "AKT"
    assert row["pred"] == "interacts_with" and row["source_sha256"] == "sha1"
