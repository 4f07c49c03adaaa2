"""Raw-format readers (S1-S8) against synthetic fixture files."""

import pytest

from bioie_llm_spark.sources.readers import (
    kegg_pathway_gene_map,
    read_indra_jsonl,
    read_kegg_genes,
    read_kegg_pathway_genes,
    read_kegg_pathways,
    read_negatome,
    read_protein_info,
    read_protein_links,
    read_result_file,
)


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw")
    (d / "protein_info.txt").write_text(
        "string_protein_id\tpreferred_name\tprotein_size\tannotation\n"
        "9606.ENSP1\tEB1\t268\tend binding\n"
        "9606.ENSP2\tRHEB\t184\tgtpase \n"
    )
    (d / "protein_links.txt").write_text(
        "protein1 protein2 combined_score\n"
        "9606.ENSP1 9606.ENSP2 900\n"
        "9606.ENSP2 9606.ENSP1 900\n"
    )
    (d / "negatome.csv").write_text("﻿P12345,Q99999\nP54321,Q11111\n")
    (d / "indra.jsonl").write_text(
        '{"id":"s1","text":"AKT phosphorylates TP53 in cells.","entity_1":{"name":"AKT","span":[0,3]},"entity_2":{"name":"TP53","span":[19,23]},"rel_type":"Phosphorylation"}\n'
        '{"id":"s2","text":"EB1 binds EB1 and EB1 again.","entity_1":{"name":"EB1","span":[0,3]},"entity_2":{"name":"EB1","span":[10,13]},"rel_type":"Activation"}\n'
    )
    (d / "kegg_pathways.tsv").write_text(
        "path:hsa00232\tCaffeine metabolism - Homo sapiens (human)\n"
        "path:hsa04110\tCell cycle - Homo sapiens (human)\n"
    )
    (d / "kegg_genes.tsv").write_text(
        "hsa:10\tNAT2, AAC2, NAT-2; arylamide acetylase 2\n"
        "hsa:9\tNAT1, AAC1; arylamide acetylase 1\n"
    )
    (d / "kegg_pathway_genes.tsv").write_text(
        "hsa:10\tpath:hsa00232\nhsa:9\tpath:hsa00232\nhsa:10\tpath:hsa04110\n"
    )
    (d / "results.txt").write_text(
        "model: test-model\nmicro f1: 0.5\n****************************\n"
        "0, EB1, RHEB, RHEB\n"
        "1, PSD-95, NONE,, TP53\n"
        "garbage line\n"
        "2, AKT, yes, no\n"
    )
    return d


def test_read_protein_info(spark, fixtures):
    rows = read_protein_info(spark, str(fixtures / "protein_info.txt")).collect()
    assert [(r["string_protein_id"], r["preferred_name"]) for r in rows] == [
        ("9606.ENSP1", "EB1"),
        ("9606.ENSP2", "RHEB"),
    ]


def test_read_protein_links_drops_score(spark, fixtures):
    df = read_protein_links(spark, str(fixtures / "protein_links.txt"))
    assert df.columns == ["protein1", "protein2"]
    assert df.count() == 2


def test_read_negatome_bom(spark, fixtures):
    rows = read_negatome(spark, str(fixtures / "negatome.csv")).collect()
    assert rows[0]["protein1"] == "P12345"  # BOM stripped


def test_read_indra_uniqueness_filter(spark, fixtures):
    rows = read_indra_jsonl(spark, str(fixtures / "indra.jsonl")).collect()
    assert len(rows) == 1 and rows[0]["id"] == "s1"  # s2 has repeated mentions
    assert rows[0]["entity_1"]["name"] == "AKT"
    assert rows[0]["entity_2"]["span"] == [19, 23]


def test_kegg_readers_and_map(spark, fixtures):
    pw = read_kegg_pathways(spark, str(fixtures / "kegg_pathways.tsv"))
    g = read_kegg_genes(spark, str(fixtures / "kegg_genes.tsv"))
    m = read_kegg_pathway_genes(spark, str(fixtures / "kegg_pathway_genes.tsv"))
    assert {r["pathway_name"] for r in pw.collect()} == {"Caffeine metabolism", "Cell cycle"}
    aliases = {r["gene_id"]: r["aliases"] for r in g.collect()}
    assert aliases["hsa:10"] == ["NAT2", "AAC2", "NAT-2"]
    mapped = {r["pathway_name"]: r["genes"] for r in kegg_pathway_gene_map(pw, g, m).collect()}
    assert sorted(map(tuple, mapped["Caffeine metabolism"])) == [
        ("NAT1", "AAC1"),
        ("NAT2", "AAC2", "NAT-2"),
    ]


def test_converted_json_roundtrip(spark, fixtures, tmp_path):
    from bioie_llm_spark.sources.readers import read_converted_json, write_json

    adj = str(fixtures / "adjacency.json")
    with open(adj, "w") as f:
        f.write('{"AKT": ["TP53", "MDM2"], "EB1": ["RHEB"]}')
    rows = {r["key"]: r["value"] for r in read_converted_json(spark, adj).collect()}
    assert rows == {"AKT": ["TP53", "MDM2"], "EB1": ["RHEB"]}

    out = str(tmp_path / "sink")
    df = spark.createDataFrame([("A", 1), ("B", 2)], "k string, v int")
    write_json(df, out)
    back = spark.read.json(out)
    assert {(r["k"], r["v"]) for r in back.collect()} == {("A", 1), ("B", 2)}


def test_read_result_file(spark, fixtures):
    rows = read_result_file(spark, str(fixtures / "results.txt")).orderBy("num").collect()
    assert len(rows) == 3
    assert (rows[0]["src"], rows[0]["pred"], rows[0]["true"]) == ("EB1", "RHEB", "RHEB")
    # double-comma repaired (F11), src with comma preserved via rsplit semantics
    assert (rows[1]["pred"], rows[1]["true"]) == ("NONE", "TP53")
    assert (rows[2]["pred"], rows[2]["true"]) == ("yes", "no")
