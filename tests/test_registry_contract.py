"""Registry-level contract the driver harness depends on."""

from bioie_llm_spark.golden import GOLDEN_QUERIES, load_golden
from bioie_llm_spark.queries import REGISTRY


def test_registry_within_driver_coverage_cap():
    """The driver's CORRECTNESS harness checks the FIRST 50 registry
    entries (measured in round 1: exactly registry entries 1-50 got rows,
    66 were registered and the 16 past the cutoff — every kg_* flagship
    query included — went unchecked). Adding query #51 silently removes a
    query from the hard correctness signal; merge instead."""
    assert len(REGISTRY) <= 50


def test_every_query_has_an_oracle():
    missing = [name for name, (_, sql) in REGISTRY.items() if sql is None]
    assert not missing, f"queries without oracle: {missing}"


def test_kg_flagship_registered_first():
    names = list(REGISTRY)
    assert names[0] == "kg_triples"
    assert all(n.startswith("kg_") for n in names[:10])


def test_golden_file_complete():
    g = load_golden()
    assert set(GOLDEN_QUERIES) <= set(g), sorted(set(GOLDEN_QUERIES) - set(g))
    for name in GOLDEN_QUERIES:
        assert g[name]["rows"], f"{name}: empty golden rows"
        assert name in REGISTRY


def test_golden_invariants_hold():
    """The pinned self-check booleans must be pinned TRUE — a golden file
    regenerated while an invariant fails would otherwise lock in the
    failure as 'expected'."""
    g = load_golden()
    for name in ("dd_minhash_simhash_check", "sim_ann_recall"):
        cols = [c for c, _ in g[name]["columns"]]
        ok_i = cols.index("ok")
        for row in g[name]["rows"]:
            assert row[ok_i] is True, (name, row)
    lsh = g["sim_near_dup_lsh"]
    cols = [c for c, _ in lsh["columns"]]
    assert lsh["rows"][0][cols.index("high_recall_ok")] is True
    pr = g["kg_triple_pr"]
    cols = [c for c, _ in pr["columns"]]
    assert pr["rows"][0][cols.index("pass_precision")] is True
    assert pr["rows"][0][cols.index("pass_recall")] is True
