"""Edge-case batch: degenerate inputs and invariants across operators."""

from pyspark.sql import functions as F

from bioie_llm_spark.operators.canonical import connected_components, normalize_name
from bioie_llm_spark.operators.metrics import classification_metrics
from bioie_llm_spark.operators.sampling import seeded_sample, stratified_sample
from bioie_llm_spark.operators.setops import py_sort_and_pad
from bioie_llm_spark.operators.skew import salted_collect_set, salted_count


def test_metrics_single_class_all_correct(spark):
    df = spark.createDataFrame([("a", "a")] * 5, "pred string, true string")
    m = classification_metrics(df).first()
    assert m["accuracy"] == 1.0 and m["micro_f1"] == 1.0 and m["macro_f1"] == 1.0


def test_metrics_all_wrong(spark):
    df = spark.createDataFrame([("a", "b")] * 4, "pred string, true string")
    m = classification_metrics(df).first()
    assert m["accuracy"] == 0.0 and m["macro_f1"] == 0.0


def test_seeded_sample_repartition_invariant(spark):
    df = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    a = sorted(r["k"] for r in seeded_sample(df, ["k"], 50).collect())
    b = sorted(r["k"] for r in seeded_sample(df.repartition(17), ["k"], 50).collect())
    assert a == b and len(a) == 50


def test_stratified_sample_exhausts_small_strata(spark):
    df = spark.createDataFrame(
        [("big", str(i)) for i in range(100)] + [("tiny", "x")],
        "cls string, k string",
    )
    out = stratified_sample(df, "cls", ["k"], 10)
    counts = {r["cls"]: r["n"] for r in out.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 10, "tiny": 1}


def test_salted_ops_match_plain_on_mixed_data(spark):
    df = spark.range(2000).select(
        (F.col("id") % 13).cast("string").alias("k"),
        (F.col("id") % 37).cast("string").alias("v"),
    )
    plain_c = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    salted_c = {r["k"]: r["n"] for r in salted_count(df, ["k"]).collect()}
    assert plain_c == salted_c
    plain_s = {
        r["k"]: sorted(r["s"])
        for r in df.groupBy("k").agg(F.collect_set("v").alias("s")).collect()
    }
    salted_s = {r["k"]: list(r["v_set"]) for r in salted_collect_set(df, ["k"], "v").collect()}
    assert plain_s == salted_s


def test_cc_long_chain(spark):
    """A 300-node path has diameter 299: naive min-label propagation needs
    299 rounds (the old implementation silently returned unconverged labels
    at its 20-round cap); alternating large/small-star converges in
    O(log n). All nodes must land in the min-node component."""
    edges = spark.createDataFrame(
        [(f"n{i:04d}", f"n{i+1:04d}") for i in range(299)], "src string, dst string"
    )
    comp = connected_components(edges)
    got = {r["component"] for r in comp.collect()}
    assert got == {"n0000"}
    assert comp.count() == 300


def test_cc_two_components_and_hub(spark):
    # a 1000-leaf hub star (stress: no per-group collect may materialize
    # the component driver-side) + a separate triangle
    hub = [("h", f"leaf{i:04d}") for i in range(1000)]
    tri = [("x", "y"), ("y", "z"), ("z", "x")]
    comp = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(hub + tri, "src string, dst string")
        ).collect()
    }
    assert comp["leaf0999"] == "h" and comp["h"] == "h"
    assert comp["x"] == comp["y"] == comp["z"] == "x"
    assert len(comp) == 1004


def test_cc_cycle_and_self_loop(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("z", "z")], "src string, dst string"
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["z"] == "z"


def test_normalize_unicode_passthrough(spark):
    df = spark.createDataFrame([("αβ-Akt 1",)], "name string")
    got = df.select(normalize_name(F.col("name")).alias("n")).first()["n"]
    assert got == "AKT1"  # non-ascii letters stripped by [^a-zA-Z0-9]


def test_sort_and_pad_all_disjoint():
    p, t = py_sort_and_pad(["x", "y"], ["a", "b", "c"], 10)
    assert p == ["x", "y", "NONE"] and t == ["a", "b", "c"]


def test_lineage_total_rows_partitioning_invariant(spark, tmp_path):
    from bioie_llm_spark.sources.checkpoint import lineage_of

    df = spark.range(500).selectExpr("id", "id * 3 as v")
    for parts in (2, 7):
        lin = lineage_of(df.repartition(parts), "s", "snap")
        assert sum(r["n_rows"] for r in lin.collect()) == 500


def test_negative_pairs_no_global_window(spark):
    """J4 scale shape: the candidate index must not funnel every node
    through one reducer — no Window / global Sort in the plan (the final
    top-n is a TakeOrdered, which is a parallel partial sort)."""
    from bioie_llm_spark.operators.adjacency import negative_pairs

    nodes = spark.range(300).select(F.concat(F.lit("n"), "id").alias("node"))
    pos = spark.range(100).select(
        F.concat(F.lit("n"), F.col("id")).alias("subj"),
        F.concat(F.lit("n"), F.col("id") + 1).alias("obj"),
    )
    neg = negative_pairs(nodes, pos, 40)
    plan = neg._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "TakeOrdered" in plan
    # the positive set must never shuffle: broadcast joins only
    assert "SortMergeJoin" not in plan
    rows = [(r["subj"], r["obj"]) for r in neg.collect()]
    assert len(rows) == 40 and len(set(rows)) == 40
    # deterministic under different parallelism
    rows2 = [
        (r["subj"], r["obj"])
        for r in negative_pairs(nodes.repartition(13), pos, 40).collect()
    ]
    assert rows == rows2
    # negatives never collide with positives (either direction)
    pos_set = {(f"n{i}", f"n{i+1}") for i in range(100)}
    for s, o in rows:
        assert (s, o) not in pos_set and (o, s) not in pos_set


def test_context_budget_boundary(spark):
    from bioie_llm_spark.functions.prompts import apply_context_budget

    df = spark.createDataFrame([("x" * 100,)], "prompt string")
    ok, _ = apply_context_budget(df, max_len=100, max_new_tokens=0)
    assert ok.count() == 1  # exactly-at-budget is allowed (<=)
    ok2, over = apply_context_budget(df, max_len=100, max_new_tokens=1)
    assert ok2.count() == 0 and over.first()["n_overflow"] == 1
