"""A5/A6/A9/A10 metric aggregates vs hand-computed expectations
(spec: /root/reference/src/evaluators/evaluator.py:10-31)."""

import math

from bioie_llm_spark.operators.metrics import (
    classification_metrics,
    confusion_matrix,
    consensus,
    full_matches,
)

# (pred, true) pairs: labels a/b.
# per-class: a: tp=2 fp=1 fn=1 -> P=2/3 R=2/3 F1=2/3
#            b: tp=1 fp=1 fn=1 -> P=1/2 R=1/2 F1=1/2
# micro: tp=3 fp=2 fn=2 -> P=R=F1=3/5; accuracy=3/5; macro=(2/3+1/2)/2
PAIRS = [("a", "a"), ("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")]


def test_classification_metrics(spark):
    df = spark.createDataFrame(PAIRS, "pred string, true string")
    m = classification_metrics(df).first()
    assert m["n"] == 5
    assert math.isclose(m["accuracy"], 0.6)
    assert math.isclose(m["micro_f1"], 0.6)
    assert math.isclose(m["macro_f1"], (2 / 3 + 1 / 2) / 2)
    # macro/weighted P-R-F cross-checked against sklearn
    # precision_recall_fscore_support(average='macro'/'weighted'):
    # support(a)=3, support(b)=2
    assert math.isclose(m["macro_precision"], (2 / 3 + 1 / 2) / 2)
    assert math.isclose(m["macro_recall"], (2 / 3 + 1 / 2) / 2)
    assert math.isclose(m["weighted_precision"], (3 * (2 / 3) + 2 * (1 / 2)) / 5)
    assert math.isclose(m["weighted_recall"], 0.6)
    assert math.isclose(m["weighted_f1"], 0.6)


def test_classification_metrics_zero_tp(spark):
    # all predictions wrong and a label that never appears in true: the
    # ANSI divide-by-zero corners must all yield 0.0, weighted averages
    # must ignore zero-support classes
    df = spark.createDataFrame(
        [("x", "y"), ("x", "y")], "pred string, true string"
    )
    m = classification_metrics(df).first()
    assert m["accuracy"] == 0.0 and m["micro_f1"] == 0.0
    assert m["macro_precision"] == 0.0 and m["weighted_f1"] == 0.0


def test_full_matches(spark):
    rows = [
        ("s1", "x", "x"), ("s1", "y", "y"),        # full match
        ("s2", "x", "x"), ("s2", "y", "z"),        # not
        ("s3", "q", "q"),                           # full match
    ]
    df = spark.createDataFrame(rows, "src string, pred string, true string")
    r = full_matches(df).first()
    assert r["full_match_count"] == 2 and r["query_count"] == 3


def test_consensus(spark):
    rows = [
        ("s1", "yes", "yes"), ("s1", "yes", "yes"),   # agree, correct
        ("s2", "yes", "no"), ("s2", "no", "no"),      # disagree -> dropped
        ("s3", "no", "yes"), ("s3", "no", "yes"),     # agree, wrong
    ]
    df = spark.createDataFrame(rows, "src string, pred string, true string")
    got = {r["src"]: r["correct"] for r in consensus(df, n_models=2).collect()}
    assert got == {"s1": True, "s3": False}


def test_confusion_matrix(spark):
    df = spark.createDataFrame(PAIRS, "pred string, true string")
    cm = {(r["true"], r["pred"]): r["n"] for r in confusion_matrix(df).collect()}
    assert cm == {("a", "a"): 2, ("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1}


def test_metrics_vs_duckdb_third_engine(spark, tmp_path):
    """Closes the pinned-golden loop with an INDEPENDENT engine: the scored
    task's (pred, true) pairs go to parquet, DuckDB recomputes micro/macro/
    weighted F1 from them with its own SQL, and the numbers must agree with
    classification_metrics — so the engine's metric semantics are checked
    by something that shares zero code with it (the in-query recompute_ok
    invariant uses Spark SQL; this uses DuckDB)."""
    import duckdb

    from bioie_llm_spark.datagen.corpus import CorpusSpec
    from bioie_llm_spark.pipeline import build_triples, relation_type_task

    stages = build_triples(spark, CorpusSpec.for_scale(0.001))
    out = relation_type_task(stages["triples"], stages["facts"], n_per_class=20)
    pairs_path = str(tmp_path / "pairs")
    # F.col, not selectExpr: a bare `true` in SQL text is the boolean literal
    from pyspark.sql import functions as F

    out["pairs"].select(F.col("pred"), F.col("true").alias("gold")).write.parquet(
        pairs_path
    )
    m = out["metrics"].first()

    con = duckdb.connect()
    row = con.execute(f"""
        WITH v AS (SELECT * FROM '{pairs_path}/*.parquet'),
        lab AS (SELECT pred AS label FROM v UNION SELECT gold FROM v),
        tp AS (SELECT pred AS label, count(*) AS n FROM v WHERE pred = gold GROUP BY pred),
        fp AS (SELECT pred AS label, count(*) AS n FROM v WHERE pred <> gold GROUP BY pred),
        fn AS (SELECT gold AS label, count(*) AS n FROM v WHERE pred <> gold GROUP BY gold),
        per AS (
          SELECT lab.label, coalesce(tp.n, 0) AS tp,
                 coalesce(fp.n, 0) AS fp, coalesce(fn.n, 0) AS fn
          FROM lab LEFT JOIN tp ON lab.label = tp.label
                   LEFT JOIN fp ON lab.label = fp.label
                   LEFT JOIN fn ON lab.label = fn.label
        ),
        cls AS (
          SELECT tp + fn AS support,
                 CASE WHEN 2 * tp + fp + fn > 0
                      THEN 2.0 * tp / (2 * tp + fp + fn) ELSE 0.0 END AS f
          FROM per
        )
        SELECT (SELECT 2.0 * sum(n) / (2 * sum(n) + sum(fpn) + sum(fnn)) FROM (
                  SELECT coalesce(tp.n, 0) AS n, coalesce(fp.n, 0) AS fpn, coalesce(fn.n, 0) AS fnn
                  FROM lab LEFT JOIN tp ON lab.label = tp.label
                           LEFT JOIN fp ON lab.label = fp.label
                           LEFT JOIN fn ON lab.label = fn.label)) AS micro_f1,
               avg(f) AS macro_f1,
               sum(support * f) / sum(support) AS weighted_f1
        FROM cls
    """).fetchone()
    assert abs(m["micro_f1"] - row[0]) < 1e-9
    assert abs(m["macro_f1"] - row[1]) < 1e-9
    assert abs(m["weighted_f1"] - row[2]) < 1e-9
