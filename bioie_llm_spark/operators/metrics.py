"""Evaluation aggregates (SURVEY.md §2.4 A5-A11) as pure DataFrame aggs —
the sklearn `precision_recall_fscore_support` calls of the reference
(evaluator.py:10-31) re-derived from tp/fp/fn counts so they distribute.

All of these are single hash-aggregate shuffles on the label column (tiny
cardinality), then a driver-sized reduce — at 100 TB the only shuffle is on
a handful of class labels, with map-side partial aggregation doing ~all of
the work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def classification_metrics(
    pairs: DataFrame, pred_col: str = "pred", true_col: str = "true"
) -> DataFrame:
    """(pred, true) label pairs -> one row: (n, accuracy, micro_precision,
    micro_recall, micro_f1, macro_precision, macro_recall, macro_f1,
    weighted_precision, weighted_recall, weighted_f1).

    Matches sklearn `precision_recall_fscore_support` semantics for every
    average the reference emits (evaluator.py:16-18, 29-31): per-class
    tp/fp/fn over the union of labels seen in pred or true; macro =
    unweighted mean over classes; weighted = mean weighted by true support
    (classes with zero support contribute 0 weight); micro = global
    tp/(tp+fp) etc. (== accuracy for single-label multiclass).
    """
    p, t = F.col(pred_col), F.col(true_col)
    labels = (
        pairs.select(p.alias("label"))
        .unionByName(pairs.select(t.alias("label")))
        .distinct()
    )
    per_class = labels.join(
        pairs.groupBy(p.alias("label")).agg(
            F.sum(F.when(p == t, 1).otherwise(0)).alias("tp"),
            F.sum(F.when(p != t, 1).otherwise(0)).alias("fp"),
        ),
        "label",
        "left",
    ).join(
        pairs.filter(p != t).groupBy(t.alias("label")).agg(F.count("*").alias("fn")),
        "label",
        "left",
    ).fillna(0, subset=["tp", "fp", "fn"])
    per_class = per_class.withColumn(
        "precision",
        F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(F.lit(0.0)),
    ).withColumn(
        "recall",
        F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(F.lit(0.0)),
    ).withColumn(
        "f1",
        F.when(
            F.col("precision") + F.col("recall") > 0,
            2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall")),
        ).otherwise(F.lit(0.0)),
    )
    totals = pairs.agg(
        F.count("*").alias("n"),
        F.avg((p == t).cast("double")).alias("accuracy"),
    )
    # try_divide + coalesce: zero-tp corners (all predictions wrong, empty
    # class) must yield 0.0 metrics, not ANSI division-by-zero errors
    support = F.col("tp") + F.col("fn")  # sklearn weights by TRUE support
    micro = per_class.agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn"),
        F.avg("precision").alias("macro_precision"),
        F.avg("recall").alias("macro_recall"),
        F.avg("f1").alias("macro_f1"),
        F.sum(support).alias("total_support"),
        F.sum(support * F.col("precision")).alias("w_p"),
        F.sum(support * F.col("recall")).alias("w_r"),
        F.sum(support * F.col("f1")).alias("w_f"),
    ).select(
        F.coalesce(
            F.try_divide(F.col("tp"), F.col("tp") + F.col("fp")), F.lit(0.0)
        ).alias("micro_precision"),
        F.coalesce(
            F.try_divide(F.col("tp"), F.col("tp") + F.col("fn")), F.lit(0.0)
        ).alias("micro_recall"),
        "macro_precision",
        "macro_recall",
        "macro_f1",
        F.coalesce(F.try_divide(F.col("w_p"), F.col("total_support")), F.lit(0.0)).alias(
            "weighted_precision"
        ),
        F.coalesce(F.try_divide(F.col("w_r"), F.col("total_support")), F.lit(0.0)).alias(
            "weighted_recall"
        ),
        F.coalesce(F.try_divide(F.col("w_f"), F.col("total_support")), F.lit(0.0)).alias(
            "weighted_f1"
        ),
    ).withColumn(
        "micro_f1",
        F.coalesce(
            F.try_divide(
                2 * F.col("micro_precision") * F.col("micro_recall"),
                F.col("micro_precision") + F.col("micro_recall"),
            ),
            F.lit(0.0),
        ),
    )
    return totals.crossJoin(micro).select(
        "n", "accuracy", "micro_precision", "micro_recall", "micro_f1",
        "macro_precision", "macro_recall", "macro_f1",
        "weighted_precision", "weighted_recall", "weighted_f1",
    )


def full_matches(
    pairs: DataFrame, src_col: str = "src", pred_col: str = "pred", true_col: str = "true"
) -> DataFrame:
    """A6 (generative_task_evaluator.py:88-110): a query counts as a FULL
    match iff every one of its positional predictions is correct.
    Returns one row (full_match_count, query_count)."""
    per_src = pairs.groupBy(src_col).agg(
        F.min((F.col(pred_col) == F.col(true_col)).cast("int")).alias("all_correct")
    )
    return per_src.agg(
        F.sum("all_correct").alias("full_match_count"),
        F.count("*").alias("query_count"),
    )


def consensus(
    results: DataFrame,
    src_col: str = "src",
    pred_col: str = "pred",
    true_col: str = "true",
    n_models: int | None = None,
) -> DataFrame:
    """A9 (binary_task_evaluator.py:75-83): srcs where all models agree,
    with correctness of the consensus vote vs gold."""
    g = results.groupBy(src_col).agg(
        F.countDistinct(pred_col).alias("n_preds"),
        F.count("*").alias("n_models"),
        F.first(pred_col).alias("vote"),
        F.first(true_col).alias("true"),
    )
    if n_models is not None:
        g = g.filter(F.col("n_models") == n_models)
    return g.filter(F.col("n_preds") == 1).select(
        src_col, "vote", "true", (F.col("vote") == F.col("true")).alias("correct")
    )


def confusion_matrix(
    pairs: DataFrame, pred_col: str = "pred", true_col: str = "true"
) -> DataFrame:
    """A10 long-form confusion counts (evaluator.py:135-159); pivot to wide
    at the driver only for display."""
    return (
        pairs.groupBy(F.col(true_col).alias("true"), F.col(pred_col).alias("pred"))
        .agg(F.count("*").alias("n"))
        .orderBy("true", "pred")
    )


def triple_pr(extracted: DataFrame, gold: DataFrame) -> DataFrame:
    """Triple-set precision/recall vs a gold set (the BASELINE.json grade):
    distinct (subj,pred,obj) on both sides, FULL outer join, then every
    count and derived metric from ONE aggregate — a single Spark job
    (the previous form ran three separate count() actions; VERDICT r2 #7).
    Lazy: no driver action happens here at all.
    One row: (n_extracted, n_gold, n_matched, precision, recall, f1)."""
    e = extracted.select("subj", "pred", "obj").distinct().withColumn("__e", F.lit(1))
    g = gold.select("subj", "pred", "obj").distinct().withColumn("__g", F.lit(1))
    joined = e.join(g, ["subj", "pred", "obj"], "full")
    counts = joined.agg(
        F.count("__e").alias("n_extracted"),
        F.count("__g").alias("n_gold"),
        F.count(F.when(F.col("__e").isNotNull() & F.col("__g").isNotNull(), 1)).alias(
            "n_matched"
        ),
    )
    prec = F.coalesce(F.try_divide("n_matched", "n_extracted"), F.lit(0.0))
    rec = F.coalesce(F.try_divide("n_matched", "n_gold"), F.lit(0.0))
    with_pr = counts.select(
        "n_extracted", "n_gold", "n_matched",
        prec.alias("precision"), rec.alias("recall"),
    )
    return with_pr.select(
        "*",
        F.coalesce(
            F.try_divide(
                2 * F.col("precision") * F.col("recall"),
                F.col("precision") + F.col("recall"),
            ),
            F.lit(0.0),
        ).alias("f1"),
    )
