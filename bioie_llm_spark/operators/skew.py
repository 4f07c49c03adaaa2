"""Explicit skew mitigation (SURVEY.md §4): salted two-stage aggregation
and hot-key-aware joins for heavy-hitter keys (hot repos, hot predicates).

AQE's skew-join splitting handles join-side skew at runtime; aggregation
skew on pathological keys (one predicate holding 40% of all triples) still
funnels one reducer. The classic fix: salt the key, pre-aggregate on
(key, salt), then finish on key — two small shuffles instead of one
lopsided one. Works for any algebraic aggregate (count/sum/min/max);
collect-style aggregates compose via array flatten.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, cols: list[str] | None = None) -> DataFrame:
    """Deterministic salt column in [0, n_salts): hash of the full row (or
    given cols) — NOT rand(), so plans stay reproducible."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn("__salt", F.pmod(F.xxhash64(*basis), F.lit(n_salts)).cast("int"))


def salted_count(df: DataFrame, keys: list[str], n_salts: int = 16) -> DataFrame:
    """groupBy(keys).count() resistant to hot keys: partial count per
    (keys, salt), then sum per keys."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(F.count("*").alias("__c"))
    return partial.groupBy(*keys).agg(F.sum("__c").alias("n"))


def salted_collect_set(
    df: DataFrame, keys: list[str], value: str, n_salts: int = 16
) -> DataFrame:
    """groupBy(keys).collect_set(value) via salted partials: per-salt sets,
    then flatten+distinct+sort at the final stage — each reducer in stage 1
    sees 1/n_salts of a hot key's rows."""
    salted = with_salt(df, n_salts, cols=[value])
    partial = salted.groupBy(*keys, "__salt").agg(F.collect_set(value).alias("__s"))
    return partial.groupBy(*keys).agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("__s")))).alias(
            f"{value}_set"
        )
    )


def broadcast_hot_keys(
    df: DataFrame, keys: list[str], threshold_frac: float = 0.05
) -> DataFrame:
    """Identify heavy hitters: keys holding more than threshold_frac of all
    rows (one pass; drives salting/broadcast decisions and lineage notes)."""
    total = df.count()
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= threshold_frac * total)
        .withColumn("frac", F.round(F.col("n") / total, 4))
    )
