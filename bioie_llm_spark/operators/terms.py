"""Corpus term statistics: TF-IDF and top-terms-per-document.

The keyword leg of a pretraining quality/topic filter (and the classic
IR baseline): tokenize once, one hash-agg for per-(doc, term) TF, one
vocab-sized hash-agg for DF, join IDF back, window top-k per doc.

Shuffle shape at 100 TB: the explode is map-side; TF aggregates on
(doc_id, term) with map-side partial combine (shuffle ~ distinct doc-term
pairs, far below token count); DF re-aggregates the TF table (already
one row per doc-term) on term alone — vocab-sized output; the IDF join
back is term-keyed against that vocab-sized side, which Spark/AQE
broadcasts when it fits and shuffle-joins otherwise; the final top-k
window repartitions on doc_id. Nothing is ever corpus × vocab.

Tokenization is the engine's shared normalization (lowercase, split on
non-alphabetic runs, drop 1-char fragments) so the DuckDB oracle can
reproduce it with `regexp_split_to_array` verbatim.

No counterpart in the reference engine — extension surface alongside the
Gopher/CCNet text battery in functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["doc_terms", "tfidf_top_terms"]


def doc_terms(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per (doc, term) with its term frequency. Tokens are
    lowercase alphabetic runs of length >= 2."""
    toks = F.split(F.lower(F.col(text_col)), "[^a-z]+")
    return (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .filter(F.length("term") >= 2)
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` terms per document by smooth TF-IDF:

        score = tf * (ln((N + 1) / (df + 1)) + 1)

    (sklearn's smooth_idf formula — every term's idf > 0, so rare-term
    documents still rank). Deterministic: ties break on the term string.
    Returns (doc_id, term, rnk, tf, df, score) with score rounded to 4.
    """
    tf = doc_terms(docs, id_col, text_col)
    # 1-row corpus-size digest, broadcast — the declared digest crossJoin
    # pattern (queries.py p5_p6 rationale).
    n = docs.select(F.countDistinct(id_col).alias("__n"))
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(df_tbl, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * (F.log((F.col("__n") + 1) / (F.col("df") + 1)) + 1), 4
            ),
        )
    )
    # Per-doc top-k as ONE aggregate (collect the doc's term structs, sort
    # the ~vocab-sized array per row, slice k) instead of a row_number
    # window: same doc-keyed exchange, but the window form sorts entire
    # partitions while this sorts each doc's own small array — measured
    # 3.1s -> 2.8s at sf1.0, bit-identical rows. Sort key (-score, term)
    # reproduces (score DESC, term ASC) exactly: negation is exact for
    # doubles and ties fall through to the term string.
    top = scored.groupBy(id_col).agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("score")).alias("__negs"),
                        F.col("term"),
                        F.col("tf"),
                        F.col("df"),
                        F.col("score"),
                    )
                )
            ),
            1,
            k,
        ).alias("__tops")
    )
    ex = top.select(id_col, F.posexplode("__tops").alias("__i", "__t"))
    return ex.select(
        id_col,
        F.col("__t.term").alias("term"),
        (F.col("__i") + 1).alias("rnk"),
        F.col("__t.tf").alias("tf"),
        F.col("__t.df").alias("df"),
        F.col("__t.score").alias("score"),
    )
