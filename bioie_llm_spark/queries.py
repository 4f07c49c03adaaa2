"""Driver-facing query registry: every implemented operator from
SURVEY.md §2 as a (spark_fn, duckdb_oracle_sql) pair over the driver's
parquet tables at /root/testdata/sf*/.

Conventions (driver compare = row-count + schema + order-insensitive
value-hash, columns sorted by name):
- every computed column aliased identically in Spark and SQL;
- arrays stringified with a sorted ``concat_ws`` (array hash representation
  differs across engines; strings don't);
- floats rounded to 4 decimals on both sides;
- deterministic 'random' = ordering on ``md5(key || ':seed')`` — bit-equal
  in Spark and DuckDB (operators.sampling rationale).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.cleaning import extract_choice_expr
from .operators.sampling import hash_order_key, seeded_sample, stratified_sample, top_k
from .operators.setops import sort_and_pad

Entry = tuple[Callable[[SparkSession, str], DataFrame], str | None]
REGISTRY: dict[str, Entry] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------------------
# A1 — symmetric adjacency build (string_reader.py:112-120): part-supplier
# bipartite edges -> per-node sorted interactor list. One union + one hash
# agg; at scale the shuffle is on node keys only, map-side combined.
@register(
    "a1_symmetric_adjacency",
    """
    WITH e AS (
      SELECT DISTINCT 'p' || l_partkey AS a, 's' || l_suppkey AS b FROM lineitem
    ),
    sym AS (
      SELECT a AS node, b AS nbr FROM e UNION ALL SELECT b AS node, a AS nbr FROM e
    )
    SELECT node,
           array_to_string(list_sort(list(DISTINCT nbr)), ',') AS interactors,
           count(DISTINCT nbr) AS degree
    FROM sym GROUP BY node
    """,
)
def a1_symmetric_adjacency(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    e = li.select(
        F.concat(F.lit("p"), "l_partkey").alias("a"),
        F.concat(F.lit("s"), "l_suppkey").alias("b"),
    ).distinct()
    sym = e.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionByName(
        e.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    return sym.groupBy("node").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("nbr"))).alias("interactors"),
        F.countDistinct("nbr").alias("degree"),
    )


# A2 — grouped membership (kegg_reader.py:141-150): nation -> sorted supplier
# name list.
@register(
    "a2_group_membership",
    """
    SELECT n.n_name AS nation,
           array_to_string(list_sort(list(DISTINCT s.s_name)), ',') AS members,
           count(DISTINCT s.s_name) AS n_members
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def a2_group_membership(spark, sf_dir):
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("s_name"))).alias("members"),
            F.countDistinct("s_name").alias("n_members"),
        )
    )


# A5 — per-class tp/fp/fn counts feeding micro/macro F1 (evaluator.py:10-31).
# pred = event_type; true = deterministic relabel (every 3rd user 'click').
_A5_TRUE_SQL = "CASE WHEN user_id % 3 = 0 THEN 'click' ELSE event_type END"


@register(
    "a5_per_class_counts",
    f"""
    WITH pairs AS (
      SELECT event_type AS pred, {_A5_TRUE_SQL} AS true_label FROM events
    ),
    labels AS (
      SELECT DISTINCT pred AS label FROM pairs
      UNION SELECT DISTINCT true_label FROM pairs
    )
    SELECT l.label AS label,
           coalesce(sum(CASE WHEN p.pred = l.label AND p.true_label = l.label THEN 1 END), 0) AS tp,
           coalesce(sum(CASE WHEN p.pred = l.label AND p.true_label <> l.label THEN 1 END), 0) AS fp,
           coalesce(sum(CASE WHEN p.true_label = l.label AND p.pred <> l.label THEN 1 END), 0) AS fn
    FROM labels l LEFT JOIN pairs p
      ON p.pred = l.label OR p.true_label = l.label
    GROUP BY l.label
    """,
)
def a5_per_class_counts(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    pairs = ev.select(
        F.col("event_type").alias("pred"),
        F.when(F.col("user_id") % 3 == 0, "click")
        .otherwise(F.col("event_type"))
        .alias("true_label"),
    )
    labels = (
        pairs.select(F.col("pred").alias("label"))
        .union(pairs.select("true_label"))
        .distinct()
    )
    p, t = F.col("pred"), F.col("true_label")
    tp = pairs.filter(p == t).groupBy(p.alias("label")).agg(F.count("*").alias("tp"))
    fp = pairs.filter(p != t).groupBy(p.alias("label")).agg(F.count("*").alias("fp"))
    fn = pairs.filter(p != t).groupBy(t.alias("label")).agg(F.count("*").alias("fn"))
    return (
        labels.join(tp, "label", "left")
        .join(fp, "label", "left")
        .join(fn, "label", "left")
        .fillna(0, subset=["tp", "fp", "fn"])
        .select("label", "tp", "fp", "fn")
    )


# A6 — full-match count (generative_task_evaluator.py:88-110): orders where
# EVERY lineitem shipped before the order-priority cutoff behaves as one
# all-positions-correct query.
@register(
    "a6_full_match",
    """
    WITH per AS (
      SELECT l_orderkey,
             min(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS all_n
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT coalesce(sum(all_n), 0) AS full_match_count, count(*) AS query_count FROM per
    """,
)
def a6_full_match(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(
        F.min(F.when(F.col("l_returnflag") == "N", 1).otherwise(0)).alias("all_n")
    )
    return per.agg(
        F.coalesce(F.sum("all_n"), F.lit(0)).alias("full_match_count"),
        F.count("*").alias("query_count"),
    )


# A9 — consensus vote (binary_task_evaluator.py:75-83): users whose events
# all carry one event_type.
@register(
    "a9_consensus",
    """
    SELECT user_id, min(event_type) AS vote, count(*) AS n_events
    FROM events GROUP BY user_id
    HAVING count(DISTINCT event_type) = 1
    """,
)
def a9_consensus(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.min("event_type").alias("vote"),
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("nd"),
        )
        .filter(F.col("nd") == 1)
        .drop("nd")
    )


# A10 — confusion matrix, long form (evaluator.py:135-159).
@register(
    "a10_confusion",
    f"""
    SELECT {_A5_TRUE_SQL} AS true_label, event_type AS pred, count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def a10_confusion(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.when(F.col("user_id") % 3 == 0, "click")
        .otherwise(F.col("event_type"))
        .alias("true_label"),
        F.col("event_type").alias("pred"),
    ).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# J1 — broadcast dimension lookup (string_reader.py:109-110): the entity-
# linking join shape. Explicit broadcast hints; filter pushed to the scan.
@register(
    "j1_broadcast_lookup",
    """
    SELECT l.l_orderkey, l.l_linenumber, p.p_name, s.s_name
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE l.l_quantity > 45
    """,
)
def j1_broadcast_lookup(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select("l_orderkey", "l_linenumber", "p_name", "s_name")
    )


# J3 — anti join / exclusion (string_processor.py:249-250).
@register(
    "j3_anti_join",
    """
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j3_anti_join(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# J6 — n-way ensemble join on src (binary_task_evaluator.py:64-79): three
# pseudo-models vote per user; keep users answered by all three.
@register(
    "j6_ensemble",
    """
    WITH votes AS (
      SELECT user_id AS src, event_id % 3 AS model, event_type AS pred FROM events
    ),
    per AS (
      SELECT src, count(DISTINCT model) AS n_models, count(DISTINCT pred) AS n_preds
      FROM votes GROUP BY src
    )
    SELECT src, n_preds FROM per WHERE n_models = 3
    """,
)
def j6_ensemble(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    votes = ev.select(
        F.col("user_id").alias("src"),
        (F.col("event_id") % 3).alias("model"),
        F.col("event_type").alias("pred"),
    )
    return (
        votes.groupBy("src")
        .agg(
            F.countDistinct("model").alias("n_models"),
            F.countDistinct("pred").alias("n_preds"),
        )
        .filter(F.col("n_models") == 3)
        .select("src", "n_preds")
    )


# J7 — positional equi-join of two ordered streams (result_comparer.py:113-116).
@register(
    "j7_positional_join",
    """
    WITH a AS (
      SELECT row_number() OVER (ORDER BY o_orderkey) AS pos, o_orderkey
      FROM orders WHERE o_orderstatus = 'O'
    ),
    b AS (
      SELECT row_number() OVER (ORDER BY o_orderkey) AS pos, o_orderkey
      FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT a.pos AS pos, a.o_orderkey AS key_a, b.o_orderkey AS key_b
    FROM a JOIN b ON a.pos = b.pos
    """,
)
def j7_positional_join(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.row_number().over(w).alias("pos"), F.col("o_orderkey").alias("key_a")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.row_number().over(w).alias("pos"), F.col("o_orderkey").alias("key_b")
    )
    return a.join(b, "pos").select("pos", "key_a", "key_b")


# ---------------------------------------------------------------------------
# T2 — seeded deterministic sample (string_processor.py:105): md5-ordered.
@register(
    "t2_seeded_sample",
    """
    SELECT o_orderkey, o_custkey FROM orders
    ORDER BY md5(o_orderkey || '|42') LIMIT 100
    """,
)
def t2_seeded_sample(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return seeded_sample(o, ["o_orderkey"], 100).select("o_orderkey", "o_custkey")


# T4 — stratified per-class sample (indra_processor.py:147-149).
@register(
    "t4_stratified_sample",
    """
    WITH ranked AS (
      SELECT event_id, event_type,
             row_number() OVER (
               PARTITION BY event_type ORDER BY md5(event_id || '|42')
             ) AS rn
      FROM events
    )
    SELECT event_id, event_type FROM ranked WHERE rn <= 50
    """,
)
def t4_stratified_sample(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return stratified_sample(ev, "event_type", ["event_id"], 50).select(
        "event_id", "event_type"
    )


# T3/T7 — global top-k (kegg_reader.py:98-104 top-100 slice).
@register(
    "t3_topk",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def t3_topk(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return top_k(
        o.select("o_orderkey", F.round("o_totalprice", 2).alias("price"), "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        100,
    ).drop("o_totalprice")


# ---------------------------------------------------------------------------
# U1 — sort_and_pad on real arrays (base_processor.py:1571-1595): pred = first
# 5 words of each document, true = words 4..9; k=5, stringified output.
@register(
    "u1_sort_and_pad",
    """
    WITH arrs AS (
      SELECT doc_id,
             list_distinct(list_slice(string_split(text, ' '), 1, 5)) AS p,
             list_distinct(list_slice(string_split(text, ' '), 4, 9)) AS t
      FROM documents
    ),
    parts AS (
      SELECT doc_id,
             list_sort(list_filter(p, x -> list_contains(t, x))) AS common,
             list_sort(list_filter(p, x -> NOT list_contains(t, x))) AS p_rest,
             list_sort(list_filter(t, x -> NOT list_contains(p, x))) AS t_rest
      FROM arrs
    ),
    outp AS (
      SELECT doc_id,
             list_slice(list_concat(common, p_rest), 1, 5) AS p_k,
             list_slice(list_concat(common, t_rest), 1, 5) AS t_k
      FROM parts
    )
    SELECT doc_id,
           array_to_string(
             list_concat(
               p_k,
               CASE WHEN len(t_k) > len(p_k)
                    THEN list_transform(range(len(t_k) - len(p_k)), x -> 'NONE')
                    ELSE [] END
             ), ',') AS pred_k,
           array_to_string(t_k, ',') AS true_k
    FROM outp
    """,
)
def u1_sort_and_pad(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    arrs = d.select(
        "doc_id",
        F.slice(words, 1, 5).alias("p"),
        F.slice(words, 4, 6).alias("t"),
    )
    p_out, t_out = sort_and_pad(F.col("p"), F.col("t"), 5)
    return arrs.select(
        "doc_id",
        F.concat_ws(",", p_out).alias("pred_k"),
        F.concat_ws(",", t_out).alias("true_k"),
    )


# ---------------------------------------------------------------------------
# F1 — boundary-aware mention matching over document text (base:1266-1298):
# which gazetteer terms appear as standalone words.
_F1_TERMS = ["spark", "vector", "query", "batch"]


@register(
    "f1_mention_match",
    f"""
    SELECT doc_id,
           array_to_string(
             list_filter({_F1_TERMS!r},
               t -> regexp_matches(text, '(^|[^A-Za-z0-9_-])' || t || '([^A-Za-z0-9_-]|$)')),
             ',') AS mentions
    FROM documents
    """,
)
def f1_mention_match(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    terms = F.array(*[F.lit(t) for t in _F1_TERMS])
    matched = F.filter(
        terms,
        lambda t: F.regexp_like(
            F.col("text"),
            F.concat(F.lit("(^|[^A-Za-z0-9_-])"), t, F.lit("([^A-Za-z0-9_-]|$)")),
        ),
    )
    return d.select("doc_id", F.concat_ws(",", matched).alias("mentions"))


# F2 — choice extraction over document text (base:1336-1345).
@register(
    "f2_choice_extract",
    """
    SELECT doc_id,
           coalesce(
             list_filter(
               list_transform(string_split_regex(text, '\\s+'),
                              t -> lower(regexp_replace(t, '[^a-zA-Z]', '', 'g'))),
               t -> t IN ('fast', 'slow'))[1],
             'none') AS choice
    FROM documents
    """,
)
def f2_choice_extract(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", extract_choice_expr(F.col("text"), ["fast", "slow"]).alias("choice")
    )


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
