"""End-to-end KG-construction pipelines (SURVEY.md §3 EP1/EP2/EP3).

The north-star dataflow:

    corpus (repo, path, commit, lang, content)
      -> sha256 stamp -> mock-LLM extraction (mapInPandas)
      -> broadcast gazetteer linking
      -> dedup -> (subj, pred, obj) triple table partitioned by pred
      -> scored tasks (entity / relation / relation_type) replicating the
         reference's grading semantics exactly.

Every stage can be materialized through sources.checkpoint for
snapshot-granular resume + lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .datagen.corpus import (
    INDRA_VERBS,
    PRED_HAS_GENE,
    PRED_INTERACTS,
    CorpusSpec,
    build_corpus,
    build_facts,
    build_gazetteer,
)
from .extraction import extract_triples, link_entities
from .functions.cleaning import extract_choice_expr, match_mentions_udf
from .operators.adjacency import negative_pairs, symmetric_adjacency
from .operators.metrics import (
    classification_metrics,
    confusion_matrix,
    full_matches,
    triple_pr,
)
from .operators.sampling import seeded_sample, stratified_sample
from .operators.setops import sort_and_pad
from .sources.checkpoint import materialize, resume_by_key

INDRA_LABELS = sorted(INDRA_VERBS.values())


def build_triples(
    spark: SparkSession,
    spec: CorpusSpec,
    out_dir: str | None = None,
    snapshot: str = "snap-000",
    miss_per_mille: int = 20,
    hallu_per_mille: int = 10,
) -> dict[str, DataFrame]:
    """Corpus -> linked, deduped triple table. Returns all intermediate
    frames keyed by stage name; materializes each under out_dir if given."""
    facts = build_facts(spark, spec)
    corpus = build_corpus(spark, spec, facts)
    gaz = build_gazetteer(spark, spec)
    if out_dir:
        # the gold PROJECTION (distinct subj/pred/obj — not the sentence
        # column) materializes alongside the derived stages so the
        # triple-P/R grade is recomputable by a SECOND engine from parquet
        # alone (kg_triple_pr's computed DuckDB oracle, r4). Facts stay
        # lazy: materializing the full sentence-bearing table measurably
        # slowed the sf4.0 end-to-end run for data the oracle never reads.
        materialize(
            facts.select("subj", "pred", "obj").distinct(),
            out_dir,
            "gold",
            snapshot,
        )
        corpus = materialize(corpus, out_dir, "corpus", snapshot)
        gaz = materialize(gaz, out_dir, "gazetteer", snapshot)
    raw = extract_triples(corpus, miss_per_mille, hallu_per_mille)
    if out_dir:
        # materializing raw + linked gives (a) stage-granular resume around
        # the expensive UDF, (b) per-stage lineage rows from which funnel
        # metrics derive WITHOUT re-running extraction (VERDICT r1 #4: the
        # funnel used to execute the UDF three times)
        raw = materialize(raw, out_dir, "raw", snapshot)
    linked = link_entities(raw, gaz)
    if out_dir:
        linked = materialize(linked, out_dir, "linked", snapshot)
    # dedup to the triple set; keep provenance fan-in as n_sources + one
    # exemplar sha (first by deterministic min) for the per-row invariant
    triples = linked.groupBy("subj", "pred", "obj").agg(
        F.count("*").alias("n_sources"),
        F.min("source_sha256").alias("source_sha256"),
    )
    stages = {
        "facts": facts,
        "corpus": corpus,
        "gazetteer": gaz,
        "raw": raw,
        "linked": linked,
        "triples": triples,
    }
    if out_dir:
        stages["triples"] = triples = materialize(
            triples, out_dir, "triples", snapshot, partition_by=["pred"]
        )
        # the flagship sink also lands a subj-bucketed copy: the triple
        # table is re-joined on subj again and again downstream (canonical
        # remap, linking audits, graph expansion) — bucketing pays that
        # shuffle ONCE at write time and every later equi-join on subj is
        # exchange-free (canonical.canonicalize_triples_colocated;
        # plan-asserted in tests/test_bucketing.py)
        import hashlib

        from .operators.bucketing import ensure_bucketed_table

        # key the table name on everything that changes the triple content —
        # out_dir alone would let a same-dir rebuild with a different snapshot
        # or miss/hallu params silently reuse the PREVIOUS build's bucketed
        # rows in one long-lived session (ensure_bucketed_table skips the
        # rewrite whenever the catalog already has the name)
        build_key = f"{out_dir}|{snapshot}|{miss_per_mille}|{hallu_per_mille}"
        table = "triples_by_subj_" + hashlib.md5(build_key.encode()).hexdigest()[:10]
        stages["triples_bucketed_table"] = ensure_bucketed_table(
            triples, table, ["subj"], n_buckets=8
        )
    return stages


def entity_task(
    triples: DataFrame,
    gold_facts: DataFrame,
    n_queries: int = 100,
    min_fanout: int = 10,
    k: int = 10,
    model: str = "galactica",
    generate_fn=None,
) -> dict[str, DataFrame]:
    """EP1 (STRING entity): for each sampled query protein with >=min_fanout
    gold interactors, build the mock-LLM response from predicted interactors,
    run the F1 mention matcher against the gold list, sort_and_pad to k, and
    grade with positional micro/macro F1 + full-match count — the exact
    reference scoring chain (string_processor.py:400-450 ->
    base_processor.py:1266-1298, 1571-1595 -> evaluator.py:10-31).

    ``generate_fn``: real-model hook, passed straight to mock_generate —
    a ``list[prompt] -> list[generated]`` batch callable replaces the mock
    continuation while the entire surrounding chain (few-shot prompting,
    prompt strip, matching, padding, scoring) stays identical. This is the
    GPU swap-in point: load the model once per executor, batch-generate per
    Arrow chunk (see README 'Real-model inference')."""
    gold_adj = symmetric_adjacency(
        gold_facts.filter(F.col("pred") == PRED_INTERACTS), "subj", "obj"
    ).withColumnRenamed("interactors", "true_arr")
    pred_adj = symmetric_adjacency(
        triples.filter(F.col("pred") == PRED_INTERACTS), "subj", "obj"
    ).withColumnRenamed("interactors", "pred_arr")

    queries = seeded_sample(
        gold_adj.filter(F.size("true_arr") >= min_fanout), ["node"], n_queries
    )
    # full reference chain: few-shot prompt build (F5/F6) -> batched
    # generate (§2.8, prompt echoed back) -> P10 prompt strip -> F1 matcher
    from .extraction import mock_generate, strip_prompt
    from .functions.prompts import build_prompts, few_shot_prefix

    shots = seeded_sample(gold_adj, ["node"], 2, seed=7).withColumn(
        "answer", F.concat_ws(", ", F.slice("true_arr", 1, 3))
    ).withColumnRenamed("node", "entity")
    prefix = few_shot_prefix(
        shots, model, "entity_q", "entity_a", ["entity"], "answer"
    )
    prompts = build_prompts(
        queries.withColumnRenamed("node", "entity"), model, "entity_q",
        ["entity"], prefix,
    )
    # the predicted interactor lists ride INTO the generate as a column
    # (facts_col): the full pred_adj streams through one join against the
    # broadcast-sized prompt frame — nothing is collected to the driver
    # (pred_adj is the adjacency of the WHOLE triple table; VERDICT r1 #1)
    with_facts = prompts.join(
        pred_adj.withColumnRenamed("node", "entity"), "entity", "left"
    ).withColumn("pred_arr", F.coalesce("pred_arr", F.array().cast("array<string>")))
    generated = mock_generate(
        with_facts,
        max_new_tokens=200,
        miss_per_mille=0,
        facts_col="pred_arr",
        generate_fn=generate_fn,
    )
    matched = (
        generated.withColumn(
            "response", strip_prompt(F.col("generated"), F.col("prompt"))
        )
        .withColumnRenamed("entity", "node")
        .withColumn("matched", match_mentions_udf(F.col("response"), F.col("true_arr")))
    )
    p_out, t_out = sort_and_pad(F.col("matched"), F.col("true_arr"), k)
    aligned = matched.select(
        F.col("node").alias("src"), p_out.alias("pred_k"), t_out.alias("true_k")
    )
    pairs = aligned.select(
        "src",
        F.posexplode(F.arrays_zip("pred_k", "true_k")).alias("pos", "pt"),
    ).select("src", "pos", F.col("pt.pred_k").alias("pred"), F.col("pt.true_k").alias("true"))
    return {
        "aligned": aligned,
        "pairs": pairs,
        "metrics": classification_metrics(pairs),
        "full_matches": full_matches(pairs),
    }


def relation_task(
    triples: DataFrame, gold_facts: DataFrame, n_pairs: int = 200, model: str = "galactica"
) -> dict[str, DataFrame]:
    """EP2 (STRING relation, binary yes/no): balanced positive pairs +
    generated negatives (sample-then-anti-join, never cartesian), mock
    response with formatting noise, F2 choice extraction, binary metrics
    (string_processor.py:140-336, base_processor.py:1336-1345)."""
    gold_ppi = gold_facts.filter(F.col("pred") == PRED_INTERACTS).select("subj", "obj")
    pos = seeded_sample(gold_ppi, ["subj", "obj"], n_pairs).withColumn(
        "true", F.lit("yes")
    )
    nodes = (
        gold_ppi.select(F.col("subj").alias("node"))
        .unionByName(gold_ppi.select(F.col("obj").alias("node")))
        .distinct()
    )
    neg = negative_pairs(nodes, gold_ppi, n_pairs).withColumn("true", F.lit("no"))
    eval_pairs = pos.unionByName(neg)

    pred_ppi = (
        triples.filter(F.col("pred") == PRED_INTERACTS)
        .select("subj", "obj")
        .distinct()
        .withColumn("found", F.lit(1))
    )
    pred_sym = pred_ppi.unionByName(
        pred_ppi.select(F.col("obj").alias("subj"), F.col("subj").alias("obj"), "found")
    ).distinct()
    with_pred = eval_pairs.join(pred_sym, ["subj", "obj"], "left")

    # full §2.8 chain at the relation task's token budget (max_new_tokens=2,
    # run_model.py:556-557): prompt -> generate -> strip -> F2 choice extract.
    # The "model" answers Yes/No with hash-keyed formatting variants the
    # extractor must see through.
    from .extraction import mock_generate, strip_prompt
    from .functions.prompts import build_prompts

    style = F.pmod(F.xxhash64("subj", "obj", F.lit(7)), F.lit(3))
    raw_answer = F.when(F.col("found").isNotNull(), "Yes").otherwise("No")
    answer_text = F.when(style == 0, F.concat(raw_answer, F.lit(","))).when(
        style == 1, F.concat(F.lit("Answer: "), F.lower(raw_answer), F.lit("."))
    ).otherwise(F.lower(raw_answer))
    keyed = with_pred.withColumn(
        "entity", F.concat_ws("|", "subj", "obj")
    ).withColumn("facts", F.array(answer_text))
    prompts = build_prompts(keyed, model, "relation_q", ["subj", "obj"])
    generated = mock_generate(
        prompts, max_new_tokens=4, miss_per_mille=0, facts_col="facts"
    )
    graded = generated.withColumn(
        "response", strip_prompt(F.col("generated"), F.col("prompt"))
    ).withColumn("pred", extract_choice_expr(F.col("response"), ["yes", "no"]))
    pairs = graded.select("subj", "obj", "pred", "true")
    return {"pairs": pairs, "metrics": classification_metrics(pairs)}


def relation_type_task(
    triples: DataFrame, gold_facts: DataFrame, n_per_class: int = 50, model: str = "generic"
) -> dict[str, DataFrame]:
    """EP3 (INDRA relation_type, 6-way choice): stratified gold sample per
    class, predicted label from the extracted triple for the same (subj,obj)
    pair, F2 choice extraction over the 6 labels, metrics + confusion matrix
    (indra_processor.py:27-236)."""
    gold = gold_facts.filter(F.col("fact_kind") == "indra").select("subj", "pred", "obj")
    sample = stratified_sample(gold, "pred", ["subj", "obj"], n_per_class).withColumnRenamed(
        "pred", "true"
    )
    pred_indra = (
        triples.filter(F.col("pred").isin(INDRA_LABELS))
        .groupBy("subj", "obj")
        .agg(F.min("pred").alias("pred_label"))
    )
    with_pred = sample.join(pred_indra, ["subj", "obj"], "left")

    # §2.8 chain at the INDRA budget (max_new_tokens=5, run_model.py:558-561):
    # unanswered pairs generate ' None.' -> F2 defaults to 'none'.
    from .extraction import mock_generate, strip_prompt
    from .functions.prompts import build_prompts

    keyed = with_pred.withColumn("entity", F.concat_ws("|", "subj", "obj")).withColumn(
        "facts",
        F.when(F.col("pred_label").isNotNull(), F.array("pred_label")).otherwise(
            F.array().cast("array<string>")
        ),
    )
    prompts = build_prompts(keyed, model, "relation_q", ["subj", "obj"])
    generated = mock_generate(
        prompts, max_new_tokens=5, miss_per_mille=0, facts_col="facts"
    )
    graded = generated.withColumn(
        "response", strip_prompt(F.col("generated"), F.col("prompt"))
    ).withColumn("pred", extract_choice_expr(F.col("response"), INDRA_LABELS))
    pairs = graded.select("subj", "obj", "pred", "true")
    return {
        "pairs": pairs,
        "metrics": classification_metrics(pairs),
        "confusion": confusion_matrix(pairs),
    }


def kegg_entity_task(
    triples: DataFrame,
    gold_facts: DataFrame,
    n_pathways: int = 50,
    k: int = 10,
    model: str = "galactica",
) -> dict[str, DataFrame]:
    """KEGG entity task (kegg_processor.py:73-133): top-N pathways (T3 rank
    slice), gold = gene lists with alias arrays (D4/P3), run through the
    FULL §2.8 chain — per-family kegg_entity_q prompt (F5) -> batched
    generate (facts ride in the Arrow batch) -> P10 strip; the generation
    renders some genes by their `A1` alias (hash-keyed), the matcher
    accepts ANY alias and projects back to the first/canonical alias (P4)
    before sort_and_pad + metrics — the reference's alias semantics
    end-to-end."""
    from .extraction import mock_generate, strip_prompt
    from .functions.prompts import build_prompts

    gold = (
        gold_facts.filter(F.col("pred") == PRED_HAS_GENE)
        .groupBy(F.col("subj").alias("pathway"))
        .agg(F.array_sort(F.collect_set("obj")).alias("true_arr"))
    )
    top = gold.orderBy("pathway").limit(n_pathways)  # T3: deterministic rank slice
    pred = (
        triples.filter(F.col("pred") == PRED_HAS_GENE)
        .groupBy(F.col("subj").alias("pathway"))
        .agg(F.array_sort(F.collect_set("obj")).alias("pred_arr"))
    )
    joined = top.join(pred, "pathway", "left").withColumn(
        "pred_arr", F.coalesce("pred_arr", F.array().cast("array<string>"))
    )
    # the "model" emits ~1/3 of genes via their alias form (gene + 'A1')
    rendered = F.transform(
        "pred_arr",
        lambda g: F.when(F.pmod(F.xxhash64(g, F.lit(3)), F.lit(3)) == 0, F.concat(g, F.lit("A1"))).otherwise(g),
    )
    keyed = joined.withColumn("entity", F.col("pathway")).withColumn("facts", rendered)
    prompts = build_prompts(keyed, model, "kegg_entity_q", ["entity"])
    generated = mock_generate(
        prompts, max_new_tokens=200, miss_per_mille=0, facts_col="facts"
    )
    joined = generated.withColumn(
        "response", strip_prompt(F.col("generated"), F.col("prompt"))
    )
    # gold alias dictionary: every gene matches as canonical OR canonical+'A1';
    # matched aliases project back to the canonical (first-alias, P4)
    flat_aliases = F.flatten(
        F.transform("true_arr", lambda g: F.array(F.concat(g, F.lit("A1")), g))
    )
    matched_aliases = match_mentions_udf(F.col("response"), flat_aliases)
    matched = joined.withColumn(
        "matched",
        F.array_distinct(
            F.transform(matched_aliases, lambda m: F.regexp_replace(m, "A1$", ""))
        ),
    )
    p_out, t_out = sort_and_pad(F.col("matched"), F.col("true_arr"), k)
    aligned = matched.select(
        F.col("pathway").alias("src"), p_out.alias("pred_k"), t_out.alias("true_k")
    )
    pairs = aligned.select(
        "src", F.posexplode(F.arrays_zip("pred_k", "true_k")).alias("pos", "pt")
    ).select("src", "pos", F.col("pt.pred_k").alias("pred"), F.col("pt.true_k").alias("true"))
    return {
        "aligned": aligned,
        "pairs": pairs,
        "metrics": classification_metrics(pairs),
        "full_matches": full_matches(pairs),
    }


def incremental_triples(
    spark: SparkSession,
    corpus: DataFrame,
    gazetteer: DataFrame,
    out_dir: str,
    snapshot: str,
    miss_per_mille: int = 20,
    hallu_per_mille: int = 10,
) -> DataFrame:
    """Snapshot-incremental triple build: the Iceberg-append flow. Each
    call sees the CURRENT corpus snapshot; extraction + linking run only
    for source files whose (repo, path, commit) key has never been
    processed (key-granular resume over a cumulative linked store —
    sources.checkpoint.resume_by_key), then the deduped triple table for
    this snapshot is materialized from the cumulative store. Unchanged
    files cost one anti-join probe, never a re-extraction; a snapshot that
    adds 0.1% of files does ~0.1% of the UDF work. Interrupted runs resume
    at file granularity (at-least-once; the dedup agg absorbs replays)."""

    def compute(todo: DataFrame) -> DataFrame:
        return link_entities(
            extract_triples(todo, miss_per_mille, hallu_per_mille), gazetteer
        )

    linked = resume_by_key(
        corpus, out_dir, "linked_incr", "cumulative",
        ["repo", "path", "commit"], compute,
    )
    triples = linked.groupBy("subj", "pred", "obj").agg(
        F.count("*").alias("n_sources"),
        F.min("source_sha256").alias("source_sha256"),
    )
    return materialize(triples, out_dir, "triples", snapshot, partition_by=["pred"])


def run_end_to_end(
    spark: SparkSession,
    spec: CorpusSpec | None = None,
    sf: float = 0.001,
    out_dir: str | None = None,
) -> dict[str, DataFrame]:
    """Full pipeline at a given scale; returns the triple table, the triple
    P/R grade vs gold, and all three scored tasks."""
    spec = spec or CorpusSpec.for_scale(sf)
    stages = build_triples(spark, spec, out_dir=out_dir)
    gold = stages["facts"]
    triples = stages["triples"]
    out = {"triples": triples, "triple_pr": triple_pr(triples, gold)}
    out["entity"] = entity_task(triples, gold)
    out["relation"] = relation_task(triples, gold)
    out["relation_type"] = relation_type_task(triples, gold)
    out["kegg_entity"] = kegg_entity_task(triples, gold)
    return out
