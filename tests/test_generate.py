"""Mock generate operator (§2.8): prompt echo, token budget, determinism,
prompt-strip round trip."""

from pyspark.sql import functions as F

from bioie_llm_spark.extraction import mock_generate, strip_prompt


def _prompts(spark):
    return spark.createDataFrame(
        [("AKT", "Q: which proteins relate to AKT?\nA:"),
         ("EB1", "Q: which proteins relate to EB1?\nA:"),
         ("UNKNOWN", "Q: which proteins relate to UNKNOWN?\nA:")],
        "entity string, prompt string",
    )

KNOWLEDGE = {"AKT": ["TP53", "MDM2", "RHEB"], "EB1": ["PSD-95"]}


def test_generate_echoes_prompt_and_strip(spark):
    g = mock_generate(_prompts(spark), KNOWLEDGE, miss_per_mille=0)
    out = g.withColumn("response", strip_prompt(F.col("generated"), F.col("prompt")))
    rows = {r["entity"]: r for r in out.collect()}
    assert rows["AKT"]["generated"].startswith(rows["AKT"]["prompt"])
    assert rows["AKT"]["response"] == " TP53, MDM2, RHEB."
    assert rows["EB1"]["response"] == " PSD-95."
    # unknown entity -> the 'None' default the choice extractor expects
    assert rows["UNKNOWN"]["response"] == " None."


def test_generate_token_budget(spark):
    g = mock_generate(_prompts(spark), KNOWLEDGE, max_new_tokens=2, miss_per_mille=0)
    row = {r["entity"]: r["generated"] for r in g.collect()}
    cont = row["AKT"][len("Q: which proteins relate to AKT?\nA:"):]
    assert len(cont.split(" ")) <= 2


def test_generate_deterministic_with_noise(spark):
    a = sorted(r["generated"] for r in mock_generate(_prompts(spark), KNOWLEDGE, miss_per_mille=300).collect())
    b = sorted(r["generated"] for r in mock_generate(_prompts(spark).repartition(3), KNOWLEDGE, miss_per_mille=300).collect())
    assert a == b


def test_generate_fn_plug_point(spark):
    """The real-LLM hook: a batch callable list[prompt] -> list[generated]
    runs inside the Arrow batch and overrides the mock continuation."""

    def fake_llm(batch):
        return [p + " GENERATED(" + str(len(batch)) + ")" for p in batch]

    g = mock_generate(_prompts(spark), generate_fn=fake_llm)
    out = g.withColumn("response", strip_prompt(F.col("generated"), F.col("prompt")))
    for r in out.collect():
        assert r["generated"].startswith(r["prompt"])
        assert r["response"].startswith(" GENERATED(")


def test_generate_requires_exactly_one_source(spark):
    import pytest

    with pytest.raises(ValueError):
        mock_generate(_prompts(spark))
    with pytest.raises(ValueError):
        mock_generate(_prompts(spark), KNOWLEDGE, facts_col="prompt")


def test_generate_fn_end_to_end_entity_task(spark, tiny_spec):
    """VERDICT r2 #8: drive a non-trivial generate_fn through the FULL
    scored-task chain. The 'model' is a deterministic CPU rule: it parses
    the query entity out of the rendered prompt (the shape a real LLM sees)
    and answers from its own weights (the predicted adjacency, loaded
    executor-side via closure — the same residence a GPU model has). Its
    continuations reproduce the facts_col path's exactly, so the entire
    chain (few-shot prompt -> generate -> strip -> match -> pad -> score)
    must produce IDENTICAL metrics through either supply path."""
    import re

    from pyspark.sql import functions as F

    from bioie_llm_spark.datagen.corpus import PRED_INTERACTS
    from bioie_llm_spark.operators.adjacency import symmetric_adjacency
    from bioie_llm_spark.pipeline import build_triples, entity_task

    stages = build_triples(spark, tiny_spec)
    triples, facts = stages["triples"], stages["facts"]
    pred_adj = symmetric_adjacency(
        triples.filter(F.col("pred") == PRED_INTERACTS), "subj", "obj"
    )
    weights = {r["node"]: list(r["interactors"]) for r in pred_adj.collect()}
    ent_re = re.compile(r"related to (\S+)\?")

    def rule_model(prompts):
        outs = []
        for p in prompts:
            entity = ent_re.findall(p)[-1]  # last question = the live query
            fs = weights.get(entity, [])
            outs.append(p + (" " + ", ".join(fs) + "." if fs else " None."))
        return outs

    via_fn = entity_task(triples, facts, n_queries=10, generate_fn=rule_model)
    via_facts = entity_task(triples, facts, n_queries=10)
    m_fn = via_fn["metrics"].first().asDict()
    m_facts = via_facts["metrics"].first().asDict()
    assert m_fn["n"] > 0
    assert m_fn == m_facts
    fm = via_fn["full_matches"].first()
    assert fm["query_count"] == 10
