"""Prompt-template registry (F5/F6/F7)."""

from bioie_llm_spark.functions.prompts import (
    TEMPLATES,
    build_prompts,
    choices_string,
    few_shot_prefix,
)


def test_choices_string():
    assert choices_string(["yes", "no"]) == '"yes", "no"'


def test_all_models_have_all_slots():
    slots = {
        "entity_q", "entity_a", "relation_q", "relation_a",
        "relation_type_q", "relation_type_a",
        "kegg_entity_q", "kegg_entity_a", "kegg_relation_q", "kegg_relation_a",
    }
    for model, t in TEMPLATES.items():
        assert set(t) == slots, model


def test_kegg_slot_renderings(spark):
    df = spark.createDataFrame([("PWY_1",)], "entity string")
    expected = {
        "galactica": 'Question: Which genes are involved in "PWY_1"?\n\nAnswer:',
        "mpt": 'QUESTION: Which genes are related to "PWY_1"?\nANSWER:',
        "solar": 'QUESTION: Which genes are associated with "PWY_1"?\nANSWER:',
        "alpaca": 'The following genes are involved in "PWY_1" pathway:',
    }
    for fam, want in expected.items():
        got = build_prompts(df, fam, "kegg_entity_q", ["entity"]).first()["prompt"]
        assert got == want, fam


def test_few_shot_prefix_and_prompts(spark):
    shots = spark.createDataFrame(
        [("AKT", "TP53, MDM2"), ("EB1", "RHEB")], "entity string, answer string"
    )
    prefix = few_shot_prefix(shots, "galactica", "entity_q", "entity_a", ["entity"], "answer")
    assert "Which proteins are related to AKT?" in prefix
    assert " TP53, MDM2\n\n" in prefix
    assert prefix.index("AKT") < prefix.index("EB1")

    df = spark.createDataFrame([("TP53",)], "entity string")
    out = build_prompts(df, "galactica", "entity_q", ["entity"], prefix).first()
    assert out["prompt"].startswith(prefix)
    assert out["prompt"].endswith("Question: Which proteins are related to TP53?\n\nAnswer:")


def test_llama2_relation_prompt(spark):
    df = spark.createDataFrame([("AKT", "TP53")], "p1 string, p2 string")
    out = build_prompts(df, "llama2", "relation_q", ["p1", "p2"]).first()
    assert out["prompt"] == "[INST] Do AKT and TP53 interact? Answer yes or no. [/INST]"


def test_all_reference_families_present():
    # the reference ships 12 prompter classes (src/prompters/*.py); every
    # family must be selectable, plus the engine-local 'generic'
    assert set(TEMPLATES) == {
        "galactica", "llama2", "alpaca", "biogpt", "biomedlm", "falcon",
        "llama3", "llama3.1", "mistral", "mpt", "rst", "solar", "generic",
    }


def test_family_specific_renderings(spark):
    df = spark.createDataFrame([("AKT",)], "entity string")
    expected = {
        "falcon": ">>QUESTION<< Which proteins interact with AKT?\n>>ANSWER<<",
        "alpaca": 'The following proteins interact with the protein "AKT":',
        "mistral": "QUESTION: Which proteins interact with AKT?\nANSWER:",
        "rst": "Question: Which proteins interact with AKT? Answer:",
    }
    for fam, want in expected.items():
        got = build_prompts(df, fam, "entity_q", ["entity"]).first()["prompt"]
        assert got == want, fam


def test_positional_relation_type_slot(spark):
    """The 'Given the options' families order the slots (sentence, choices,
    e1, e2) in-string; the registry passes args uniformly as (sentence, e1,
    e2, choices) via %N$s — JVM format_string and the Python few-shot twin
    must agree."""
    from bioie_llm_spark.functions.prompts import py_format, template

    args = ("S.", "A", "B", '"x", "y"')
    want = (
        'S.\n\nQuestion: Given the options: "x", "y", which one is the '
        "relation type between A and B in the text above?\n\nAnswer:"
    )
    assert py_format(template("biogpt", "relation_type_q"), args) == want
    df = spark.createDataFrame([args], "s string, e1 string, e2 string, c string")
    got = build_prompts(df, "biogpt", "relation_type_q", ["s", "e1", "e2", "c"]).first()
    assert got["prompt"] == want
