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
    }
    for model, t in TEMPLATES.items():
        assert set(t) == slots, model


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
