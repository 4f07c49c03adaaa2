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
