"""Prompt-template registry (SURVEY.md §2.7 F5/F6/F7): per-(model, task)
question/answer templates as Catalyst `format_string` expressions, plus the
few-shot prefix builder.

The reference ships 12 prompter classes of lambda templates
(src/prompters/*.py); here one registry keyed by (model, slot) with the same
task slots: entity_q/a, relation_q/a, relation_type_q/a for the STRING/INDRA
corpora plus the per-corpus kegg_entity_q/a and kegg_relation_q/a forms
(`get_kegg_prompt`). Templates mirror each prompter's ACTIVE (last-assigned)
lambdas — the reference files carry many commented/overridden drafts;
semantics cited per family below, no code copied. Argument convention is uniform:
entity_q(%s=entity), relation_q(%s,%s=e1,e2), relation_type_q(sentence, e1,
e2, choices) — families whose string orders the slots differently (the
"Given the options: C ... between X and Y" form) use java.util.Formatter
positional specifiers (%1$s..%4$s), which `format_string` supports natively
and ``few_shot_prefix`` resolves Python-side.

Few-shot prefixes are driver-side constants folded into a `lit()` column —
query-constant, exactly like the reference's task_prompt
(base_processor.py:74).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the "Given the options" relation-type form shared by most families
# (e.g. biogpt_prompter.py get_indra_prompt, llama3_prompter.py same):
# order in-string is (sentence, choices, e1, e2)
_RT_OPTIONS = (
    "%1$s\n\nQuestion: Given the options: %4$s, which one is the relation type "
    "between %2$s and %3$s in the text above?\n\nAnswer:"
)

# the KEGG relation form nearly every family converged on
# (*_prompter.py get_kegg_prompt, last-assigned)
_KEGG_IS_GENE_RQ = (
    'Question: Is the gene "%s" involved in the pathway "%s"?\n\nAnswer:'
)
_KEGG_ASSOC_EQ = 'QUESTION: Which genes are associated with "%s"?\nANSWER:'

# a QUESTION/ANSWER block several families converged on
# (llama3/llama3_1/mistral/mpt/solar_prompter.py get_string_prompt +
# get_kegg_prompt; mpt overrides the kegg entity question below)
_QA_UPPER = {
    "entity_q": "QUESTION: Which proteins interact with %s?\nANSWER:",
    "entity_a": " %s\n",
    "relation_q": "QUESTION: Do %s and %s interact with each other?\nANSWER:",
    "relation_a": " %s\n",
    "relation_type_q": _RT_OPTIONS,
    "relation_type_a": " %s\n\n",
        "kegg_entity_q": _KEGG_ASSOC_EQ,
    "kegg_entity_a": " %s\n",
    "kegg_relation_q": _KEGG_IS_GENE_RQ,
    "kegg_relation_a": " %s\n\n",
}

# %s placeholders filled by format_string; answer slots end the exemplar.
TEMPLATES: dict[str, dict[str, str]] = {
    # galactica_prompter.py:36-57
    "galactica": {
        "entity_q": "Question: Which proteins are related to %s?\n\nAnswer:",
        "entity_a": " %s\n\n",
        "relation_q": "Question: Do %s and %s interact with each other?\n\nAnswer:",
        "relation_a": " %s\n\n",
        "relation_type_q": "%s\n\nQuestion: What is the relation type between %s and %s in the sentence above? Choose one from %s.\n\nAnswer:",
        "relation_type_a": " %s\n\n",
        "kegg_entity_q": 'Question: Which genes are involved in "%s"?\n\nAnswer:',
        "kegg_entity_a": " %s</s>\n\n",
        "kegg_relation_q": 'Question: Are "%s" and "%s" related to each other?\n\nAnswer:',
        "kegg_relation_a": " %s</s>\n\n",
    },
    # llama2_prompter.py:35-67 ([INST] chat form)
    "llama2": {
        "entity_q": "[INST] List proteins that interact with %s. [/INST]",
        "entity_a": " %s </s>",
        "relation_q": "[INST] Do %s and %s interact? Answer yes or no. [/INST]",
        "relation_a": " %s </s>",
        "relation_type_q": "[INST] %s\nWhat is the relation between %s and %s? Options: %s [/INST]",
        "relation_type_a": " %s </s>",
        "kegg_entity_q": _KEGG_ASSOC_EQ,
        "kegg_entity_a": " %s\n",
        "kegg_relation_q": _KEGG_IS_GENE_RQ,
        "kegg_relation_a": " %s\n\n",
    },
    # engine-local fallback family (not a reference prompter)
    "generic": {
        "entity_q": "Which proteins are related to %s?\nAnswer:",
        "entity_a": " %s\n",
        "relation_q": "Do %s and %s interact (yes/no)?\nAnswer:",
        "relation_a": " %s\n",
        "relation_type_q": "%s\nRelation between %s and %s? One of: %s.\nAnswer:",
        "relation_type_a": " %s\n",
        "kegg_entity_q": 'Which genes are in pathway %s?\nAnswer:',
        "kegg_entity_a": " %s\n",
        "kegg_relation_q": 'Is gene %s in pathway %s (yes/no)?\nAnswer:',
        "kegg_relation_a": " %s\n",
    },
    # alpaca_prompter.py get_string_prompt (completion-style entity query)
    "alpaca": {
        "entity_q": 'The following proteins interact with the protein "%s":',
        "entity_a": " %s\n\n",
        "relation_q": "Question: Do %s and %s interact with each other?\n\nAnswer:",
        "relation_a": " %s\n\n",
        "relation_type_q": _RT_OPTIONS,
        "relation_type_a": " %s\n\n",
        "kegg_entity_q": 'The following genes are involved in "%s" pathway:',
        "kegg_entity_a": " %s\n\n",
        "kegg_relation_q": _KEGG_IS_GENE_RQ,
        "kegg_relation_a": " %s\n\n",
    },
    # biogpt_prompter.py get_string_prompt
    "biogpt": {
        "entity_q": "Question: Which proteins are related to %s?\n\nAnswer:",
        "entity_a": " %s\n\n",
        "relation_q": "Question: Do %s and %s interact with each other?\n\nAnswer:",
        "relation_a": " %s\n\n",
        "relation_type_q": _RT_OPTIONS,
        "relation_type_a": " %s\n\n",
        "kegg_entity_q": 'Question: Which genes are involved in "%s"?\n\nAnswer:',
        "kegg_entity_a": " %s\n\n",
        "kegg_relation_q": _KEGG_IS_GENE_RQ,
        "kegg_relation_a": " %s\n\n",
    },
    # biomedlm_prompter.py get_string_prompt (single-line Answer: tail)
    "biomedlm": {
        "entity_q": "QUESTION: Which proteins interact with %s?\nANSWER:",
        "entity_a": " %s\n",
        "relation_q": "Question: Do %s and %s interact with each other? Answer:",
        "relation_a": " %s\n\n",
        "relation_type_q": _RT_OPTIONS,
        "relation_type_a": " %s\n\n",
        "kegg_entity_q": 'Question: Which genes are involved in "%s"? Answer:',
        "kegg_entity_a": " %s\n\n",
        "kegg_relation_q": 'Question: Is the gene "%s" involved in the pathway "%s"? Answer:',
        "kegg_relation_a": " %s\n\n",
    },
    # falcon_prompter.py get_string_prompt (>>QUESTION<< control tokens)
    "falcon": {
        "entity_q": ">>QUESTION<< Which proteins interact with %s?\n>>ANSWER<<",
        "entity_a": " %s\n",
        "relation_q": ">>QUESTION<< Do %s and %s interact with each other?\n>>ANSWER<<",
        "relation_a": " %s\n",
        "relation_type_q": _RT_OPTIONS,
        "relation_type_a": " %s\n\n",
        "kegg_entity_q": '>>QUESTION<< Which genes are associated with "%s"?\n>>ANSWER<<',
        "kegg_entity_a": " %s\n",
        "kegg_relation_q": _KEGG_IS_GENE_RQ,
        "kegg_relation_a": " %s\n\n",
    },
    # llama3_prompter.py / llama3_1_prompter.py / mistral_prompter.py /
    # mpt_prompter.py / solar_prompter.py get_string_prompt — the reference
    # ships these as five near-identical classes; the registry keeps one
    # dict each so per-family selection still works
    "llama3": dict(_QA_UPPER),
    "llama3.1": dict(_QA_UPPER),
    "mistral": dict(_QA_UPPER),
    "mpt": dict(_QA_UPPER, kegg_entity_q='QUESTION: Which genes are related to "%s"?\nANSWER:'),
    "solar": dict(_QA_UPPER),
    # rst_prompter.py get_string_prompt
    "rst": {
        "entity_q": "Question: Which proteins interact with %s? Answer:",
        "entity_a": " %s\n",
        "relation_q": "Question: Are %s and %s related to each other?\n\nAnswer:",
        "relation_a": " %s\n\n",
        "relation_type_q": _RT_OPTIONS,
        "relation_type_a": " %s\n\n",
        "kegg_entity_q": 'Question: Which genes are involved in "%s"?\n\nAnswer:',
        "kegg_entity_a": " %s\n\n",
        "kegg_relation_q": 'Question: Are "%s" and "%s" related to each other?\n\nAnswer:',
        "kegg_relation_a": " %s\n\n",
    },
}


def template(model: str, slot: str) -> str:
    return TEMPLATES[model][slot]


_POSITIONAL = re.compile(r"%(\d+)\$s")


def py_format(tpl: str, args: tuple) -> str:
    """Python-side twin of format_string: resolves %N$s positional
    specifiers (java.util.Formatter syntax) that plain %-formatting
    doesn't understand."""
    if _POSITIONAL.search(tpl):
        return _POSITIONAL.sub(lambda m: str(args[int(m.group(1)) - 1]), tpl)
    return tpl % args


def render(model: str, slot: str, *args: Column) -> Column:
    """Template -> format_string column (JVM-side, codegen'd)."""
    return F.format_string(template(model, slot), *args)


def choices_string(labels: list[str]) -> str:
    """F7: the quoted multiple-choice list (indra_processor.py:50)."""
    return ", ".join(f'"{x}"' for x in labels)


def few_shot_prefix(
    shots: DataFrame, model: str, q_slot: str, a_slot: str, q_cols: list[str], a_col: str
) -> str:
    """F6: fold <=~5 exemplar rows into one constant prefix string. The
    shots frame is tiny (seeded-sampled upstream); collect is intentional
    and bounded (reference interleaves exemplars the same way,
    string_processor.py:84-86)."""
    rows = shots.select(*q_cols, a_col).collect()
    parts = []
    for r in rows:
        parts.append(py_format(template(model, q_slot), tuple(r[c] for c in q_cols)))
        parts.append(py_format(template(model, a_slot), (r[a_col],)))
    return "".join(parts)


def build_prompts(
    df: DataFrame, model: str, q_slot: str, q_cols: list[str], prefix: str = ""
) -> DataFrame:
    """Attach the final prompt column: constant few-shot prefix + rendered
    per-row question."""
    q = render(model, q_slot, *[F.col(c) for c in q_cols])
    return df.withColumn("prompt", F.concat(F.lit(prefix), q))


def apply_context_budget(
    df: DataFrame,
    max_len: int,
    max_new_tokens: int = 0,
    prompt_col: str = "prompt",
) -> tuple[DataFrame, DataFrame]:
    """Context-length guard (base_processor.py:862, run_model.py:582-599):
    rows whose prompt + generation budget exceed the model context are
    filtered OUT of the inference pool and returned separately as an
    overflow metric frame (count per overflow reason) instead of the
    reference's hard assert."""
    budget = max_len - max_new_tokens
    ok = df.filter(F.length(prompt_col) <= budget)
    overflow = (
        df.filter(F.length(prompt_col) > budget)
        .agg(
            F.count("*").alias("n_overflow"),
            F.max(F.length(prompt_col)).alias("max_prompt_len"),
        )
        .withColumn("budget", F.lit(budget))
    )
    return ok, overflow
