"""Mock-LLM triple-extraction operator: the engine's one irreducible
black-box, expressed as ``mapInPandas`` (SURVEY.md §2.8).

The reference runs batched ``model.generate`` over prompt micro-batches
(/root/reference/src/data_processors/base_processor.py:121-207); here each
Arrow batch IS the prompt micro-batch and the "model" is a deterministic
parser over ``content`` with a hash-seeded noise knob:

- *miss*: a planted fact is dropped with probability miss_per_mille/1000
  (recall noise, like a model failing to recall an interactor);
- *hallucination*: a spurious triple is emitted with probability
  hallu_per_mille/1000 — half with an out-of-gazetteer entity (killed later
  by entity linking, like `clean_response` killing non-gold mentions), half
  with a real-but-wrong self-loop that survives linking (precision noise).

All noise is keyed on md5(subj|pred|obj) — deterministic at any parallelism
and across runs, so sf0.001 and sf0.1 runs are exactly reproducible
(reference pins RANDOM_SEED=42 for the same reason, base_processor.py:58-59).

Scale notes: the UDF is Arrow-batched (no per-row Python round trips across
the JVM boundary); regexes are compiled once per module import and applied
in a per-row Python loop over each Arrow batch — the loop is intentional
(the emit logic is data-dependent: per-triple noise buckets, conditional
hallucination rows), and its cost is dominated by the C-level regex scans;
a real LLM replaces the whole loop with batched GPU generate anyway.
sha256(content) is computed JVM-side (``F.sha2``) *before* the UDF and
carried through — the per-row invariant required by BASELINE.json.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .datagen.corpus import INDRA_VERBS, PRED_HAS_GENE, PRED_INTERACTS

EXTRACT_SCHEMA = (
    "repo string, path string, source_sha256 string, "
    "subj string, pred string, obj string"
)

_PPI_RE = re.compile(r"(\S+) interacts with (\S+)\.")
_KEGG_RE = re.compile(r"Pathway (\S+) includes gene (\S+)\.")
_INDRA_RE = re.compile(
    r"(\S+) (" + "|".join(sorted(INDRA_VERBS)) + r") (\S+)\."
)


def _noise_bucket(subj: str, pred: str, obj: str) -> int:
    """Deterministic uniform bucket in [0, 1000) for a fact."""
    d = hashlib.md5(f"{subj}|{pred}|{obj}".encode()).digest()
    return int.from_bytes(d[:4], "big") % 1000


_GEN_NAME = re.compile(r"^PR(\d+)X$")


def _has_synonym(name: str) -> bool:
    """Mirrors datagen: every 5th generated protein carries a SYN_ alias
    (corpus.build_gazetteer)."""
    m = _GEN_NAME.match(name)
    return bool(m) and int(m.group(1)) % 5 == 0


def extract_triples(
    corpus: DataFrame,
    miss_per_mille: int = 20,
    hallu_per_mille: int = 10,
    target_partitions: int | None = None,
) -> DataFrame:
    """corpus(repo, path, commit, lang, content) -> raw triple stream
    (repo, path, source_sha256, subj, pred, obj). Unlinked, undeduped —
    linking and canonicalization are downstream operators.

    ``target_partitions``: explicit repartition before the UDF so every
    executor core gets prompt micro-batches — the reference tunes batch
    size per task the same way (run_model.py:403-410). Essential when the
    corpus arrives as few large files (one parquet file = one input split
    = serial extraction no matter how many cores); a real Iceberg table
    at 10^12 files brings its own splits, but hot small tables don't.
    AQE never coalesces an explicit numbered repartition, so the fan-out
    sticks."""

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows: list[tuple] = []
            for repo, path, sha, content in zip(
                pdf["repo"], pdf["path"], pdf["source_sha256"], pdf["content"]
            ):
                triples: list[tuple[str, str, str]] = []
                for s, o in _PPI_RE.findall(content):
                    triples.append((s, PRED_INTERACTS, o))
                for s, o in _KEGG_RE.findall(content):
                    triples.append((s, PRED_HAS_GENE, o))
                for s, verb, o in _INDRA_RE.findall(content):
                    triples.append((s, INDRA_VERBS[verb], o))
                for s, p, o in triples:
                    b = _noise_bucket(s, p, o)
                    if b < miss_per_mille:
                        continue  # model "forgot" this fact
                    # surface-form variation: ~3% of mentions come out as the
                    # SYN_ alias (real models emit synonyms; the gazetteer
                    # join must map them back to the canonical id)
                    if 960 <= b < 990 and _has_synonym(s):
                        s = "SYN_" + s
                    out_rows.append((repo, path, sha, s, p, o))
                    if b >= 990 and (990 + hallu_per_mille) > b:
                        if b % 2 == 0:
                            # out-of-gazetteer hallucination: linking kills it
                            out_rows.append((repo, path, sha, s + "_GHOST", p, o))
                        else:
                            # in-gazetteer wrong fact: survives linking
                            out_rows.append((repo, path, sha, s, p, s))
            yield pd.DataFrame(
                out_rows,
                columns=["repo", "path", "source_sha256", "subj", "pred", "obj"],
            )

    if target_partitions:
        corpus = corpus.repartition(target_partitions)
    with_sha = corpus.withColumn("source_sha256", F.sha2(F.col("content"), 256))
    return with_sha.select(
        "repo", "path", "source_sha256", "content"
    ).mapInPandas(infer, EXTRACT_SCHEMA)


def mock_generate(
    prompts: DataFrame,
    knowledge: dict[str, list[str]] | None = None,
    max_new_tokens: int = 200,
    entity_col: str = "entity",
    prompt_col: str = "prompt",
    miss_per_mille: int = 20,
    facts_col: str | None = None,
    generate_fn=None,
) -> DataFrame:
    """The batched `model.generate` analog (§2.8, base_processor.py:169-201):
    prompt micro-batches in, *prompt + continuation* out (models emit the
    prompt tokens first; the caller strips them — P10).

    ``generate_fn``: the REAL-model plug point — a callable
    ``list[prompt] -> list[generated]`` invoked once per Arrow batch on the
    executor (each batch is the prompt micro-batch; a GPU-backed
    implementation loads the model once per worker and runs batched
    inference here, the exact shape of the reference's
    ``model.generate(**encoded_batch)``). When provided it overrides the
    mock continuation entirely; knowledge/facts_col is then optional.

    Two ways to supply the mock "model weights":

    - ``facts_col`` (the scale path): an ``array<string>`` column of the
      facts to verbalize, joined onto the prompt frame upstream — the same
      shape a real LLM uses (everything the generation needs rides in the
      Arrow batch; nothing is collected to the driver). Distributed
      end-to-end, bounded only by the prompt frame.
    - ``knowledge``: a driver-side entity -> facts dict, broadcast to
      executors. Only for mock-sized tests; building it from a full table
      collects unbounded rows (the exact anti-pattern VERDICT r1 flagged).

    - ``max_new_tokens`` caps the continuation length in whitespace tokens
      (per-task budgets: entity 200 / relation 2 / indra 5,
      run_model.py:553-568).
    - recall noise: a fact is dropped from the continuation with
      probability miss_per_mille/1000, hash-keyed (deterministic) — output
      is identical whichever supply path is used.
    """
    if generate_fn is None and (knowledge is None) == (facts_col is None):
        raise ValueError("mock_generate needs exactly one of knowledge / facts_col")
    bc = (
        prompts.sparkSession.sparkContext.broadcast(knowledge)
        if knowledge is not None
        else None
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if generate_fn is not None:
                res = pdf.copy()
                res["generated"] = generate_fn(list(pdf[prompt_col]))
                yield res
                continue
            if bc is not None:
                fact_lists = (bc.value.get(e, []) for e in pdf[entity_col])
            else:
                fact_lists = (
                    [] if fs is None else list(fs) for fs in pdf[facts_col]
                )
            out = []
            for entity, prompt, facts in zip(pdf[entity_col], pdf[prompt_col], fact_lists):
                kept = [
                    f
                    for f in facts
                    if f is not None
                    and _noise_bucket(entity, "gen", f) >= miss_per_mille
                ]
                continuation = " " + ", ".join(kept) + "." if kept else " None."
                toks = continuation.split(" ")
                if len(toks) > max_new_tokens:
                    continuation = " ".join(toks[:max_new_tokens])
                out.append(prompt + continuation)
            res = pdf.copy()
            res["generated"] = out
            yield res

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in prompts.schema)
    return prompts.mapInPandas(fn, schema + ", generated string")


def strip_prompt(generated, prompt):
    """P10 (base_processor.py:1176-1181): cut the echoed prompt off the
    generation — `text[len(prompt):]` as a JVM expression."""
    return F.substring(generated, F.length(prompt) + 1, F.lit(2**30))


def link_entities(
    triples: DataFrame, gazetteer: DataFrame, keep_unlinked: bool = False
) -> DataFrame:
    """Dictionary-backed entity linking via two broadcast hash joins —
    the Spark generalization of the reference's id->name dict lookups
    (string_reader.py:109-110, J1 in SURVEY.md §2.3).

    gazetteer: (alias, canonical, entity_type); broadcast-sized by design.
    Returns triples with subj/obj replaced by canonical ids; rows whose
    subj or obj is not in the gazetteer are dropped (hallucination filter)
    unless keep_unlinked.

    Aliases are deduped before joining: a duplicate alias key on the build
    side multiplies the probe side (at 100 TB a 2x-duplicated gazetteer is
    a 2x row explosion through BOTH joins) — dedup is one cheap hash-agg
    over a dimension table.
    """
    uniq = gazetteer.dropDuplicates(["alias"])
    gaz_s = F.broadcast(
        uniq.select(F.col("alias").alias("subj"), F.col("canonical").alias("subj_canon"))
    )
    gaz_o = F.broadcast(
        uniq.select(F.col("alias").alias("obj"), F.col("canonical").alias("obj_canon"))
    )
    how = "left" if keep_unlinked else "inner"
    linked = triples.join(gaz_s, "subj", how).join(gaz_o, "obj", how)
    return linked.select(
        "repo",
        "path",
        "source_sha256",
        F.coalesce("subj_canon", "subj").alias("subj"),
        "pred",
        F.coalesce("obj_canon", "obj").alias("obj"),
    )
