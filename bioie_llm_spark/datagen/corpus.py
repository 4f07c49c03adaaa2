"""Deterministic synthetic corpus: Iceberg-style source-file table with
planted STRING/KEGG/INDRA facts (seed-stable at ANY parallelism).

Mirrors the reference's input corpora semantically (SURVEY.md §1, FIXTURES.md):

- STRING PPI edges          -> "X interacts with Y."        (string_reader.py:101-122)
- KEGG pathway membership   -> "Pathway P includes gene G." (kegg_reader.py:141-158)
- INDRA typed statements    -> "X phosphorylates Y."        (indra_reader.py:62-77)

Everything derives from ``spark.range`` + ``xxhash64`` expressions keyed on
stable row ids — NO Python RNG, NO ``rand()`` (which is partition-dependent).
Identical output under local[1] / local[8] / local[32]; this is what makes
the scaling-efficiency benchmark an apples-to-apples comparison and row-level
sha256 assertions possible.

Scale knob: a single ``CorpusSpec``; ``CorpusSpec.for_scale(sf)`` follows the
driver's sf convention (sf0.001 ~ smoke, sf0.01 ~ correctness, sf0.1 ~ bench).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42

# Boundary-trap names (reference tests `EB1` vs `RHEB`, `PSD` vs `PSD-95`:
# base_processor.py:1279-1293) — substring pairs the mention matcher must
# distinguish with its word-boundary class [a-zA-Z0-9-_].
TRAP_NAMES = [
    "EB1", "RHEB", "PSD", "PSD-95", "AKT", "AKT1",
    "TP53", "P53", "RAS", "KRAS", "MAP2", "MAP2K1",
]

INDRA_VERBS = {
    "activates": "activation",
    "inhibits": "inhibition",
    "phosphorylates": "phosphorylation",
    "dephosphorylates": "dephosphorylation",
    "ubiquitinates": "ubiquitination",
    "deubiquitinates": "deubiquitination",
}
INDRA_VERB_LIST = sorted(INDRA_VERBS)  # stable order for element_at

LANGS = ["python", "md", "txt", "rst", "java"]

PRED_INTERACTS = "interacts_with"
PRED_HAS_GENE = "has_gene"


@dataclass(frozen=True)
class CorpusSpec:
    n_files: int = 200
    n_prot: int = 100
    n_genes: int = 80
    n_pathways: int = 20
    n_edges: int = 2200      # PPI edge draws (pre-dedup)
    n_memberships: int = 600  # KEGG pathway-gene draws (pre-dedup)
    n_statements: int = 900   # INDRA statement draws (pre-dedup)

    @classmethod
    def for_scale(cls, sf: float) -> "CorpusSpec":
        k = max(sf / 0.001, 1.0)  # 1 at sf0.001, 100 at sf0.1
        return cls(
            n_files=int(200 * k),
            n_prot=max(100, int(60 * k)),
            n_genes=max(80, int(40 * k)),
            n_pathways=max(20, int(8 * k)),
            n_edges=int(2200 * k),
            n_memberships=int(600 * k),
            n_statements=int(900 * k),
        )


def _h(col, salt: int):
    """Stable 64-bit hash of a column + salt (parallelism-independent)."""
    return F.xxhash64(col, F.lit(salt), F.lit(SEED))


def _pick(col, salt: int, n: int):
    """Deterministic uniform pick in [0, n)."""
    return F.pmod(_h(col, salt), F.lit(n)).cast("int")


def protein_name_col(idx_col):
    """Protein display name for index i: curated trap names first, then
    generated `PR######X` symbols (suffix letter prevents prefix-substring
    collisions between generated names). NOTE: Spark lpad TRUNCATES inputs
    longer than the pad width — width 7 keeps names collision-free up to
    10M entities (a truncation here once duplicated gazetteer aliases and
    exploded the linking join 100x)."""
    traps = F.array(*[F.lit(t) for t in TRAP_NAMES])
    return F.when(
        idx_col < len(TRAP_NAMES), F.element_at(traps, idx_col.cast("int") + 1)
    ).otherwise(F.concat(F.lit("PR"), F.lpad(idx_col.cast("string"), 7, "0"), F.lit("X")))


def gene_name_col(idx_col):
    return F.concat(F.lit("GEN"), F.lpad(idx_col.cast("string"), 7, "0"), F.lit("B"))


def pathway_name_col(idx_col):
    return F.concat(F.lit("PWY_"), F.lpad(idx_col.cast("string"), 6, "0"))


def build_gazetteer(spark: SparkSession, spec: CorpusSpec) -> DataFrame:
    """Alias -> canonical-entity gazetteer (UniProt/MeSH-style; the linking
    dimension table — broadcast-sized by design, like the reference's
    id->preferred_name dicts at string_reader.py:92-98).

    Every 5th protein gets a `SYN_`-prefixed synonym so canonicalization has
    real alias clusters to collapse. Returns (alias, canonical, entity_type).
    """
    prot = (
        spark.range(spec.n_prot)
        .select(protein_name_col(F.col("id")).alias("canonical"), F.col("id"))
        .withColumn("entity_type", F.lit("protein"))
    )
    prot_primary = prot.select(
        F.col("canonical").alias("alias"), "canonical", "entity_type"
    )
    prot_syn = (
        prot.filter(F.col("id") % 5 == 0)
        .select(
            F.concat(F.lit("SYN_"), F.col("canonical")).alias("alias"),
            "canonical",
            "entity_type",
        )
    )
    gene = spark.range(spec.n_genes).select(
        gene_name_col(F.col("id")).alias("canonical"),
        F.lit("gene").alias("entity_type"),
    )
    gene_primary = gene.select(F.col("canonical").alias("alias"), "canonical", "entity_type")
    gene_alias = gene.select(
        F.concat(F.col("canonical"), F.lit("A1")).alias("alias"), "canonical", "entity_type"
    )
    pw = spark.range(spec.n_pathways).select(
        pathway_name_col(F.col("id")).alias("canonical"),
        F.lit("pathway").alias("entity_type"),
    )
    pw_primary = pw.select(F.col("canonical").alias("alias"), "canonical", "entity_type")
    return (
        prot_primary.unionByName(prot_syn)
        .unionByName(gene_primary)
        .unionByName(gene_alias)
        .unionByName(pw_primary)
    )


def build_facts(spark: SparkSession, spec: CorpusSpec) -> DataFrame:
    """Unified fact table: (fact_kind, subj, pred, obj, sentence).

    This is simultaneously the GOLD triple set and the source of planted
    sentences. Facts are deduped on (subj, pred, obj) so the gold set is a
    set (the reference dedups adjacency the same way, string_reader.py:112-120).
    """
    # --- STRING PPI edges (undirected; canonicalised as subj < obj) ---
    ppi = (
        spark.range(spec.n_edges)
        .select(
            _pick(F.col("id"), 1, spec.n_prot).alias("a"),
            _pick(F.col("id"), 2, spec.n_prot).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .select(
            protein_name_col(F.least("a", "b")).alias("subj"),
            protein_name_col(F.greatest("a", "b")).alias("obj"),
        )
        .distinct()
        .select(
            F.lit("ppi").alias("fact_kind"),
            "subj",
            F.lit(PRED_INTERACTS).alias("pred"),
            "obj",
        )
        .withColumn(
            "sentence",
            F.concat(F.col("subj"), F.lit(" interacts with "), F.col("obj"), F.lit(".")),
        )
    )

    # --- KEGG pathway membership ---
    kegg = (
        spark.range(spec.n_memberships)
        .select(
            pathway_name_col(_pick(F.col("id"), 11, spec.n_pathways)).alias("subj"),
            gene_name_col(_pick(F.col("id"), 12, spec.n_genes)).alias("obj"),
        )
        .distinct()
        .select(
            F.lit("kegg").alias("fact_kind"),
            "subj",
            F.lit(PRED_HAS_GENE).alias("pred"),
            "obj",
        )
        .withColumn(
            "sentence",
            F.concat(
                F.lit("Pathway "), F.col("subj"),
                F.lit(" includes gene "), F.col("obj"), F.lit("."),
            ),
        )
    )

    # --- INDRA typed statements (directed) ---
    verbs = F.array(*[F.lit(v) for v in INDRA_VERB_LIST])
    label_map = F.create_map(
        *[F.lit(x) for kv in INDRA_VERBS.items() for x in kv]
    )
    indra = (
        spark.range(spec.n_statements)
        .select(
            _pick(F.col("id"), 21, spec.n_prot).alias("a"),
            _pick(F.col("id"), 22, spec.n_prot).alias("b"),
            F.element_at(verbs, _pick(F.col("id"), 23, len(INDRA_VERB_LIST)) + 1).alias(
                "verb"
            ),
        )
        .filter(F.col("a") != F.col("b"))
        .select(
            protein_name_col(F.col("a")).alias("subj"),
            label_map[F.col("verb")].alias("pred"),
            protein_name_col(F.col("b")).alias("obj"),
            F.col("verb"),
        )
        .distinct()
        .select(
            F.lit("indra").alias("fact_kind"),
            "subj",
            "pred",
            "obj",
            F.concat(
                F.col("subj"), F.lit(" "), F.col("verb"), F.lit(" "),
                F.col("obj"), F.lit("."),
            ).alias("sentence"),
        )
    )
    return ppi.unionByName(kegg).unionByName(indra)


def build_corpus(
    spark: SparkSession, spec: CorpusSpec, facts: DataFrame | None = None
) -> DataFrame:
    """Iceberg-style corpus table (repo, path, commit, lang, content).

    Facts are scattered over ``spec.n_files`` files by hash; content is the
    newline-joined *sorted* list of planted sentences (array_sort makes the
    content byte-stable at any parallelism -> sha256(content) is a stable
    per-row invariant) plus deterministic distractor lines containing
    gazetteer names embedded in longer tokens (xEB1y etc.) that a correct
    word-boundary matcher must NOT fire on.

    Repo assignment is intentionally skewed: ~30% of files land in 3 hot
    repos (FIXTURES.md §1) to exercise AQE skew handling.
    """
    if facts is None:
        facts = build_facts(spark, spec)
    tagged = facts.withColumn(
        "file_id", F.pmod(F.xxhash64("subj", "pred", "obj", F.lit(SEED)), F.lit(spec.n_files))
    )
    per_file = tagged.groupBy("file_id").agg(
        F.array_sort(F.collect_list("sentence")).alias("sentences")
    )
    # files that drew no facts still exist (pure-noise files)
    all_files = spark.range(spec.n_files).select(F.col("id").alias("file_id"))
    per_file = all_files.join(per_file, "file_id", "left").withColumn(
        "sentences", F.coalesce("sentences", F.array().cast("array<string>"))
    )

    hot = _pick(F.col("file_id"), 7, 10) < 3
    repo = F.when(
        hot, F.concat(F.lit("org/hot-"), _pick(F.col("file_id"), 8, 3))
    ).otherwise(F.concat(F.lit("org/repo-"), _pick(F.col("file_id"), 9, 197)))
    commit = F.substring(
        F.concat(F.md5(F.col("file_id").cast("string")), F.md5(repo)), 1, 40
    )
    distractor = F.concat(
        F.lit("// distractor: xEB1y RHEBQ zPSD-95w "),
        F.lit("token_"), F.md5(F.concat(F.lit("d"), F.col("file_id"))),
    )
    header = F.concat(F.lit("# synthetic corpus file "), F.col("file_id").cast("string"))
    return per_file.select(
        repo.alias("repo"),
        F.concat(F.lit("src/file_"), F.col("file_id"), F.lit(".py")).alias("path"),
        commit.alias("commit"),
        F.element_at(
            F.array(*[F.lit(x) for x in LANGS]), _pick(F.col("file_id"), 5, len(LANGS)) + 1
        ).alias("lang"),
        F.concat_ws(
            "\n", F.concat(header, F.lit("")), F.concat_ws("\n", "sentences"), distractor
        ).alias("content"),
    )
