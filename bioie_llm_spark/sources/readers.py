"""Raw-corpus readers (SURVEY.md §2.1 S1-S8): every file format the
reference ingests, as declarative Spark reads with explicit schemas.

Reference formats (semantics cited, no code copied):
- S1 `9606.protein.info.v11.5.txt`: TSV w/ header (string_reader.py:92-98)
- S2 `9606.protein.links.v11.5.txt`: space-delimited w/ header, score
  column read-and-dropped (string_reader.py:102-107)
- S3 `H_sapien_Negative_Real.csv`: headerless CSV with UTF-8 BOM
  (string_reader.py:82-86)
- S5 INDRA train/dev/test.json: JSON-lines (indra_reader.py:38-41)
- S6 KEGG pathway/gene/membership TSVs (kegg_reader.py:109-150) with the
  `path:` prefix / ` - Homo sapiens (human)` suffix surgery (P2) and the
  `'; '`/`', '` alias-split (P3)
- S7 golden result files: header + `****` delimiter + `num, src, pred,
  true` lines (evaluator.py:112-123; re-parsed at
  generative_task_evaluator.py:56-84)

All readers return DataFrames with explicit StructType; filters/projections
are expressed so Catalyst pushes them into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PROTEIN_INFO_SCHEMA = T.StructType(
    [
        T.StructField("string_protein_id", T.StringType()),
        T.StructField("preferred_name", T.StringType()),
        T.StructField("protein_size", T.IntegerType()),
        T.StructField("annotation", T.StringType()),
    ]
)

PROTEIN_LINKS_SCHEMA = T.StructType(
    [
        T.StructField("protein1", T.StringType()),
        T.StructField("protein2", T.StringType()),
        T.StructField("combined_score", T.IntegerType()),
    ]
)

INDRA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField(
            "entity_1",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("span", T.ArrayType(T.IntegerType())),
                ]
            ),
        ),
        T.StructField(
            "entity_2",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("span", T.ArrayType(T.IntegerType())),
                ]
            ),
        ),
        T.StructField("rel_type", T.StringType()),
    ]
)


def read_protein_info(spark: SparkSession, path: str) -> DataFrame:
    """S1: TSV with header -> (string_protein_id, preferred_name); unused
    columns pruned at the scan."""
    return (
        spark.read.option("sep", "\t")
        .option("header", True)
        .schema(PROTEIN_INFO_SCHEMA)
        .csv(path)
        .select(F.trim("string_protein_id").alias("string_protein_id"),
                F.trim("preferred_name").alias("preferred_name"))
    )


def read_protein_links(spark: SparkSession, path: str) -> DataFrame:
    """S2: space-delimited with header -> (protein1, protein2); the score
    column is read and dropped, matching the reference (no threshold)."""
    return (
        spark.read.option("sep", " ")
        .option("header", True)
        .schema(PROTEIN_LINKS_SCHEMA)
        .csv(path)
        .select(F.trim("protein1").alias("protein1"), F.trim("protein2").alias("protein2"))
    )


def read_negatome(spark: SparkSession, path: str) -> DataFrame:
    """S3: headerless CSV (BOM-tolerant) -> (protein1, protein2)."""
    df = spark.read.option("encoding", "UTF-8").csv(path).toDF("protein1", "protein2")
    # strip a leading BOM if the file carries one (utf-8-sig)
    return df.select(
        F.regexp_replace(F.trim("protein1"), "^﻿", "").alias("protein1"),
        F.trim("protein2").alias("protein2"),
    )


def read_indra_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S5: line-delimited JSON with the nested entity structs; applies the
    mention-uniqueness filter P7 (each entity name occurs exactly once in
    the text, indra_reader.py:72)."""
    df = spark.read.schema(INDRA_SCHEMA).json(path)

    # split-on-literal: escape regex metachars in entity names
    def occurs_once(name_col):
        pat = F.regexp_replace(name_col, r"([\\.\[\]\{\}\(\)\*\+\?\^\$\|])", r"\\$1")
        return F.size(F.split(F.col("text"), pat, -1)) == 2

    return df.filter(
        occurs_once(F.col("entity_1.name")) & occurs_once(F.col("entity_2.name"))
    )


def read_kegg_pathways(spark: SparkSession, path: str) -> DataFrame:
    """S6a: pathway TSV with the P2 string surgery (strip `path:` prefix and
    ` - Homo sapiens (human)` suffix)."""
    df = spark.read.option("sep", "\t").csv(path).toDF("pathway_id", "pathway_name")
    return df.select(
        F.regexp_replace(F.trim("pathway_id"), "^path:", "").alias("pathway_id"),
        F.regexp_replace(
            F.trim("pathway_name"), r" - Homo sapiens \(human\)$", ""
        ).alias("pathway_name"),
    )


def read_kegg_genes(spark: SparkSession, path: str) -> DataFrame:
    """S6b: gene TSV; P3 alias split — `SYM, ALIAS1; description` -> the
    first `'; '` segment split on `', '` into an alias array."""
    df = spark.read.option("sep", "\t").csv(path).toDF("gene_id", "gene_name")
    return df.select(
        F.trim("gene_id").alias("gene_id"),
        F.split(F.split(F.col("gene_name"), "; ").getItem(0), ", ").alias("aliases"),
    )


def read_kegg_pathway_genes(spark: SparkSession, path: str) -> DataFrame:
    """S6c: membership TSV (gene_id, pathway_id) with `path:` prefix strip."""
    df = spark.read.option("sep", "\t").csv(path).toDF("gene_id", "pathway_id")
    return df.select(
        F.trim("gene_id").alias("gene_id"),
        F.regexp_replace(F.trim("pathway_id"), "^path:", "").alias("pathway_id"),
    )


def kegg_pathway_gene_map(
    pathways: DataFrame, genes: DataFrame, membership: DataFrame
) -> DataFrame:
    """J2+A2: compose the pathway -> nested alias-array map
    (kegg_reader.py:152-158): two broadcast joins then one groupBy."""
    return (
        membership.join(F.broadcast(pathways), "pathway_id")
        .join(F.broadcast(genes), "gene_id")
        .groupBy("pathway_name")
        .agg(F.collect_list("aliases").alias("genes"))
    )


def read_converted_json(
    spark: SparkSession, path: str, value_type: str = "array<string>"
) -> DataFrame:
    """S4: dict-shaped converted JSON (one big object, e.g. the STRING
    adjacency {protein: [interactors]} at string_reader.py:75) -> rows
    (key, value). multiLine read of the single object, then unpivoted via
    stack-less explode of the struct fields."""
    df = spark.read.option("multiLine", True).json(path)
    fields = df.schema.fieldNames()
    pairs = F.array(
        *[
            F.struct(F.lit(f).alias("key"), F.col(f"`{f}`").cast(value_type).alias("value"))
            for f in fields
        ]
    )
    return df.select(F.explode(pairs).alias("kv")).select("kv.key", "kv.value")


def write_json(df: DataFrame, path: str) -> None:
    """S8: JSON sink for converted tables (string_reader.py:124-128 analog;
    line-delimited — the scalable form of the reference's dict dumps)."""
    df.write.mode("overwrite").json(path)


def read_relation_types(spark: SparkSession, path: str, n_classes: int | None = 6) -> list[str]:
    """D6: relation-type label vocabulary `{label: {id: int}}` truncated to
    the first n_classes by id (indra_reader.py:24-27). Returns the ordered
    label list (driver-side constant — it parameterizes prompts and the
    choice extractor)."""
    df = spark.read.option("multiLine", True).json(path)
    labels = sorted(
        ((f, df.select(F.col(f"`{f}`.id")).first()[0]) for f in df.schema.fieldNames()),
        key=lambda kv: kv[1],
    )
    out = [k for k, _ in labels]
    return out[:n_classes] if n_classes else out


def read_result_file(spark: SparkSession, path: str) -> DataFrame:
    """S7: golden result file -> (num, src, pred, true). Format: free-form
    header, a `****` delimiter line, then `num, src, pred, true` rows
    (right-split on `', '` twice, so src may itself contain commas). P9
    malformed-line filter included. The new engine persists triples as
    Parquet; this reader exists for parity with legacy outputs."""
    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("lineno"), F.col("value")
    )
    delim = lines.filter(F.col("value").startswith("****")).agg(
        F.min("lineno").alias("d")
    )
    body = lines.join(F.broadcast(delim)).filter(
        (F.col("lineno") > F.col("d")) & (F.trim("value") != "")
    )
    # rsplit(', ', 2): last two fields are pred/true; the head is `num, src`
    parts = F.split(F.regexp_replace("value", ",,", ","), ", ")
    n = F.size(parts)
    head = F.concat_ws(", ", F.slice(parts, 1, F.greatest(n - 2, F.lit(0))))
    return (
        body.select(
            F.regexp_extract(head, r"^(\d+)", 1).try_cast("int").alias("num"),
            F.regexp_replace(head, r"^\d+, ", "").alias("src"),
            F.try_element_at(parts, F.lit(-2)).alias("pred"),
            F.try_element_at(parts, F.lit(-1)).alias("true"),
        )
        .filter(F.col("num").isNotNull() & (F.col("pred") != ""))
    )
