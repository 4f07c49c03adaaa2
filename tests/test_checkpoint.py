"""Checkpoint-resume staging + per-partition lineage (north_rule)."""

import os

from pyspark.sql import functions as F

from bioie_llm_spark.pipeline import build_triples
from bioie_llm_spark.sources.checkpoint import (
    is_materialized,
    materialize,
    read_lineage,
    stage_path,
)


def test_materialize_write_once(spark, tmp_path):
    root = str(tmp_path)
    df = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    out1 = materialize(df, root, "stage_a", "snap1")
    assert out1.count() == 100
    assert is_materialized(root, "stage_a", "snap1")
    mtime = os.path.getmtime(os.path.join(stage_path(root, "stage_a", "snap1"), "_SUCCESS"))

    # second call must NOT rewrite (write-once resume semantics)
    out2 = materialize(spark.range(5).selectExpr("id", "id as v"), root, "stage_a", "snap1")
    assert out2.count() == 100  # stale input ignored; stage already done
    assert os.path.getmtime(
        os.path.join(stage_path(root, "stage_a", "snap1"), "_SUCCESS")
    ) == mtime


def test_lineage_self_heals(spark, tmp_path):
    """A crash between the stage write and the lineage write must not lose
    the stage's lineage forever: re-materializing recomputes it from the
    already-written parquet (idempotent per-stage overwrite)."""
    import shutil

    from bioie_llm_spark.sources.checkpoint import lineage_path

    root = str(tmp_path)
    df = spark.range(50).selectExpr("id", "id * 3 as v")
    materialize(df, root, "s", "snap")
    lin_dir = lineage_path(root, "s", "snap")
    shutil.rmtree(lin_dir)  # simulate the crash window
    materialize(df, root, "s", "snap")  # data write skipped, lineage healed
    lin = read_lineage(spark, root).filter("stage = 's'")
    assert sum(r["n_rows"] for r in lin.collect()) == 50
    # and healing is idempotent — no double rows on a third call
    materialize(df, root, "s", "snap")
    assert sum(r["n_rows"] for r in read_lineage(spark, root).filter("stage = 's'").collect()) == 50


def test_lineage_rows(spark, tmp_path):
    root = str(tmp_path)
    df = spark.range(1000).repartition(4)
    materialize(df, root, "stage_b", "snapX")
    lin = read_lineage(spark, root).filter(
        (F.col("stage") == "stage_b") & (F.col("snapshot") == "snapX")
    )
    rows = lin.collect()
    assert sum(r["n_rows"] for r in rows) == 1000
    assert all(r["content_hash"] is not None for r in rows)


def test_snapshot_isolation(spark, tmp_path):
    root = str(tmp_path)
    materialize(spark.range(10), root, "stage_c", "snap1")
    materialize(spark.range(20), root, "stage_c", "snap2")
    assert spark.read.parquet(stage_path(root, "stage_c", "snap1")).count() == 10
    assert spark.read.parquet(stage_path(root, "stage_c", "snap2")).count() == 20


def test_pipeline_checkpointing(spark, tiny_spec, tmp_path):
    root = str(tmp_path / "pipe")
    s1 = build_triples(spark, tiny_spec, out_dir=root, snapshot="s0")
    n1 = s1["triples"].count()
    for stage in ("corpus", "gazetteer", "triples"):
        assert is_materialized(root, stage, "s0"), stage
    # resume: rebuild skips the work and reads identical triples back
    s2 = build_triples(spark, tiny_spec, out_dir=root, snapshot="s0")
    assert s2["triples"].count() == n1
    lin = read_lineage(spark, root)
    assert {r["stage"] for r in lin.select("stage").distinct().collect()} >= {
        "corpus", "gazetteer", "triples",
    }
    # triple table is partitioned by predicate on disk
    parts = os.listdir(stage_path(root, "triples", "s0"))
    assert any(p.startswith("pred=") for p in parts)


def test_resume_by_key(spark, tiny_spec, tmp_path):
    """Key-granular resume: after a partial run, only pending files are
    reprocessed; the final output equals a one-shot run."""
    from bioie_llm_spark.datagen.corpus import build_corpus, build_gazetteer
    from bioie_llm_spark.extraction import extract_triples, link_entities
    from bioie_llm_spark.sources.checkpoint import resume_by_key

    root = str(tmp_path / "rk")
    corpus = build_corpus(spark, tiny_spec).cache()
    gaz = build_gazetteer(spark, tiny_spec)
    compute = lambda df: link_entities(extract_triples(df), gaz)
    calls = []

    def counting_compute(df):
        calls.append(df.count())
        return compute(df)

    # partial run: first 30 files only
    first = corpus.filter(F.col("path") < "src/file_3")
    out1 = resume_by_key(first, root, "extract", "s0", ["path"], counting_compute)
    n1 = out1.count()

    # full run resumes: only the remaining files are computed
    out2 = resume_by_key(corpus, root, "extract", "s0", ["path"], counting_compute)
    n2 = out2.count()
    assert calls[0] == first.count()
    assert calls[1] == corpus.count() - first.count()  # only the delta
    assert n2 > n1

    # re-run with nothing pending: no compute at all
    out3 = resume_by_key(corpus, root, "extract", "s0", ["path"], counting_compute)
    assert len(calls) == 2 and out3.count() == n2

    # equals a one-shot batch run
    assert n2 == compute(corpus).count()


def test_skew_operators(spark):
    from bioie_llm_spark.operators.skew import (
        broadcast_hot_keys,
        salted_collect_set,
        salted_count,
    )

    df = spark.createDataFrame(
        [("hot", f"v{i % 7}") for i in range(900)] + [("cold", "x")] * 9,
        "k string, v string",
    )
    counts = {r["k"]: r["n"] for r in salted_count(df, ["k"]).collect()}
    assert counts == {"hot": 900, "cold": 9}
    sets = {r["k"]: r["v_set"] for r in salted_collect_set(df, ["k"], "v").collect()}
    assert sets["hot"] == sorted({f"v{i}" for i in range(7)})
    assert sets["cold"] == ["x"]
    hot = broadcast_hot_keys(df, ["k"], threshold_frac=0.5).collect()
    assert len(hot) == 1 and hot[0]["k"] == "hot"


def test_incremental_snapshots(spark, tiny_spec, tmp_path):
    """Iceberg-append flow: snapshot B adds files on top of snapshot A —
    only the delta runs through extraction, and B's triple table equals a
    from-scratch build over the full corpus."""
    from bioie_llm_spark.datagen.corpus import build_corpus, build_gazetteer
    from bioie_llm_spark.extraction import extract_triples, link_entities
    from bioie_llm_spark.pipeline import incremental_triples

    root = str(tmp_path / "incr")
    corpus = build_corpus(spark, tiny_spec).cache()
    gaz = build_gazetteer(spark, tiny_spec)
    snap_a = corpus.filter(F.col("path") < "src/file_3")  # ~1/3 of files

    t_a = incremental_triples(spark, snap_a, gaz, root, "snap-a")
    assert t_a.count() > 0

    t_b = incremental_triples(spark, corpus, gaz, root, "snap-b")
    # only the delta was extracted: the cumulative key log covers all files
    keys = spark.read.parquet(os.path.join(root, "linked_incr__keys", "snapshot=cumulative"))
    assert keys.count() == corpus.count()

    oneshot = (
        link_entities(extract_triples(corpus), gaz)
        .groupBy("subj", "pred", "obj")
        .count()
    )
    got = {(r["subj"], r["pred"], r["obj"]) for r in t_b.collect()}
    want = {(r["subj"], r["pred"], r["obj"]) for r in oneshot.collect()}
    assert got == want
    # snapshot A's table is still readable and smaller
    assert spark.read.parquet(stage_path(root, "triples", "snap-a")).count() == t_a.count()
