"""Cross-model report composition (result_comparer.py:105-128 semantics)."""

import struct
import zlib

from bioie_llm_spark.report import (
    confusion_png,
    confusion_pivot,
    model_comparison,
    render_confusion,
)

# three models over four srcs, gold = a,a,b,b
M1 = [("s1", "a", "a"), ("s2", "a", "a"), ("s3", "b", "b"), ("s4", "a", "b")]
M2 = [("s1", "a", "a"), ("s2", "b", "a"), ("s3", "b", "b"), ("s4", "a", "b")]
M3 = [("s1", "a", "a"), ("s2", "a", "a"), ("s3", "a", "b"), ("s4", "a", "b")]


def _frames(spark):
    mk = lambda rows: spark.createDataFrame(rows, "src string, pred string, true string")
    return {"m1": mk(M1), "m2": mk(M2), "m3": mk(M3)}


def test_model_comparison(spark):
    rep = {r["model"]: r for r in model_comparison(_frames(spark)).collect()}
    assert set(rep) == {"m1", "m2", "m3"}
    # per-model accuracy: m1 3/4, m2 2/4, m3 2/4
    assert rep["m1"]["accuracy"] == 0.75
    assert rep["m2"]["accuracy"] == 0.5
    assert rep["m3"]["accuracy"] == 0.5
    # s1 right by all three -> intersection 1 (s2: m2 wrong; s3: m3 wrong)
    assert rep["m1"]["n_correct_all"] == 1
    # s2 right by m1+m3 (not unique); s3 right by m1+m2; no unique-correct srcs
    assert all(rep[m]["n_correct_unique"] == 0 for m in rep)
    # consensus: s1 (all 'a', right) and s4 (all 'a', wrong) agree -> 1 correct
    assert rep["m1"]["n_consensus_correct"] == 1


def test_model_comparison_unique(spark):
    frames = _frames(spark)
    # make m1 uniquely right on s4
    rows = [("s1", "a", "a"), ("s2", "a", "a"), ("s3", "b", "b"), ("s4", "b", "b")]
    frames["m1"] = frames["m1"].sparkSession.createDataFrame(
        rows, "src string, pred string, true string"
    )
    rep = {r["model"]: r for r in model_comparison(frames).collect()}
    assert rep["m1"]["n_correct_unique"] == 1


def test_confusion_pivot_and_render(spark):
    df = spark.createDataFrame(M1, "src string, pred string, true string")
    wide = {r["true_label"]: r for r in confusion_pivot(df).collect()}
    assert wide["a"]["a"] == 2 and wide["a"]["b"] == 0
    assert wide["b"]["a"] == 1 and wide["b"]["b"] == 1
    text = render_confusion(df)
    assert "true_label" in text.splitlines()[0]
    assert len(text.splitlines()) == 3


def test_confusion_png(spark, tmp_path):
    """The stdlib PNG artifact (evaluator.py:135-159 analog): structurally
    valid PNG, correct dimensions, and the cell raster decodes to the
    viridis extremes for the max-count and zero-count cells."""
    df = spark.createDataFrame(M1, "src string, pred string, true string")
    path = str(tmp_path / "cm.png")
    vocab = confusion_png(df, path, labels=["A", "B", "zzz"])
    assert vocab == ["a", "b"]  # lowercased; 'zzz' absent from the data
    blob = open(path, "rb").read()
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", blob[16:24])
    cell, margin = 48, 24
    assert (w, h) == (margin + 2 * cell, margin + 2 * cell)
    # decode IDAT and spot-check cell-center colors
    idat_off = blob.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", blob[idat_off - 8 : idat_off - 4])[0]
    raw = zlib.decompress(blob[idat_off : idat_off + idat_len])
    stride = 1 + 3 * w

    def px(x, y):
        base = y * stride + 1 + 3 * x
        return tuple(raw[base : base + 3])

    # (true=a, pred=a) holds the max count 2 -> viridis(1.0) = bright yellow
    cx, cy = margin + cell // 4, margin + cell // 4
    assert px(cx, cy) == (253, 231, 37)
    # (true=a, pred=b) is 0 -> viridis(0.0) = dark purple
    assert px(margin + cell + cell // 4, cy) == (68, 1, 84)
    # legend sidecar maps indices to labels
    legend = open(path + ".labels.txt").read().splitlines()
    assert legend == ["idx\tlabel", "0\ta", "1\tb"]


def test_confusion_png_null_and_discovered(spark, tmp_path):
    """Discovered-label mode: nulls coalesce to 'none' and join the vocab."""
    rows = [("s1", "a", "a"), ("s2", None, "a")]
    df = spark.createDataFrame(rows, "src string, pred string, true string")
    path = str(tmp_path / "cm2.png")
    vocab = confusion_png(df, path)
    assert vocab == ["a", "none"]


def test_cross_family_task_report(spark, tiny_spec):
    """result_comparer flow end-to-end on REAL task outputs: the same
    triple table scored under two prompt families, composed into the
    per-model comparison report."""
    from pyspark.sql import functions as F

    from bioie_llm_spark.pipeline import build_triples, entity_task

    stages = build_triples(spark, tiny_spec)
    results = {}
    for fam in ("galactica", "mpt"):
        pairs = entity_task(
            stages["triples"], stages["facts"], n_queries=10, model=fam
        )["pairs"]
        results[fam] = pairs.select(
            F.concat_ws("#", "src", "pos").alias("src"), "pred", "true"
        )
    rep = {r["model"]: r for r in model_comparison(results).collect()}
    assert set(rep) == {"galactica", "mpt"}
    # the mock model's knowledge is family-independent: identical scores,
    # full intersection, no unique-correct answers
    assert rep["galactica"]["accuracy"] == rep["mpt"]["accuracy"]
    assert rep["galactica"]["n_correct_unique"] == 0
    assert rep["galactica"]["n_correct_all"] == rep["galactica"]["n_consensus_correct"]
