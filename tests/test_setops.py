"""U1 sort_and_pad semantics (base_processor.py:1571-1595)."""

from pyspark.sql import functions as F

from bioie_llm_spark.operators.setops import py_sort_and_pad, sort_and_pad

CASES = [
    (["a", "b", "c"], ["b", "c", "d"]),
    ([], ["x", "y"]),
    (["x", "y"], []),
    (["a"] * 3 + ["b"], ["a", "b"]),  # dup pred
    ([f"p{i}" for i in range(15)], [f"p{i}" for i in range(5, 25)]),  # >k overlap
    (["z"], ["z"]),
]


def test_py_twin_basics():
    p, t = py_sort_and_pad(["a", "b", "c"], ["b", "c", "d"])
    assert p == ["b", "c", "a"] and t == ["b", "c", "d"]
    p, t = py_sort_and_pad([], ["x", "y"])
    assert p == ["NONE", "NONE"] and t == ["x", "y"]


def test_spark_matches_python(spark):
    df = spark.createDataFrame(
        [(i, p, t) for i, (p, t) in enumerate(CASES)],
        "id int, pred array<string>, true array<string>",
    )
    p_out, t_out = sort_and_pad(F.col("pred"), F.col("true"), 10)
    got = df.select("id", p_out.alias("p"), t_out.alias("t")).orderBy("id").collect()
    for row, (p, t) in zip(got, CASES):
        ep, et = py_sort_and_pad(p, t, 10)
        assert row["p"] == ep, (p, t)
        assert row["t"] == et, (p, t)


def test_positional_f1_alignment(spark):
    """Common items occupy identical positions in both outputs."""
    df = spark.createDataFrame(
        [(["q", "a", "m"], ["m", "z", "a", "k"])], "pred array<string>, true array<string>"
    )
    p_out, t_out = sort_and_pad(F.col("pred"), F.col("true"), 10)
    row = df.select(p_out.alias("p"), t_out.alias("t")).first()
    common = set(["q", "a", "m"]) & set(["m", "z", "a", "k"])
    for i in range(len(common)):
        assert row["p"][i] == row["t"][i]
