"""Text-analysis functions: token counts, quality, language ID, fingerprint."""

from pyspark.sql import functions as F

from bioie_llm_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint,
    language_id,
    quality_score,
    token_count,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(col.alias("v")).first()["v"]


def test_token_count(spark):
    assert _one(spark, "a b  c", token_count(F.col("text"))) == 3
    assert _one(spark, "   ", token_count(F.col("text"))) == 0


def test_bpe_ish_token_count(spark):
    n = _one(spark, "hello, world 42", bpe_ish_token_count(F.col("text")))
    # pieces: hello , world 4 2 -> 5 + extra for 5-char words
    assert n >= 5


def test_quality_score_ranges(spark):
    good = "the quick brown fox and the lazy dog walked over a hill of green grass " * 5
    bad = "!!! ??? ### $$$ %%%"
    q_good = _one(spark, good, quality_score(F.col("text")))
    q_bad = _one(spark, bad, quality_score(F.col("text")))
    assert 0.0 <= q_bad < q_good <= 1.0


def test_language_id(spark):
    assert _one(spark, "the cat and the dog is here", language_id(F.col("text"))) == "en"
    assert _one(spark, "der hund und die katze ist da", language_id(F.col("text"))) == "de"
    assert _one(spark, "el perro y la casa es grande", language_id(F.col("text"))) == "es"
    assert _one(spark, "zzz qqq xxx", language_id(F.col("text"))) == "und"


def test_fingerprint_normalization(spark):
    a = _one(spark, "Hello,   World!", fingerprint(F.col("text")))
    b = _one(spark, "hello world", fingerprint(F.col("text")))
    c = _one(spark, "goodbye world", fingerprint(F.col("text")))
    assert a == b != c


def test_scrub_pii(spark):
    from bioie_llm_spark.functions.text import scrub_pii

    df = spark.createDataFrame(
        [("mail me at a.b+c@ex-ample.org or see https://x.io/p?q=1 from 10.0.0.1",)],
        "text string",
    )
    got = df.select(scrub_pii(F.col("text")).alias("t")).first()["t"]
    assert got == "mail me at <EMAIL> or see <URL> from <IP>"


def test_repetition_ratio(spark):
    from bioie_llm_spark.functions.text import repetition_ratio

    df = spark.createDataFrame(
        [
            (1, "spam ham eggs " * 8),              # fully looped
            (2, "one two three four five six seven eight nine ten"),
            (3, ""),                                  # degenerate
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["r"] for r in df.select(
        "doc_id", repetition_ratio(F.col("text")).alias("r")).collect()}
    assert got[1] > 0.3          # the loop n-gram dominates
    assert got[2] == 0.125       # 8 distinct trigrams, each once
    assert got[3] <= 1.0         # no crash on empty text


def test_repetition_ratio_grouped_equivalence(spark):
    """VERDICT r3 #4: the exploded-groupBy book-length form must produce
    bit-identical ratios to the per-row array form — on real sf0.001 docs
    AND the degenerate corners (empty, single word, fully looped)."""
    from bioie_llm_spark.functions.text import (
        repetition_ratio,
        repetition_ratio_grouped,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    edges = spark.createDataFrame(
        [
            (100001, ""),
            (100002, "word"),
            (100003, "spam ham eggs " * 50),
            (100004, "a b"),  # fewer tokens than n
        ],
        "doc_id long, text string",
    )
    df = docs.unionByName(edges)
    per_row = {
        r["doc_id"]: r["r"]
        for r in df.select(
            "doc_id", repetition_ratio(F.col("text")).alias("r")
        ).collect()
    }
    grouped = {
        r["doc_id"]: r["repetition"]
        for r in repetition_ratio_grouped(df).select("doc_id", "repetition").collect()
    }
    assert per_row.keys() == grouped.keys()
    mism = {k: (per_row[k], grouped[k]) for k in per_row if per_row[k] != grouped[k]}
    assert not mism, f"first mismatches: {dict(list(mism.items())[:5])}"


def test_duplicate_line_stats(spark):
    from bioie_llm_spark.functions.text import duplicate_line_stats

    df = spark.createDataFrame(
        [
            (1, "aaa\nbbb\naaa\nccc"),          # 'aaa' x2 of 4 lines
            (2, "one\ntwo\nthree"),               # no dups
            (3, "x\nx\nx"),                       # fully duplicated
            (4, ""),                               # degenerate
            (5, "long line here\nshort\nlong line here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["s"].asDict()
        for r in df.select("doc_id", duplicate_line_stats(F.col("text")).alias("s")).collect()
    }
    assert got[1] == {"n_lines": 4, "dup_line_frac": 0.25, "dup_char_frac": 0.5}
    assert got[2] == {"n_lines": 3, "dup_line_frac": 0.0, "dup_char_frac": 0.0}
    assert got[3] == {"n_lines": 3, "dup_line_frac": round(2 / 3, 4), "dup_char_frac": 1.0}
    assert got[4] == {"n_lines": 0, "dup_line_frac": 0.0, "dup_char_frac": 0.0}
    # doc 5: 2 of 3 lines dup ('long line here' x2), chars 28/(28+5)
    assert got[5]["dup_line_frac"] == round(1 / 3, 4)
    assert got[5]["dup_char_frac"] == round(28 / 33, 4)


def test_duplicate_line_stats_null_and_regex_sep(spark):
    """Code-review regressions: NULL text behaves like empty (consistent
    struct, no NULL n_lines), and a metacharacter separator is literal."""
    from bioie_llm_spark.functions.text import duplicate_line_stats

    df = spark.createDataFrame([(1, None), (2, "a|b|a")], "doc_id long, text string")
    got = {
        r["doc_id"]: r["s"].asDict()
        for r in df.select(
            "doc_id", duplicate_line_stats(F.col("text"), sep="|").alias("s")
        ).collect()
    }
    assert got[1] == {"n_lines": 0, "dup_line_frac": 0.0, "dup_char_frac": 0.0}
    # '|' split literally: lines a, b, a -> one dup line, 2/3 of chars
    assert got[2] == {
        "n_lines": 3,
        "dup_line_frac": round(1 / 3, 4),
        "dup_char_frac": round(2 / 3, 4),
    }


def test_txt_profile_dup_line_support(spark):
    """The driver row's synthesized 2-token-line view must carry REAL
    duplicate-line support (181/500 docs at sf0.01 when written) — if a
    corpus or construction change drives it to zero, the oracle-recomputed
    dup fractions stop testing anything and this trips first."""
    from bioie_llm_spark.queries import REGISTRY

    prof = REGISTRY["txt_profile"][0](spark, "/root/testdata/sf0.01")
    n_dup = prof.filter(F.col("dup_line_frac") > 0).count()
    assert n_dup >= 50, f"only {n_dup} docs with duplicate lines"
