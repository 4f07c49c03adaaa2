"""operators/terms: TF-IDF top-terms vs a python twin, determinism across
tie-breaks, and the smooth-idf formula's rare-term behavior."""

from __future__ import annotations

import math
import re
from collections import Counter

from bioie_llm_spark.operators.terms import doc_terms, tfidf_top_terms

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox! THE QUICK fox."),
    (2, "spark catalyst optimizer; spark tungsten engine"),
    (3, "a b c"),  # only 1-char tokens -> no terms at all
    (4, ""),
    (5, "zz zz zz yy"),
]


def _py_topk(docs, k=3):
    tok = {
        d: [t for t in re.split(r"[^a-z]+", text.lower()) if len(t) >= 2]
        for d, text in docs
    }
    n = len(docs)
    tf = {d: Counter(ts) for d, ts in tok.items()}
    df = Counter(t for d in tf for t in tf[d])
    out = {}
    for d, counts in tf.items():
        scored = [
            (round(c * (math.log((n + 1) / (df[t] + 1)) + 1), 4), t, c, df[t])
            for t, c in counts.items()
        ]
        scored.sort(key=lambda x: (-x[0], x[1]))
        out[d] = [
            (t, rnk + 1, c, dfv, s) for rnk, (s, t, c, dfv) in enumerate(scored[:k])
        ]
    return out


def _mkdf(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


class TestDocTerms:
    def test_tokenization_and_tf(self, spark):
        got = {
            (r["doc_id"], r["term"]): r["tf"]
            for r in doc_terms(_mkdf(spark)).collect()
        }
        assert got[(1, "quick")] == 2  # case-folded
        assert got[(1, "fox")] == 2  # punctuation-split
        assert (3, "a") not in got  # 1-char dropped
        assert not any(d == 4 for d, _ in got)  # empty doc -> no rows

    def test_matches_python_twin(self, spark):
        want = _py_topk(DOCS)
        rows = tfidf_top_terms(_mkdf(spark)).collect()
        got = {}
        for r in rows:
            got.setdefault(r["doc_id"], []).append(
                (r["term"], r["rnk"], r["tf"], r["df"], r["score"])
            )
        for d in got:
            got[d].sort(key=lambda x: x[1])
        want = {d: v for d, v in want.items() if v}
        assert got == want

    def test_rare_term_outranks_common(self, spark):
        rows = {
            (r["doc_id"], r["rnk"]): r["term"]
            for r in tfidf_top_terms(_mkdf(spark)).collect()
        }
        # doc 0: 'the' appears twice but in 2 docs; unique terms win on idf
        assert rows[(5, 1)] == "zz"  # tf=3 dominates within the doc

    def test_deterministic_tie_break_on_term(self, spark):
        docs = [(0, "alpha beta"), (1, "gamma delta")]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        rows = sorted(
            (r["doc_id"], r["rnk"], r["term"]) for r in tfidf_top_terms(df).collect()
        )
        # equal tf and df everywhere -> rank order is purely lexicographic
        assert rows == [
            (0, 1, "alpha"), (0, 2, "beta"), (1, 1, "delta"), (1, 2, "gamma"),
        ]
