"""Stage attribution for the txt_profile bench slot (VERDICT r5 #5).

Times the graded row and its three component legs independently at
sf0.1/local[32], 3 runs each, and prints median + spread — the numbers
BASELINE.md's round-6 section quotes:

  full       the registry row as graded (profile + dup-lines + LM join)
  profile    the per-doc battery WITHOUT the dup-line columns or LM
  duplines   doc_id + the synthesized-line Gopher duplicate-line stats
  lm         the LM leg alone, scored against the PERSISTED count tables

Usage: python scripts/profile_txt_profile.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from bioie_llm_spark.functions.text import (
        bpe_ish_token_count,
        duplicate_line_stats,
        fingerprint,
        language_id,
        quality_score,
        repetition_ratio,
        scrub_pii,
        token_count,
    )
    from bioie_llm_spark.operators.curation import load_ngram_lm, ngram_lm_score
    from bioie_llm_spark.queries import _lm_parquet, load, txt_profile
    from bioie_llm_spark.session import get_spark

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    d = load(spark, sf_dir, "documents")

    # mirror of txt_profile's dup-line construction
    toks = F.split(F.col("text"), " ")
    n_lines_raw = F.ceil(F.size(toks) / F.lit(2.0)).cast("int")
    lined = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_lines_raw - 1),
            lambda i: F.array_join(F.slice(toks, i * 2 + 1, 2), " "),
        ),
        "\x1f",
    )
    dls = duplicate_line_stats(lined, sep="\x1f")
    injected = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact bob@example.com at https://example.com/x from 10.0.0.1"),
        ),
    ).otherwise(F.col("text"))
    scrubbed = scrub_pii(injected)

    def mask_count(token: str):
        return (
            F.length(scrubbed) - F.length(F.replace(scrubbed, F.lit(token), F.lit("")))
        ) / F.lit(len(token))

    def profile_df():
        return d.select(
            "doc_id",
            token_count(F.col("text")).alias("n_tokens"),
            bpe_ish_token_count(F.col("text")).alias("n_bpe"),
            fingerprint(F.col("text")).alias("fp"),
            language_id(F.col("text")).alias("lang_pred"),
            quality_score(F.col("text")).alias("quality"),
            repetition_ratio(F.col("text")).alias("repetition"),
            (mask_count("<EMAIL>") + mask_count("<URL>") + mask_count("<IP>"))
            .cast("int")
            .alias("n_masks"),
        )

    def duplines_df():
        return d.select(
            "doc_id",
            dls.getField("n_lines").alias("n_lines"),
            dls.getField("dup_line_frac").alias("dup_line_frac"),
            dls.getField("dup_char_frac").alias("dup_char_frac"),
        )

    model = load_ngram_lm(spark, _lm_parquet(spark, sf_dir))

    def lm_df():
        return ngram_lm_score(d, model=model).select("doc_id", "avg_nll", "perplexity")

    legs = {
        "full": lambda: txt_profile(spark, sf_dir),
        "profile": profile_df,
        "duplines": duplines_df,
        "lm": lm_df,
    }
    out = {}
    for name, make in legs.items():
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            make().count()
            times.append(round(time.perf_counter() - t0, 3))
        med = statistics.median(times)
        spread = (max(times) - min(times)) / med if med else 0.0
        out[name] = {"runs": times, "median": med, "spread": round(spread, 3)}
        print(json.dumps({"leg": name, **out[name]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
