"""Extra measurement harness for the optimization round (guide §1.4).

NOT the driver contract — bench.py stays frozen. This file isolates the
expensive slots' sub-stages with the noop sink so each change targets the
actual hot stage, and can time a single named slot without paying for the
whole suite.

Usage:
    python bench_extra.py stages [sf_dir]     # sub-stage breakdown
    python bench_extra.py slot NAME [sf_dir]  # one registry/bench slot, best-of-2
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timeit(spark, label: str, fn, runs: int = 2) -> float:
    spark.sparkContext.setJobDescription(label)
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        sec = time.time() - t0
        best = sec if best is None or sec < best else best
    spark.sparkContext.setJobDescription(None)
    print(f"{label:45s} {best:7.2f}s")
    return best


def main() -> None:
    from bioie_llm_spark.queries import REGISTRY, load
    from bioie_llm_spark.session import get_spark

    mode = sys.argv[1] if len(sys.argv) > 1 else "stages"
    args = sys.argv[2:]
    sf_dir = None
    slot = None
    if mode == "slot":
        slot = args[0]
        sf_dir = args[1] if len(args) > 1 else None
    else:
        sf_dir = args[0] if args else None
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cores=cpus, app_name="bench-extra")

    if mode == "slot":
        fn, _ = REGISTRY[slot]
        fn(spark, sf_dir).count()  # warm plan + scratch
        timeit(spark, slot, lambda: fn(spark, sf_dir).count())
        spark.stop()
        return

    from bioie_llm_spark.operators.dedup import (
        cdc_chunks,
        cdc_remove_dup_spans,
        minhash_lsh_candidates,
        ngram_exploded_index,
        ngram_jaccard_pairs,
        word_shingles,
        _minhash_banded,
    )

    docs = load(spark, sf_dir, "documents").repartition(64)
    n_docs = docs.count()
    total_chars = docs.agg(F.sum(F.length("text"))).first()[0]
    print(f"docs={n_docs} chars={total_chars}")

    # --- shingle computation alone (shared front of minhash/ngram/contam)
    sh = docs.select("doc_id", word_shingles(F.col("text")).alias("sh"))
    timeit(spark, "word_shingles (noop)", lambda: noop(sh))

    # --- ngram_jaccard sub-stages
    ex = ngram_exploded_index(docs)
    timeit(spark, "ngram exploded index (noop)", lambda: noop(ex))
    members = (
        ex.groupBy("g")
        .agg(F.collect_list(F.struct("id", "n_sh")).alias("ms"), F.count("*").alias("__df"))
        .filter(F.col("__df") <= 100)
    )
    timeit(spark, "ngram index+group (count)", lambda: members.count())
    timeit(
        spark,
        "ngram_jaccard_pairs full (count)",
        lambda: ngram_jaccard_pairs(docs, threshold=0.5, max_df=100).count(),
    )

    # --- minhash sub-stages
    banded = _minhash_banded(docs)
    timeit(spark, "minhash banded (noop)", lambda: noop(banded))
    timeit(
        spark,
        "minhash_lsh_candidates (count)",
        lambda: minhash_lsh_candidates(docs).count(),
    )

    # --- CDC sub-stages
    ck = cdc_chunks(docs)
    timeit(spark, "cdc_chunks (noop)", lambda: noop(ck))
    timeit(
        spark,
        "cdc_remove_dup_spans (sum len)",
        lambda: cdc_remove_dup_spans(docs).agg(F.sum(F.length("clean_text"))).collect(),
    )

    # --- contamination sub-stages
    from bioie_llm_spark.operators.curation import contamination_check, contamination_check_bloom

    bench_docs = docs.filter(F.col("doc_id") % 17 == 0).select("text")
    timeit(
        spark,
        "contamination exact (count)",
        lambda: contamination_check(docs, bench_docs).count(),
    )
    timeit(
        spark,
        "contamination bloom (count)",
        lambda: contamination_check_bloom(docs, bench_docs).count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
