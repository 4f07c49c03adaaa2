"""One-off measured ANN crossover (VERDICT r5 #3).

The graded serve slot sim_ann_ivfpq_query runs at fixture scale (5,000
vectors ~ 2.5 MB), where the brute scan is one cheap stage and the
multi-stage IVF-PQ serve path grades fixed overhead, not the asset. This
script measures where the asset pays: same 32 queries against synthetic
clustered corpora of 50k and 200k vectors (dim 64), three methods —

  brute    exact cosine over the raw double arrays (the correctness
           baseline: reads n x 64 x 8 B per query batch)
  ivf      IVF-flat serve against PREBUILT centroids (probe n_probe of
           n_centroids cells; exact cosine inside the probed cells —
           reads ~n_probe/n_centroids of the raw bytes)
  ivfpq    IVF-PQ serve against a PREBUILT encoded index (probe + ADC
           over m-byte codes + exact re-rank of the refine*k shortlist
           only — the candidate scan is dim*8/m (= 64x at m=8) smaller
           than raw)

Index build (centroids / codebooks / encoded corpus) happens OUTSIDE the
timed region: at 100 TB the index is a persisted artifact built once,
and the serve latency is what a retrieval deployment pays per batch.
Timing = best of 2 runs of a full materializing action; recall@10 of
each approximate method is computed against the brute result in the same
session so speed is never quoted without its accuracy.

Usage:  python scripts/bench_ann_crossover.py [--sizes 50000,200000]
Prints one JSON line per (n, method) plus a final markdown table for
BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_QUERIES = 32
DIM = 64
K = 10
SCRATCH = "/tmp/bioie_ann_crossover"


def _spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ann-crossover")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _corpus_path(n: int) -> str:
    return os.path.join(SCRATCH, f"corpus_{n}_d{DIM}")


def build_corpus(spark, n: int) -> None:
    """Deterministic clustered vectors (64 true clusters + unit noise) so
    IVF has real structure to find — pure-noise data makes every ANN
    method degrade to brute force and the comparison meaningless."""
    import numpy as np
    import pandas as pd

    path = _corpus_path(n)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    rng = np.random.RandomState(1234 + n)
    # centers at 1.5 sigma: clusters are real but loose, so within-cell
    # neighbor ranking still spans a wide cosine range — tight clusters
    # (3 sigma) make all members ~0.998-cosine twins and grade nothing
    # but PQ quantization noise
    centers = rng.randn(64, DIM) * 1.5
    assign = rng.randint(0, 64, n)
    vecs = (centers[assign] + rng.randn(n, DIM)).astype(float)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": [[float(x) for x in row] for row in vecs],
        }
    )
    spark.createDataFrame(
        pdf, schema="vec_id long, embedding array<double>"
    ).repartition(32).write.mode("overwrite").parquet(path)


def _queries_df(spark, corpus):
    from pyspark.sql import functions as F

    return (
        corpus.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .cache()
    )


def _timed(make_df) -> tuple[float, list]:
    """Best-of-2 wall time of a fully materializing collect; returns
    (best_sec, rows from the last run)."""
    best, rows = float("inf"), []
    for _ in range(2):
        t0 = time.perf_counter()
        rows = make_df().collect()
        best = min(best, time.perf_counter() - t0)
    return best, rows


def _recall(approx_rows, exact_rows) -> float:
    exact: dict[int, set] = {}
    for r in exact_rows:
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    hit = tot = 0
    for r in approx_rows:
        tot += 1
        if r["vec_id"] in exact.get(r["query_id"], set()):
            hit += 1
    return round(hit / tot, 4) if tot else 0.0


def run(n: int, cpus: int) -> list[dict]:
    from bioie_llm_spark.operators.similarity import (
        cosine_topk,
        ivf_index,
        ivf_topk,
        ivfpq_index,
        ivfpq_query,
    )

    spark = _spark(cpus)
    build_corpus(spark, n)
    corpus = spark.read.parquet(_corpus_path(n)).cache()
    corpus.count()  # warm the cache so every method reads the same bytes
    q = _queries_df(spark, corpus)
    q.count()

    # ---- index build, OUTSIDE the timed region (persisted artifact) ----
    # build once per (n, config) and persist: the index IS a persisted
    # artifact at 100 TB, and re-running the sweep must not pay the
    # Lloyd refinement again
    n_cent = 64
    idx_dir = os.path.join(SCRATCH, f"index_{n}_c{n_cent}_m16ks16")
    marker = os.path.join(idx_dir, "__done.json")
    if os.path.exists(marker):
        with open(marker) as fh:
            meta = json.load(fh)
        cents, pq_cents, books = meta["cents"], meta["pq_cents"], meta["books"]
        assigned = spark.read.parquet(os.path.join(idx_dir, "assigned"))
        enc = spark.read.parquet(os.path.join(idx_dir, "enc"))
        build = {"n": n, "ivf_build_sec": "cached", "ivfpq_build_sec": "cached"}
    else:
        t0 = time.perf_counter()
        cents, assigned = ivf_index(corpus, n_centroids=n_cent)
        assigned.write.mode("overwrite").parquet(os.path.join(idx_dir, "assigned"))
        assigned = spark.read.parquet(os.path.join(idx_dir, "assigned"))
        ivf_build_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        # m=16 (4-dim subspaces) matches the graded serve slot's config —
        # m=8 halves the code size but quadruples per-subspace
        # quantization error and recall@10 collapses to ~0.25 here
        pq_cents, books, enc = ivfpq_index(corpus, n_centroids=n_cent, m=16, ks=16)
        enc.write.mode("overwrite").parquet(os.path.join(idx_dir, "enc"))
        enc = spark.read.parquet(os.path.join(idx_dir, "enc"))
        pq_build_sec = time.perf_counter() - t0
        with open(marker, "w") as fh:
            json.dump({"cents": cents, "pq_cents": pq_cents, "books": books}, fh)
        build = {
            "n": n,
            "ivf_build_sec": round(ivf_build_sec, 3),
            "ivfpq_build_sec": round(pq_build_sec, 3),
        }
    print(json.dumps(build), flush=True)
    assigned = assigned.cache()
    assigned.count()
    enc = enc.cache()
    enc.count()

    brute_sec, brute_rows = _timed(lambda: cosine_topk(corpus, q, k=K))
    out = [
        {"n": n, "method": "brute", "sec": round(brute_sec, 3), "recall_at_10": 1.0}
    ]
    ivf_sec, ivf_rows = _timed(
        lambda: ivf_topk(corpus, q, k=K, n_probe=8, index=(cents, assigned))
    )
    out.append(
        {
            "n": n,
            "method": "ivf",
            "sec": round(ivf_sec, 3),
            "recall_at_10": _recall(ivf_rows, brute_rows),
        }
    )
    # ADC is a coarse ranker: sweep the exact-re-rank shortlist width —
    # recall is bought with refine*k re-ranked rows per query, and the
    # sweep shows the price
    for refine in (16, 32, 64, 128):
        pq_sec, pq_rows = _timed(
            lambda: ivfpq_query(
                enc, corpus, pq_cents, books, q, k=K, n_probe=8, refine=refine
            )
        )
        out.append(
            {
                "n": n,
                "method": f"ivfpq_r{refine}",
                "sec": round(pq_sec, 3),
                "recall_at_10": _recall(pq_rows, brute_rows),
            }
        )
    # corpus-size-derived knobs (VERDICT r6 #3): hold the shortlist /
    # candidates ratio constant instead of refine itself — the row every
    # deployment should run, asserted >= 0.9 recall by --assert-recall
    from bioie_llm_spark.operators.similarity import ivfpq_auto_knobs

    a_probe, a_refine = ivfpq_auto_knobs(n, n_cent, k=K, n_probe=8)
    pq_sec, pq_rows = _timed(
        lambda: ivfpq_query(
            enc, corpus, pq_cents, books, q, k=K, n_probe=a_probe, refine=a_refine
        )
    )
    out.append(
        {
            "n": n,
            "method": f"ivfpq_auto_r{a_refine}",
            "sec": round(pq_sec, 3),
            "recall_at_10": _recall(pq_rows, brute_rows),
        }
    )
    for row in out:
        print(json.dumps(row), flush=True)
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="50000,200000")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--assert-recall", action="store_true")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    rows: list[dict] = []
    for n in sizes:
        rows.extend(run(n, args.cpus))

    print("\n| n vectors | method | sec | recall@10 |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['n']:,} | {r['method']} | {r['sec']} | {r['recall_at_10']} |")

    if args.assert_recall:
        auto = [r for r in rows if r["method"].startswith("ivfpq_auto")]
        bad = [r for r in auto if r["recall_at_10"] < 0.9]
        assert auto and not bad, (
            f"auto-knob recall floor breached: {bad or 'no auto rows'}"
        )
        print(f"OK: {len(auto)} auto-knob rows all hold recall@10 >= 0.9")


if __name__ == "__main__":
    main()
