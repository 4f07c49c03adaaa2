"""Benchmark harness.

Default mode (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--scaling`` mode: run the identical KG-extraction job at two parallelism
levels (local[8] vs local[32]) in separate subprocesses — the sandbox
stand-in for N vs 4N executors — and report throughput at both plus scaling
efficiency (BASELINE.md target >= 0.8).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


HEADLINE = [
    "a1_symmetric_adjacency",
    "a5_per_class_counts",
    "j1_broadcast_lookup",
    "j6_ensemble",
    "t4_stratified_sample",
    "u1_sort_and_pad",
    "f1_mention_match",
]


def run_once(cpus: int, sf_dir: str, kg_only: bool = False) -> dict:
    from bioie_llm_spark.datagen.corpus import CorpusSpec
    from bioie_llm_spark.pipeline import build_triples
    from bioie_llm_spark.queries import REGISTRY
    from bioie_llm_spark.session import get_spark

    sf = _sf_of(sf_dir)
    spark = get_spark(cores=cpus, app_name=f"bench-{cpus}")
    timings: dict[str, float] = {}

    # KG flagship: corpus -> extraction -> linking -> triple table
    spec = CorpusSpec.for_scale(sf)
    t0 = time.time()
    stages = build_triples(spark, spec)
    n_triples = stages["triples"].count()
    kg_sec = time.time() - t0
    timings["kg_extract"] = round(kg_sec, 3)
    files_per_sec = spec.n_files / kg_sec

    if not kg_only:
        for name in HEADLINE:
            fn, _ = REGISTRY[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            timings[name] = round(time.time() - t0, 3)
    spark.stop()
    return {
        "sf": sf,
        "cpus": cpus,
        "queries": timings,
        "n_triples": n_triples,
        "n_files": spec.n_files,
        "files_per_sec": round(files_per_sec, 2),
        "total_sec": round(sum(timings.values()), 3),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if not os.path.isdir(sf_dir):
        print(json.dumps({"error": f"sf_dir not found: {sf_dir}"}), file=sys.stderr)
        sys.exit(2)

    if "--scaling" in sys.argv:
        # identical job at two parallelism levels, fresh JVM each
        out = {}
        for n in (8, 32):
            r = subprocess.run(
                [sys.executable, __file__, "--single-kg", str(n), sf_dir],
                capture_output=True,
                text=True,
                check=True,
            )
            out[n] = json.loads(r.stdout.strip().splitlines()[-1])
        tp8, tp32 = out[8]["files_per_sec"], out[32]["files_per_sec"]
        eff = (tp32 / tp8) / (32 / 8)
        print(
            json.dumps(
                {
                    "metric": "kg_scaling_efficiency",
                    "value": round(eff, 3),
                    "unit": "ratio",
                    "throughput_local8_files_per_sec": tp8,
                    "throughput_local32_files_per_sec": tp32,
                    "sf": _sf_of(sf_dir),
                }
            )
        )
        return

    if "--single-kg" in sys.argv:
        i = sys.argv.index("--single-kg")
        print(json.dumps(run_once(int(sys.argv[i + 1]), sys.argv[i + 2], kg_only=True)))
        return

    r = run_once(cpus, sf_dir)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": r["total_sec"],
                "unit": "sec",
                "queries": r["queries"],
                "sf": r["sf"],
                "cpus": r["cpus"],
                "n_triples": r["n_triples"],
                "files_per_sec": r["files_per_sec"],
            }
        )
    )


if __name__ == "__main__":
    main()
