"""Stage-level attribution for the full-pipeline thread-scaling number
(VERDICT r6 #2: full_pipeline_efficiency drifted 0.906 -> 0.827 while
extract+link held 0.996 — the delta lives in the triple-dedup shuffle).

Runs the SAME full pipeline bench.py --scaling times (read -> mapInPandas
extraction -> broadcast linking -> triple-dedup hash agg) in a fresh
taskset-pinned JVM per (cores, variant) leg, with the Spark UI enabled so
the REST status API can report per-stage executorRunTime / shuffle bytes /
spill — measured attribution, not assertion.

Variants (select with --variants, comma-separated):
  base     the exact bench.py configuration (8g driver heap both legs)
  mem      heap scaled with cores (cores/2 GiB): a 4x cluster has 4x DRAM,
           so constant-heap legs under-provision the wide leg's hash agg —
           per-task execution memory is 4x smaller at local[32]
  binkey   source_sha256 shuffled as 32-byte binary instead of 64-char hex
           (min() order-isomorphic: fixed-width lowercase hex is ordered
           exactly like its bytes), halving that column's shuffle payload

Orchestrator:  python scripts/profile_scaling_stages.py [--sf 4.0]
Single leg:    ... --single CORES VARIANT CORPUS GAZ  (internal)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.load(r)


def run_leg(cores: int, variant: str, corpus_dir: str, gaz_dir: str) -> dict:
    from pyspark.sql import functions as F

    from bioie_llm_spark.extraction import extract_triples, link_entities
    from bioie_llm_spark.session import get_spark

    if variant == "mem":
        os.environ["SPARK_GRAFT_DRIVER_MEM"] = f"{max(2, cores // 2)}g"
    port = 4141
    spark = get_spark(
        cores=cores,
        app_name=f"scaleprof-{cores}-{variant}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(port)},
    )
    app_id = spark.sparkContext.applicationId
    corpus = spark.read.parquet(corpus_dir)
    gaz = spark.read.parquet(gaz_dir)

    def pipeline():
        linked = link_entities(extract_triples(corpus), gaz)
        if variant == "binkey":
            linked = linked.withColumn("source_sha256", F.unhex("source_sha256"))
        agg = linked.groupBy("subj", "pred", "obj").agg(
            F.count("*").alias("n_sources"),
            F.min("source_sha256").alias("source_sha256"),
        )
        return agg.count()

    pipeline()  # warmup: JIT, codegen, python worker pool, page cache
    best_sec, best_jobs = None, None
    for _ in range(3):
        before = {j["jobId"] for j in _rest(port, f"applications/{app_id}/jobs")}
        t0 = time.time()
        n = pipeline()
        sec = time.time() - t0
        jobs = [
            j
            for j in _rest(port, f"applications/{app_id}/jobs")
            if j["jobId"] not in before
        ]
        if best_sec is None or sec < best_sec:
            best_sec, best_jobs = sec, jobs
    stage_ids = sorted({s for j in best_jobs for s in j["stageIds"]})
    stages = []
    for sid in stage_ids:
        try:
            for att in _rest(port, f"applications/{app_id}/stages/{sid}"):
                stages.append(
                    {
                        "stage": sid,
                        "name": att["name"].split("\n")[0][:60],
                        "tasks": att["numCompleteTasks"],
                        "wall_ms": att.get("executorRunTime", 0),
                        "cpu_ms": att.get("executorCpuTime", 0) // 1_000_000,
                        "shuf_write_mb": round(
                            att.get("shuffleWriteBytes", 0) / 1e6, 1
                        ),
                        "shuf_read_mb": round(att.get("shuffleReadBytes", 0) / 1e6, 1),
                        "spill_mem_mb": round(
                            att.get("memoryBytesSpilled", 0) / 1e6, 1
                        ),
                        "spill_disk_mb": round(
                            att.get("diskBytesSpilled", 0) / 1e6, 1
                        ),
                    }
                )
        except Exception:
            pass
    spark.stop()
    return {
        "cores": cores,
        "variant": variant,
        "sec": round(best_sec, 3),
        "n": n,
        "stages": stages,
    }


def main() -> None:
    if "--single" in sys.argv:
        i = sys.argv.index("--single")
        cores, variant = int(sys.argv[i + 1]), sys.argv[i + 2]
        print(json.dumps(run_leg(cores, variant, sys.argv[i + 3], sys.argv[i + 4])))
        return

    sf = 4.0
    if "--sf" in sys.argv:
        sf = float(sys.argv[sys.argv.index("--sf") + 1])
    variants = ["base", "mem", "binkey"]
    if "--variants" in sys.argv:
        variants = sys.argv[sys.argv.index("--variants") + 1].split(",")

    import bench

    root = os.path.join(tempfile.gettempdir(), "bioie_bench")
    corpus_dir, gaz_dir, n_files = bench.materialize_corpus(sf, root)
    env = dict(os.environ)
    if os.path.isdir("/dev/shm"):
        env.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")

    results = []
    for variant in variants:
        for cores in (8, 32):
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "--single", str(cores), variant, corpus_dir, gaz_dir,
            ]
            if shutil.which("taskset"):
                cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
            r = subprocess.run(cmd, capture_output=True, text=True, env=env)
            if r.returncode != 0:
                print(r.stderr[-2000:], file=sys.stderr)
                sys.exit(1)
            leg = json.loads(r.stdout.strip().splitlines()[-1])
            results.append(leg)
            print(
                f"== {variant} local[{cores}]: {leg['sec']}s "
                f"({round(n_files / leg['sec'])} files/s)"
            )
            for s in leg["stages"]:
                print(
                    f"   stage {s['stage']:>3} {s['name']:<60} tasks={s['tasks']:<4} "
                    f"run={s['wall_ms'] / 1000:7.1f}s cpu={s['cpu_ms'] / 1000:7.1f}s "
                    f"sw={s['shuf_write_mb']:8.1f}MB sr={s['shuf_read_mb']:8.1f}MB "
                    f"spill={s['spill_mem_mb']:.0f}/{s['spill_disk_mb']:.0f}MB"
                )
    for variant in variants:
        legs = {r["cores"]: r for r in results if r["variant"] == variant}
        if 8 in legs and 32 in legs:
            eff = (legs[8]["sec"] / legs[32]["sec"]) / 4
            print(f"{variant}: full-pipeline efficiency 8->32 = {eff:.3f}")


if __name__ == "__main__":
    main()
