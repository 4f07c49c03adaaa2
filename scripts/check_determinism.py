#!/usr/bin/env python
"""Cross-parallelism determinism proof: run the identical pipeline at two
core counts in separate JVMs and compare a sha256 over the SORTED triple
set plus the sorted corpus sha256 list. Byte-equal output at local[2] and
local[8] is the property that makes (a) the per-row sha256 invariant
meaningful and (b) the N vs 4N scaling comparison apples-to-apples.

Usage: python scripts/check_determinism.py [--sf 0.001]
Prints one JSON line {"deterministic": true, ...}.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_level(cores: int, sf: float) -> dict:
    from bioie_llm_spark.datagen.corpus import CorpusSpec
    from bioie_llm_spark.pipeline import build_triples
    from bioie_llm_spark.session import get_spark

    spark = get_spark(cores=cores, app_name=f"determinism-{cores}")
    stages = build_triples(spark, CorpusSpec.for_scale(sf))
    triples = sorted(
        (r["subj"], r["pred"], r["obj"], r["source_sha256"])
        for r in stages["triples"].collect()
    )
    corpus_shas = sorted(
        r["s"]
        for r in stages["corpus"]
        .selectExpr("sha2(content, 256) AS s")
        .collect()
    )
    spark.stop()
    h = hashlib.sha256()
    for t in triples:
        h.update("|".join(t).encode())
    ch = hashlib.sha256("".join(corpus_shas).encode()).hexdigest()
    return {
        "cores": cores,
        "n_triples": len(triples),
        "triples_sha": h.hexdigest(),
        "corpus_sha": ch,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.001)
    ap.add_argument("--level", type=int, default=None, help="(internal)")
    args = ap.parse_args()
    if args.level:
        print(json.dumps(run_level(args.level, args.sf)))
        return
    out = {}
    for n in (2, 8):
        r = subprocess.run(
            [sys.executable, __file__, "--sf", str(args.sf), "--level", str(n)],
            capture_output=True,
            text=True,
            check=True,
        )
        out[n] = json.loads(r.stdout.strip().splitlines()[-1])
    ok = (
        out[2]["triples_sha"] == out[8]["triples_sha"]
        and out[2]["corpus_sha"] == out[8]["corpus_sha"]
    )
    print(
        json.dumps(
            {
                "deterministic": ok,
                "sf": args.sf,
                "n_triples": out[2]["n_triples"],
                "triples_sha": out[2]["triples_sha"][:16],
                "levels": [2, 8],
            }
        )
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
