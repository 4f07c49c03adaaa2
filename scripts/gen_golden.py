"""Regenerate the pinned golden oracles (bioie_llm_spark/golden/sf0_01.json).

Run after any INTENTIONAL semantics change to datagen / extraction /
pipeline / the golden queries themselves::

    python scripts/gen_golden.py

The pinned values are what the driver's CORRECTNESS gate (and
tests/test_oracle_parity.py) compare against — see golden.py for why a
pinned result is as hard a signal as a computed oracle here.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bioie_llm_spark.golden import (  # noqa: E402
    GOLDEN_PATH,
    GOLDEN_QUERIES,
    HYBRID_PINNED,
    capture,
)


def main() -> None:
    from bioie_llm_spark.queries import REGISTRY
    from bioie_llm_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_GOLDEN_SF", "/root/testdata/sf0.01")
    spark = get_spark(cores=8, app_name="gen-golden")
    out = {}
    for name in GOLDEN_QUERIES:
        fn, _ = REGISTRY[name]
        snap = capture(fn(spark, sf_dir))
        out[name] = snap
        print(f"{name}: {len(snap['rows'])} rows", flush=True)
    for name, pinned_cols in HYBRID_PINNED.items():
        fn, _ = REGISTRY[name]
        snap = capture(fn(spark, sf_dir).select(*pinned_cols))
        out[name] = snap
        print(f"{name} (hybrid, {pinned_cols}): {len(snap['rows'])} rows", flush=True)
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(out, f, indent=1, ensure_ascii=False)
    spark.stop()
    print(f"wrote {GOLDEN_PATH}")


if __name__ == "__main__":
    main()
