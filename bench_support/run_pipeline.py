"""Subprocess worker: run the e2e KG pipeline at a given core count and
print one JSON line {n_pages, n_triples, elapsed_sec, triples_per_sec}.
A fresh process per parallelism level gives each run its own JVM (clean
local[N] scheduling, no leftover shuffle files)."""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--pages", type=int, required=True)
    args = ap.parse_args()

    from esgkg.session import get_spark
    from esgkg import pipeline

    spark = get_spark(cores=args.cores, app=f"bench{args.cores}")
    # warm the python workers / JIT with a tiny run so the measured window
    # is steady-state compute, not process spin-up
    pipeline.build_kg(spark, 32, seed=7)["triples"].count()

    t0 = time.time()
    out = pipeline.build_kg(spark, args.pages)
    n_triples = out["triples"].count()
    n_edges = out["edges"].count()
    n_links = out["predicted_links"].count()
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "cores": args.cores,
                "n_pages": args.pages,
                "n_triples": n_triples,
                "n_edges": n_edges,
                "n_links": n_links,
                "elapsed_sec": round(elapsed, 3),
                "triples_per_sec": round(n_triples / elapsed, 2),
                "pages_per_sec": round(args.pages / elapsed, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
