"""Per-stage wall-time profile of the bench-mode pipeline at one core count.

Usage: python tools/profile_pipeline.py --cores 16 --pages 200000
Prints one JSON line: stage timings, final-count timings, Spark job count.
The scaling gate lives or dies on the constant-size tail — this shows it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["ESGKG_STAGE_TIMING"] = "1"


def n_jobs(spark) -> int:
    try:
        return int(spark.sparkContext._jsc.sc().dagScheduler().nextJobId().get())
    except Exception:  # noqa: BLE001
        return -1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--pages", type=int, default=200000)
    args = ap.parse_args()

    from esgkg import pipeline
    from esgkg.session import get_spark

    spark = get_spark(cores=args.cores, app=f"profile{args.cores}")
    # same warmup as bench_support/run_pipeline.py: JIT every plan shape
    from pyspark.sql import functions as F

    from esgkg.stages import canon

    warm = pipeline.build_kg(spark, 20000, seed=7)
    warm["predicted_links"].count()
    canon.canonical_map(
        warm["triples"].select(F.col("subj").alias("surface")).limit(3000),
        driver_threshold=0,
    ).count()
    pipeline.LAST_TIMINGS.clear()
    jobs0 = n_jobs(spark)

    t0 = time.time()
    out = pipeline.build_kg(spark, args.pages)
    t_build = time.time() - t0

    t1 = time.time()
    # same counting strategy as bench_support/run_pipeline.py: the rewrite
    # is row-count-preserving, so count the linked parquet footer
    n_triples = out["linked_triples"].count()
    t_count_triples = time.time() - t1
    t2 = time.time()
    n_edges = out["edges"].count()
    t_count_edges = time.time() - t2
    t3 = time.time()
    n_links = out["predicted_links"].count()
    t_links = time.time() - t3
    elapsed = time.time() - t0

    print(
        json.dumps(
            {
                "cores": args.cores,
                "pages": args.pages,
                "n_triples": n_triples,
                "n_edges": n_edges,
                "n_links": n_links,
                "elapsed_sec": round(elapsed, 3),
                "build_sec": round(t_build, 3),
                "count_triples_sec": round(t_count_triples, 3),
                "count_edges_sec": round(t_count_edges, 3),
                "aa_links_sec": round(t_links, 3),
                "stages": dict(pipeline.LAST_TIMINGS),
                "n_jobs": n_jobs(spark) - jobs0,
                "triples_per_sec": round(n_triples / elapsed, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
