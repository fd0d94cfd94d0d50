"""Bench harness (driver contract): one JSON line with headline throughput.

- e2e KG pipeline (synth pages → canonical triples → edges → links) at
  local[$SPARK_GRAFT_CPUS], plus the same job at local[8] in a separate JVM
  to evidence the two-parallelism-level scaling rule
  (BASELINE.json north_rule; efficiency = (thr_hi/thr_8) / (hi/8)).
- headline operator queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR.

Output: {"metric": ..., "value": <e2e seconds>, "unit": "sec",
         "queries": {...per-query sec...}, "sf": ...,
         "pipeline": {...}, "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PAGES = int(
    os.environ.get(
        "ESGKG_BENCH_PAGES",
        {"sf0.001": 5000, "sf0.01": 50000, "sf0.1": 300000}.get(
            Path(SF_DIR).name, 300000
        ),
    )
)

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q02_top_nations_revenue",
    "q03_order_rank_window",
    "q06_token_frequency",
    "q11_cosine_topk",
    "q12_char_jaccard_pairs",
    "q13_adamic_adar",
    "q14_html_roundtrip",
    "q20_knn_join",
]


def run_pipeline_subprocess(cores: int, pages: int) -> dict:
    cmd = [
        sys.executable,
        str(REPO / "bench_support" / "run_pipeline.py"),
        "--cores", str(cores),
        "--pages", str(pages),
    ]
    res = subprocess.run(
        cmd, capture_output=True, text=True, timeout=1800, check=False
    )
    for line in reversed(res.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"pipeline bench at cores={cores} produced no JSON: "
        f"{res.stdout[-500:]} {res.stderr[-500:]}"
    )


def main() -> None:
    sf = Path(SF_DIR).name
    # scaling evidence: same input, two parallelism levels, separate JVMs
    lo = run_pipeline_subprocess(8, PAGES)
    hi = run_pipeline_subprocess(CPUS, PAGES) if CPUS != 8 else lo
    speedup = hi["triples_per_sec"] / lo["triples_per_sec"]
    efficiency = speedup / (CPUS / 8) if CPUS != 8 else 1.0

    # operator queries in-process at the high parallelism level
    import __spark_entry__ as entry_mod
    from esgkg.session import get_spark

    spark = get_spark(cores=CPUS, app="bench-queries")
    qs = entry_mod.queries()
    per_query: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        per_query[name] = round(time.time() - t0, 3)
        assert n >= 0
    per_query["pipeline_e2e"] = hi["elapsed_sec"]
    spark.stop()

    print(
        json.dumps(
            {
                "metric": "kg_pipeline_e2e_sec",
                "value": hi["elapsed_sec"],
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
                "pipeline": {
                    "n_pages": hi["n_pages"],
                    "n_triples": hi["n_triples"],
                    "n_edges": hi["n_edges"],
                    "triples_per_sec": hi["triples_per_sec"],
                    "pages_per_sec": hi["pages_per_sec"],
                },
                "scaling": {
                    "cores_lo": 8,
                    "cores_hi": CPUS,
                    "triples_per_sec_lo": lo["triples_per_sec"],
                    "triples_per_sec_hi": hi["triples_per_sec"],
                    "speedup": round(speedup, 3),
                    "efficiency": round(efficiency, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
