"""CLI entry: run the full KG-construction pipeline.

Works both ways:
    python -m esgkg --pages 10000 --out /tmp/kg --cores 16
    spark-submit --master local[16] --py-files /tmp/esgkg_pyfiles.zip \
        -- python entry is esgkg/__main__.py --pages ... --out ...

Under spark-submit the session builder inherits the submitted master/conf
(getOrCreate); standalone it builds its own local[N] session. With --out the
run is manifest-checkpointed (idempotent resume); without, it prints counts.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

# spark-submit runs this file as a bare script before the context (and its
# --py-files path entries) exists; make the package importable either way
_ROOT = str(Path(__file__).resolve().parent.parent)
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main() -> None:
    ap = argparse.ArgumentParser(prog="esgkg")
    ap.add_argument("--pages", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cores", type=int, default=None,
                    help="local[N] when not running under spark-submit")
    ap.add_argument("--out", type=str, default=None,
                    help="catalog dir for manifest-checkpointed tables")
    ap.add_argument("--top-k", type=int, default=10)
    args = ap.parse_args()

    from esgkg import pipeline
    from esgkg.session import get_spark

    spark = get_spark(cores=args.cores)
    t0 = time.time()
    out = pipeline.build_kg(
        spark, args.pages, seed=args.seed, base_dir=args.out,
        top_k=args.top_k,
    )
    stats = {
        "n_pages": args.pages,
        "n_triples": out["triples"].count(),
        "n_nodes": out["nodes"].count(),
        "n_edges": out["edges"].count(),
        "n_predicted_links": out["predicted_links"].count(),
        "elapsed_sec": round(time.time() - t0, 3),
        "out": args.out,
    }
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
