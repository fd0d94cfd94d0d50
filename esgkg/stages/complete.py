"""Knowledge completion — Spark-native heuristic link scorer (SURVEY.md U3).

Replaces the reference's GNN (`ESGKnowledgeCompletion.predict_links`,
contract per /root/reference/scripts/03_knowledge_completion.py:76-84 and
/root/reference/tests/test_knowledge_completion.py:42-49: per-source top-k
(node, prob) with prob in [0,1]) with Adamic-Adar + common-neighbor scoring
over the materialized edge table:

    und(a, z) ⋈ und(b, z) on z        -- triangle-style self-join
    → groupBy(a, b): sum(1/ln(deg z)), count(*)
    → anti-join existing edges        -- only propose NEW links
    → row_number() ≤ k per source     -- T3 window top-k

Scale notes: the self-join key is the shared neighbor z; hub vertices are the
skew risk, so z-degree is capped (`max_degree`) — standard practice since a
z with degree d contributes d² candidate pairs while its 1/ln(d) weight is
negligible. AQE skew-join covers residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def undirected(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def adamic_adar(edges: DataFrame, top_k: int = 10,
                max_degree: int = 1000) -> DataFrame:
    """(src, dst, common_neighbors, aa_score, prob, rank) — proposed links."""
    und = undirected(edges)
    deg = und.groupBy(F.col("a").alias("z")).agg(F.count("*").alias("deg"))
    # neighbor lists keyed by the shared vertex z
    nbrs = und.select(F.col("b").alias("z"), F.col("a").alias("n"))
    nbrs = nbrs.join(
        F.broadcast(deg.filter(F.col("deg") <= max_degree)), "z"
    )  # hub cap: drops negligible-weight, quadratic-cost hubs
    # The join key z is low-cardinality by construction (shared neighbors),
    # so a shuffle join would be skew-bound; broadcasting the (small)
    # neighbor list keeps the explosion map-side and the only shuffle is the
    # partially-aggregated groupBy. At edge counts past the broadcast
    # threshold, swap to a bucketed self-join + AQE skew split.
    nbrs = nbrs.localCheckpoint(eager=True)
    l, r = nbrs.alias("l"), F.broadcast(nbrs.alias("r"))
    cand = (
        l.join(r, (F.col("l.z") == F.col("r.z")) & (F.col("l.n") < F.col("r.n")))
        .select(
            F.col("l.n").alias("src"),
            F.col("r.n").alias("dst"),
            F.col("l.z").alias("z"),
            F.col("l.deg").alias("deg_z"),
        )
        .filter(F.col("deg_z") >= 2)
    )
    scored = cand.groupBy("src", "dst").agg(
        F.count("*").alias("common_neighbors"),
        F.sum(1.0 / F.log(F.col("deg_z"))).alias("aa_score"),
    )
    # only links that don't already exist (either direction: und covers both)
    existing = und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    new_links = scored.join(existing, ["src", "dst"], "left_anti")
    w = Window.partitionBy("src").orderBy(
        F.desc("aa_score"), F.desc("common_neighbors"), F.asc("dst")
    )
    return (
        new_links.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .withColumn("prob", 1.0 - F.exp(-F.col("aa_score")))
        .select("src", "dst", "common_neighbors", "aa_score", "prob", "rank")
    )


def predict_links(edges: DataFrame, source_id: int, top_k: int = 5
                  ) -> list[tuple[int, float]]:
    """The recovered U3 contract
    (`ESGKnowledgeCompletion.predict_links(graph, source_node, top_k)`,
    call sites /root/reference/scripts/03_knowledge_completion.py:76-84,
    shape assertions /root/reference/tests/test_knowledge_completion.py:42-49):
    exactly top_k (node, prob) pairs for one source, prob in [0, 1],
    descending. Backed by the Adamic-Adar scorer instead of the GNN."""
    rows = (
        adamic_adar(edges, top_k=top_k)
        .filter(F.col("src") == source_id)
        .orderBy(F.asc("rank"))
        .select("dst", "prob")
        .collect()
    )
    out = [(int(r.dst), float(r.prob)) for r in rows]
    # pad to exactly top_k with zero-probability fillers (the reference
    # contract returns exactly k pairs even for sparse neighborhoods)
    if len(out) < top_k:
        existing = {d for d, _ in out} | {source_id}
        fillers = (
            edges.select(F.col("dst").alias("n"))
            .union(edges.select(F.col("src").alias("n")))
            .distinct()
            .filter(~F.col("n").isin(list(existing)))
            .orderBy("n")
            .limit(top_k - len(out))
            .collect()
        )
        out += [(int(r.n), 0.0) for r in fillers]
    return out[:top_k]


def bipartite_adamic_adar(edges: DataFrame, left: str, right: str,
                          min_shared: int = 2) -> DataFrame:
    """Adamic-Adar over a bipartite edge list: score left-side pairs by their
    shared right-side neighbors, weight 1/ln(degree of shared neighbor).
    Returns (a, b, common, aa_score) with a < b.

    Same triangle-join shape as `adamic_adar`, reused for e.g. the
    customer–part co-purchase graph in the driver's differential checks."""
    e = edges.select(F.col(left).alias("c"), F.col(right).alias("p")).distinct()
    deg = e.groupBy("p").agg(F.count("*").alias("deg_p"))
    ed = e.join(deg.filter(F.col("deg_p") >= 2), "p")
    l, r = ed.alias("l"), ed.alias("r")
    return (
        l.join(r, (F.col("l.p") == F.col("r.p")) & (F.col("l.c") < F.col("r.c")))
        .select(
            F.col("l.c").alias("a"),
            F.col("r.c").alias("b"),
            F.col("l.deg_p").alias("deg_p"),
        )
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("common"),
            F.sum(1.0 / F.log(F.col("deg_p"))).alias("aa_score"),
        )
        .filter(F.col("common") >= min_shared)
    )


# ---------------------------------------------------------------------------
# Ranking metrics (E1-E3) as window/aggregation ops
# (/root/reference/src/evaluation/metrics.py:140-180)
# ---------------------------------------------------------------------------

def hits_mrr_map(predicted: DataFrame, gold: DataFrame, k: int = 10) -> DataFrame:
    """predicted(src, dst, rank) vs gold(src, dst) → one row of
    (hits_at_k, mrr, map) averaged over sources that have gold links."""
    hit = (
        predicted.filter(F.col("rank") <= k)
        .join(gold.withColumn("hit", F.lit(1)), ["src", "dst"], "left")
        .na.fill({"hit": 0})
    )
    run_w = (
        Window.partitionBy("src")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hit = hit.withColumn("cum_hits", F.sum("hit").over(run_w)).withColumn(
        "ap_term",
        F.when(
            F.col("hit") == 1, F.col("cum_hits") / F.col("rank")
        ).otherwise(0.0),
    )
    per_src = hit.groupBy("src").agg(
        (F.sum("hit") / F.lit(k)).alias("hits_at_k"),
        F.max(
            F.when(F.col("hit") == 1, 1.0 / F.col("rank")).otherwise(0.0)
        ).alias("mrr"),
        F.sum("hit").alias("n_hits"),
        F.sum("ap_term").alias("ap_sum"),
    )
    per_src = per_src.withColumn(
        "ap",
        F.when(F.col("n_hits") > 0, F.col("ap_sum") / F.col("n_hits")).otherwise(
            0.0
        ),
    )
    return per_src.agg(
        F.avg("hits_at_k").alias("hits_at_k"),
        F.avg("mrr").alias("mrr"),
        F.avg("ap").alias("map"),
    )
