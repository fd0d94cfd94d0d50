"""Evaluation / structural metrics (SURVEY.md §2.5 A6-A10, §2.6 G4-G6, J1).

DataFrame re-expressions of /root/reference/src/evaluation/metrics.py:

* relation_prf — exact (subj, pred, obj) join P/R/F1 (metrics.py:106-138;
  the J1 harness behind the ≥0.95 gate).
* structural_metrics — density, orphan count, max in/out degree, leaf/root
  counts (metrics.py:26-44, 90-94).
* redundant_is_a — parent reachable from another parent (metrics.py:96-102)
  via bounded transitive closure.
* has_cycle — bounded-round reachability self-test (metrics.py:83-88).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import graph as graph_stage

# The reference's simple tokenizer (metrics.py:267-271): strip JA punctuation
# + whitespace, split on runs of spaces.
REF_TOKEN_PUNCT = r"[、。！？「」『』（）［］\s]+"


def ref_tokens(col):
    """Column expr: the reference `_tokenize` as an array<string>."""
    return F.filter(
        F.split(F.regexp_replace(col, REF_TOKEN_PUNCT, " "), " "),
        lambda t: t != "",
    )


def relation_prf(pred: DataFrame, gold: DataFrame) -> dict[str, float]:
    """Exact 3-column intersection P/R/F1 (order-insensitive, J1)."""
    p = pred.select("subj", "pred", "obj").distinct().localCheckpoint()
    g = gold.select("subj", "pred", "obj").distinct().localCheckpoint()
    tp = p.join(g, ["subj", "pred", "obj"]).count()
    np_, ng = p.count(), g.count()
    precision = tp / np_ if np_ else 0.0
    recall = tp / ng if ng else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {"precision": precision, "recall": recall, "f1": f1, "tp": tp}


def structural_metrics(nodes: DataFrame, edges: DataFrame) -> dict[str, float]:
    n = nodes.count()
    e = edges.count()
    deg = graph_stage.degrees(edges).localCheckpoint()
    agg = deg.agg(
        F.max("in_deg").alias("max_in"),
        F.max("out_deg").alias("max_out"),
        F.avg("out_deg").alias("avg_branching"),
    ).collect()[0]
    orphans = graph_stage.orphans(nodes, edges).count()
    leaves = deg.filter(F.col("in_deg") == 0).count()
    roots = deg.filter(F.col("out_deg") == 0).count()
    return {
        "num_nodes": n,
        "num_edges": e,
        "density": (2 * e / (n * (n - 1))) if n > 1 else 0.0,
        "max_in_degree": agg["max_in"],
        "max_out_degree": agg["max_out"],
        "avg_branching": agg["avg_branching"],
        "num_orphans": orphans,
        "num_leaves": leaves,
        "num_roots": roots,
    }


def transitive_closure(edges: DataFrame, relation: str | None = None,
                       max_rounds: int = 8) -> DataFrame:
    """(src, dst) reachability pairs by iterative doubling-free expansion
    (bounded rounds — ontology hierarchies are shallow, G6)."""
    e = edges
    if relation is not None:
        e = e.filter(F.col("relation") == relation)
    e = e.select("src", "dst").distinct().localCheckpoint(eager=True)
    reach = e
    for _ in range(max_rounds):
        step = (
            reach.alias("r")
            .join(e.alias("e"), F.col("r.dst") == F.col("e.src"))
            .select(F.col("r.src").alias("src"), F.col("e.dst").alias("dst"))
        )
        new_reach = reach.union(step).distinct().localCheckpoint(eager=True)
        if new_reach.count() == reach.count():
            break
        reach = new_reach
    return reach


def has_cycle(edges: DataFrame, max_rounds: int = 8) -> bool:
    """G4 — a node that reaches itself closes a cycle."""
    tc = transitive_closure(edges, max_rounds=max_rounds)
    return tc.filter(F.col("src") == F.col("dst")).limit(1).count() > 0


def redundant_is_a(edges: DataFrame) -> DataFrame:
    """G6 — is_a edges (c → p) where p is already reachable from another
    parent of c (the redundant-relation detector, metrics.py:96-102)."""
    isa = edges.filter(F.col("relation") == "is_a").select("src", "dst")
    tc = transitive_closure(edges, relation="is_a")
    other_parent = isa.alias("a").join(
        isa.alias("b"),
        (F.col("a.src") == F.col("b.src")) & (F.col("a.dst") != F.col("b.dst")),
    ).select(
        F.col("a.src").alias("src"),
        F.col("a.dst").alias("dst"),
        F.col("b.dst").alias("other"),
    )
    return (
        other_parent.join(
            tc.withColumnRenamed("src", "other").withColumnRenamed(
                "dst", "reached"
            ),
            "other",
        )
        .filter(F.col("reached") == F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
