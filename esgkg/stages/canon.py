"""Canonicalization: MinHash-LSH blocking → pair verification → iterative
connected components → triple rewrite (SURVEY.md §2.8 C1-C4, G7).

The reference canonicalizes only by exact name equality (Neo4j MERGE {name},
/root/reference/src/knowledge_graph/neo4j_manager.py:62; NetworkX node
identity, /root/reference/src/knowledge_graph/ontology.py:91). The build
target upgrades this to surface-form merging at web scale:

1. **C1 blocking** — per-surface MinHash signatures (deterministic universal
   hashing, esgkg.kernel.minhash_signature) split into LSH bands; band
   buckets become join keys. Skew control: bucket sizes are bounded by
   `max_bucket` (oversized buckets are dropped and counted — hub surfaces
   like boilerplate strings would otherwise produce quadratic pair blowup),
   and the pair self-join runs under AQE skew-join.
2. **C2 verify** — exact char-3gram Jaccard on candidate pairs (vectorized
   pandas UDF), threshold filter.
3. **C3 connected components** — min-label propagation as a DataFrame
   self-join fixpoint, localCheckpoint every `checkpoint_every` rounds to cut
   lineage, early-exit when no label changes.
4. **C4 rewrite** — triples joined against the canonical map on subj and obj
   (broadcast when the map is small, shuffle hash otherwise).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import session as _session

# whitespace class for the normalized-exact recovery pass — spelled out
# explicitly because Java's \s is ASCII-only while Python's is Unicode-aware
# (U+3000 ideographic space matters for Japanese surfaces); both rungs use
# this identical class so they stay byte-equal
WS_CLASS = "[ \\t\\n\\r\\f\\x0B\\u00A0\\u3000]+"

# which rung the most recent canonical_map took: "driver" | "dist_pairs" |
# "dist_cc" — observability hook for tests asserting the distributed branch
# actually runs at bench scale
LAST_STRATEGY: str | None = None
# whether the most recent connected_components call used the driver
# union-find fast path ("local") or the iterative-join fixpoint
# ("distributed")
LAST_CC_STRATEGY: str | None = None

_BANDS_SCHEMA = T.StructType(
    [
        T.StructField("surface", T.StringType(), False),
        T.StructField("band_id", T.IntegerType(), False),
        T.StructField("band_hash", T.LongType(), False),
    ]
)


def band_rows(surfaces: DataFrame, col: str = "surface",
              k: int = 32, bands: int = 16, ngram: int = 3,
              assume_distinct: bool = False) -> DataFrame:
    """distinct surfaces → (surface, band_id, band_hash) LSH bucket rows.

    `assume_distinct` skips the dedup shuffle when the caller guarantees the
    input is already one row per surface (e.g. a groupBy output) — each
    distinct over the vocabulary is a full shuffle job of fixed latency."""
    _session.ensure_shipped(surfaces.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from esgkg import kernel

        for pdf in batches:
            ss = [s for s in pdf[col] if s]
            # batch-vectorized signatures (pytest-asserted byte-identical
            # to the scalar kernel) — the banding hot path
            sigs = kernel.minhash_signatures_batch(ss, k=k, ngram=ngram)
            rows = []
            for s, sig in zip(ss, sigs):
                for bi, bh in enumerate(kernel.band_hashes(sig, bands)):
                    rows.append((s, bi, bh))
            yield pd.DataFrame(rows, columns=["surface", "band_id", "band_hash"])

    # explicit repartition: AQE coalesces the (byte-tiny) distinct output to
    # ~1 partition, but the minhash kernel is CPU-heavy per row — spread it
    # across all cores regardless of byte size
    par = surfaces.sparkSession.sparkContext.defaultParallelism
    pool = surfaces.select(F.col(col).alias("surface"))
    if not assume_distinct:
        pool = pool.distinct()
    return pool.repartition(par).mapInPandas(run, schema=_BANDS_SCHEMA)


def candidate_pairs(surfaces: DataFrame, col: str = "surface",
                    k: int = 32, bands: int = 16, ngram: int = 3,
                    max_bucket: int = 64,
                    edit_prefilter: float | None = None,
                    recover_exact: bool = True,
                    assume_distinct: bool = False) -> DataFrame:
    """LSH candidate pairs (a < b). Oversized buckets are excluded (skew
    guard); `recover_exact` diverts what the cap would lose that is still
    O(n)-recoverable: a whitespace-normalized EXACT pass over the whole
    surface pool (one extra groupBy on the tiny distinct-surface set, no
    dependency on the band table, so the lazy banding chain still evaluates
    once). Surfaces equal after whitespace stripping pair to the group's
    min surface — O(n) rows, never O(n²) — and flow through the SAME
    conjunctive verification as LSH candidates, so purity is unchanged; a
    near-identical pair whose bucket was dropped still merges. Near-but-not-
    normalized-equal members of a dropped bucket remain the accepted recall
    loss of the cap (the trade every web-scale dedup makes). Mirrors
    dedup.minhash_near_dup_pairs' oversized-bucket exact-hash recovery —
    by normalized surface rather than content hash because the surface pool
    is already distinct (an exact-duplicate pass would recover nothing).

    One shuffle: band rows group into buckets (collect_list), the size cap
    filters oversized buckets, and pairs are emitted MAP-SIDE from each
    bucket array with higher-order functions — no band self-join, no second
    pass over the band table (the round-1 shape needed a size-histogram
    groupBy + a join + a sort-merge self-join over the same rows, three
    shuffles of fixed latency that dominated wall time at vocabulary scale).
    The distinct() that dedups a pair colliding in several bands is a
    shuffle of the (small) candidate set itself.

    `assume_distinct` (forwarded to band_rows and honored by the recovery
    pass) skips BOTH per-surface dedup shuffles when the caller guarantees
    one row per surface — e.g. the pipeline's surface_stats groupBy output,
    where each redundant distinct is a full vocabulary shuffle job of fixed
    latency."""
    b = band_rows(surfaces, col, k, bands, ngram, assume_distinct)
    buckets = (
        b.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list("surface")).alias("ms"))
        .filter((F.size("ms") >= 2) & (F.size("ms") <= max_bucket))
    )
    ms = F.col("ms")
    pair_arrays = F.transform(
        ms,
        lambda x, i: F.transform(
            F.slice(ms, i + F.lit(2), F.size(ms)),
            lambda y: F.struct(x.alias("a"), y.alias("b")),
        ),
    )
    out = (
        buckets.select(F.explode(F.flatten(pair_arrays)).alias("p"))
        .select("p.a", "p.b")
    )
    if recover_exact:
        rec_pool = surfaces.select(F.col(col).alias("surface"))
        if not assume_distinct:
            rec_pool = rec_pool.distinct()
        norm_groups = (
            rec_pool
            .groupBy(
                F.regexp_replace(F.col("surface"), WS_CLASS, "").alias("nk")
            )
            .agg(F.sort_array(F.collect_list("surface")).alias("ms"))
            .filter(F.size("ms") >= 2)
        )
        rec = norm_groups.select(
            F.col("ms")[0].alias("a"),
            F.explode(F.slice(F.col("ms"), 2, F.size(F.col("ms")))).alias("b"),
        )
        out = out.unionByName(rec)
    if edit_prefilter is not None:
        # JVM levenshtein BEFORE the dedup shuffle: a pair colliding in
        # several bands is exploded several times, but only survivors reach
        # the distinct — the shuffle carries verified-scale rows, not
        # candidate-scale ones
        out = out.filter(
            (
                F.lit(1.0)
                - F.levenshtein(F.col("a"), F.col("b"))
                / F.greatest(F.length("a"), F.length("b"), F.lit(1))
            )
            >= edit_prefilter
        )
    return out.distinct()


def verify_pairs(pairs: DataFrame, threshold: float = 0.5,
                 edit_threshold: float = 0.88, ngram: int = 3) -> DataFrame:
    """C2 — conjunctive pair verification: exact char-ngram Jaccard (recall
    side, confirms the LSH estimate) AND edit similarity (precision side,
    rejects lookalikes that share shingles but differ structurally, e.g.
    same-sector company names whose stems overlap).

    The edit-similarity criterion is evaluated twice: first as a JVM
    whole-stage-codegen prefilter (F.levenshtein — identical to the kernel's
    DP for BMP text since both count code units), which drops the ~99% of
    LSH candidates that share a legal-suffix shingle but nothing else, then
    exactly in the python kernel on the survivors (shared source of truth
    with the driver-local rung). Python therefore touches only the
    verified-scale row count, not the candidate-scale one."""
    _session.ensure_shipped(pairs.sparkSession)
    pairs = pairs.filter(
        (
            F.lit(1.0)
            - F.levenshtein(F.col("a"), F.col("b"))
            / F.greatest(F.length("a"), F.length("b"), F.lit(1))
        )
        >= edit_threshold
    )
    schema = T.StructType(
        [
            T.StructField("a", T.StringType(), False),
            T.StructField("b", T.StringType(), False),
            T.StructField("sim", T.DoubleType(), False),
            T.StructField("edit_sim", T.DoubleType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from esgkg import kernel

        for pdf in batches:
            out = pdf.copy()
            out["sim"] = [
                kernel.jaccard(a, b, ngram) for a, b in zip(pdf["a"], pdf["b"])
            ]
            out["edit_sim"] = [
                kernel.edit_similarity(a, b)
                for a, b in zip(pdf["a"], pdf["b"])
            ]
            yield out[["a", "b", "sim", "edit_sim"]]

    # repartition for the same reason as band_rows: the candidate-pair set
    # is byte-tiny (AQE → 1 partition) but the edit-distance DP is O(len²)
    # CPU per row
    par = pairs.sparkSession.sparkContext.defaultParallelism
    return pairs.repartition(par).mapInPandas(run, schema=schema).filter(
        (F.col("sim") >= threshold) & (F.col("edit_sim") >= edit_threshold)
    )


def connected_components(pairs: DataFrame, vertices: DataFrame | None = None,
                         max_iter: int = 20,
                         checkpoint_every: int = 3,
                         small_threshold: int = 200_000) -> DataFrame:
    """Min-label propagation fixpoint → (surface, canonical).

    canonical = lexicographically smallest surface in the component
    (deterministic representative). Each round is one join + one groupBy
    (both on the node key, so AQE reuses the partitioning); convergence is
    detected by counting changed labels (G7).

    Scale-adaptive: a verified near-dup pair graph is usually orders of
    magnitude smaller than the corpus, so when it fits comfortably on the
    driver (≤ small_threshold edges) we run exact union-find locally and
    broadcast the result — identical output, none of the iterative-join
    latency. The distributed fixpoint is the ≥threshold path. BOTH driver
    collects are probed with limit(threshold+1) — an over-threshold
    `vertices` frame routes to the distributed path the same way an
    over-threshold pair graph does, so no caller input can trigger an
    unbounded collect."""
    global LAST_CC_STRATEGY
    spark = pairs.sparkSession
    # single job: grab up to threshold+1 rows; only fall back to the
    # distributed fixpoint when the pair graph is genuinely large
    head = pairs.limit(small_threshold + 1).collect()
    vhead: list | None = None
    if vertices is not None and len(head) <= small_threshold:
        # the local rung also collects the vertex frame (for singleton
        # identity rows) — probe its size the same way instead of an
        # unguarded full collect, so an unexpectedly huge vertex set routes
        # to the distributed fixpoint by construction
        vcol0 = vertices.columns[0]
        vhead = (
            vertices.select(vcol0).distinct().limit(small_threshold + 1).collect()
        )
    if len(head) <= small_threshold and (
        vhead is None or len(vhead) <= small_threshold
    ):
        LAST_CC_STRATEGY = "local"
        rows = head
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in rows:
            ra, rb = find(r[0]), find(r[1])
            if ra != rb:
                # min-label union keeps the deterministic representative
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        out = sorted((n, find(n)) for n in parent)
        if vhead is not None:
            have = set(parent)
            extra = [
                (r[0], r[0]) for r in vhead if r[0] not in have
            ]
            out = sorted(out + extra)
        if not out:
            return spark.createDataFrame([], "surface string, canonical string")
        return spark.createDataFrame(out, "surface string, canonical string")
    LAST_CC_STRATEGY = "distributed"
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    if vertices is not None:
        nodes = nodes.union(
            vertices.select(F.col(vertices.columns[0]).alias("node"))
        ).distinct()
    labels = nodes.select("node", F.col("node").alias("label"))

    for it in range(max_iter):
        nbr = (
            edges.join(labels, edges.dst == labels.node)
            .select(F.col("src").alias("node"), "label")
        )
        new_labels = (
            labels.union(nbr).groupBy("node").agg(F.min("label").alias("label"))
        )
        if (it + 1) % checkpoint_every == 0 or it == max_iter - 1:
            new_labels = new_labels.localCheckpoint(eager=True)
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        else:
            labels = new_labels
    return labels.select(
        F.col("node").alias("surface"), F.col("label").alias("canonical")
    )


def canonical_map_local(surfaces: list[str],
                        jaccard_threshold: float = 0.5,
                        edit_threshold: float = 0.88,
                        max_bucket: int = 64,
                        ngram: int = 3, k: int = 32,
                        bands: int = 16) -> dict[str, str]:
    """Driver-side canonical map over a small distinct-surface set — the
    exact same LSH banding + conjunctive verification + union-find the
    distributed path computes, byte-for-byte (shared kernel functions).
    Used by `canonical_map` below when the surface set fits on the driver."""
    from collections import defaultdict

    from .. import kernel

    buckets: dict[tuple[int, int], list[str]] = defaultdict(list)
    pool = [s for s in surfaces if s]
    sigs = kernel.minhash_signatures_batch(pool, k=k, ngram=ngram)
    for s, sig in zip(pool, sigs):
        for bi, bh in enumerate(kernel.band_hashes(sig, bands)):
            buckets[(bi, bh)].append(s)
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def try_merge(x: str, y: str, seen: set[tuple[str, str]]) -> None:
        pair = (x, y)
        if pair in seen:
            return
        seen.add(pair)
        if (
            kernel.jaccard(x, y, ngram) >= jaccard_threshold
            and kernel.edit_similarity(x, y) >= edit_threshold
        ):
            ra, rb = find(x), find(y)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo

    seen_pairs: set[tuple[str, str]] = set()
    for members in buckets.values():
        if len(members) > max_bucket:
            continue
        ms = sorted(set(members))
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                try_merge(ms[i], ms[j], seen_pairs)
    # whitespace-normalized exact recovery — byte-identical semantics to the
    # distributed path's `recover_exact` branch (candidate_pairs): members of
    # a dropped oversized bucket that are equal after whitespace stripping
    # still pair to the group's min surface and pass the same verification
    import re as _re
    from collections import defaultdict as _dd

    norm_groups: dict[str, list[str]] = _dd(list)
    for s in surfaces:
        if s:
            norm_groups[_re.sub(WS_CLASS, "", s)].append(s)
    for members in norm_groups.values():
        ms = sorted(set(members))
        for m in ms[1:]:
            try_merge(ms[0], m, seen_pairs)
    return {s: find(s) if s in parent else s for s in surfaces}


def canonical_map(surfaces: DataFrame, col: str = "surface",
                  jaccard_threshold: float = 0.5,
                  edit_threshold: float = 0.88,
                  max_bucket: int = 64,
                  exclude_exact: list[str] | None = None,
                  driver_threshold: int = 4_096,
                  pair_threshold: int = 200_000,
                  assume_distinct: bool = False) -> DataFrame:
    """surface → canonical for every input surface (identity for singletons).

    Merging is the transitive closure over verified pairs: two variants that
    are each similar to a bridging surface merge through it, but two distant
    variants whose bridge never occurs in the corpus stay separate (standard
    CC semantics — completeness is conditional on observed bridges, purity is
    unconditional).

    `exclude_exact`: surfaces that are already canonical by construction
    (the ontology dictionary) are excluded from pair generation so that
    distinct but textually close concepts (e.g. コンプライアンス vs
    コンプライアンス体制) are never merged.

    Strategy ladder (scale-adaptive, every rung tested equal):
    1. ≤ `driver_threshold` distinct surfaces → everything on the driver
       (collect + local LSH/verify/union-find). Test/seed scale only; the
       LSH hashing is single-threaded here, so this rung must stay tiny —
       round 1 ran it up to 100k surfaces and the serial hashing became a
       scaling-gate tail.
    2. otherwise → DISTRIBUTED banding + verification (mapInPandas, scales
       with cores); the verified near-dup pair graph is orders of magnitude
       smaller than the vocabulary, so ≤ `pair_threshold` pairs finish with
       a driver union-find (exact, no iterative-join latency), and only a
       genuinely huge pair graph takes the distributed CC fixpoint.

    `assume_distinct`: the caller guarantees one row per surface AND that
    the input is already materialized (e.g. the pipeline's checkpointed
    surface_stats groupBy output). Skips this function's own
    distinct+localCheckpoint — at bench scale that pair of vocabulary-wide
    shuffle jobs is ~7 s of fixed latency paid identically at every core
    count — and forwards the guarantee to candidate_pairs, whose banding
    and whitespace-recovery passes each drop one more dedup shuffle.
    Rung-equality on distinct inputs is pytest-asserted."""
    # one distinct over the (large) surface stream feeds both the LSH pool
    # and the identity join — computed once, reused (skipped entirely when
    # the caller already holds the distinct, materialized pool)
    global LAST_STRATEGY
    all_s = surfaces.select(F.col(col).alias("surface"))
    if not assume_distinct:
        all_s = all_s.distinct().localCheckpoint(eager=True)
    spark = surfaces.sparkSession
    head = all_s.limit(driver_threshold + 1).collect()
    if len(head) <= driver_threshold:
        LAST_STRATEGY = "driver"
        excl = set(exclude_exact or ())
        pool_local = [r[0] for r in head if r[0] and r[0] not in excl]
        cm = canonical_map_local(
            pool_local, jaccard_threshold, edit_threshold, max_bucket
        )
        rows = sorted(
            (s, cm.get(s, s)) for s in (r[0] for r in head) if s is not None
        )
        if not rows:
            return spark.createDataFrame(
                [], "surface string, canonical string"
            )
        return spark.createDataFrame(
            rows, "surface string, canonical string"
        )
    pool = all_s
    if exclude_exact:
        pool = pool.filter(~F.col("surface").isin(exclude_exact))
    # the banding→bucket→pair→verify chain is ONE lazy plan; the (tiny)
    # verified pair set is collected exactly once by connected_components'
    # size probe, so no intermediate materialization is needed on the
    # dist_pairs rung (the common one). Only the rare dist_cc rung
    # (> pair_threshold verified pairs) re-evaluates the chain.
    pairs = verify_pairs(
        candidate_pairs(pool, "surface", max_bucket=max_bucket,
                        edit_prefilter=edit_threshold,
                        assume_distinct=assume_distinct),
        threshold=jaccard_threshold,
        edit_threshold=edit_threshold,
    ).select("a", "b")
    comp = connected_components(pairs, small_threshold=pair_threshold)
    local_cc = LAST_CC_STRATEGY == "local"
    LAST_STRATEGY = "dist_pairs" if local_cc else "dist_cc"
    # the union-find result is tiny (≤ pair_threshold nodes) → broadcast it
    # into the identity join over the full vocabulary
    comp = F.broadcast(comp) if local_cc else comp
    return (
        all_s.join(comp, "surface", "left")
        .select(
            "surface",
            F.coalesce(F.col("canonical"), F.col("surface")).alias("canonical"),
        )
    )


def rewrite_triples(triples: DataFrame, canon: DataFrame,
                    broadcast_threshold: int = 2_000_000) -> DataFrame:
    """C4: rewrite subj and obj through the canonical map (left joins keep
    unmapped surfaces as-is).

    The map is one row per DISTINCT corpus surface — unbounded at web scale —
    so it is broadcast only while it is genuinely small (size-gated by a
    single cheap count; the map is materialized/persisted by the pipeline
    before this stage). Above the threshold both lookups run as shuffle hash
    joins on the surface key; AQE splits residual skew."""
    n_map = canon.limit(broadcast_threshold + 1).count()
    c = F.broadcast(canon) if n_map <= broadcast_threshold else canon
    out = (
        triples.join(
            c.withColumnRenamed("surface", "subj").withColumnRenamed(
                "canonical", "subj_canon"
            ),
            "subj",
            "left",
        )
        .join(
            c.withColumnRenamed("surface", "obj").withColumnRenamed(
                "canonical", "obj_canon"
            ),
            "obj",
            "left",
        )
        .select(
            F.coalesce("subj_canon", "subj").alias("subj"),
            "pred",
            F.coalesce("obj_canon", "obj").alias("obj"),
            "url",
            "confidence",
        )
    )
    return out
