"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exactness baseline: JVM-side dot product via
  zip_with + aggregate (no Python in the loop), TakeOrderedAndProject top-k.
* LSH-bucketed ANN — the scale path: random-hyperplane signatures bucket the
  corpus; queries probe only their bucket (and neighbors), turning an O(N)
  scan into an O(N/2^b) probe. Deterministic planes (seeded).
* IVF-style variant — coarse centroids via deterministic seeding, probe the
  nearest `nprobe` lists.

All scoring math is double-precision and sequential-order stable so the
DuckDB differential oracle can reproduce values bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import session as _session


def _dot(vec_col, qvec: list[float]):
    """JVM-side double dot product of an array<float> column with a literal."""
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return F.aggregate(
        F.zip_with(
            vec_col.cast("array<double>"), q, lambda a, b: a * b
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(vec_col):
    return F.sqrt(
        F.aggregate(
            vec_col.cast("array<double>"),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )


def cosine_topk(embeddings: DataFrame, qvec: list[float], k: int = 10,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact brute-force cosine top-k: (id, score) ordered desc, id-tiebreak.

    Compiles to one scan + TakeOrderedAndProject (no full sort, no shuffle of
    the score column beyond the k-row reduction)."""
    qn = float(np.sqrt(np.sum(np.asarray(qvec, dtype=np.float64) ** 2)))
    score = _dot(F.col(vec_col), qvec) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        embeddings.select(F.col(id_col).alias("id"), score.alias("score"))
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
    )


def _lsh_planes(dim: int, n_tables: int, n_planes: int,
                seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_tables, dim, n_planes))


def hyperplane_signatures(embeddings: DataFrame, n_tables: int = 12,
                          n_planes: int = 6,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          seed: int = 1234) -> DataFrame:
    """(id, table, bucket) multi-table random-hyperplane LSH signatures —
    L independent tables of b bits each (standard recall amplification:
    P(candidate) = 1-(1-p^b)^L for per-plane agreement p)."""
    _session.ensure_shipped(embeddings.sparkSession)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("table", T.IntegerType(), False),
            T.StructField("bucket", T.IntegerType(), False),
        ]
    )
    pows = 1 << np.arange(n_planes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if planes is None:
                planes = _lsh_planes(
                    len(pdf[vec_col].iloc[0]), n_tables, n_planes, seed
                )
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].astype(np.int64).to_numpy()
            frames = []
            for t in range(n_tables):
                buckets = ((mat @ planes[t]) > 0).dot(pows).astype(np.int32)
                frames.append(
                    pd.DataFrame(
                        {"id": ids, "table": np.int32(t), "bucket": buckets}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return embeddings.select(id_col, vec_col).mapInPandas(run, schema=schema)


def ann_topk(embeddings: DataFrame, qvec: list[float], k: int = 10,
             n_tables: int = 12, n_planes: int = 6,
             id_col: str = "vec_id",
             vec_col: str = "embedding", seed: int = 1234,
             probe_hamming: int = 1,
             signatures: DataFrame | None = None) -> DataFrame:
    """Multi-table LSH approximate top-k: score only vectors that share a
    bucket (within `probe_hamming` bits) with the query in ANY table.

    `signatures`: a precomputed (id, table, bucket) table from
    `hyperplane_signatures` (same n_tables/n_planes/seed — caller's
    contract). The signature table is the ANN *index*: at corpus scale it is
    materialized once and probed by every query; recomputing it per query
    re-hashes the whole corpus (the round-2 scale flag). Compute-if-absent
    keeps the single-query call self-contained."""
    q = np.asarray(qvec, dtype=np.float64)
    planes = _lsh_planes(len(q), n_tables, n_planes, seed)
    pows = 1 << np.arange(n_planes)
    probe_rows = []
    for t in range(n_tables):
        qb = int(((q @ planes[t]) > 0).dot(pows))
        buckets = {qb}
        if probe_hamming >= 1:
            for i in range(n_planes):
                buckets.add(qb ^ (1 << i))
        for b in buckets:
            probe_rows.append((t, b))
    spark = embeddings.sparkSession
    probes = F.broadcast(
        spark.createDataFrame(probe_rows, "table int, bucket int")
    )
    sig = signatures if signatures is not None else hyperplane_signatures(
        embeddings, n_tables, n_planes, id_col, vec_col, seed
    )
    cand_ids = sig.join(probes, ["table", "bucket"]).select("id").distinct()
    cand = embeddings.join(
        cand_ids.withColumnRenamed("id", id_col), id_col, "left_semi"
    )
    return cosine_topk(cand, qvec, k, id_col, vec_col)


def scored_topk_per_partition(embeddings: DataFrame, queries: DataFrame,
                              k: int = 5, id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              max_queries: int = 100_000) -> DataFrame:
    """The map side of the batch k-NN join: per PARTITION, the exact top-k
    corpus neighbors of every query — (query_id, id, score), at most Q×k
    rows per non-empty partition (the partial-reduce contract a global
    window then finishes).

    Per Arrow batch: one (Q×dim)·(dim×B) matmul, then `np.partition` keeps
    only rows whose score reaches the per-query k-th largest (boundary ties
    included, so no true top-k member under the (score desc, id asc) order
    can be cut) — fully vectorized, no per-row Python loop, never Q×B rows
    shipped (the round-1/round-2 scale flag). The per-batch survivors are
    reduced to exactly Q×k rows per partition with one pandas sort.

    The queries side is collected and broadcast (the 'probe table'
    contract), so it must be driver-small: `max_queries` fails loud instead
    of OOMing the driver on a misused corpus-sized probe side (mirrors
    rewrite_triples' broadcast gate — the limit(n+1) collect never ships
    more than n+1 rows even when the caller passes a huge DataFrame). For a
    genuinely large probe side, block-partition the queries and union
    per-block joins, or use the LSH/IVF index paths."""
    _session.ensure_shipped(embeddings.sparkSession)
    qrows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"the kNN probe (queries) side exceeds max_queries="
            f"{max_queries} in scored_topk_per_partition; it is "
            "collected+broadcast and must be small (raise max_queries "
            "deliberately, or use ann/ivf indexes)"
        )
    qids = np.asarray([int(r[0]) for r in qrows], dtype=np.int64)
    qmat = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    sc = embeddings.sparkSession.sparkContext
    bq = sc.broadcast((qids, qmat))

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), False),
            T.StructField("id", T.LongType(), False),
            T.StructField("score", T.DoubleType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qm = bq.value
        parts = []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat = mat / np.clip(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None
            )
            scores = qm @ mat.T  # (Q, B)
            vids = pdf[id_col].to_numpy().astype(np.int64)
            b = scores.shape[1]
            if k < b:
                # k-th largest score per query; keep every entry reaching it
                kth = -np.partition(-scores, k - 1, axis=1)[:, k - 1]
                qi, bi = np.nonzero(scores >= kth[:, None])
            else:
                qi, bi = np.nonzero(np.ones_like(scores, dtype=bool))
            parts.append(
                pd.DataFrame(
                    {
                        "query_id": ids[qi],
                        "id": vids[bi],
                        "score": scores[qi, bi],
                    }
                )
            )
        if parts:
            allc = pd.concat(parts, ignore_index=True).sort_values(
                ["query_id", "score", "id"], ascending=[True, False, True]
            )
            yield allc.groupby("query_id", sort=False).head(k)

    return embeddings.select(id_col, vec_col).mapInPandas(run, schema=schema)


def pairwise_topk_join(embeddings: DataFrame, queries: DataFrame,
                       k: int = 5, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       max_queries: int = 100_000) -> DataFrame:
    """Batch k-NN join: for every query vector, the top-k corpus neighbors.

    Arrow-batched matrix multiply per partition against a broadcast query
    matrix (the queries side must be small enough to broadcast — the classic
    'probe table' shape). The map side pre-reduces to ≤ Q×k rows per
    partition (`scored_topk_per_partition`); the window is the final
    exact reduce over Q×k×partitions rows, not Q×N."""
    scored = scored_topk_per_partition(
        embeddings, queries, k, id_col, vec_col, max_queries
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _seeded_centroids(dim: int, n_lists: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    cents = rng.standard_normal((n_lists, dim))
    return cents / np.linalg.norm(cents, axis=1, keepdims=True)


def ivf_train_centroids(embeddings: DataFrame, n_lists: int = 64,
                        train_iters: int = 1,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        seed: int = 4321) -> np.ndarray:
    """Spherical-k-means-trained IVF centroids: `train_iters` distributed
    Lloyd iterations seeded from the deterministic codebook. Each iteration
    is one pass — executors assign their partition's (normalized) vectors to
    the nearest current centroid and emit PER-PARTITION partial sums
    (n_lists rows of (list_id, n, sumvec) per partition, vectorized
    np.add.at — never the corpus), which the driver reduces into the new
    normalized means (empty lists keep their previous centroid). The
    returned (n_lists × dim) array is driver-small by construction and
    plugs into ivf_assign/ivf_topk via their `centroids` parameter."""
    _session.ensure_shipped(embeddings.sparkSession)
    first = embeddings.select(vec_col).first()
    if first is None:
        raise ValueError("cannot train IVF centroids on an empty corpus")
    cents = _seeded_centroids(len(first[0]), n_lists, seed)
    sc = embeddings.sparkSession.sparkContext
    schema = T.StructType(
        [
            T.StructField("list_id", T.IntegerType(), False),
            T.StructField("n", T.LongType(), False),
            T.StructField("sums", T.ArrayType(T.DoubleType()), False),
        ]
    )
    for _ in range(max(0, train_iters)):
        bc = sc.broadcast(cents)

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            c = bc.value
            counts = np.zeros(len(c), dtype=np.int64)
            sums = np.zeros_like(c)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                mat = mat / np.clip(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None
                )
                lists = np.argmax(mat @ c.T, axis=1)
                np.add.at(sums, lists, mat)
                np.add.at(counts, lists, 1)
            nz = np.nonzero(counts)[0]
            yield pd.DataFrame(
                {
                    "list_id": nz.astype(np.int32),
                    "n": counts[nz],
                    "sums": [sums[i].tolist() for i in nz],
                }
            )

        partials = (
            embeddings.select(vec_col).mapInPandas(run, schema=schema).collect()
        )
        new = cents.copy()
        tot_n = np.zeros(len(cents), dtype=np.int64)
        tot_s = np.zeros_like(cents)
        for r in partials:
            tot_n[r.list_id] += r.n
            tot_s[r.list_id] += np.asarray(r.sums)
        nz = tot_n > 0
        means = tot_s[nz] / tot_n[nz, None]
        new[nz] = means / np.clip(
            np.linalg.norm(means, axis=1, keepdims=True), 1e-12, None
        )
        cents = new
        bc.destroy()
    return cents


def ivf_assign(embeddings: DataFrame, n_lists: int = 64,
               id_col: str = "vec_id", vec_col: str = "embedding",
               seed: int = 4321,
               centroids: np.ndarray | None = None) -> DataFrame:
    """IVF coarse assignment: (id, list_id) — each vector joins the list of
    its nearest coarse centroid. Default centroids are deterministic seeded
    Gaussian directions (the cheap ingest baseline); pass the output of
    `ivf_train_centroids` as `centroids` for trained lists — the assignment
    math is identical. The assignment table is the IVF *index*: materialized
    once, probed by every query."""
    _session.ensure_shipped(embeddings.sparkSession)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("list_id", T.IntegerType(), False),
        ]
    )
    bc = (
        embeddings.sparkSession.sparkContext.broadcast(
            np.asarray(centroids, dtype=np.float64)
        )
        if centroids is not None
        else None
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value if bc is not None else None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if cents is None:
                cents = _seeded_centroids(
                    len(pdf[vec_col].iloc[0]), n_lists, seed
                )
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat = mat / np.clip(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None
            )
            lists = np.argmax(mat @ cents.T, axis=1).astype(np.int32)
            yield pd.DataFrame(
                {"id": pdf[id_col].astype("int64"), "list_id": lists}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(run, schema=schema)


def ivf_topk(embeddings: DataFrame, qvec: list[float], k: int = 10,
             n_lists: int = 64, nprobe: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 4321,
             assignments: DataFrame | None = None,
             centroids: np.ndarray | None = None) -> DataFrame:
    """IVF approximate top-k: score only vectors whose coarse list is among
    the query's `nprobe` nearest lists — the scan shrinks ~n_lists/nprobe.
    `assignments` accepts the materialized `ivf_assign` table
    (compute-if-absent), mirroring `ann_topk`'s signature reuse;
    `centroids` accepts the trained codebook from `ivf_train_centroids`
    (caller contract: the same centroids that built `assignments`)."""
    q = np.asarray(qvec, dtype=np.float64)
    q = q / max(float(np.linalg.norm(q)), 1e-12)
    cents = (
        np.asarray(centroids, dtype=np.float64)
        if centroids is not None
        else _seeded_centroids(len(q), n_lists, seed)
    )
    probe_lists = [
        int(i) for i in np.argsort(-(cents @ q), kind="stable")[:nprobe]
    ]
    spark = embeddings.sparkSession
    probes = F.broadcast(
        spark.createDataFrame([(i,) for i in probe_lists], "list_id int")
    )
    assign = assignments if assignments is not None else ivf_assign(
        embeddings, n_lists, id_col, vec_col, seed, centroids=centroids
    )
    cand_ids = assign.join(probes, "list_id").select("id")
    cand = embeddings.join(
        cand_ids.withColumnRenamed("id", id_col), id_col, "left_semi"
    )
    return cosine_topk(cand, qvec, k, id_col, vec_col)
