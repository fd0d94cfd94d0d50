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


def hyperplane_signatures(embeddings: DataFrame, n_planes: int = 8,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          seed: int = 1234) -> DataFrame:
    """(id, bucket) random-hyperplane LSH signature per vector."""
    _session.ensure_shipped(embeddings.sparkSession)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("bucket", T.IntegerType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            dim = len(pdf[vec_col].iloc[0])
            if planes is None:
                rng = np.random.RandomState(seed)
                planes = rng.standard_normal((dim, n_planes))
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (mat @ planes) > 0
            buckets = bits.dot(1 << np.arange(n_planes)).astype(np.int32)
            yield pd.DataFrame({"id": pdf[id_col].astype(np.int64),
                                "bucket": buckets})

    return embeddings.select(id_col, vec_col).mapInPandas(run, schema=schema)


def ann_topk(embeddings: DataFrame, qvec: list[float], k: int = 10,
             n_planes: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding", seed: int = 1234,
             probe_hamming: int = 1) -> DataFrame:
    """LSH-bucketed approximate top-k: score only vectors whose hyperplane
    bucket is within `probe_hamming` bits of the query's bucket."""
    q = np.asarray(qvec, dtype=np.float64)
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((len(q), n_planes))
    qbits = (q @ planes) > 0
    qbucket = int(qbits.dot(1 << np.arange(n_planes)))
    # enumerate probe buckets within hamming distance
    buckets = {qbucket}
    if probe_hamming >= 1:
        for i in range(n_planes):
            buckets.add(qbucket ^ (1 << i))
    if probe_hamming >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                buckets.add(qbucket ^ (1 << i) ^ (1 << j))

    sig = hyperplane_signatures(embeddings, n_planes, id_col, vec_col, seed)
    cand_ids = sig.filter(F.col("bucket").isin(sorted(buckets))).select("id")
    cand = embeddings.join(
        cand_ids.withColumnRenamed("id", id_col), id_col, "left_semi"
    )
    return cosine_topk(cand, qvec, k, id_col, vec_col)


def pairwise_topk_join(embeddings: DataFrame, queries: DataFrame,
                       k: int = 5, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Batch k-NN join: for every query vector, the top-k corpus neighbors.

    Arrow-batched matrix multiply per partition against a broadcast query
    matrix (the queries side must be small enough to broadcast — the classic
    'probe table' shape); window top-k on the scored stream."""
    _session.ensure_shipped(embeddings.sparkSession)
    qrows = queries.select(id_col, vec_col).collect()
    qids = [int(r[0]) for r in qrows]
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
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat = mat / np.clip(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None
            )
            scores = qm @ mat.T  # (Q, B)
            out = []
            vids = pdf[id_col].to_numpy()
            for qi, qid in enumerate(ids):
                for bi in range(len(pdf)):
                    out.append((qid, int(vids[bi]), float(scores[qi, bi])))
            yield pd.DataFrame(out, columns=["query_id", "id", "score"])

    scored = embeddings.select(id_col, vec_col).mapInPandas(run, schema=schema)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
