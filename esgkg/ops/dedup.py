"""Deduplication operators for large-scale training-data pipelines.

Five families over a document table:

* exact      — hash groupBy; keeper = min(doc_id) per identical text.
* minhash    — MinHash+LSH near-dup: shingle → minhash → band → bucket join
               (same machinery as canonicalization, tuned for documents).
* simhash    — 64-bit SimHash over tokens; near-dups = small hamming distance
               within same band prefix.
* ngram/char jaccard — exact verified similarity on bounded candidate sets.
* embedding-cosine — semantic near-dup over an embedding column:
               hyperplane-LSH blocking + exact JVM cosine verification.

Scale notes: every family is blocking-based (no all-pairs cross join). The
LSH band groupBy is the only shuffle; bucket-size caps bound the pair
explosion from boilerplate-heavy corpora (the classic web-dedup skew).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import session as _session
from ..stages import canon


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: (keep_id, n_dupes). JVM-side only.

    Groups on (md5, xxhash64, length) content hashes instead of the raw text
    so the shuffle key is ~30 bytes, not the document body (at 100 TB the
    full-text key IS the corpus). Two independent hashes + the exact length
    make a false merge ~2^-192-improbable — the collision-verify margin."""
    key = [
        F.md5(F.col(text_col)),
        F.xxhash64(F.col(text_col), F.lit(7)),
        F.length(F.col(text_col)),
    ]
    return (
        docs.groupBy(*key)
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dupes"),
        )
        .select("keep_id", "n_dupes")
    )


def exact_dedup_keep(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """The surviving rows after exact dedup (keeper = min id per text)."""
    keep = exact_dedup(docs, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return docs.join(keep, id_col)


def minhash_near_dup_pairs(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           k: int = 32, bands: int = 16,
                           shingle: int = 5,
                           jaccard_threshold: float = 0.7,
                           max_bucket: int = 64,
                           recover_oversized: bool = True,
                           min_band_agreement: int = 2) -> DataFrame:
    """Near-duplicate id pairs via MinHash-LSH + exact-Jaccard verify.

    Shingles are character n-grams of the document text (word-shingles are a
    one-line change in the kernel).

    `min_band_agreement` is a signature-agreement prefilter applied BEFORE
    full texts are joined onto candidates: a candidate pair colliding in
    fewer than this many of the `bands` LSH bands is dropped without ever
    shipping its document bodies. The band-collision count is free — it
    falls out of the groupBy that dedups multi-band collisions — and it IS
    the signature-level Jaccard estimate (bands agree with probability
    j^(k/bands)). At the defaults (k=32, bands=16, threshold=0.7) a true
    ≥0.7-Jaccard pair agrees in <2 bands with probability ~3.5e-4
    (assuming all 16 bands are counted — see below) — the accepted recall
    cost for not shipping boilerplate-heavy texts to the verify stage; set
    to 1 to disable. Pairs that reach verify are gated by exact Jaccard
    exactly as before, so precision is unchanged.

    Interaction with `max_bucket`: collisions are counted only among bands
    whose bucket survived the size cap, so a pair whose agreeing bands
    mostly landed in oversized (dropped) buckets would otherwise lose
    evidence it actually has. The prefilter therefore lowers each pair's
    required agreement by the EXACT number of agreements the cap hid — the
    count of bands where both members share the same capped bucket (a join
    of the dropped-band rows against the already-colliding candidate pairs,
    never a quadratic expansion) — never below 1. A per-id bound
    (min of each member's dropped-band counts) was tried first and relaxes
    far too broadly on boilerplate-heavy corpora, where most docs touch ≥1
    oversized bucket through unrelated boilerplate. The threshold is also
    clamped to `bands` so callers passing bands < min_band_agreement still
    get the one-band behavior instead of zero pairs unconditionally.

    Oversized band buckets (boilerplate skew) are excluded from the
    quadratic pair join; with `recover_oversized` their members are
    diverted to an EXACT content-hash pass — identical texts in a dropped
    bucket still pair (jaccard 1.0, pairing each doc to the min-id keeper
    of its hash group, so the recovery emits O(n) rows, never O(n²)).
    Near-but-not-identical members of a dropped bucket remain the accepted
    recall loss of the cap — that is the skew/recall trade every web-scale
    dedup makes."""
    _session.ensure_shipped(docs.sparkSession)

    bands_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("band_id", T.IntegerType(), False),
            T.StructField("band_hash", T.LongType(), False),
        ]
    )

    def mk_bands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from esgkg import kernel

        for pdf in batches:
            rows = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if not t:
                    continue
                sig = kernel.minhash_signature(t, k=k, ngram=shingle)
                for bi, bh in enumerate(kernel.band_hashes(sig, bands)):
                    rows.append((int(i), bi, bh))
            yield pd.DataFrame(rows, columns=["id", "band_id", "band_hash"])

    # checkpoint: band rows feed the size histogram, the pair join, and the
    # oversized-bucket recovery — without it the minhash UDF would run 3x
    b = (
        docs.select(id_col, text_col)
        .mapInPandas(mk_bands, schema=bands_schema)
        .localCheckpoint(eager=True)
    )
    sizes = b.groupBy("band_id", "band_hash").agg(F.count("*").alias("n"))
    oversized = sizes.filter(F.col("n") > max_bucket).select(
        "band_id", "band_hash"
    )
    ok = b.join(
        sizes.filter(F.col("n") <= max_bucket).select("band_id", "band_hash"),
        ["band_id", "band_hash"],
    )
    eff_agreement = max(1, min(min_band_agreement, bands))
    l, r = ok.alias("l"), ok.alias("r")
    pairs0 = (
        l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        # groupBy replaces the old distinct(): same dedup shuffle, but the
        # collision count doubles as the signature-agreement prefilter
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_bands"))
    )
    if eff_agreement <= 1:
        cand = pairs0.select("a", "b")
    else:
        # EXACT per-pair relaxation: count only bands where BOTH members sit
        # in the SAME capped bucket — precisely the agreements the cap could
        # have hidden. (The earlier min(nd_a, nd_b) over ANY oversized bucket
        # relaxed the threshold to ~1 for nearly every pair on boilerplate-
        # heavy corpora, disabling the prefilter exactly where it matters —
        # round-4 advice.) Never a quadratic expansion: the dropped-band rows
        # are joined against the ALREADY-COLLIDING candidate pairs (≤ bands
        # rows per id per side), not against each other; pairs whose every
        # agreement was dropped stay the accepted recall loss of the cap.
        # pairs0 feeds both the relaxation join and the final filter —
        # checkpoint so the quadratic bucket join runs once.
        pairs0 = pairs0.localCheckpoint(eager=True)
        dropped_bands = b.join(oversized, ["band_id", "band_hash"])
        shared_dropped = (
            pairs0.select("a", "b")
            .join(
                dropped_bands.select(
                    F.col("id").alias("a"), "band_id", "band_hash"
                ),
                "a",
            )
            .join(
                dropped_bands.select(
                    F.col("id").alias("b"), "band_id", "band_hash"
                ),
                ["b", "band_id", "band_hash"],
            )
            .groupBy("a", "b")
            .agg(F.count("*").alias("nd_shared"))
        )
        cand = (
            pairs0.join(shared_dropped, ["a", "b"], "left")
            .filter(
                F.col("n_bands")
                >= F.greatest(
                    F.lit(1),
                    F.lit(eff_agreement)
                    - F.coalesce(F.col("nd_shared"), F.lit(0)),
                )
            )
            .select("a", "b")
        )
    texts = docs.select(F.col(id_col).alias("a"), F.col(text_col).alias("ta"))
    cand = cand.join(texts, "a").join(
        docs.select(F.col(id_col).alias("b"), F.col(text_col).alias("tb")), "b"
    )

    verify_schema = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.LongType(), False),
            T.StructField("jaccard", T.DoubleType(), False),
        ]
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from esgkg import kernel

        for pdf in batches:
            out = pdf[["a", "b"]].copy()
            out["jaccard"] = [
                kernel.jaccard(ta, tb, shingle)
                for ta, tb in zip(pdf["ta"], pdf["tb"])
            ]
            yield out

    verified = (
        cand.mapInPandas(verify, schema=verify_schema)
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
    if not recover_oversized:
        return verified
    dropped_ids = (
        b.join(
            sizes.filter(F.col("n") > max_bucket).select(
                "band_id", "band_hash"
            ),
            ["band_id", "band_hash"],
        )
        .select("id")
        .distinct()
    )
    dd = docs.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("h")
    ).join(dropped_ids, "id")
    keep = dd.groupBy("h").agg(F.min("id").alias("keep_id"))
    exact_pairs = (
        dd.join(keep, "h")
        .filter(F.col("id") != F.col("keep_id"))
        .select(
            F.col("keep_id").alias("a"),
            F.col("id").alias("b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    # a pair can appear in both passes (caught in a small bucket AND an
    # oversized one) — keep one row per (a, b), preferring the exact pass
    return (
        verified.unionByName(exact_pairs)
        .groupBy("a", "b")
        .agg(F.max("jaccard").alias("jaccard"))
    )


def minhash_dedup_components(docs: DataFrame, **kw) -> DataFrame:
    """Near-dup clusters: (id, cluster_id) via connected components over the
    verified pair graph (cluster representative = min id)."""
    pairs = minhash_near_dup_pairs(docs, **kw).select(
        F.col("a").cast("string").alias("a"),
        F.col("b").cast("string").alias("b"),
    )
    comp = canon.connected_components(pairs)
    return comp.select(
        F.col("surface").cast("long").alias("doc_id"),
        F.col("canonical").cast("long").alias("cluster_id"),
    )


def simhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) 64-bit token-level SimHash per document."""
    _session.ensure_shipped(docs.sparkSession)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("simhash", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from esgkg import kernel

        for pdf in batches:
            rows = [
                (int(i), kernel.simhash64(kernel.tokenize(t or "")))
                for i, t in zip(pdf[id_col], pdf[text_col])
            ]
            yield pd.DataFrame(rows, columns=["id", "simhash"])

    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)


def simhash_near_dup_pairs(docs: DataFrame, max_hamming: int = 3,
                           max_bucket: int = 64, **kw) -> DataFrame:
    """SimHash near-dup pairs: block on 16-bit prefix bands (a pair within
    hamming distance d ≤ 3 of a 64-bit hash agrees exactly on at least one of
    4 16-bit bands — pigeonhole), verify exact hamming distance JVM-side.

    `max_bucket` bounds band-bucket sizes exactly like the MinHash path:
    boilerplate-heavy corpora collapse millions of docs into one band_val and
    the self-join goes quadratic without it. Oversized buckets are dropped —
    their members are exact/near-identical boilerplate that the exact-dedup
    pass catches by hash."""
    sig = simhash_signatures(docs, **kw)
    bands = []
    for bi in range(4):
        bands.append(
            sig.select(
                "id",
                "simhash",
                F.lit(bi).alias("band_id"),
                F.shiftrightunsigned(F.col("simhash"), bi * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("band_val"),
            )
        )
    b = bands[0]
    for x in bands[1:]:
        b = b.union(x)
    b = b.localCheckpoint(eager=True)  # feeds sizes AND both join sides
    sizes = b.groupBy("band_id", "band_val").agg(F.count("*").alias("n"))
    b = b.join(
        sizes.filter(F.col("n") <= max_bucket).select("band_id", "band_val"),
        ["band_id", "band_val"],
    )
    l, r = b.alias("l"), b.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.col("l.simhash").alias("ha"),
            F.col("r.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def char_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       block_col: str = "n_chars",
                       threshold: float = 0.5) -> DataFrame:
    """Character-set Jaccard similarity pairs within equal-`block_col` blocks
    (bounded candidate set) — fully JVM-side (no Python), and expressible in
    ANSI SQL for the differential oracle."""
    chars = F.array_distinct(F.split(F.col(text_col), ""))
    d = docs.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        chars.alias("chars"),
    )
    l, r = d.alias("l"), d.alias("r")
    inter = F.size(F.array_intersect(F.col("l.chars"), F.col("r.chars")))
    union = F.size(F.array_union(F.col("l.chars"), F.col("r.chars")))
    return (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            (inter / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             n_tables: int = 12, n_planes: int = 8,
                             seed: int = 1234,
                             max_bucket: int = 1024) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine) — the
    semantic-dedup family: random-hyperplane LSH blocking (the same
    signature machinery as `simsearch.ann_topk`) bounds the candidate set,
    then the exact cosine is verified JVM-side (zip_with/aggregate dot —
    no Python in the verify). A pair colliding in ANY of the `n_tables`
    bands becomes a candidate; `max_bucket` caps bucket fan-out exactly like
    the MinHash path (embedding-space boilerplate — near-zero or templated
    vectors — is the skew risk). Recall for a true pair at cosine s is
    1-(1-p^b)^L with p = 1 - arccos(s)/π: at the defaults and s=0.95,
    p ≈ 0.899, p^8 ≈ 0.426, recall ≈ 1-(1-0.426)^12 ≈ 0.9987."""
    from . import simsearch

    sig = (
        simsearch.hyperplane_signatures(
            embeddings.select(id_col, vec_col), n_tables, n_planes,
            id_col, vec_col, seed,
        )
        .localCheckpoint(eager=True)  # feeds sizes AND both join sides
    )
    sizes = sig.groupBy("table", "bucket").agg(F.count("*").alias("n"))
    ok = sig.join(
        sizes.filter(F.col("n") <= max_bucket).select("table", "bucket"),
        ["table", "bucket"],
    )
    l, r = ok.alias("l"), ok.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.table") == F.col("r.table"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )
    vecs = embeddings.select(
        F.col(id_col).alias("a"), F.col(vec_col).cast("array<double>").alias("va")
    )
    cand = cand.join(vecs, "a").join(
        embeddings.select(
            F.col(id_col).alias("b"),
            F.col(vec_col).cast("array<double>").alias("vb"),
        ),
        "b",
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def _n(c):
        return F.sqrt(
            F.aggregate(F.col(c), F.lit(0.0), lambda acc, x: acc + x * x)
        )

    return (
        cand.withColumn("cosine", dot / (_n("va") * _n("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
