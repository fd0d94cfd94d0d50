"""Regenerate tests/golden/*.parquet — committed expected outputs for the
queries the DuckDB oracle cannot express (q15-q20, q31, q33-q34 — `no_oracle`
in the driver's correctness report). Each golden is computed by a SINGLE-NODE
oracle (plain python / numpy / pandas — no Spark): the sequential
reference-pipeline semantics of esgkg/oracle.py extended with the linking,
canonicalization, graph and similarity steps those queries cover. The
pytest in tests/test_golden_queries.py hash-compares every query's Spark
DataFrame against its golden.

Independence caveat: the XXH64 used for graph ids is reimplemented here
from the public spec (and cross-checked against F.xxhash64 by pytest), so
the q16 golden is fully independent of the code under test. q17/q18,
however, reuse `canon.canonical_map_local` and `kernel.hash_embed` from
the esgkg package itself — those goldens pin DISTRIBUTED-vs-DRIVER
consistency (the Spark plans must reproduce the driver-side semantics row
for row), not an independent re-derivation of the canonicalization /
embedding semantics. The semantics themselves are covered separately by
the canon purity/completeness and unit-norm pytest suites.

Usage: python tools/gen_goldens.py   (writes tests/golden/*.parquet)
"""

from __future__ import annotations

import hashlib
import math
import sys
from pathlib import Path

import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GOLDEN_DIR = REPO / "tests" / "golden"
SF_DIR = "/root/testdata/sf0.01"  # the driver's correctness scale


# ---------------------------------------------------------------------------
# XXH64 (pure python) — Spark's `xxhash64(col, 42)` hashes the UTF-8 bytes
# of a string with the standard XXH64 algorithm and returns the result as a
# SIGNED long. Implemented from the public xxHash specification so the
# graph-id golden is independent of the JVM. A pytest cross-checks this
# implementation against F.xxhash64 on sample strings.
# ---------------------------------------------------------------------------
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _xxh64_int(value: int, seed: int) -> int:
    """XXH64 of a 4-byte little-endian int (Spark XXH64.hashInt)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def name_id(name: str) -> int:
    """Spark `_name_id` = `xxhash64(name, lit(42))`. NOTE Spark semantics:
    the literal 42 is not the seed — `xxhash64` hashes ALL its argument
    columns left-to-right with the fixed default seed 42, each column's
    hash seeding the next. So the id is the int-42 hash seeded by the
    string hash (verified against F.xxhash64 in
    test_python_xxh64_matches_spark)."""
    h = _xxh64_int(42, xxh64(name.encode("utf-8"), 42))
    return h - (1 << 64) if h >= (1 << 63) else h


# ---------------------------------------------------------------------------
# q15 — media features: the synthetic media table and the deterministic
# fake decoder are themselves the spec (esgkg/ops/multimodal.py docstring);
# recomputed here from that spec without Spark.
# ---------------------------------------------------------------------------
def gold_q15(n: int = 200, n_real: int = 30, seed: int = 42) -> pd.DataFrame:
    rows = []
    for i in range(n):
        payload = hashlib.blake2b(
            f"{seed}:{i}".encode(), digest_size=32
        ).digest() * (4 + i % 7)
        kind = ("image", "audio", "video")[i % 3]
        h = hashlib.blake2b(payload, digest_size=8).digest()
        w = 64 + h[0] % 192
        ht = 64 + h[1] % 192
        luma = sum(payload[:256]) / max(1, len(payload[:256])) / 255.0
        rows.append((i, kind, w, ht, _round6_half_up(luma), len(payload)))
    # real-format rows: payload bytes come from the shared deterministic
    # builder, but the expected features are recomputed ANALYTICALLY from
    # its closed-form pixel spec (multimodal.synth_real_payload docstring)
    # — the golden therefore independently checks the native BMP, PNG
    # (RGB and palette), and GIF decoders and the JPEG/WebP dimensions-only
    # parses, not just replays them
    from esgkg.ops.multimodal import synth_real_payload

    for i in range(n_real):
        payload, codec = synth_real_payload(i)
        w, ht = 4 + i % 13, 3 + i % 7
        if codec in ("jpeg", "webp"):
            luma = np.nan  # dimensions-only parse: luma needs a full decode
        elif codec == "gif":
            # 256-gray palette indexed by the c=0 channel value: luma of
            # gray (j, j, j) is exactly j under the BT.601 weights
            tot = sum(
                (i * 31 + y * 17 + x * 5) % 256
                for y in range(ht) for x in range(w)
            )
            luma = _round6_half_up(tot / (w * ht) / 255.0)
        elif i % 6 == 5:
            # palette PNG: index = c=0 channel value, resolved through the
            # closed-form PLTE entry j -> ((j*3)%256, (j*5+1)%256, (j*7+2)%256)
            tot = 0.0
            for y in range(ht):
                for x in range(w):
                    j = (i * 31 + y * 17 + x * 5) % 256
                    tot += (
                        0.299 * ((j * 3) % 256)
                        + 0.587 * ((j * 5 + 1) % 256)
                        + 0.114 * ((j * 7 + 2) % 256)
                    )
            luma = _round6_half_up(tot / (w * ht) / 255.0)
        else:
            tot = 0.0
            for y in range(ht):
                for x in range(w):
                    r, g, b = (
                        (i * 31 + y * 17 + x * 5 + c * 11) % 256
                        for c in (0, 1, 2)
                    )
                    tot += 0.299 * r + 0.587 * g + 0.114 * b
            luma = _round6_half_up(tot / (w * ht) / 255.0)
        rows.append((1000 + i, "image", w, ht, luma, len(payload)))
    return pd.DataFrame(
        rows,
        columns=["media_id", "kind", "width", "height", "mean_luma", "n_bytes"],
    )


# ---------------------------------------------------------------------------
# q16/q17/q18 — the sequential reference pipeline over 300 synthetic pages:
# raw triples (oracle.gold_triples) → dictionary/dense linking →
# driver-rung canonicalization → graph → Adamic-Adar top-k.
# ---------------------------------------------------------------------------
def _linked_triples(n_pages: int = 300) -> list[tuple[str, str, str, str]]:
    from esgkg import kernel, oracle, vocab

    surfaces = vocab.all_concept_surfaces()
    concepts = sorted(set(surfaces.values()))
    mat = np.stack([kernel.hash_embed(c) for c in concepts])
    cache: dict[str, str] = {}

    def link(s: str) -> str:
        hit = surfaces.get(s)
        if hit is not None:
            return hit
        hit = cache.get(s)
        if hit is None:
            v = kernel.hash_embed(s)
            sims = mat @ v
            i = int(np.argmax(sims))
            hit = concepts[i] if sims[i] >= 0.75 else s
            cache[s] = hit
        return hit

    return sorted(
        (link(s), p, link(o), u) for s, p, o, u in oracle.gold_triples(n_pages)
    )


def gold_q16(n_pages: int = 300) -> pd.DataFrame:
    from esgkg import oracle

    counts: dict[str, int] = {}
    for _, p, _, _ in oracle.gold_triples(n_pages):
        counts[p] = counts.get(p, 0) + 1
    return pd.DataFrame(
        sorted(counts.items()), columns=["pred", "n_triples"]
    )


def _canonical_triples(n_pages: int = 300) -> list[tuple[str, str, str, str]]:
    from esgkg import vocab
    from esgkg.stages import canon

    linked = _linked_triples(n_pages)
    surf = sorted({t[0] for t in linked} | {t[2] for t in linked})
    protected = set(
        sorted(set(vocab.all_concept_surfaces().values())) + ["Organization"]
    )
    pool = [s for s in surf if s and s not in protected]
    cm = canon.canonical_map_local(pool)
    return sorted(
        (cm.get(s, s), p, cm.get(o, o), u) for s, p, o, u in linked
    )


def gold_q17(n_pages: int = 300) -> pd.DataFrame:
    return pd.DataFrame(
        _canonical_triples(n_pages), columns=["subj", "pred", "obj", "url"]
    )


def gold_q18(n_pages: int = 300, top_k: int = 10,
             max_degree: int = 1000) -> pd.DataFrame:
    from esgkg import vocab

    triples = _canonical_triples(n_pages)
    # edges = dedup'd (src, dst, relation) ids over triples + ontology seed
    # (graph.materialize assume_closed semantics)
    edge_keys = {
        (name_id(s), name_id(o), p) for s, p, o, _ in triples
    } | {(name_id(c), name_id(p), r) for c, p, r in vocab.HIERARCHY}
    und: set[tuple[int, int]] = set()
    for a, b, _ in edge_keys:
        if a != b:
            und.add((a, b))
            und.add((b, a))
    nbrs: dict[int, set[int]] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
    deg = {z: len(ns) for z, ns in nbrs.items()}
    scores: dict[tuple[int, int], list[float]] = {}
    for z, ns in nbrs.items():
        d = deg[z]
        if d < 2 or d > max_degree:
            continue
        members = sorted(ns)
        w = 1.0 / math.log(d)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                key = (members[i], members[j])
                cur = scores.get(key)
                if cur is None:
                    scores[key] = [1, w]
                else:
                    cur[0] += 1
                    cur[1] += w
    rows = []
    per_src: dict[int, list] = {}
    for (a, b), (common, aa) in scores.items():
        if (a, b) in und:
            continue  # only NEW links
        per_src.setdefault(a, []).append((-aa, -common, b))
    for src, cands in per_src.items():
        cands.sort()
        for rank, (naa, ncommon, dst) in enumerate(cands[:top_k], start=1):
            rows.append((src, dst, int(-ncommon), round(-naa, 6), rank))
    out = pd.DataFrame(
        rows, columns=["src", "dst", "common_neighbors", "aa_score", "rank"]
    ).sort_values(["src", "rank"]).reset_index(drop=True)
    return out


# ---------------------------------------------------------------------------
# q19/q20 — similarity search over the sf0.01 embeddings table, numpy only.
# ---------------------------------------------------------------------------
def _embeddings() -> tuple[np.ndarray, np.ndarray]:
    df = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    ids = df["vec_id"].to_numpy().astype(np.int64)
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return ids, mat


def gold_q19(k: int = 10, n_tables: int = 12, n_planes: int = 6,
             seed: int = 1234, probe_hamming: int = 1) -> pd.DataFrame:
    ids, mat = _embeddings()
    q = mat[ids == 0][0]
    pool_mask = ids != 0
    pids, pmat = ids[pool_mask], mat[pool_mask]
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_tables, mat.shape[1], n_planes))
    pows = 1 << np.arange(n_planes)
    cand = np.zeros(len(pids), dtype=bool)
    for t in range(n_tables):
        buckets = ((pmat @ planes[t]) > 0).dot(pows).astype(int)
        qb = int(((q @ planes[t]) > 0).dot(pows))
        probes = {qb} | (
            {qb ^ (1 << i) for i in range(n_planes)}
            if probe_hamming >= 1
            else set()
        )
        cand |= np.isin(buckets, sorted(probes))
    cids, cmat = pids[cand], pmat[cand]
    qn = math.sqrt(float(q @ q))
    scores = (cmat @ q) / (np.sqrt((cmat * cmat).sum(axis=1)) * qn)
    order = sorted(range(len(cids)), key=lambda i: (-scores[i], cids[i]))[:k]
    return pd.DataFrame(
        [(int(cids[i]), round(float(scores[i]), 6)) for i in order],
        columns=["id", "score"],
    )


def gold_q20(k: int = 5) -> pd.DataFrame:
    ids, mat = _embeddings()
    qmask = ids < 5
    qids, qmat = ids[qmask], mat[qmask]
    cids, cmat = ids[~qmask], mat[~qmask]
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    cn = cmat / np.clip(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12, None)
    scores = qn @ cn.T
    rows = []
    for qi in range(len(qids)):
        order = sorted(
            range(len(cids)), key=lambda i: (-scores[qi, i], cids[i])
        )[:k]
        for rank, i in enumerate(order, start=1):
            rows.append(
                (int(qids[qi]), int(cids[i]), round(float(scores[qi, i]), 6), rank)
            )
    return pd.DataFrame(rows, columns=["query_id", "id", "score", "rank"])


# ---------------------------------------------------------------------------
# q31 — the evaluation harness over the 300-page KG, single-node. Reuses
# kernel.hash_embed + canonical_map_local like q17/q18 (distributed-vs-driver
# consistency — see the module docstring's independence caveat); the graph
# materialization, subgraph search (score → threshold/top-k → BFS →
# restricted edge set) and both evaluators are re-derived here in plain
# python from the documented semantics (stages/graph.py materialize/bfs,
# stages/rag.py search_subgraph, stages/evaluate.py).
# ---------------------------------------------------------------------------
def gold_q31(n_pages: int = 300, n_cases: int = 3) -> pd.DataFrame:
    from esgkg import kernel, vocab

    triples = _canonical_triples(n_pages)
    cat = vocab.concept_category()
    mentions: dict[str, int] = {}
    inst: set[str] = set()
    for s, p, o, _ in triples:
        mentions[s] = mentions.get(s, 0) + 1
        mentions[o] = mentions.get(o, 0) + 1
        if p == "instance_of":
            inst.add(s)
    seed_names = (
        {"ROOT"} | {c for c, _, _ in vocab.HIERARCHY} | set(vocab.LAWS)
    )
    all_names = sorted(set(mentions) | seed_names)
    name2id = {n: name_id(n) for n in all_names}
    id2name = {v: k for k, v in name2id.items()}
    category = {n: cat.get(n, "Other") for n in all_names}
    edge_keys = sorted(
        {(name2id[s], name2id[o], p) for s, p, o, _ in triples}
        | {(name2id[c], name2id[p], r) for c, p, r in vocab.HIERARCHY}
    )
    adj: dict[int, list[int]] = {}
    for a, b, _r in edge_keys:
        adj.setdefault(a, []).append(b)

    weights = {"Environment": 1.2, "Social": 1.1, "Governance": 1.1}
    emb = {n: kernel.hash_embed(n) for n in all_names}

    def search(query: str, max_nodes: int, max_depth: int,
               thr: float = 0.3) -> tuple[set, set]:
        q = kernel.hash_embed(query)
        scored = []
        for n in all_names:
            v = emb[n]
            dot = 0.0
            for i in range(len(v)):  # sequential f64 fold, like F.aggregate
                dot += float(v[i]) * float(q[i])
            scored.append((dot * weights.get(category[n], 1.0), n))
        top = [
            n
            for s, n in sorted(scored, key=lambda t: (-t[0], t[1]))
            if s >= thr
        ][:max_nodes]
        reach = {name2id[n] for n in top}
        frontier = set(reach)
        for _ in range(max_depth):
            nxt = {
                b for a in frontier for b in adj.get(a, ()) if b not in reach
            }
            if not nxt:
                break
            reach |= nxt
            frontier = nxt
        sub_names = {id2name[i] for i in reach if i in id2name}
        rel_keys = {
            f"{id2name[a]}-{r}-{id2name[b]}"
            for a, b, r in edge_keys
            if a in reach and b in reach and a in id2name and b in id2name
        }
        return sub_names, rel_keys

    # synth_test_cases: top out-degree sources, first-3 sorted out-edges
    outdeg: dict[int, int] = {}
    for a, _b, _r in edge_keys:
        outdeg[a] = outdeg.get(a, 0) + 1
    top_srcs = sorted(outdeg, key=lambda a: (-outdeg[a], a))[: n_cases * 4]
    rel_cases, rag_cases = [], []
    for src in top_srcs:
        if len(rel_cases) >= n_cases:
            break
        if src not in id2name:
            continue
        sname = id2name[src]
        outs = sorted(
            (sname, r, id2name[b])
            for a, b, r in edge_keys
            if a == src and b in id2name
        )[:3]
        if not outs:
            continue
        rel_cases.append((sname, outs))
        rag_cases.append(
            (sname, sorted({sname} | {d for _, _, d in outs}), outs)
        )

    correct = 0
    for sname, gold in rel_cases:
        _, rel_keys = search(sname, 10, 2)
        if rel_keys & {f"{s}-{t}-{d}" for s, t, d in gold}:
            correct += 1
    accuracy = correct / len(rel_cases) if rel_cases else 0.0
    node_covs, rel_covs = [], []
    for sname, concepts, outs in rag_cases:
        sub_names, rel_keys = search(sname, 15, 3)
        goldn = set(concepts)
        node_covs.append(
            len(sub_names & goldn) / len(goldn) if goldn else 0.0
        )
        goldr = {f"{s}-{t}-{d}" for s, t, d in outs}
        rel_covs.append(len(rel_keys & goldr) / len(goldr) if goldr else 0.0)
    n = len(rag_cases)
    return pd.DataFrame(
        [
            (
                accuracy,
                round(sum(node_covs) / n, 6) if n else 0.0,
                round(sum(rel_covs) / n, 6) if n else 0.0,
                len(rel_cases),
                n,
            )
        ],
        columns=[
            "accuracy",
            "avg_node_coverage",
            "avg_relation_coverage",
            "n_rel_cases",
            "n_rag_cases",
        ],
    )


# ---------------------------------------------------------------------------
# q33 — audio features: fake rows recomputed from the synthetic-decoder
# spec; real rows recomputed ANALYTICALLY from synth_real_audio_payload's
# closed-form sample spec, independently checking the native WAV decoder
# and the MP3 / FLAC parameters-only parses.
# ---------------------------------------------------------------------------
def _round6_half_up(v: float) -> float:
    """Spark's F.round(col, 6): HALF_UP on the double's shortest decimal
    repr (Python's round() is round-half-even and diverges on exact
    .xxxxxx5 values like 51/16000)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(v)).quantize(
        Decimal("1e-6"), rounding=ROUND_HALF_UP
    ))


def gold_q33(n: int = 200, n_real: int = 30, seed: int = 42) -> pd.DataFrame:
    rows = []
    for i in range(n):
        if i % 3 != 1:  # synth_media kind rotation: only audio rows
            continue
        payload = hashlib.blake2b(
            f"{seed}:{i}".encode(), digest_size=32
        ).digest() * (4 + i % 7)
        h = hashlib.blake2b(payload, digest_size=8).digest()
        rows.append(
            (
                i, "audio", 8000 + h[0] * 100, 1 + h[1] % 2,
                _round6_half_up((1 + h[2] % 30) / 10.0),
                _round6_half_up(h[3] / 255.0),
                len(payload),
            )
        )
    from esgkg.ops.multimodal import synth_real_audio_payload

    for i in range(n_real):
        payload, codec = synth_real_audio_payload(i)
        ch = 1 + i % 2
        frames = 50 + i % 30
        if codec == "mp3":
            # the hand-built frame header is always MPEG1 44.1 kHz; the
            # parameters-only parse leaves duration/rms NULL
            rows.append((2000 + i, "audio", 44100, ch,
                         np.nan, np.nan, len(payload)))
            continue
        if codec == "flac":
            # STREAMINFO-only stream: duration = total_samples/rate is
            # header-derivable; rms stays NULL (needs a frame decode)
            frate = 32000 + (i % 5) * 8000
            rows.append((2000 + i, "audio", frate, ch,
                         _round6_half_up(frames / frate),
                         np.nan, len(payload)))
            continue
        rate = (8000, 16000, 22050, 44100)[i % 4]
        tot = 0.0
        for t in range(frames):
            for c in range(ch):
                if i % 4 == 0:  # 16-bit signed
                    s = (((i * 37 + t * 13 + c * 7) % 4096) - 2048) / 32768.0
                else:           # 8-bit unsigned
                    s = ((i * 37 + t * 13 + c * 7) % 256 - 128) / 128.0
                tot += s * s
        rms = (tot / (frames * ch)) ** 0.5
        rows.append((2000 + i, "audio", rate, ch,
                     _round6_half_up(frames / rate),
                     _round6_half_up(rms), len(payload)))
    return pd.DataFrame(
        rows,
        columns=["media_id", "kind", "sample_rate", "n_channels",
                 "duration_sec", "rms", "n_bytes"],
    )


# ---------------------------------------------------------------------------
# q34 — video container metadata: fake rows recomputed from the synthetic-
# parser spec; real rows recomputed ANALYTICALLY from
# synth_real_video_payload's closed-form metadata spec, independently
# checking the native MP4 box walk (both mvhd/tkhd layout versions and the
# audio-only NULL-dimensions contract).
# ---------------------------------------------------------------------------
def gold_q34(n: int = 200, n_real: int = 30, seed: int = 42) -> pd.DataFrame:
    rows = []
    for i in range(n):
        if i % 3 != 2:  # synth_media kind rotation: only video rows
            continue
        payload = hashlib.blake2b(
            f"{seed}:{i}".encode(), digest_size=32
        ).digest() * (4 + i % 7)
        h = hashlib.blake2b(payload, digest_size=8).digest()
        rows.append(
            (
                i, "video", 160 + h[0] * 8, 120 + h[1] * 8,
                _round6_half_up((1 + h[2]) / 4.0), len(payload),
            )
        )
    from esgkg.ops.multimodal import synth_real_video_payload

    for i in range(n_real):
        payload, _codec = synth_real_video_payload(i)
        audio_only = i % 5 == 4
        rows.append(
            (
                3000 + i, "video",
                np.nan if audio_only else 160 + 8 * (i % 9),
                np.nan if audio_only else 120 + 8 * (i % 5),
                _round6_half_up((10 + i % 100) / 10.0), len(payload),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["media_id", "kind", "width", "height",
                 "duration_sec", "n_bytes"],
    )


GOLDENS = {
    "q15_media_features": gold_q15,
    "q33_audio_features": gold_q33,
    "q34_video_features": gold_q34,
    "q16_triples_by_pred": gold_q16,
    "q17_canonical_triples": gold_q17,
    "q18_predicted_links": gold_q18,
    "q19_ann_topk": gold_q19,
    "q20_knn_join": gold_q20,
    "q31_evaluation_harness": gold_q31,
}


def main() -> None:
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    for name, fn in GOLDENS.items():
        df = fn()
        path = GOLDEN_DIR / f"{name}.parquet"
        df.to_parquet(path, index=False)
        print(f"wrote {path} ({len(df)} rows)")


if __name__ == "__main__":
    main()
