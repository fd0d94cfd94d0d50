"""Oracle-vs-Spark differential gates (SURVEY.md §5):

1. byte-identical extracted text per url (BASELINE.json input_hint),
2. triples P/R ≥ 0.95 on exact (subj, pred, obj) join
   (comparison semantics: /root/reference/src/evaluation/metrics.py:125-132),
3. multi-label section categorization equality,
4. canonicalization purity + bridged completeness,
5. graph invariants (no orphan edges),
6. idempotent manifest resume.
"""

import shutil
import tempfile

import pytest

from esgkg import oracle, pipeline, synth, vocab
from esgkg.stages import canon, complete, corpus, graph, nlp, sections

N = 200


@pytest.fixture(scope="module")
def text_df(spark):
    return corpus.extract_text(corpus.synth_pages(spark, N)).cache()


def test_byte_identity(spark, text_df):
    got = {r.url: r.text for r in text_df.collect()}
    gold = oracle.gold_text(N)
    assert set(got) == set(gold)
    for url, g in gold.items():
        assert got[url].encode("utf-8") == g.encode("utf-8"), url


def test_triples_precision_recall(spark, text_df):
    pred = {
        (r.subj, r.pred, r.obj, r.url)
        for r in nlp.extract_triples(text_df).collect()
    }
    gold = oracle.gold_triples(N)
    p, r, f1 = oracle.precision_recall(pred, gold)
    assert p >= 0.95, p
    assert r >= 0.95, r


def test_sections_match_oracle(spark, text_df):
    got = {(r.url, r.category) for r in sections.categorize(text_df).collect()}
    gold = {(u, c) for u, c, _ in oracle.gold_sections(N)}
    assert got == gold


def test_canonicalization_purity_and_bridged_completeness(spark, text_df):
    linked = nlp.link_triples(nlp.extract_triples(text_df))
    surfaces = (
        linked.select("subj").union(linked.select("obj"))
        .withColumnRenamed("subj", "surface")
    )
    protected = sorted(set(vocab.all_concept_surfaces().values()))
    cm = {
        r.surface: r.canonical
        for r in canon.canonical_map(
            surfaces, exclude_exact=protected
        ).collect()
    }
    surface_group = {s: gid for s, gid in synth.gold_canon_groups()}
    # purity: no canonical id spans two gold groups
    canon_to_group: dict[str, int] = {}
    for s, c in cm.items():
        if s not in surface_group:
            continue
        gid = surface_group[s]
        assert canon_to_group.setdefault(c, gid) == gid, (s, c)
    # bridged completeness: if the group's base surface is present, all
    # present variants merge through it
    for grp in synth.company_pool():
        present = [s for s in grp if s in cm]
        if grp[0] in present and len(present) > 1:
            assert len({cm[s] for s in present}) == 1, present


def test_fused_equals_modular(spark, text_df):
    """The fused bench stage (synth→extract→nlp→link in one Arrow pass) must
    produce exactly the modular stages' rows."""
    modular = {
        tuple(r)
        for r in nlp.link_triples(nlp.extract_triples(text_df)).collect()
    }
    fused = {
        tuple(r)
        for r in nlp.synth_linked_triples(text_df.sparkSession, N).collect()
    }
    assert fused == modular


def test_narrow_widen_roundtrip_equals_fused(spark, text_df, tmp_path):
    """The bench-mode materialization path (narrow (subj,pred,obj,pid) rows
    → parquet → widen_linked JVM projection) must reproduce the fused
    stage's full TRIPLES_SCHEMA rows exactly — url string formatting and
    confidence included — and the full fused output must equal the modular
    chain (covered by test_fused_equals_modular)."""
    path = str(tmp_path / "narrow")
    nlp.synth_linked_narrow(spark, N).write.parquet(path)
    widened = nlp.widen_linked(spark.read.parquet(path))
    assert [f.name for f in widened.schema.fields] == [
        "subj", "pred", "obj", "url", "confidence"
    ]
    got = {tuple(r) for r in widened.collect()}
    want = {
        tuple(r)
        for r in nlp.link_triples(nlp.extract_triples(text_df)).collect()
    }
    assert got == want


def test_canonical_map_local_equals_distributed(spark, text_df):
    linked = nlp.link_triples(nlp.extract_triples(text_df))
    surfaces = (
        linked.select("subj").union(linked.select("obj"))
        .withColumnRenamed("subj", "surface")
    )
    protected = sorted(set(vocab.all_concept_surfaces().values()))
    fast = {
        r.surface: r.canonical
        for r in canon.canonical_map(
            surfaces, exclude_exact=protected
        ).collect()
    }
    # rung 2: distributed banding/verify + driver union-find on pairs
    mid = {
        r.surface: r.canonical
        for r in canon.canonical_map(
            surfaces, exclude_exact=protected, driver_threshold=0
        ).collect()
    }
    # rung 3: distributed banding/verify + distributed CC fixpoint
    dist = {
        r.surface: r.canonical
        for r in canon.canonical_map(
            surfaces, exclude_exact=protected, driver_threshold=0,
            pair_threshold=0
        ).collect()
    }
    assert fast == mid == dist


def test_cc_matches_networkx(spark):
    import networkx as nx

    pairs = [
        ("a", "b"), ("b", "c"), ("d", "e"), ("f", "f2"), ("f2", "f3"),
        ("x", "y"),
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = {
        r.surface: r.canonical
        for r in canon.connected_components(df).collect()
    }
    g = nx.Graph(pairs)
    for comp in nx.connected_components(g):
        labels = {got[n] for n in comp}
        assert len(labels) == 1
        assert min(comp) == labels.pop()


def test_graph_invariants(spark, text_df):
    linked = nlp.link_triples(nlp.extract_triples(text_df))
    nodes, edges = graph.materialize(linked, spark)
    # J3: every edge endpoint exists (inner-join write semantics)
    ids = {r.id for r in nodes.collect()}
    for r in edges.select("src", "dst").collect():
        assert r.src in ids and r.dst in ids
    # no orphan nodes among extracted ones that came from triples
    assert graph.orphans(nodes, edges).count() == 0
    # ids deterministic: rebuild gives identical ids
    nodes2, _ = graph.materialize(linked, spark)
    assert {(r.id, r.name) for r in nodes2.collect()} == {
        (r.id, r.name) for r in nodes.collect()
    }


def test_subconcepts_pruned_lookup(spark):
    from pyspark.sql import functions as F

    nodes, edges = graph.seed_graph(spark)
    nodes = nodes.withColumn("id", F.xxhash64("name", F.lit(42)))
    e = (
        edges.join(nodes.select(F.col("name").alias("src_name"), F.col("id").alias("src")), "src_name")
        .join(nodes.select(F.col("name").alias("dst_name"), F.col("id").alias("dst")), "dst_name")
        .select("src", "dst", "relation")
    )
    subs = {r.name for r in graph.subconcepts(e, nodes, "気候変動").collect()}
    assert "温室効果ガス" in subs and "カーボンニュートラル" in subs


def test_adamic_adar_matches_networkx(spark):
    import networkx as nx

    edges = [
        (1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5), (1, 6), (6, 7),
    ]
    df = spark.createDataFrame(
        [(a, b, "related_to", 1.0, "u") for a, b in edges],
        "src long, dst long, relation string, confidence double, url string",
    )
    got = {
        (r.src, r.dst): r.aa_score
        for r in complete.adamic_adar(df, top_k=100).collect()
    }
    g = nx.Graph(edges)
    for u, v, score in nx.adamic_adar_index(g):
        a, b = min(u, v), max(u, v)
        if score > 0:
            assert (a, b) in got, (a, b)
            assert abs(got[(a, b)] - score) < 1e-9
    # nothing proposed that networkx wouldn't
    nx_pairs = {
        (min(u, v), max(u, v))
        for u, v, s in nx.adamic_adar_index(
            g, [(a, b) for a in g for b in g if a < b and not g.has_edge(a, b)]
        )
        if s > 0
    }
    assert set(got) <= nx_pairs


def test_catalog_merge_upsert_semantics(spark):
    """S6 MERGE emulation: new rows win on key collision, others kept
    (Neo4j MERGE semantics, neo4j_manager.py:62,91)."""
    from esgkg.io import ParquetCatalog

    base = tempfile.mkdtemp(prefix="esgkg_merge_")
    try:
        cat = ParquetCatalog(base)
        cat.write(
            spark.createDataFrame(
                [("a", 1), ("b", 2)], "name string, v int"
            ),
            "t",
        )
        cat.merge(
            spark,
            spark.createDataFrame(
                [("b", 20), ("c", 3)], "name string, v int"
            ),
            "t",
            keys=["name"],
        )
        got = {(r.name, r.v) for r in cat.read(spark, "t").collect()}
        assert got == {("a", 1), ("b", 20), ("c", 3)}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_manifest_resume_after_partial_run(spark):
    """Kill-between-stages semantics: commit only the first stages, then run
    the full pipeline — committed stages must be skipped (their output files
    untouched) and the final tables must equal a from-scratch run."""
    import os

    from esgkg.io import ParquetCatalog
    from esgkg.stages import corpus, manifest, nlp

    base = tempfile.mkdtemp(prefix="esgkg_partial_")
    try:
        runner = manifest.Runner(spark, ParquetCatalog(base))
        fp = "synth:42:60"
        # simulate a run killed after the first two stages committed
        pages = corpus.synth_pages(spark, 60)
        text = runner.run_stage("text", fp, lambda: corpus.extract_text(pages))
        runner.run_stage("raw_triples", fp, lambda: nlp.extract_triples(text))
        mtimes = {
            f: os.path.getmtime(os.path.join(base, "text", f))
            for f in os.listdir(os.path.join(base, "text"))
        }
        # full pipeline over the same inputs resumes and completes
        out = pipeline.build_kg(spark, 60, base_dir=base)
        got = {(r.subj, r.pred, r.obj, r.url) for r in out["triples"].collect()}
        # committed stage outputs were not rewritten
        for f, m in mtimes.items():
            assert os.path.getmtime(os.path.join(base, "text", f)) == m
        # equals a from-scratch run
        base2 = tempfile.mkdtemp(prefix="esgkg_scratch_")
        try:
            out2 = pipeline.build_kg(spark, 60, base_dir=base2)
            want = {
                (r.subj, r.pred, r.obj, r.url)
                for r in out2["triples"].collect()
            }
            assert got == want
        finally:
            shutil.rmtree(base2, ignore_errors=True)
        m = spark.read.parquet(f"{base}/_manifest")
        assert m.count() == m.select("stage").distinct().count()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_manifest_resume_idempotent(spark):
    base = tempfile.mkdtemp(prefix="esgkg_manifest_")
    try:
        out1 = pipeline.build_kg(spark, 60, base_dir=base)
        t1 = {
            (r.subj, r.pred, r.obj, r.url) for r in out1["triples"].collect()
        }
        # second run must skip recompute and read identical tables
        out2 = pipeline.build_kg(spark, 60, base_dir=base)
        t2 = {
            (r.subj, r.pred, r.obj, r.url) for r in out2["triples"].collect()
        }
        assert t1 == t2
        m = out1["triples"].sparkSession.read.parquet(f"{base}/_manifest")
        stages = {r.stage for r in m.collect()}
        assert "triples" in stages and "edges" in stages
        # exactly one commit per stage (no duplicate work on resume)
        assert m.count() == len(stages)
    finally:
        shutil.rmtree(base, ignore_errors=True)
