"""Single-node oracle: the sequential reference pipeline the Spark engine
must match (SURVEY.md §5 — oracle-vs-Spark differential tests).

It mirrors the reference's straight-line flow
(/root/reference/scripts/05_text_extraction.py:110-134 →
/root/reference/scripts/06_ontology_construction.py:164-207) over the
synthetic ``pages`` table using the exact same kernel functions the Spark
UDFs call. Gates:

* gold_text — byte-identical extracted text per url,
* gold_triples — (subj, pred, obj) with P/R ≥ 0.95 (comparison semantics per
  /root/reference/src/evaluation/metrics.py:125-132).
"""

from __future__ import annotations

from . import kernel, synth


def gold_text(n_pages: int, seed: int = synth.SEED) -> dict[str, str]:
    """url -> byte-exact extracted+cleaned text."""
    g = synth.default_groups(n_pages)
    out: dict[str, str] = {}
    for i in range(n_pages):
        p = synth.make_page(i, seed, g)
        out[p["url"]] = kernel.page_text(p["html"])
    return out


def gold_sections(n_pages: int, seed: int = synth.SEED) -> list[tuple[str, str, str]]:
    """(url, category, text) rows — multi-label keyword categorization
    (/root/reference/scripts/05_text_extraction.py:85-106)."""
    g = synth.default_groups(n_pages)
    rows = []
    for i in range(n_pages):
        p = synth.make_page(i, seed, g)
        text = kernel.page_text(p["html"])
        if not text:
            continue
        for cat in kernel.categorize(text):
            rows.append((p["url"], cat, text))
    return rows


def gold_triples(n_pages: int, seed: int = synth.SEED) -> set[tuple[str, str, str, str]]:
    """(subj, pred, obj, url) set from the sequential kernel extractor."""
    g = synth.default_groups(n_pages)
    out: set[tuple[str, str, str, str]] = set()
    for i in range(n_pages):
        p = synth.make_page(i, seed, g)
        text = kernel.page_text(p["html"])
        for t in kernel.extract_triples(text, p["url"]):
            out.add(t)
    return out


def precision_recall(
    pred: set[tuple], gold: set[tuple]
) -> tuple[float, float, float]:
    """Exact-match P/R/F1 over triple sets
    (/root/reference/src/evaluation/metrics.py:106-138)."""
    if not pred or not gold:
        return 0.0, 0.0, 0.0
    tp = len(pred & gold)
    p = tp / len(pred)
    r = tp / len(gold)
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return p, r, f1
